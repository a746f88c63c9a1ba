"""Dot-product scoring head (re-design of ``model_misc.DotProductScoring``,
model_misc.py:37-91): MLP(prompt) -> masked mean-pool -> proj; queries -> proj;
scaled dot product, clamped to ±12."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import LoRALinear, MLP, Spec


def masked_mean_pool(x: jnp.ndarray, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """x: (B, S, D); pad_mask: (B, S) True=pad -> (B, D)."""
    if pad_mask is None:
        return x.mean(axis=1)
    valid = (~pad_mask).astype(x.dtype)[..., None]
    num = jnp.clip(valid.sum(axis=1), 1.0)
    return (x * valid).sum(axis=1) / num


class DotProductScoring(nn.Module):
    spec: Spec

    @nn.compact
    def __call__(
        self,
        hs: jnp.ndarray,            # (layers, B, Q, D) or (B, Q, D)
        prompt: jnp.ndarray,        # (B, S, D)
        prompt_mask: Optional[jnp.ndarray],  # (B, S) True=pad
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        sp = self.spec
        cfg = sp.model
        d = cfg.d_model
        prompt = MLP(
            cfg.score_mlp_hidden, d, 2, sp, dropout=0.1, residual=True,
            out_norm=True, name="prompt_mlp",
        )(prompt, train=train)
        pooled = masked_mean_pool(prompt, prompt_mask)           # (B, D)
        pooled = LoRALinear(d, sp, name="prompt_proj")(pooled, train=train)
        proj_hs = LoRALinear(d, sp, name="hs_proj")(hs, train=train)
        scores = jnp.einsum(
            "...bqd,bd->...bq", proj_hs.astype(jnp.float32), pooled.astype(jnp.float32)
        )[..., None]
        scores = scores * (1.0 / jnp.sqrt(jnp.float32(d)))
        return jnp.clip(scores, -cfg.score_clamp, cfg.score_clamp)
