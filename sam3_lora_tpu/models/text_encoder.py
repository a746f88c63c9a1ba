"""CLIP-style text encoder (re-design of ``sam3/model/text_encoder_ve.py``).

TextTransformer: token embedding + learned positional embedding + 24 pre-LN
residual attention blocks (causal mask) + final LayerNorm; the SAM3 wrapper
(``VETextEncoder``) returns per-token features resized 1024 -> 256 by a linear
``resizer``. The CLIP projection matrix (1024 x 512) is kept as a parameter
for checkpoint-key parity but is dead weight in this path (the reference
discards the pooled output, text_encoder_ve.py:306).

Module names mirror torch: ``encoder.token_embedding``,
``encoder.positional_embedding``, ``encoder.transformer.resblocks.{i}.{ln_1,
attn, ln_2, mlp.c_fc, mlp.c_proj}``, ``encoder.ln_final``,
``encoder.text_projection``, ``resizer``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Embedding, LayerNorm, LoRALinear, MultiHeadAttention, Spec


class ResidualAttentionBlock(nn.Module):
    spec: Spec
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, *, attn_bias=None, train: bool = False):
        y = LayerNorm(name="ln_1")(x)
        y = MultiHeadAttention(self.width, self.heads, self.spec, name="attn")(
            y, y, y, attn_bias=attn_bias, train=train
        )
        x = x + y
        y = LayerNorm(name="ln_2")(x)
        y = LoRALinear(self.width * 4, self.spec, name="mlp.c_fc")(y, train=train)
        y = jax.nn.gelu(y, approximate=False)
        y = LoRALinear(self.width, self.spec, name="mlp.c_proj")(y, train=train)
        return x + y


class TextTransformer(nn.Module):
    spec: Spec

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, *, train: bool = False):
        """token_ids: (B, L) int32. Returns (tokens (B, L, width), embeds)."""
        cfg = self.spec.model
        width = cfg.text_width
        emb = Embedding(
            cfg.text_vocab_size,
            width,
            self.spec,
            init=nn.initializers.normal(stddev=0.02),
            name="token_embedding",
        )
        x = emb(token_ids)
        inputs_embeds = x
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (cfg.text_context_length, width),
            self.spec.param_dtype,
        )
        seq = token_ids.shape[1]
        x = x + pos[:seq].astype(x.dtype)

        # causal mask: -inf above the diagonal (text_encoder_ve.py:220-226)
        causal = jnp.triu(jnp.full((seq, seq), -1e9, jnp.float32), k=1)
        causal = causal[None, None]  # (1, 1, L, L)

        for i in range(cfg.text_layers):
            x = ResidualAttentionBlock(
                self.spec, width, cfg.text_heads, name=f"transformer.resblocks.{i}"
            )(x, attn_bias=causal, train=train)
        x = LayerNorm(name="ln_final")(x)

        # CLIP projection: kept for checkpoint parity; unused downstream
        self.param(
            "text_projection",
            nn.initializers.normal(stddev=width ** -0.5),
            (width, cfg.text_proj_dim),
            self.spec.param_dtype,
        )
        return x, inputs_embeds


class VETextEncoder(nn.Module):
    """Returns (pad_mask (B, L) True=pad, resized tokens (B, L, d_model))."""

    spec: Spec

    @nn.compact
    def __call__(
        self, token_ids: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tokens, _ = TextTransformer(self.spec, name="encoder")(token_ids, train=train)
        resized = LoRALinear(self.spec.model.d_model, self.spec, name="resizer")(
            tokens, train=train
        )
        pad_mask = token_ids == 0  # True = padding (text_encoder_ve.py:300-310)
        return pad_mask, resized
