"""Fusion (DETR) encoder + the shared self/cross/FFN encoder layer.

Re-design of ``sam3/model/encoder.py`` (GroundingDINO-style). Each of the 6
layers runs pre-norm {self-attention over the 5184 flattened image tokens
(position encodings added at attention, encoder.py:180), cross-attention to
the prompt sequence, relu-FFN}. SAM3 uses a single feature level and no image
padding masks, so the multi-level flatten/level-embed plumbing reduces to one
reshape (encoder.py:322-376 collapses statically).

This framework is batch-first throughout (B, L, D) — sequence-first is a
torch.nn.MultiheadAttention legacy with no TPU benefit; batch-first keeps the
batch axis leading for data-parallel sharding.

``EncoderLayer`` is shared with the geometry encoder (the reference
instantiates the same ``TransformerEncoderLayer`` class for both,
model_builder.py:115-150 and :232-285).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dropout, LayerNorm, LoRALinear, MultiHeadAttention, Spec


def _ffn(layer: "EncoderLayer", x: jnp.ndarray, train: bool) -> jnp.ndarray:
    """The FFN sub-block as a liftable function (first arg = module) so it can
    be rematted on its own — see ModelConfig.enc_remat_ffn. Module names are
    created in the layer's own scope, so parameter paths are identical whether
    or not the remat wrapper is applied."""
    x = LoRALinear(layer.ffn_dim, layer.spec, name="linear1")(x, train=train)
    x = jax.nn.relu(x)
    x = Dropout(layer.dropout, name="dropout")(x, train=train)
    x = LoRALinear(layer.d_model, layer.spec, name="linear2")(x, train=train)
    return x


class EncoderLayer(nn.Module):
    """Pre-norm self-attn -> cross-attn -> FFN (encoder.py:139-201)."""

    spec: Spec
    d_model: int
    heads: int
    ffn_dim: int
    dropout: float
    pos_enc_at_attn: bool
    pos_enc_at_cross_attn_keys: bool
    pos_enc_at_cross_attn_queries: bool
    remat_ffn: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,          # (B, L, D)
        memory: jnp.ndarray,       # (B, S, D) cross-attention keys/values
        query_pos: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,  # memory pos enc
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,   # (B, L)
        memory_key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S)
        train: bool = False,
    ) -> jnp.ndarray:
        # NOTE: all-positional signature so nn.remat can mark `train` static
        # (static_argnums=(7,)).
        sp = self.spec
        # self attention
        tgt2 = LayerNorm(name="norm1")(tgt)
        qk = tgt2 + query_pos if (self.pos_enc_at_attn and query_pos is not None) else tgt2
        tgt2 = MultiHeadAttention(
            self.d_model, self.heads, sp, dropout=self.dropout, name="self_attn"
        )(qk, qk, tgt2, key_padding_mask=tgt_key_padding_mask, train=train)
        tgt = tgt + Dropout(self.dropout, name="dropout1")(tgt2, train=train)

        # cross attention to memory (prompt / image feats)
        tgt2 = LayerNorm(name="norm2")(tgt)
        q = tgt2 + query_pos if (self.pos_enc_at_cross_attn_queries and query_pos is not None) else tgt2
        k = memory + pos if (self.pos_enc_at_cross_attn_keys and pos is not None) else memory
        tgt2 = MultiHeadAttention(
            self.d_model, self.heads, sp, dropout=self.dropout, name="cross_attn_image"
        )(q, k, memory, key_padding_mask=memory_key_padding_mask, train=train)
        tgt = tgt + Dropout(self.dropout, name="dropout2")(tgt2, train=train)

        # FFN
        tgt2 = LayerNorm(name="norm3")(tgt)
        ffn = (
            nn.remat(_ffn, static_argnums=(2,))
            if (train and self.remat_ffn)
            else _ffn
        )
        tgt2 = ffn(self, tgt2, train)
        tgt = tgt + Dropout(self.dropout, name="dropout3")(tgt2, train=train)
        return tgt


class TransformerEncoderFusion(nn.Module):
    """6-layer fusion encoder over flattened image tokens.

    Inputs: img tokens (B, HW, D) + their sine pos (B, HW, D), prompt
    (B, S, D) + padding mask. Returns the encoded memory (B, HW, D).
    (add_pooled_text_to_img_feat=False in SAM3, model_builder.py:147.)
    """

    spec: Spec

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_pos: jnp.ndarray,
        prompt: jnp.ndarray,
        prompt_key_padding_mask: Optional[jnp.ndarray],
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.spec.model
        out = src
        layer_cls = (
            nn.remat(
                EncoderLayer, static_argnums=(7,),
                # save the long-attention kernel's output o: its custom VJP
                # needs o (flash rowsum identity), so without this the
                # backward replays the ~10 ms in-kernel forward per layer
                # just to rebuild it (q/k/v come from the cheap in_proj GEMM
                # replay either way). ~21 MB/layer at bs8.
                policy=jax.checkpoint_policies.save_only_these_names(
                    "enc_attn_out"
                ),
            )
            if (train and cfg.enc_remat)
            else EncoderLayer
        )
        for i in range(cfg.enc_layers):
            out = layer_cls(
                self.spec,
                d_model=cfg.d_model,
                heads=cfg.enc_heads,
                ffn_dim=cfg.enc_ffn_dim,
                dropout=cfg.enc_dropout,
                pos_enc_at_attn=True,
                pos_enc_at_cross_attn_keys=False,
                pos_enc_at_cross_attn_queries=False,
                remat_ffn=(not cfg.enc_remat) and cfg.enc_remat_ffn,
                name=f"layers.{i}",
            )(out, prompt, src_pos, None, None, prompt_key_padding_mask, train)
        return out
