"""MaskFormer-style universal segmentation head.

Re-design of ``sam3/model/maskformer_segmentation.py`` with SAM3's config
(model_builder.py:204-229): prompt cross-attention into the encoded image
tokens, a 3-stage top-down pixel decoder (nearest upsample + add + conv3x3 +
GroupNorm(8) + relu) to a stride-3.5 (288^2) pixel embedding, a conv1x1
instance head, and per-query mask logits via einsum(queries . mask_embed_MLP,
pixel_embed). A 1-channel semantic head is included for output parity.

TPU-native addition: ``query_sel`` — in training the (B, 400, 288, 288) full
mask tensor is never materialized; only the matched/gathered queries' masks
are produced (the einsum contracts over a gathered (B, K, D) query tensor).
The reference materializes all 400 (maskformer_segmentation.py:304-317), which
is the single largest activation in its train step.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_nearest
from .layers import Conv2d, GroupNorm, LayerNorm, MLP, MultiHeadAttention, Spec


class PixelDecoder(nn.Module):
    """Top-down FPN fusion (maskformer_segmentation.py:172-219)."""

    spec: Spec

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        """feats: high-res -> low-res list, e.g. [288^2, 144^2, 72^2 (encoder)]."""
        sp = self.spec
        d = sp.model.d_model
        prev = feats[-1]
        for idx, cur in enumerate(feats[:-1][::-1]):
            prev = cur + resize_nearest(prev, cur.shape[-2:])
            prev = Conv2d(d, (3, 3), sp, padding=1, name=f"conv_layers.{idx}")(prev)
            prev = jax.nn.relu(GroupNorm(8, name=f"norms.{idx}")(prev))
        return prev


class UniversalSegmentationHead(nn.Module):
    spec: Spec

    @nn.compact
    def __call__(
        self,
        backbone_feats: List[jnp.ndarray],   # [(B,D,288,288), (B,D,144,144), ...]
        encoder_hidden_states: jnp.ndarray,  # (B, HW, D)
        obj_queries: jnp.ndarray,            # (B, K, D) — last-layer queries (pre-gathered ok)
        prompt: jnp.ndarray,                 # (B, S, D)
        prompt_mask: Optional[jnp.ndarray],  # (B, S) True=pad
        feat_hw: Tuple[int, int],
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        sp = self.spec
        d = sp.model.d_model
        b = encoder_hidden_states.shape[0]
        h, w = feat_hw

        # prompt cross-attention into encoder tokens (msegm.py:281-289)
        tgt2 = LayerNorm(name="cross_attn_norm")(encoder_hidden_states)
        tgt2 = MultiHeadAttention(d, 8, sp, dropout=0.0, name="cross_attend_prompt")(
            tgt2, prompt, prompt, key_padding_mask=prompt_mask, train=train
        )
        enc = tgt2 + encoder_hidden_states

        # pixel decoder over [fpn..., encoder-grid] (msegm.py:102-143)
        enc_grid = enc.transpose(0, 2, 1).reshape(b, d, h, w)
        feats = list(backbone_feats[:-1]) + [enc_grid]
        pixel_embed = PixelDecoder(sp, name="pixel_decoder")(feats)  # (B, D, Hp, Wp)

        instance_embeds = Conv2d(d, (1, 1), sp, name="instance_seg_head")(pixel_embed)
        semantic_seg = Conv2d(1, (1, 1), sp, name="semantic_seg_head")(pixel_embed)

        mask_embed = MLP(d, d, 3, sp, name="mask_predictor.mask_embed")(
            obj_queries, train=train
        )
        # f32 MXU accumulation, but STORE the mask logits at the compute dtype:
        # the f32 output was a 540 MB HLO temp at bs8/v5e (r3 queue H dump) and
        # its residual doubles backward memory. The reference's AMP autocast
        # produces bf16 mask logits here too (torch einsum under autocast);
        # the loss upcasts to f32 elementwise (train/losses.py), which XLA
        # fuses into the focal/dice chain without materializing an f32 copy.
        pred_masks = jnp.einsum(
            "bqc,bchw->bqhw",
            mask_embed.astype(sp.dtype),
            instance_embeds.astype(sp.dtype),
            preferred_element_type=jnp.float32,
        ).astype(sp.dtype)
        return {
            "pred_masks": pred_masks,
            "semantic_seg": semantic_seg,
        }
