"""Geometry (box/point) prompt encoder.

Re-design of ``sam3/model/geometry_encoders.py`` (SequenceGeometryEncoder with
SAM3's flags: boxes/points each encoded by direct projection + feature pooling
+ sine position encoding, summed with a positive/negative label embedding; a
CLS token; a final linear+LN projection; then 3 transformer layers
cross-attending to the stride-14 image features, model_builder.py:232-285).

Static-shape prompt representation (replaces the reference's ``Prompt``
container + ``concat_padded_sequences`` machinery, geometry_encoders.py:22-412):
boxes live in a fixed (B, P, 4) tensor with a (B, P) True=pad mask. Because
every consumer (attention, pooling, scoring) is mask-aware, fixed-slot layout
is equivalent to the reference's contiguous right-padding — no re-packing is
ever needed on device.

Output sequence layout: [P box slots | CLS], mask (B, P+1) with CLS always
valid. Points are deferred to the interactive tier (PCS ignores point prompts;
sam3_image.py:547-548 prints a warning and drops them).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..ops.boxes import box_cxcywh_to_xyxy
from ..ops.posenc import encode_boxes, encode_xy
from ..ops.sampling import grid_sample, roi_align
from .fusion_encoder import EncoderLayer
from .layers import Conv2d, Embedding, LayerNorm, LoRALinear, Spec


@struct.dataclass
class GeoPrompt:
    """Static-shape geometric prompt batch.

    boxes: (B, P, 4) normalized cxcywh; mask: (B, P) True = padding;
    labels: (B, P) int32, 1 = positive, 0 = negative.
    points: (B, Pp, 2) normalized xy; points_mask/points_labels likewise.
    """

    boxes: jnp.ndarray
    mask: jnp.ndarray
    labels: jnp.ndarray
    points: Optional[jnp.ndarray] = None
    points_mask: Optional[jnp.ndarray] = None
    points_labels: Optional[jnp.ndarray] = None
    # mask prompt (one per query, reference Prompt.mask_embeddings,
    # geometry_encoders.py:376-396): (B, 1, Hm, Wm) float mask scores,
    # (B, 1) True=pad, (B, 1) int labels
    mask_embeddings: Optional[jnp.ndarray] = None
    mask_mask: Optional[jnp.ndarray] = None
    mask_labels: Optional[jnp.ndarray] = None

    @staticmethod
    def empty(
        batch: int, num_slots: int, num_points: int = 0
    ) -> "GeoPrompt":
        return GeoPrompt(
            boxes=jnp.zeros((batch, num_slots, 4), jnp.float32),
            mask=jnp.ones((batch, num_slots), jnp.bool_),
            labels=jnp.ones((batch, num_slots), jnp.int32),
            points=(
                jnp.zeros((batch, num_points, 2), jnp.float32)
                if num_points else None
            ),
            points_mask=(
                jnp.ones((batch, num_points), jnp.bool_) if num_points else None
            ),
            points_labels=(
                jnp.ones((batch, num_points), jnp.int32) if num_points else None
            ),
        )


class GeometryEncoder(nn.Module):
    spec: Spec

    @nn.compact
    def __call__(
        self,
        prompt: GeoPrompt,
        img_feats: jnp.ndarray,       # (B, HW, D) stride-14 tokens
        img_pos: jnp.ndarray,         # (B, HW, D)
        feat_hw: Tuple[int, int],
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (geo_tokens (B, P+1, D), geo_mask (B, P+1) True=pad)."""
        sp = self.spec
        cfg = sp.model
        d = cfg.d_model
        b, p, _ = prompt.boxes.shape
        h, w = feat_hw

        # image features for pooling, pre-normed (geometry_encoders.py:578-580)
        feats_normed = LayerNorm(name="img_pre_norm")(img_feats)
        feats_grid = feats_normed.transpose(0, 2, 1).reshape(b, d, h, w)

        # --- box embedding: direct + ROI pool + sine PE (geometry_encoders.py:643-692)
        boxes = prompt.boxes
        direct = LoRALinear(d, sp, name="boxes_direct_project")(
            boxes.astype(sp.dtype), train=train
        )

        boxes_xyxy = box_cxcywh_to_xyxy(boxes) * jnp.array(
            [w, h, w, h], jnp.float32
        )
        pooled = roi_align(
            feats_grid.astype(jnp.float32),
            boxes_xyxy,
            output_size=cfg.geo_roi_size,
        )  # (B, P, D, R, R)
        pooled = pooled.reshape(b * p, d, cfg.geo_roi_size, cfg.geo_roi_size)
        pooled = Conv2d(d, (cfg.geo_roi_size, cfg.geo_roi_size), sp, name="boxes_pool_project")(
            pooled.astype(sp.dtype)
        )
        pooled = pooled.reshape(b, p, d)

        cx, cy, ww, hh = [boxes[..., i] for i in range(4)]
        pe = encode_boxes(cx, cy, ww, hh, num_pos_feats=d)  # (B, P, D+2)
        pe = LoRALinear(d, sp, name="boxes_pos_enc_project")(
            pe.astype(sp.dtype), train=train
        )

        label_embed = Embedding(2, d, sp, name="label_embed")
        emb = direct + pooled + pe + label_embed(jnp.clip(prompt.labels, 0, 1))

        # --- point embedding: direct + grid-sample pool + sine PE
        # (geometry_encoders.py:600-641) — always instantiate the projections
        # so the param namespace matches the reference checkpoint even when no
        # point prompts are given.
        pts_direct = LoRALinear(d, sp, name="points_direct_project")
        pts_pool = LoRALinear(d, sp, name="points_pool_project")
        pts_pe = LoRALinear(d, sp, name="points_pos_enc_project")
        has_points = prompt.points is not None and prompt.points.shape[1] > 0
        if has_points:
            pts = prompt.points  # (B, Pp, 2) normalized xy
            p_direct = pts_direct(pts.astype(sp.dtype), train=train)
            # grid_sample expects [-1, 1] coords (align_corners=False)
            grid = (pts * 2.0 - 1.0)[:, :, None, :]  # (B, Pp, 1, 2)
            sampled = grid_sample(feats_grid.astype(jnp.float32), grid)
            sampled = sampled[..., 0].transpose(0, 2, 1)  # (B, Pp, D)
            p_pool = pts_pool(sampled.astype(sp.dtype), train=train)
            # encode_xy(npf=d) yields d/2 per coordinate; concat -> d
            ex, ey = encode_xy(pts[..., 0], pts[..., 1], num_pos_feats=d)
            p_pe = pts_pe(
                jnp.concatenate([ex, ey], -1).astype(sp.dtype), train=train
            )
            p_emb = p_direct + p_pool + p_pe + label_embed(
                jnp.clip(prompt.points_labels, 0, 1)
            )
        else:
            # materialize params without contributing to the graph
            zero2 = jnp.zeros((b, 0, 2), sp.dtype)
            zerod = jnp.zeros((b, 0, d), sp.dtype)
            pts_direct(zero2, train=train)
            pts_pool(zerod, train=train)
            pts_pe(zerod, train=train)
            p_emb = jnp.zeros((b, 0, d), emb.dtype)

        # --- CLS token (always valid; guarantees a non-empty sequence)
        cls = Embedding(1, d, sp, name="cls_embed")()  # (1, D)
        cls = jnp.broadcast_to(cls[None], (b, 1, d))
        seq = jnp.concatenate([emb, p_emb, cls], axis=1)     # (B, P+Pp+1, D)
        point_mask = (
            prompt.points_mask
            if has_points
            else jnp.ones((b, 0), jnp.bool_)
        )
        mask = jnp.concatenate(
            [prompt.mask, point_mask, jnp.zeros((b, 1), jnp.bool_)], axis=1
        )

        # zero out padded slots so no NaN/garbage leaks through residuals
        seq = jnp.where(mask[..., None], 0.0, seq)

        # --- final projection + LN (add_post_encode_proj=True)
        seq = LayerNorm(name="norm")(
            LoRALinear(d, sp, name="final_proj")(seq, train=train)
        )

        # --- 3 transformer layers cross-attending to image feats
        for i in range(cfg.geo_layers):
            seq = EncoderLayer(
                sp,
                d_model=d,
                heads=cfg.enc_heads,
                ffn_dim=cfg.enc_ffn_dim,
                dropout=cfg.enc_dropout,
                pos_enc_at_attn=False,
                pos_enc_at_cross_attn_keys=True,
                pos_enc_at_cross_attn_queries=False,
                name=f"encode.{i}",
            )(seq, img_feats, None, img_pos, mask, None, train)
        seq = LayerNorm(name="encode_norm")(seq)

        # --- mask prompt (FusedMaskEncoder, geometry_encoders.py:436-478):
        # downsample the prompt mask to the feature grid, fuse with the
        # (pre-normed) image features, add the sine PE, and append the H*W
        # tokens AFTER the transformer (reference forward :846-849 concats
        # mask embeddings last, skipping the encode layers). Gated off by
        # default — the release model has mask_encoder=None.
        if cfg.geo_mask_prompts and prompt.mask_embeddings is not None:
            from .tracker import SimpleMaskEncoder

            enc = SimpleMaskEncoder(
                sp, out_dim=d, in_dim=d,
                num_fuser_layers=cfg.geo_mask_fuser_layers,
                name="mask_encoder",
            )(
                feats_grid.astype(sp.dtype),
                prompt.mask_embeddings.astype(jnp.float32),
                skip_mask_sigmoid=True,  # removed option, handled outside
            )
            mtok = enc["vision_features"] + enc["vision_pos_enc"]
            mtok = mtok.reshape(b, d, -1).transpose(0, 2, 1)  # (B, H*W, D)
            mpad = jnp.broadcast_to(
                prompt.mask_mask, (b, mtok.shape[1])
            )  # attn_mask.repeat_interleave(H*W) with n_masks=1
            mtok = jnp.where(mpad[..., None], 0.0, mtok.astype(seq.dtype))
            seq = jnp.concatenate([seq, mtok], axis=1)
            mask = jnp.concatenate([mask, mpad], axis=1)
        return seq, mask
