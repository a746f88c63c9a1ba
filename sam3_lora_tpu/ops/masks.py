"""Mask ops: pairwise mask IoU, masks->boxes (device, XLA-fusable).

TPU-native equivalents of ``/root/reference/sam3/perflib/masks_ops.py:6-69``.
The reference implements these as flattened AND/OR sums (already XLA-friendly);
here they are single fused einsum/reduce expressions so XLA maps the inner
products onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_iou(masks1: jnp.ndarray, masks2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two stacks of binary masks.

    masks1: (N, H, W) bool/float; masks2: (M, H, W) -> (N, M) float32.
    Intersection is computed as a matmul over flattened pixels (MXU-friendly);
    union from per-mask areas.
    """
    m1 = masks1.reshape(masks1.shape[0], -1).astype(jnp.float32)
    m2 = masks2.reshape(masks2.shape[0], -1).astype(jnp.float32)
    inter = m1 @ m2.T
    area1 = m1.sum(-1)[:, None]
    area2 = m2.sum(-1)[None, :]
    union = area1 + area2 - inter
    return inter / jnp.clip(union, 1.0)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding xyxy boxes of binary masks (N, H, W) -> (N, 4) float32.

    Mirrors the reference's amax/amin trick (masks_ops.py:33-69): boxes are
    inclusive-exclusive pixel coordinates [x0, y0, x1+1, y1+1] matching
    torchvision conventions used by the eval tier; empty masks give zeros.
    """
    n, h, w = masks.shape
    m = masks.astype(jnp.bool_)
    any_mask = m.any(axis=(1, 2))
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    big = jnp.float32(1e9)
    row_any = m.any(axis=2)  # (N, H)
    col_any = m.any(axis=1)  # (N, W)
    y0 = jnp.min(jnp.where(row_any, ys[None, :], big), axis=1)
    y1 = jnp.max(jnp.where(row_any, ys[None, :], -big), axis=1)
    x0 = jnp.min(jnp.where(col_any, xs[None, :], big), axis=1)
    x1 = jnp.max(jnp.where(col_any, xs[None, :], -big), axis=1)
    boxes = jnp.stack([x0, y0, x1 + 1.0, y1 + 1.0], axis=-1)
    return jnp.where(any_mask[:, None], boxes, 0.0)
