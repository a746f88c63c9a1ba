"""Generic NMS over a precomputed IoU matrix (device, lax.fori_loop).

TPU-native equivalent of the reference's Triton mask-NMS
(``sam3/perflib/triton/nms.py:22-124``) and its generic dispatcher
(``sam3/perflib/nms.py:23-92``). The suppression recurrence is inherently
sequential in score order; N <= a few hundred, so an XLA fori_loop over rows
(each step vectorized over all columns) is bandwidth-trivial and avoids any
host round-trip. Returns a static-shape keep mask instead of dynamic indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masks import mask_iou


def generic_nms_mask(
    iou: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS given a pairwise IoU matrix.

    iou: (N, N); scores: (N,); valid: optional (N,) bool.
    Returns keep: (N,) bool, aligned with the *input* order.
    """
    n = scores.shape[0]
    neg = jnp.float32(-jnp.inf)
    s = scores.astype(jnp.float32)
    if valid is not None:
        s = jnp.where(valid, s, neg)
    order = jnp.argsort(-s)  # descending score
    iou_sorted = iou[order][:, order]
    valid_sorted = (
        jnp.ones((n,), jnp.bool_) if valid is None else valid[order]
    )

    def body(i, keep):
        # row i survives iff it hasn't been suppressed; if it survives,
        # suppress all later rows with IoU > thr
        alive_i = keep[i] & valid_sorted[i]
        later = jnp.arange(n) > i
        suppress = later & (iou_sorted[i] > iou_threshold)
        keep = jnp.where(alive_i & suppress, False, keep)
        return keep

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_sorted)
    # scatter back to input order
    keep = jnp.zeros((n,), jnp.bool_).at[order].set(keep_sorted)
    return keep


def nms_masks(
    masks: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mask-NMS: pairwise mask IoU (MXU matmul) + greedy suppression.

    masks: (N, H, W) binary; scores: (N,). Returns keep mask (N,) bool.
    Equivalent to reference ``nms_masks`` (perflib/nms.py:23-52).
    """
    iou = mask_iou(masks, masks)
    return generic_nms_mask(iou, scores, iou_threshold, valid=valid)
