"""Detection <-> track association, fully on device (static shapes).

Re-design of ``sam3/perflib/associate_det_trk.py:11-137``: the reference
computes mask IoU on GPU, then syncs to the host for scipy Hungarian matching
and python-set bookkeeping. Here the assignment runs on device (the same
auction solver as the training matcher) and every output is a fixed-size
mask/index tensor, so the per-frame video loop can stay inside one jitted
step with zero host round-trips:

* tracks match one-to-one via max-IoU assignment; a track is "matched" iff
  its assigned detection reaches ``iou_threshold_trk``;
* a detection is "new" iff it reaches ``iou_threshold`` with NO track and
  its score >= ``new_det_thresh``;
* ``det_to_trk`` is the boolean (N, M) "IoU >= threshold" incidence the
  reference returns as a dict-of-lists.

Inputs carry validity masks instead of dynamic lengths.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

from ..train.matcher import auction
from .masks import mask_iou


class Association(NamedTuple):
    new_det: jnp.ndarray            # (N,) bool — detections starting new tracks
    unmatched_trk: jnp.ndarray      # (M,) bool — tracks with no detection
    det_to_trk: jnp.ndarray         # (N, M) bool incidence (IoU >= thr)
    matched_det_score: jnp.ndarray  # (M,) score of the assigned detection (0 if none)
    matched_det_score_iou: jnp.ndarray  # (M,) score * IoU of assignment
    iou: jnp.ndarray                # (N, M)


def associate_det_trk(
    det_masks: jnp.ndarray,      # (N, H, W) bool/logits>0
    trk_masks: jnp.ndarray,      # (M, H, W)
    det_valid: Optional[jnp.ndarray] = None,   # (N,) bool
    trk_valid: Optional[jnp.ndarray] = None,   # (M,) bool
    det_scores: Optional[jnp.ndarray] = None,  # (N,)
    iou_threshold: float = 0.5,
    iou_threshold_trk: float = 0.5,
    new_det_thresh: float = 0.0,
) -> Association:
    n, m = det_masks.shape[0], trk_masks.shape[0]
    det_valid = (
        jnp.ones((n,), jnp.bool_) if det_valid is None else det_valid
    )
    trk_valid = (
        jnp.ones((m,), jnp.bool_) if trk_valid is None else trk_valid
    )
    det_scores = (
        jnp.ones((n,), jnp.float32) if det_scores is None else det_scores
    )

    iou = mask_iou(det_masks > 0, trk_masks > 0)  # (N, M)
    iou = jnp.where(det_valid[:, None] & trk_valid[None, :], iou, 0.0)

    # one-to-one assignment maximizing IoU, tracks as rows (each track gets
    # at most one detection — reference Hungarian direction)
    trk_to_det = auction(1.0 - iou.T, row_valid=trk_valid)  # (M,) det idx or -1
    safe = jnp.clip(trk_to_det, 0, n - 1)
    assigned_iou = jnp.where(
        trk_to_det >= 0, iou[safe, jnp.arange(m)], 0.0
    )
    matched_trk = assigned_iou >= iou_threshold_trk
    unmatched_trk = trk_valid & ~matched_trk

    det_to_trk = (iou >= iou_threshold) & det_valid[:, None] & trk_valid[None, :]
    new_det = (
        det_valid
        & ~det_to_trk.any(axis=1)
        & (det_scores >= new_det_thresh)
    )

    matched_score = jnp.where(trk_to_det >= 0, det_scores[safe], 0.0)
    return Association(
        new_det=new_det,
        unmatched_trk=unmatched_trk,
        det_to_trk=det_to_trk,
        matched_det_score=matched_score,
        matched_det_score_iou=matched_score * assigned_iou,
        iou=iou,
    )
