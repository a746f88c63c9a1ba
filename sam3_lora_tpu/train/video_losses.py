"""Semantic-segmentation criterion + detection<->track association losses.

Re-design of the video-tier losses in ``sam3/train/loss/loss_fns.py``:

* :func:`semantic_seg_loss` — SemanticSegCriterion (loss_fns.py:1000-1150):
  instance masks merged into one semantic target, BCE-or-focal + dice at the
  prediction resolution, optional presence head that gates per-image losses
  to frames that actually contain foreground, plus the mIoU metric.
* :func:`det2trk_assoc_loss` — Det2TrkAssoc (loss_fns.py:1153-1226): softmax
  CE over (Q_trk + 2) association columns (track index / "new object" /
  "false positive") with -1-label masking instead of ignore_index.
* :func:`tracking_by_detection_assoc_loss` — TrackingByDetectionAssoc
  (loss_fns.py:1228-1305): the symmetric det->trk + trk->det pair with
  "new-object" / "occluded" extra columns.

All label construction is static-shape boolean algebra (the reference uses
``nonzero`` scatter, which is dynamic); ignored labels are masked out of the
mean rather than skipped.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.focal import sigmoid_focal_loss


def _dice_per_image(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Unreduced dice over (B, P) flattened masks (loss_fns.py:79-123 with
    reduce=False — the presence head gates the reduction)."""
    p = jax.nn.sigmoid(logits)
    num = 2.0 * (p * targets).sum(axis=-1)
    den = p.sum(axis=-1) + targets.sum(axis=-1)
    return 1.0 - (num + 1.0) / (den + 1.0)

__all__ = [
    "semantic_seg_loss",
    "det2trk_assoc_loss",
    "tracking_by_detection_assoc_loss",
]


def _resize_to(masks: jnp.ndarray, hw) -> jnp.ndarray:
    """Bilinear resize of (B, H, W) float masks to (B, h, w)."""
    b = masks.shape[0]
    return jax.image.resize(masks, (b,) + tuple(hw), "bilinear")


def _masked_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row softmax CE with -1 labels contributing 0 (the reference's
    ignore_index=-1)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(labels >= 0, ce, 0.0)


def semantic_seg_loss(
    semantic_logits: jnp.ndarray,       # (B, 1, h, w)
    instance_masks: jnp.ndarray,        # (B, T, H, W) float {0,1}
    mask_valid: jnp.ndarray,            # (B, T) bool
    presence_logit: Optional[jnp.ndarray] = None,  # (B,) or (B, 1)
    focal: bool = False,
    focal_alpha: float = 0.6,
    focal_gamma: float = 1.6,
    presence_loss: bool = True,
) -> Dict[str, jnp.ndarray]:
    logits = semantic_logits[:, 0]                     # (B, h, w)
    hw = logits.shape[-2:]
    # instance -> semantic union, downsampled to the prediction grid
    inst = jnp.where(mask_valid[..., None, None], instance_masks, 0.0)
    sem = inst.max(axis=1)                             # (B, H, W)
    sem = _resize_to(sem.astype(jnp.float32), hw) > 0.5
    target = sem.astype(jnp.float32)

    b = logits.shape[0]
    flat_l = logits.reshape(b, -1)
    flat_t = target.reshape(b, -1)
    if focal:
        per_px = sigmoid_focal_loss(
            flat_l, flat_t, alpha=focal_alpha, gamma=focal_gamma
        )
    else:
        per_px = (
            jnp.maximum(flat_l, 0.0)
            - flat_l * flat_t
            + jnp.log1p(jnp.exp(-jnp.abs(flat_l)))
        )
    per_img = per_px.mean(axis=1)                      # (B,)
    d = _dice_per_image(flat_l, flat_t)                # (B,)

    pred = (jax.nn.sigmoid(flat_l) > 0.5)
    inter = (pred & (flat_t > 0.5)).sum(axis=1)
    union = (pred | (flat_t > 0.5)).sum(axis=1)
    miou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0).mean()

    out: Dict[str, jnp.ndarray] = {}
    if presence_logit is not None:
        pl = presence_logit.reshape(b)
        present = flat_t.any(axis=1)
        pt = present.astype(jnp.float32)
        if presence_loss:
            bce = (
                jnp.maximum(pl, 0.0) - pl * pt + jnp.log1p(jnp.exp(-jnp.abs(pl)))
            )
            out["loss_semantic_presence"] = bce.mean()
            out["presence_acc"] = (
                ((jax.nn.sigmoid(pl) > 0.5) == present).astype(jnp.float32).mean()
            )
        else:
            out["loss_semantic_presence"] = jnp.float32(0.0)
            out["presence_acc"] = jnp.float32(0.0)
        nb = pt.sum()
        per_img = (per_img * pt).sum() / (nb + 1e-6)
        d = (d * pt).sum() / (nb + 1e-6)
    else:
        per_img = per_img.mean()
        d = d.mean()

    out["loss_semantic_seg"] = per_img
    out["loss_semantic_dice"] = d
    out["miou_semantic_seg"] = miou
    return out


def det2trk_assoc_loss(
    assoc_logits: jnp.ndarray,       # (B, Q_det, Q_trk + 2)
    matched_obj_ids_det: jnp.ndarray,  # (B, Q_det) int, -1 = unmatched
    matched_obj_ids_trk: jnp.ndarray,  # (B, Q_trk) int, -1 = unmatched
    num_boxes: jnp.ndarray,
    pred_logits: Optional[jnp.ndarray] = None,  # (B, Q_det) for FP labels
    is_exhaustive: Optional[jnp.ndarray] = None,  # (B,) bool
    use_fp_loss: bool = False,
    fp_loss_on_exhaustive_only: bool = True,
    treat_fp_as_new_obj: bool = False,
) -> Dict[str, jnp.ndarray]:
    b, q_det, cols = assoc_logits.shape
    q_trk = cols - 2
    det_m = matched_obj_ids_det >= 0
    trk_m = matched_obj_ids_trk >= 0

    same = (
        det_m[:, :, None]
        & trk_m[:, None, :]
        & (matched_obj_ids_det[:, :, None] == matched_obj_ids_trk[:, None, :])
    )  # (B, Q_det, Q_trk)
    # label a): matched track index (at most one true per det)
    trk_label = jnp.argmax(same, axis=-1)
    has_trk = same.any(axis=-1)
    labels = jnp.where(has_trk, trk_label, -1)
    # label b): new object
    labels = jnp.where(det_m & ~has_trk, q_trk, labels)
    # label c): false positive
    if use_fp_loss and pred_logits is not None:
        fp = ~det_m & (pred_logits > 0)
        if treat_fp_as_new_obj:
            labels = jnp.where(fp, q_trk, labels)
        else:
            if fp_loss_on_exhaustive_only and is_exhaustive is not None:
                fp = fp & is_exhaustive[:, None]
            labels = jnp.where(fp, q_trk + 1, labels)

    ce = _masked_ce(assoc_logits, labels)              # (B, Q_det)
    frame_valid = trk_m.any(axis=-1, keepdims=True)
    ce = ce * frame_valid.astype(jnp.float32)
    return {"loss_det2trk_assoc": ce.sum() / (b * num_boxes)}


def tracking_by_detection_assoc_loss(
    assoc_logits: jnp.ndarray,          # (B, Q_det+1, Q_trk+1)
    matched_obj_ids_det: jnp.ndarray,   # (B, Q_det)
    prev_trk_object_ids: jnp.ndarray,   # (B, Q_trk)
    num_boxes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    b, qd1, qt1 = assoc_logits.shape
    q_det, q_trk = qd1 - 1, qt1 - 1
    det_m = matched_obj_ids_det >= 0
    trk_m = prev_trk_object_ids >= 0
    frame_valid = trk_m.any(axis=-1, keepdims=True).astype(jnp.float32)

    same = (
        det_m[:, :, None]
        & trk_m[:, None, :]
        & (matched_obj_ids_det[:, :, None] == prev_trk_object_ids[:, None, :])
    )  # (B, Q_det, Q_trk)

    # det -> trk: matched track index, else "new object" column Q_trk
    d_lab = jnp.where(same.any(-1), jnp.argmax(same, -1), -1)
    d_lab = jnp.where(det_m & ~same.any(-1), q_trk, d_lab)
    d_ce = _masked_ce(assoc_logits[:, :-1], d_lab) * frame_valid
    out = {"loss_det2trk_assoc": d_ce.sum() / (b * num_boxes)}

    # trk -> det: matched det index, else "occluded" column Q_det
    same_t = same.transpose(0, 2, 1)                   # (B, Q_trk, Q_det)
    t_lab = jnp.where(same_t.any(-1), jnp.argmax(same_t, -1), -1)
    t_lab = jnp.where(trk_m & ~same_t.any(-1), q_det, t_lab)
    t_logits = assoc_logits.transpose(0, 2, 1)[:, :-1]  # (B, Q_trk, Q_det+1)
    t_ce = _masked_ce(t_logits, t_lab) * frame_valid
    out["loss_trk2det_assoc"] = t_ce.sum() / (b * num_boxes)
    return out


# ---------------------------------------------------------------------------
# PointRend-style point-sampled mask loss (sam3/train/loss/mask_sampling.py)
# ---------------------------------------------------------------------------


def point_sample(logits: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (N, C, H, W) at (N, P, 2) coords in [0,1]x[0,1] (x, y)
    -> (N, C, P). The reference wraps grid_sample the same way
    (mask_sampling.py:10-34)."""
    from ..ops.sampling import grid_sample

    grid = 2.0 * coords[:, :, None, :] - 1.0            # (N, P, 1, 2) in [-1,1]
    out = grid_sample(logits, grid)                     # (N, C, P, 1)
    return out[..., 0]


def get_uncertain_point_coords_with_randomness(
    logits: jnp.ndarray,        # (N, 1, H, W)
    rng: jnp.ndarray,
    num_points: int,
    oversample_ratio: int = 3,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """(N, num_points, 2) in [0,1]^2: importance-sampled where |logit| is
    small (uncertain) + uniform random remainder (mask_sampling.py:38-...,
    PointRend). Static shapes throughout."""
    n = logits.shape[0]
    k1, k2 = jax.random.split(rng)
    n_sampled = num_points * oversample_ratio
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    vals = point_sample(logits, coords)[:, 0]           # (N, n_sampled)
    uncert = -jnp.abs(vals)
    n_imp = int(num_points * importance_sample_ratio)
    n_rand = num_points - n_imp
    _, idx = jax.lax.top_k(uncert, n_imp)
    imp = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if n_rand > 0:
        rand = jax.random.uniform(k2, (n, n_rand, 2))
        return jnp.concatenate([imp, rand], axis=1)
    return imp


def point_sampled_mask_loss(
    pred_logits: jnp.ndarray,   # (N, h, w) predicted mask logits
    gt_masks: jnp.ndarray,      # (N, H, W) float {0,1}
    num_boxes,
    rng: jnp.ndarray,
    num_points: int = 12544,
    oversample_ratio: int = 3,
    importance_sample_ratio: float = 0.75,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
):
    """Focal + dice on PointRend-sampled points instead of full-resolution
    upsampling (the reference Masks loss's point-sampled variant,
    loss_fns.py:568-709): avoids materializing (N, 1008, 1008) upsampled
    logits — on TPU this replaces a 4 GB bilinear tensor with a (N, P)
    gather."""
    p = pred_logits[:, None]                            # (N, 1, h, w)
    coords = jax.lax.stop_gradient(
        get_uncertain_point_coords_with_randomness(
            p, rng, num_points, oversample_ratio, importance_sample_ratio
        )
    )
    pred_pts = point_sample(p, coords)[:, 0]            # (N, P)
    gt_pts = point_sample(gt_masks[:, None].astype(jnp.float32), coords)[:, 0]
    gt_pts = (gt_pts > 0.5).astype(jnp.float32)
    focal = sigmoid_focal_loss(
        pred_pts, gt_pts, alpha=focal_alpha, gamma=focal_gamma
    ).mean(axis=-1)
    dice = _dice_per_image(pred_pts, gt_pts)
    return {
        "loss_mask": focal.sum() / num_boxes,
        "loss_dice": dice.sum() / num_boxes,
    }
