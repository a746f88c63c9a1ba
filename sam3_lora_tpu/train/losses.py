"""SAM3 training losses, static-shape (re-derivation of
``sam3/train/loss/loss_fns.py`` + ``sam3_loss.py`` with the native LoRA
trainer's exact configuration, train_sam3_lora_native.py:743-793):

* Boxes: L1 + diagonal GIoU over matched pairs / num_boxes (loss_fns.py:518-565)
* IABCEMdetr: IoU-aware BCE with soft positive targets
  t = p^alpha * IoU^(1-alpha), pos_weight 10, focal-weighted negatives,
  weak (non-exhaustive) negative masking, presence focal loss
  (loss_fns.py:267-515)
* Masks: focal(0.25, 2) + dice on matched pairs (loss_fns.py:568-709)
* aggregation over main + per-layer aux outputs + the DAC o2m branch at
  o2m_weight=2 (sam3_loss.py:83-159)

Weights (native trainer): bbox 5, giou 2, ce 20, presence 20, mask 200,
dice 10. Matched-pair bookkeeping uses the static index tensors produced by
``sam3_lora_tpu/train/matcher.py`` instead of ragged (batch, src, tgt) tuples.

The expected initial total loss is ~130 on real data (reference
README.md:1224-1254 documents the magnitude breakdown — useful integration
oracle).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.sam3_image import Targets
from ..ops.boxes import (
    box_cxcywh_to_xyxy,
    fast_diag_box_iou,
    fast_diag_generalized_box_iou,
)
from ..ops.focal import dice_loss, sigmoid_bce, sigmoid_focal_loss
from ..ops.interpolate import resize_bilinear


@dataclass(frozen=True)
class LossConfig:
    weight_bbox: float = 5.0
    weight_giou: float = 2.0
    weight_ce: float = 20.0
    weight_presence: float = 20.0
    weight_mask: float = 200.0
    weight_dice: float = 10.0
    pos_weight: float = 10.0
    alpha: float = 0.25      # IABCEM soft-target mixing + mask focal alpha
    gamma: float = 2.0       # negative down-weighting + mask focal gamma
    presence_alpha: float = 0.5
    presence_gamma: float = 0.0
    o2m_weight: float = 2.0
    normalization: str = "local"  # local | global | none
    axis_name: Optional[str] = None  # mesh axis for global normalization
    compute_aux: bool = True


def _num_boxes(targets: Targets, cfg: LossConfig):
    n = targets.valid.sum().astype(jnp.float32)
    if cfg.normalization == "global":
        assert cfg.axis_name is not None
        n = jax.lax.pmean(n, cfg.axis_name)
        return jnp.clip(n, 1.0)
    if cfg.normalization == "local":
        return jnp.clip(n, 1.0)
    return jnp.float32(1.0)


def _gather_q(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, Q, ...); idx: (B, ...) int -> x[b, idx[b]] with idx clipped."""
    b = x.shape[0]
    flat_idx = jnp.clip(idx.reshape(b, -1), 0, x.shape[1] - 1)
    out = jnp.take_along_axis(
        x, flat_idx[(...,) + (None,) * (x.ndim - 2)], axis=1
    )
    return out.reshape(idx.shape + x.shape[2:])


def boxes_loss(pred_boxes, pred_xyxy, targets: Targets, idx, pair_valid, num_boxes):
    """L1 + diag GIoU over matched pairs. idx/pair_valid: (B, ...pair dims)."""
    src = _gather_q(pred_boxes, idx)
    src_xyxy = _gather_q(pred_xyxy, idx)
    # broadcast targets over extra pair dims (o2m K axis)
    tb = targets.boxes
    tbx = box_cxcywh_to_xyxy(tb)
    while tb.ndim < src.ndim:
        tb = tb[..., None, :]
        tbx = tbx[..., None, :]
    tb = jnp.broadcast_to(tb, src.shape)
    tbx = jnp.broadcast_to(tbx, src_xyxy.shape)
    w = pair_valid.astype(jnp.float32)
    l1 = (jnp.abs(src - tb).sum(-1) * w).sum() / num_boxes
    giou = ((1.0 - fast_diag_generalized_box_iou(src_xyxy, tbx)) * w).sum() / num_boxes
    return {"loss_bbox": l1, "loss_giou": giou}


def iabce_loss(
    pred_logits,          # (B, Q, 1)
    pred_xyxy,            # (B, Q, 4)
    targets: Targets,
    idx,                  # (B, T) o2o or (B, T, K) o2m
    pair_valid,           # same shape as idx
    num_boxes,
    cfg: LossConfig,
    presence_logits: Optional[jnp.ndarray] = None,  # (B, 1)
):
    b, q = pred_logits.shape[:2]
    s = pred_logits[..., 0]                  # (B, Q)
    prob = jax.nn.sigmoid(s)

    # scatter matched info into per-query maps
    onehot = jax.nn.one_hot(jnp.clip(idx, 0, q - 1), q, dtype=jnp.float32)
    onehot = onehot * pair_valid.astype(jnp.float32)[..., None]
    pair_axes = tuple(range(1, idx.ndim))    # axes over T (and K)
    target_classes = jnp.clip(onehot.sum(pair_axes), 0.0, 1.0)  # (B, Q)

    # soft positive targets t = p^a * iou^(1-a), clamp 0.01 (loss_fns.py:366-370)
    src_xyxy = _gather_q(pred_xyxy, idx)
    tbx = box_cxcywh_to_xyxy(targets.boxes)
    while tbx.ndim < src_xyxy.ndim:
        tbx = tbx[..., None, :]
    tbx = jnp.broadcast_to(tbx, src_xyxy.shape)
    iou = fast_diag_box_iou(src_xyxy, tbx)
    prob_pair = _gather_q(prob[..., None], idx)[..., 0]
    t = jnp.clip(prob_pair ** cfg.alpha * iou ** (1.0 - cfg.alpha), 0.01)
    t = jax.lax.stop_gradient(t)
    # scatter t (max-combine across duplicate query matches)
    t_map = (onehot * t[..., None]).max(pair_axes)  # (B, Q)
    positive_tc = jnp.where(target_classes > 0, t_map, 0.0)

    loss_bce = sigmoid_bce(s, positive_tc) * target_classes * cfg.pos_weight
    loss_bce = loss_bce + sigmoid_bce(s, target_classes) * (
        1.0 - target_classes
    ) * prob ** cfg.gamma

    presence_loss = jnp.float32(0.0)
    if presence_logits is not None:
        visible = targets.valid & (targets.boxes[..., 2] > 0) & (
            targets.boxes[..., 3] > 0
        )
        keep = (visible.sum(-1, keepdims=True) != 0).astype(jnp.float32)  # (B,1)
        loss_bce = loss_bce * keep
        pl = sigmoid_focal_loss(
            presence_logits.astype(jnp.float32), keep,
            alpha=cfg.presence_alpha, gamma=cfg.presence_gamma,
        )
        presence_loss = pl.mean(-1).sum() / b

    # weak-negatives masking (loss_fns.py:443-457): drop negative supervision
    # for non-exhaustive queries, then average over kept entries
    keep_mask = ~(
        (~targets.is_exhaustive)[:, None] & (target_classes < 0.5)
    )
    loss_bce = loss_bce * keep_mask.astype(jnp.float32)
    loss_ce = loss_bce.sum() / (keep_mask.sum() + 1e-6)

    # binary F1 metric (reference logs torchmetrics f1, loss_fns.py:503-507)
    pred_pos = prob > 0.5
    tp = (pred_pos & (target_classes > 0.5)).sum()
    fp = (pred_pos & (target_classes <= 0.5)).sum()
    fn = (~pred_pos & (target_classes > 0.5)).sum()
    f1 = 2 * tp / jnp.clip(2 * tp + fp + fn, 1)

    return {
        "loss_ce": loss_ce,
        "presence_loss": presence_loss,
        "ce_f1": jax.lax.stop_gradient(f1.astype(jnp.float32)),
    }


def masks_loss(
    pred_masks,          # (B, ...pairs, Hm, Wm) logits, gathered to pair slots
    targets: Targets,
    pair_valid,          # (B, ...pairs)
    num_boxes,
    cfg: LossConfig,
):
    if targets.masks is None:
        z = jnp.float32(0.0)
        return {"loss_mask": z, "loss_dice": z}
    gt = targets.masks
    # Keep GT at its UNEXPANDED shape (B, T, 1, H, W) over the o2m K axis and
    # reduce over the trailing (H, W) axes directly: an explicit broadcast_to
    # + reshape here materialized the K-expanded GT as three live f32
    # [B, T, K, H, W] copies (3 x 432 MB at bs8) across the remat boundary —
    # the allocations that pushed the v5e r3 queue H/I configs out of HBM.
    # Elementwise ops broadcast lazily, so the math below is identical.
    while gt.ndim < pred_masks.ndim:
        gt = jnp.expand_dims(gt, 2)
    if pred_masks.shape[-2:] != gt.shape[-2:]:
        pred_masks = resize_bilinear(pred_masks.astype(jnp.float32), gt.shape[-2:])
    mv = targets.mask_valid
    while mv.ndim < pair_valid.ndim:
        mv = jnp.expand_dims(mv, -1)
    w = (pair_valid & jnp.broadcast_to(mv, pair_valid.shape)).astype(jnp.float32)

    pred = pred_masks.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    hw = (-2, -1)
    fl = sigmoid_focal_loss(pred, gt, cfg.alpha, cfg.gamma)
    loss_mask = (fl.mean(hw) * w).sum() / num_boxes
    inputs = jax.nn.sigmoid(pred)
    numer = 2.0 * (inputs * gt).sum(hw)
    denom = inputs.sum(hw) + gt.sum(hw)  # gt sum broadcasts over K
    dl = 1.0 - (numer + 1.0) / (denom + 1.0)
    loss_dice = (dl * w).sum() / num_boxes
    return {"loss_mask": loss_mask, "loss_dice": loss_dice}


def compute_losses(
    out: Dict[str, Any], targets: Targets, cfg: LossConfig = LossConfig()
) -> Dict[str, jnp.ndarray]:
    """Full training loss over main + aux + o2m outputs.

    ``out`` is the Sam3Image training output dict (leading `layers` axis on
    pred_logits/pred_boxes/..., static matched indices). Returns a dict with
    'core_loss' plus the per-term breakdown (suffix `_aux_i` like the
    reference).
    """
    num_boxes = _num_boxes(targets, cfg)
    layers = out["pred_logits"].shape[0]
    has_o2m = "pred_logits_o2m" in out

    losses: Dict[str, jnp.ndarray] = {}
    core = jnp.float32(0.0)

    for li in range(layers):
        is_main = li == layers - 1
        suffix = "" if is_main else f"_aux_{li}"
        if not is_main and not cfg.compute_aux:
            continue
        idx = out["indices"][li]
        pv = (idx >= 0) & targets.valid
        presence = (
            out["presence_logit_dec"][li]
            if out.get("presence_logit_dec") is not None
            else None
        )
        lb = boxes_loss(
            out["pred_boxes"][li], out["pred_boxes_xyxy"][li],
            targets, idx, pv, num_boxes,
        )
        lc = iabce_loss(
            out["pred_logits"][li], out["pred_boxes_xyxy"][li],
            targets, idx, pv, num_boxes, cfg, presence_logits=presence,
        )
        term = (
            cfg.weight_bbox * lb["loss_bbox"]
            + cfg.weight_giou * lb["loss_giou"]
            + cfg.weight_ce * lc["loss_ce"]
            + cfg.weight_presence * lc["presence_loss"]
        )
        if is_main and "pred_masks_matched" in out:
            lm = masks_loss(out["pred_masks_matched"], targets, pv, num_boxes, cfg)
            term = term + cfg.weight_mask * lm["loss_mask"] + cfg.weight_dice * lm["loss_dice"]
            losses.update({f"{k}{suffix}": v for k, v in lm.items()})
        core = core + term
        losses.update({f"{k}{suffix}": v for k, v in {**lb, **lc}.items()})

        # ---- o2m branch (sam3_loss.py:105-156) ----
        if has_o2m:
            o2m_idx = out["o2m_indices"][li]
            o2m_pv = out["o2m_valid"][li] & targets.valid[..., None]
            lb2 = boxes_loss(
                out["pred_boxes_o2m"][li], out["pred_boxes_xyxy_o2m"][li],
                targets, o2m_idx, o2m_pv, num_boxes,
            )
            lc2 = iabce_loss(
                out["pred_logits_o2m"][li], out["pred_boxes_xyxy_o2m"][li],
                targets, o2m_idx, o2m_pv, num_boxes, cfg, presence_logits=None,
            )
            term2 = (
                cfg.weight_bbox * lb2["loss_bbox"]
                + cfg.weight_giou * lb2["loss_giou"]
                + cfg.weight_ce * lc2["loss_ce"]
            )
            if is_main and "pred_masks_o2m_matched" in out:
                lm2 = masks_loss(
                    out["pred_masks_o2m_matched"], targets, o2m_pv, num_boxes, cfg
                )
                term2 = term2 + cfg.weight_mask * lm2["loss_mask"] + cfg.weight_dice * lm2["loss_dice"]
                losses.update({f"{k}{suffix}_o2m": v for k, v in lm2.items()})
            core = core + cfg.o2m_weight * term2
            losses.update({f"{k}{suffix}_o2m": v for k, v in {**lb2, **lc2}.items()})

    losses["core_loss"] = core
    return losses
