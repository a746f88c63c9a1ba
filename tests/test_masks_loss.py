"""masks_loss regression: lazy-broadcast formulation == materialized one.

r4 rewrote masks_loss (train/losses.py) to keep GT masks at their unexpanded
(B, T, 1, H, W) shape over the o2m K axis and reduce over (H, W) directly:
the previous broadcast_to + reshape forced XLA to materialize the K-expanded
f32 GT three times (3 x 432 MB at bs8 on v5e — the r3 queue H/I OOM margin).
This pins the new math to the literal old formulation.

Reference semantics: sam3/train/loss/loss_fns.py:568-709 (focal+dice over
matched pair masks, mean over pixels, sum / num_boxes).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.models.sam3_image import Targets
from sam3_lora_tpu.ops.focal import sigmoid_focal_loss
from sam3_lora_tpu.train.losses import LossConfig, masks_loss


def _targets(gt, mvalid, valid, b, t):
    return Targets(
        **{
            **{f.name: None for f in dataclasses.fields(Targets)},
            "masks": gt,
            "mask_valid": mvalid,
            "valid": valid,
            "boxes": jnp.zeros((b, t, 4)),
            "is_exhaustive": jnp.ones((b,), bool),
        }
    )


def _old_masks_loss(pred, gt, pv, mvalid, num_boxes, cfg):
    """The pre-r4 formulation, verbatim (materialized broadcast + reshape)."""
    g = gt
    while g.ndim < pred.ndim:
        g = jnp.expand_dims(g, 2)
    g = jnp.broadcast_to(g, pred.shape[:-2] + g.shape[-2:])
    mv = mvalid
    while mv.ndim < pv.ndim:
        mv = jnp.expand_dims(mv, -1)
    w = (pv & jnp.broadcast_to(mv, pv.shape)).astype(jnp.float32)
    fp = pred.reshape(pred.shape[:-2] + (-1,)).astype(jnp.float32)
    fg = g.reshape(g.shape[:-2] + (-1,)).astype(jnp.float32)
    fl = sigmoid_focal_loss(fp, fg, cfg.alpha, cfg.gamma)
    loss_mask = (fl.mean(-1) * w).sum() / num_boxes
    ip = jax.nn.sigmoid(fp)
    numer = 2.0 * (ip * fg).sum(-1)
    denom = ip.sum(-1) + fg.sum(-1)
    loss_dice = ((1.0 - (numer + 1.0) / (denom + 1.0)) * w).sum() / num_boxes
    return loss_mask, loss_dice


@pytest.mark.parametrize("with_k", [True, False])
def test_masks_loss_matches_materialized_broadcast(with_k):
    rng = np.random.RandomState(0)
    B, T, K, H, W = 2, 5, 3, 17, 17
    shape = (B, T, K, H, W) if with_k else (B, T, H, W)
    pred = jnp.asarray(rng.randn(*shape).astype(np.float32))
    gt = jnp.asarray((rng.rand(B, T, H, W) > 0.5).astype(np.float32))
    pv = jnp.asarray(rng.rand(*shape[:-2]) > 0.3)
    mvalid = jnp.asarray(rng.rand(B, T) > 0.2)
    valid = jnp.asarray(rng.rand(B, T) > 0.1)
    cfg = LossConfig()
    targets = _targets(gt, mvalid, valid, B, T)

    new = masks_loss(pred, targets, pv, 7.0, cfg)
    old_mask, old_dice = _old_masks_loss(pred, gt, pv, mvalid, 7.0, cfg)

    np.testing.assert_allclose(new["loss_mask"], old_mask, rtol=1e-6)
    np.testing.assert_allclose(new["loss_dice"], old_dice, rtol=1e-6)


def test_masks_loss_gradient_matches():
    """Backward must agree too — the OOM copies were backward-side temps."""
    rng = np.random.RandomState(1)
    B, T, K, H, W = 1, 3, 2, 9, 9
    pred = jnp.asarray(rng.randn(B, T, K, H, W).astype(np.float32))
    gt = jnp.asarray((rng.rand(B, T, H, W) > 0.5).astype(np.float32))
    pv = jnp.ones((B, T, K), bool)
    mvalid = jnp.ones((B, T), bool)
    valid = jnp.ones((B, T), bool)
    cfg = LossConfig()
    targets = _targets(gt, mvalid, valid, B, T)

    def new_total(p):
        d = masks_loss(p, targets, pv, 5.0, cfg)
        return d["loss_mask"] + d["loss_dice"]

    def old_total(p):
        lm, ld = _old_masks_loss(p, gt, pv, mvalid, 5.0, cfg)
        return lm + ld

    g_new = jax.grad(new_total)(pred)
    g_old = jax.grad(old_total)(pred)
    np.testing.assert_allclose(g_new, g_old, rtol=1e-5, atol=1e-8)
