"""Tests for the video-tier losses (semantic seg, association CE, PointRend
point-sampled masks) — golden cases derived from the loss definitions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam3_lora_tpu.train.video_losses import (
    det2trk_assoc_loss,
    get_uncertain_point_coords_with_randomness,
    point_sample,
    point_sampled_mask_loss,
    semantic_seg_loss,
    tracking_by_detection_assoc_loss,
)


def disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


class TestSemanticSeg:
    def test_perfect_prediction_near_zero_loss(self):
        m = disk(32, 32, 16, 16, 8)
        inst = jnp.asarray(m[None, None])                  # (1, 1, H, W)
        valid = jnp.ones((1, 1), bool)
        logits = jnp.asarray((m * 2 - 1) * 20.0)[None, None]
        out = semantic_seg_loss(logits, inst, valid)
        assert float(out["loss_semantic_seg"]) < 1e-3
        assert float(out["loss_semantic_dice"]) < 0.01
        assert float(out["miou_semantic_seg"]) > 0.99

    def test_instance_union(self):
        a = disk(32, 32, 8, 8, 5)
        b = disk(32, 32, 24, 24, 5)
        inst = jnp.asarray(np.stack([a, b])[None])         # (1, 2, H, W)
        valid = jnp.ones((1, 2), bool)
        union = np.maximum(a, b)
        logits = jnp.asarray((union * 2 - 1) * 20.0)[None, None]
        out = semantic_seg_loss(logits, inst, valid)
        assert float(out["miou_semantic_seg"]) > 0.99

    def test_presence_gating(self):
        """Empty frames contribute only the presence loss."""
        m = disk(16, 16, 8, 8, 4)
        inst = jnp.asarray(np.stack([m, np.zeros_like(m)])[:, None])
        valid = jnp.asarray([[True], [False]])
        logits = jnp.zeros((2, 1, 16, 16))
        presence = jnp.asarray([5.0, -5.0])                # correct calls
        out = semantic_seg_loss(logits, inst, valid, presence_logit=presence)
        assert float(out["presence_acc"]) == 1.0
        assert float(out["loss_semantic_presence"]) < 0.01
        # gated seg loss averages over the ONE present frame
        ref = semantic_seg_loss(logits[:1], inst[:1], valid[:1])
        assert float(out["loss_semantic_seg"]) == pytest.approx(
            float(ref["loss_semantic_seg"]), rel=1e-4
        )


class TestAssocLosses:
    def test_det2trk_labels(self):
        # det0 matches trk1's object (id 7) -> label 1; det1 new object (id 9)
        # -> label Q_trk=2; det2 unmatched -> ignored
        logits = jnp.zeros((1, 3, 4))                      # Q_det=3, Q_trk=2
        det_ids = jnp.asarray([[7, 9, -1]])
        trk_ids = jnp.asarray([[-1, 7]])
        out = det2trk_assoc_loss(logits, det_ids, trk_ids, jnp.float32(1.0))
        # uniform logits -> CE = log(4) per labeled det, 2 labeled, B=1
        expect = 2 * np.log(4.0)
        assert float(out["loss_det2trk_assoc"]) == pytest.approx(expect, rel=1e-5)

    def test_det2trk_skips_frames_without_tracks(self):
        logits = jnp.zeros((1, 2, 4))
        det_ids = jnp.asarray([[3, -1]])
        trk_ids = jnp.asarray([[-1, -1]])                  # no valid tracks
        out = det2trk_assoc_loss(logits, det_ids, trk_ids, jnp.float32(1.0))
        assert float(out["loss_det2trk_assoc"]) == 0.0

    def test_det2trk_perfect_logits_low_loss(self):
        logits = np.full((1, 1, 4), -20.0, np.float32)
        logits[0, 0, 1] = 20.0                             # points at trk 1
        out = det2trk_assoc_loss(
            jnp.asarray(logits), jnp.asarray([[7]]), jnp.asarray([[-1, 7]]),
            jnp.float32(1.0),
        )
        assert float(out["loss_det2trk_assoc"]) < 1e-4

    def test_tracking_by_detection_symmetric(self):
        # det0 <-> trk0 same object; trk1 matched to GT but no det -> occluded
        logits = jnp.zeros((1, 3, 3))                      # (Q_det+1, Q_trk+1)
        det_ids = jnp.asarray([[4, -1]])
        trk_ids = jnp.asarray([[4, 6]])
        out = tracking_by_detection_assoc_loss(
            logits, det_ids, trk_ids, jnp.float32(1.0)
        )
        # det side: 1 label over 3 columns; trk side: 2 labels over 3 columns
        assert float(out["loss_det2trk_assoc"]) == pytest.approx(np.log(3.0), rel=1e-5)
        assert float(out["loss_trk2det_assoc"]) == pytest.approx(2 * np.log(3.0), rel=1e-5)


class TestPointSampling:
    def test_point_sample_bilinear(self):
        img = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
        # center of pixel (1,2): x=(2+0.5)/4, y=(1+0.5)/4
        coords = jnp.asarray([[[2.5 / 4, 1.5 / 4]]])
        val = point_sample(img, coords)
        assert float(val[0, 0, 0]) == pytest.approx(6.0, abs=1e-5)

    def test_uncertain_points_concentrate_at_boundary(self):
        m = disk(64, 64, 32, 32, 16)
        logits = jnp.asarray((m * 2 - 1) * 10.0)[None, None]
        pts = get_uncertain_point_coords_with_randomness(
            logits, jax.random.PRNGKey(0), num_points=64,
            oversample_ratio=4, importance_sample_ratio=0.75,
        )
        assert pts.shape == (1, 64, 2)
        # importance points (first 48) should sit near the |logit|=0 ring
        vals = np.abs(np.asarray(point_sample(logits, pts))[0, 0, :48])
        rand_vals = np.abs(
            np.asarray(
                point_sample(
                    logits,
                    jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 2)),
                )
            )[0, 0]
        )
        assert vals.mean() < rand_vals.mean()

    def test_point_sampled_mask_loss_perfect(self):
        m = disk(32, 32, 16, 16, 10)
        pred = jnp.asarray((m * 2 - 1) * 20.0)[None]
        gt = jnp.asarray(m)[None]
        out = point_sampled_mask_loss(
            pred, gt, jnp.float32(1.0), jax.random.PRNGKey(0), num_points=256
        )
        assert float(out["loss_mask"]) < 0.01
        assert float(out["loss_dice"]) < 0.05
        bad = point_sampled_mask_loss(
            -pred, gt, jnp.float32(1.0), jax.random.PRNGKey(0), num_points=256
        )
        assert float(bad["loss_mask"]) > float(out["loss_mask"])
