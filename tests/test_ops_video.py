"""Connected components / EDT / det-trk association vs host oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam3_lora_tpu.ops.cc import (
    component_sizes,
    connected_components,
    edt,
    sample_point_from_error_region,
)
from sam3_lora_tpu.ops.association import associate_det_trk


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


class TestConnectedComponents:
    def test_matches_scipy(self):
        from scipy import ndimage

        rng = np.random.RandomState(0)
        for trial in range(5):
            mask = rng.rand(48, 48) > 0.6
            ours = np.asarray(connected_components(jnp.asarray(mask)))
            ref, n_ref = ndimage.label(mask, structure=np.ones((3, 3)))
            # same partition: bijection between label sets
            assert (ours >= 0).sum() == (ref > 0).sum()
            pairs = set(zip(ours[mask].tolist(), ref[mask].tolist()))
            assert len(pairs) == n_ref, "component partition differs"

    def test_snake(self):
        """A long winding path must collapse to ONE component (pointer
        jumping handles diameter >> sweeps)."""
        mask = np.zeros((40, 40), bool)
        for i in range(0, 40, 2):
            mask[i, :] = True
            if (i // 2) % 2 == 0:
                mask[i + 1, -1] = True
            else:
                mask[i + 1, 0] = True
        ours = np.asarray(connected_components(jnp.asarray(mask)))
        assert len(set(ours[mask].tolist())) == 1

    def test_sizes(self):
        mask = np.zeros((32, 32), bool)
        mask[2:6, 2:6] = True      # 16 px
        mask[20:25, 20:26] = True  # 30 px
        labels = connected_components(jnp.asarray(mask))
        sizes = np.asarray(component_sizes(labels))
        got = sorted(s for s in sizes.tolist() if s > 0)
        assert got == [16, 30]


class TestEDT:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(1)
        mask = rng.rand(24, 24) > 0.3
        d = np.asarray(edt(jnp.asarray(mask), chunk=16))
        ys, xs = np.where(~mask)
        for i in range(24):
            for j in range(24):
                if not mask[i, j]:
                    assert d[i, j] == 0
                else:
                    ref = ((ys - i) ** 2 + (xs - j) ** 2).min()
                    assert abs(d[i, j] - ref) < 1e-3, (i, j, d[i, j], ref)

    def test_point_sampling(self):
        gt = _blob(32, 32, 16, 16, 10)
        pred = _blob(32, 32, 16, 16, 5)  # under-segmentation -> FN ring
        pt, positive = sample_point_from_error_region(
            jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32),
            jax.random.PRNGKey(0),
        )
        y, x = np.asarray(pt)
        assert bool(positive)          # missed foreground -> positive click
        assert gt[y, x] and not pred[y, x]


class TestAssociation:
    def test_matching_rules(self):
        h = w = 32
        d0 = _blob(h, w, 8, 8, 5)      # overlaps track 0
        d1 = _blob(h, w, 24, 24, 5)    # brand new
        t0 = _blob(h, w, 8, 9, 5)      # near-duplicate of d0
        t1 = _blob(h, w, 8, 28, 4)     # lost track
        det = jnp.asarray(np.stack([d0, d1]).astype(np.float32))
        trk = jnp.asarray(np.stack([t0, t1]).astype(np.float32))
        out = associate_det_trk(
            det, trk, det_scores=jnp.asarray([0.9, 0.8]),
            iou_threshold=0.5, iou_threshold_trk=0.5,
        )
        assert np.asarray(out.new_det).tolist() == [False, True]
        assert np.asarray(out.unmatched_trk).tolist() == [False, True]
        assert np.asarray(out.det_to_trk)[0, 0]
        assert float(out.matched_det_score[0]) == pytest.approx(0.9)

    def test_validity_masks(self):
        h = w = 16
        d = jnp.asarray(np.stack([_blob(h, w, 8, 8, 4)] * 3).astype(np.float32))
        t = jnp.asarray(np.zeros((2, h, w), np.float32))
        out = associate_det_trk(
            d, t,
            det_valid=jnp.asarray([True, True, False]),
            trk_valid=jnp.asarray([False, False]),
        )
        # no valid tracks: both valid detections are new, invalid one is not
        assert np.asarray(out.new_det).tolist() == [True, True, False]
        assert np.asarray(out.unmatched_trk).tolist() == [False, False]
