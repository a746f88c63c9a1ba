import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from sam3_lora_tpu.train.matcher import (
    hungarian,
    hungarian_match,
    matching_cost,
    one_to_many_match,
)

rng = np.random.RandomState(42)


class TestHungarian:
    def test_optimal_cost_vs_scipy_random(self):
        for trial in range(20):
            t = rng.randint(1, 12)
            q = rng.randint(t, 40)
            c = rng.randn(t, q).astype(np.float32) * rng.uniform(0.1, 10)
            got = np.array(hungarian(jnp.array(c[None]))[0])
            r, col = linear_sum_assignment(c)
            want_cost = c[r, col].sum()
            got_cost = c[np.arange(t), got].sum()
            assert len(set(got.tolist())) == t, "assignment must be injective"
            np.testing.assert_allclose(got_cost, want_cost, rtol=1e-5)

    def test_degenerate_ties(self):
        c = np.zeros((4, 6), np.float32)
        got = np.array(hungarian(jnp.array(c[None]))[0])
        assert len(set(got.tolist())) == 4

    def test_invalid_rows(self):
        c = rng.randn(5, 9).astype(np.float32)
        valid = np.array([True, True, False, True, False])
        got = np.array(hungarian(jnp.array(c[None]), jnp.array(valid[None]))[0])
        assert np.all(got[~valid] == -1)
        # valid rows must achieve the optimum of the restricted problem
        r, col = linear_sum_assignment(c[valid])
        want = c[valid][r, col].sum()
        got_cost = c[valid, got[valid]].sum()
        np.testing.assert_allclose(got_cost, want, rtol=1e-5)
        assert len(set(got[valid].tolist())) == valid.sum()

    def test_batched(self):
        b, t, q = 7, 6, 20
        c = rng.randn(b, t, q).astype(np.float32)
        got = np.array(hungarian(jnp.array(c)))
        for i in range(b):
            r, col = linear_sum_assignment(c[i])
            np.testing.assert_allclose(
                c[i, np.arange(t), got[i]].sum(), c[i][r, col].sum(), rtol=1e-5
            )

    def test_jit_and_grad_safety(self):
        c = jnp.array(rng.randn(2, 4, 10).astype(np.float32))
        f = jax.jit(hungarian)
        out = f(c)
        assert out.shape == (2, 4)


class TestMatchingCost:
    def test_focal_cost_formula(self):
        """Check against a direct port of the reference formula."""
        q, t = 8, 3
        logits = rng.randn(1, q, 1).astype(np.float32)
        pboxes = np.concatenate(
            [0.3 + 0.4 * rng.rand(1, q, 2), 0.05 + 0.2 * rng.rand(1, q, 2)], -1
        ).astype(np.float32)
        tboxes = np.concatenate(
            [0.3 + 0.4 * rng.rand(1, t, 2), 0.05 + 0.2 * rng.rand(1, t, 2)], -1
        ).astype(np.float32)
        got = np.array(
            matching_cost(jnp.array(logits), jnp.array(pboxes), jnp.array(tboxes))
        )[0]
        # reference math (matcher.py:570-606)
        import scipy.special as sp

        s = logits[0, :, 0]
        prob = 1 / (1 + np.exp(-s))
        logp = np.log(prob)
        log1mp = np.log(1 - prob)
        alpha, gamma = 0.25, 2.0
        cclass = -alpha * (1 - prob) ** gamma * logp + (1 - alpha) * prob ** gamma * log1mp

        def to_xyxy(b):
            cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
            return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

        def giou(a, bb):
            a = to_xyxy(a)[:, None]
            bb = to_xyxy(bb)[None, :]
            lt = np.maximum(a[..., :2], bb[..., :2])
            rb = np.minimum(a[..., 2:], bb[..., 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[..., 0] * wh[..., 1]
            area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
            area_b = (bb[..., 2] - bb[..., 0]) * (bb[..., 3] - bb[..., 1])
            union = area_a + area_b - inter
            iou = inter / union
            ltc = np.minimum(a[..., :2], bb[..., :2])
            rbc = np.maximum(a[..., 2:], bb[..., 2:])
            whc = np.clip(rbc - ltc, 0, None)
            areac = whc[..., 0] * whc[..., 1]
            return iou - (areac - union) / areac

        cbbox = np.abs(pboxes[0][:, None] - tboxes[0][None]).sum(-1)
        cgiou = -giou(pboxes[0], tboxes[0])
        want = (5.0 * cbbox + 2.0 * cclass[:, None] + 2.0 * cgiou).T
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestO2M:
    def test_topk_threshold(self):
        b, q, t = 1, 20, 3
        logits = jnp.array(rng.randn(b, q, 1).astype(np.float32)) * 3
        boxes = jnp.array(
            np.concatenate(
                [0.3 + 0.4 * rng.rand(b, q, 2), 0.05 + 0.2 * rng.rand(b, q, 2)], -1
            ).astype(np.float32)
        )
        tboxes = boxes[:, :t]  # perfect-overlap targets
        valid = jnp.ones((b, t), bool)
        idx, v = one_to_many_match(logits, boxes, tboxes, valid, topk=4)
        assert idx.shape == (b, t, 4)
        # the identical box must always be among the matches (iou=1 dominates)
        for j in range(t):
            assert j in np.array(idx[0, j]).tolist()

    def test_invalid_targets_unmatched(self):
        b, q, t = 1, 10, 4
        logits = jnp.zeros((b, q, 1))
        boxes = jnp.tile(jnp.array([0.5, 0.5, 0.2, 0.2]), (b, q, 1))
        tboxes = jnp.tile(jnp.array([0.5, 0.5, 0.2, 0.2]), (b, t, 1))
        valid = jnp.array([[True, False, True, False]])
        _, v = one_to_many_match(logits, boxes, tboxes, valid)
        assert not np.array(v[0, 1]).any()
        assert not np.array(v[0, 3]).any()
