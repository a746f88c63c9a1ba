"""Eval tier tests: COCO mAP + cgF1 on constructed cases with known answers."""

import numpy as np
import pytest

from sam3_lora_tpu.eval import evaluate_cgf1, evaluate_coco_map


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


class TestCocoMap:
    def test_perfect_predictions(self):
        m1 = _disk(64, 64, 20, 20, 8)
        m2 = _disk(64, 64, 45, 45, 10)
        gts = {0: [{"mask": m1}, {"mask": m2}]}
        dts = {0: [{"mask": m1, "score": 0.9}, {"mask": m2, "score": 0.8}]}
        res = evaluate_coco_map(gts, dts)
        assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
        assert res["mAP_50"] == pytest.approx(1.0, abs=1e-6)

    def test_no_predictions(self):
        gts = {0: [{"mask": _disk(64, 64, 20, 20, 8)}]}
        res = evaluate_coco_map(gts, {0: []})
        assert res["mAP"] == 0.0

    def test_half_matched(self):
        m1 = _disk(64, 64, 20, 20, 8)
        m2 = _disk(64, 64, 45, 45, 10)
        far = _disk(64, 64, 5, 60, 3)
        gts = {0: [{"mask": m1}, {"mask": m2}]}
        # one perfect (higher score), one totally wrong
        dts = {0: [{"mask": m1, "score": 0.9}, {"mask": far, "score": 0.3}]}
        res = evaluate_coco_map(gts, dts)
        # AP: precision 1.0 up to recall 0.5, 0 beyond -> ~0.5 at every thr
        assert 0.4 < res["mAP"] <= 0.51

    def test_localization_quality_grading(self):
        """A prediction with IoU ~0.6 counts at thr .5 but not at .75."""
        gt = np.zeros((64, 64), bool)
        gt[10:30, 10:30] = True
        pred = np.zeros((64, 64), bool)
        pred[10:30, 10:26] = True  # IoU = 16/20 = 0.8 -> counts at .75 not .85
        gts = {0: [{"mask": gt}]}
        dts = {0: [{"mask": pred, "score": 0.9}]}
        res = evaluate_coco_map(gts, dts)
        assert res["mAP_50"] == pytest.approx(1.0, abs=1e-6)
        assert res["mAP_75"] == pytest.approx(1.0, abs=1e-6)
        assert res["mAP"] < 1.0  # fails the >=0.85 thresholds

    def test_bbox_mode(self):
        gts = {0: [{"box": [10, 10, 20, 20]}]}
        dts = {0: [{"box": [10, 10, 20, 20], "score": 0.9}]}
        res = evaluate_coco_map(gts, dts, iou_type="bbox")
        assert res["mAP"] == pytest.approx(1.0, abs=1e-6)

    def test_score_ordering_matters(self):
        """Low-scoring FP before TP hurts less than high-scoring FP."""
        m1 = _disk(64, 64, 20, 20, 8)
        far = _disk(64, 64, 5, 60, 3)
        gts = {0: [{"mask": m1}]}
        res_fp_low = evaluate_coco_map(
            gts, {0: [{"mask": m1, "score": 0.9}, {"mask": far, "score": 0.1}]}
        )
        res_fp_high = evaluate_coco_map(
            gts, {0: [{"mask": m1, "score": 0.1}, {"mask": far, "score": 0.9}]}
        )
        assert res_fp_low["mAP"] > res_fp_high["mAP"]


class TestCgF1:
    def test_perfect(self):
        m1 = _disk(64, 64, 20, 20, 8)
        gts = {0: [{"mask": m1}], 1: []}
        dts = {0: [{"mask": m1, "score": 0.9}], 1: []}
        res = evaluate_cgf1(gts, dts)
        assert res["cgF1_50"] == pytest.approx(1.0, abs=1e-3)
        assert res["IL_MCC"] == pytest.approx(1.0, abs=1e-3)

    def test_score_threshold_filters(self):
        """Dets under the 0.5 score threshold are invisible to cgF1."""
        m1 = _disk(64, 64, 20, 20, 8)
        gts = {0: [{"mask": m1}]}
        dts = {0: [{"mask": m1, "score": 0.4}]}
        res = evaluate_cgf1(gts, dts)
        assert res["cgF1_50"] == pytest.approx(0.0, abs=1e-3)

    def test_false_positive_on_empty_image_kills_mcc(self):
        m1 = _disk(64, 64, 20, 20, 8)
        gts = {0: [{"mask": m1}], 1: []}
        dts = {0: [{"mask": m1, "score": 0.9}], 1: [{"mask": m1, "score": 0.9}]}
        res = evaluate_cgf1(gts, dts)
        # image-level FP with no TN -> MCC collapses to 0
        assert res["IL_MCC"] == pytest.approx(0.0, abs=1e-3)
        assert res["cgF1_50"] == pytest.approx(0.0, abs=1e-3)

    def test_assignment_is_optimal(self):
        """Two dets, two gts, crossed IoUs: optimal assignment gets both."""
        a = np.zeros((32, 32), bool); a[0:10, 0:10] = True
        b = np.zeros((32, 32), bool); b[20:30, 20:30] = True
        ab = a | b
        gts = {0: [{"mask": a}, {"mask": b}]}
        # det1 overlaps both (matches a better via LSAP), det2 = b exactly
        dts = {0: [{"mask": ab, "score": 0.9}, {"mask": b, "score": 0.8}]}
        res = evaluate_cgf1(gts, dts)
        assert res["recall"] > 0.0
