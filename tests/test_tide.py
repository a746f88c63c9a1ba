"""TIDE error-decomposition golden cases (eval/tide.py)."""

import numpy as np
import pytest

from sam3_lora_tpu.eval.tide import tide_errors


def disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(bool)


def gt_of(*masks):
    return [{"mask": m, "iscrowd": 0} for m in masks]


def dt_of(*pairs):
    return [{"mask": m, "score": s} for m, s in pairs]


def test_perfect_predictions():
    m = disk(32, 32, 16, 16, 8)
    out = tide_errors({0: gt_of(m)}, {0: dt_of((m, 0.9))})
    assert out["n_TP"] == 1
    assert out["n_Loc"] == out["n_Dup"] == out["n_Bkg"] == out["n_Miss"] == 0
    assert out["mAP"] == pytest.approx(1.0)


def test_duplicate_detection():
    m = disk(32, 32, 16, 16, 8)
    out = tide_errors({0: gt_of(m)}, {0: dt_of((m, 0.9), (m, 0.8))})
    assert out["n_TP"] == 1 and out["n_Dup"] == 1
    # removing the duplicate restores perfect AP
    assert out["mAP"] + out["dAP_Dup"] == pytest.approx(1.0)


def test_background_detection():
    m = disk(64, 64, 16, 16, 8)
    far = disk(64, 64, 48, 48, 8)
    out = tide_errors({0: gt_of(m)}, {0: dt_of((m, 0.9), (far, 0.8))})
    assert out["n_Bkg"] == 1
    assert out["dAP_Bkg"] >= 0.0


def test_localization_error():
    gt = disk(64, 64, 32, 32, 10)
    shifted = disk(64, 64, 32, 44, 10)   # overlaps partially (0.1 < IoU < 0.5)
    iou = (gt & shifted).sum() / (gt | shifted).sum()
    assert 0.1 < iou < 0.5
    out = tide_errors({0: gt_of(gt)}, {0: dt_of((shifted, 0.9))})
    assert out["n_Loc"] == 1 and out["n_Miss"] == 1
    assert out["n_TP"] == 0


def test_missed_gt():
    a = disk(64, 64, 16, 16, 8)
    b = disk(64, 64, 48, 48, 8)
    out = tide_errors({0: gt_of(a, b)}, {0: dt_of((a, 0.9))})
    assert out["n_Miss"] == 1
    # oracle restore of the miss lifts mAP to 1
    assert out["mAP"] + out["dAP_Miss"] == pytest.approx(1.0)


def test_multi_image_aggregation():
    m = disk(32, 32, 16, 16, 8)
    gts = {0: gt_of(m), 1: gt_of(m)}
    dts = {0: dt_of((m, 0.9)), 1: []}
    out = tide_errors(gts, dts)
    assert out["n_TP"] == 1 and out["n_Miss"] == 1
