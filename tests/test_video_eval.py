"""Golden-case tests for the tracking metrics (eval/video_eval.py).

Cases are constructed so the exact metric values follow from the published
definitions (HOTA IJCV 2021, CLEAR-MOT 2008, YTVIS track mAP)."""

import numpy as np
import pytest

from sam3_lora_tpu.eval.video_eval import (
    evaluate_clear_mot,
    evaluate_hota,
    evaluate_track_map,
    track_iou,
)


def box_track(frames, x0=0.0, step=5.0):
    """A track of 10x10 boxes translating right by `step` per frame."""
    return {f: np.array([x0 + step * f, 0.0, x0 + step * f + 10.0, 10.0])
            for f in frames}


def mask_track(frames, size=32, r=5, step=2):
    out = {}
    for f in frames:
        yy, xx = np.mgrid[:size, :size]
        cx = 8 + step * f
        out[f] = (yy - 16) ** 2 + (xx - cx) ** 2 <= r * r
    return out


def test_track_iou_identical():
    t = mask_track(range(5))
    assert track_iou(t, t) == pytest.approx(1.0)


def test_track_iou_disjoint_frames():
    a = mask_track(range(0, 4))
    b = mask_track(range(4, 8))
    assert track_iou(a, b) == pytest.approx(0.0)


def test_track_iou_half_overlap_boxes():
    a = box_track(range(4))
    b = {f: v.copy() for f, v in a.items() if f < 2}  # half the frames
    # per-frame IoU 1 on shared frames; missing frames count full union
    assert track_iou(a, b) == pytest.approx(0.5)


def test_hota_perfect():
    gt = {1: mask_track(range(6)), 2: mask_track(range(6), step=-2)}
    out = evaluate_hota(gt, gt)
    assert out["HOTA"] == pytest.approx(1.0)
    assert out["DetA"] == pytest.approx(1.0)
    assert out["AssA"] == pytest.approx(1.0)
    assert out["LocA"] == pytest.approx(1.0)


def test_hota_missing_half_frames():
    gt = {1: box_track(range(8))}
    pred = {1: {f: v for f, v in box_track(range(8)).items() if f % 2 == 0}}
    out = evaluate_hota(gt, pred)
    # DetA = TP/(TP+FN+FP) = 4/8; association perfect on matched frames
    assert out["DetA"] == pytest.approx(0.5)
    assert out["HOTA"] == pytest.approx(np.sqrt(0.5 * out["AssA"]), rel=1e-6)


def test_hota_id_swap_hurts_assa_not_deta():
    # two parallel gt tracks; predictions swap identities halfway
    g1 = {f: np.array([0.0, 0.0, 10.0, 10.0]) for f in range(8)}
    g2 = {f: np.array([100.0, 0.0, 110.0, 10.0]) for f in range(8)}
    p1 = {f: (g1 if f < 4 else g2)[f] for f in range(8)}
    p2 = {f: (g2 if f < 4 else g1)[f] for f in range(8)}
    out = evaluate_hota({1: g1, 2: g2}, {1: p1, 2: p2})
    assert out["DetA"] == pytest.approx(1.0)
    # A = 4 / (8 + 8 - 4) = 1/3 for every matched pair
    assert out["AssA"] == pytest.approx(1.0 / 3.0, rel=1e-6)
    assert out["HOTA"] == pytest.approx(np.sqrt(1.0 / 3.0), rel=1e-6)


def test_clear_mot_perfect():
    gt = {1: box_track(range(5)), 2: box_track(range(5), x0=50)}
    out = evaluate_clear_mot(gt, gt)
    assert out["MOTA"] == pytest.approx(1.0)
    assert out["MOTP"] == pytest.approx(1.0)
    assert out["IDSW"] == 0


def test_clear_mot_id_switch():
    g1 = {f: np.array([0.0, 0.0, 10.0, 10.0]) for f in range(8)}
    g2 = {f: np.array([100.0, 0.0, 110.0, 10.0]) for f in range(8)}
    p1 = {f: (g1 if f < 4 else g2)[f] for f in range(8)}
    p2 = {f: (g2 if f < 4 else g1)[f] for f in range(8)}
    out = evaluate_clear_mot({1: g1, 2: g2}, {1: p1, 2: p2})
    # 2 id switches (both gts swap at frame 4), 16 gt dets
    assert out["IDSW"] == 2
    assert out["MOTA"] == pytest.approx(1.0 - 2 / 16)


def test_clear_mot_false_positives_and_misses():
    gt = {1: box_track(range(4))}
    pred = {
        1: {f: v for f, v in box_track(range(4)).items() if f < 2},  # 2 misses
        2: box_track(range(4), x0=500),  # 4 false positives
    }
    out = evaluate_clear_mot(gt, pred)
    assert out["FN"] == 2 and out["FP"] == 4
    assert out["MOTA"] == pytest.approx(1.0 - (2 + 4) / 4)


def test_track_map_perfect():
    gt = {1: mask_track(range(5)), 2: mask_track(range(5), step=-1)}
    scores = {1: 0.9, 2: 0.8}
    out = evaluate_track_map(gt, gt, scores)
    assert out["track_mAP"] == pytest.approx(1.0)


def test_track_map_spurious_low_score_pred_keeps_ap50():
    gt = {1: box_track(range(5))}
    preds = {1: box_track(range(5)), 99: box_track(range(5), x0=900)}
    out = evaluate_track_map(gt, preds, {1: 0.9, 99: 0.1})
    # correct track ranked first -> precision at full recall stays 1
    assert out["track_mAP_50"] == pytest.approx(1.0)


def test_track_map_half_temporal_overlap():
    gt = {1: box_track(range(4))}
    preds = {1: {f: v for f, v in box_track(range(4)).items() if f < 2}}
    out = evaluate_track_map(gt, preds, {1: 0.9})
    # track IoU = 0.5 -> matches at thr .5 only
    assert out["track_mAP_50"] == pytest.approx(1.0)
    assert out["track_mAP_75"] == pytest.approx(0.0)
