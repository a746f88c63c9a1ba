"""Hand-computed fixtures for CLEAR-MOT and track-mAP (VERDICT r3 weak #6).

No oracle exists for these two metrics (the reference's vendored trackeval
ships only HOTA+Count; TETA ships only its own metric), so these pin the
implementations to tiny scenarios where every quantity is worked out by hand
below. They would catch a matching, persistence, id-switch or
precision-interpolation regression.

All detections are xyxy boxes so the IoUs are exact rational numbers.
"""

import numpy as np

from sam3_lora_tpu.eval.video_eval import (
    evaluate_clear_mot,
    evaluate_track_map,
    evaluate_teta,
)

A = [0.0, 0.0, 10.0, 10.0]      # area 100
A_SHIFT = [0.0, 2.0, 10.0, 12.0]  # vs A: inter 10x8=80, union 120 -> IoU 2/3
B = [20.0, 20.0, 30.0, 30.0]    # area 100
B_SHRUNK = [20.0, 20.0, 30.0, 28.0]  # vs B: inter 80, union 100 -> IoU 4/5
FAR = [50.0, 50.0, 60.0, 60.0]  # overlaps nothing


def test_clear_mot_hand_computed():
    """Scenario (threshold 0.5):

    g1 frames 0-5 at A. g2 frames 0-1 at B, never predicted.
    p1 frames 0-2 at A (IoU 1.0 with g1).
    p2 frames 4-5 at A_SHIFT (IoU 2/3 with g1 -> matched, ID SWITCH at f4).
    p3 frame 0 at FAR (pure false positive).

    Frame ledger (n_gt = 6 + 2 = 8):
      f0: g1-p1 match (IoU 1), g2 FN, p3 FP        -> FN 1, FP 1
      f1: g1-p1 match (IoU 1), g2 FN               -> FN 2
      f2: g1-p1 match (IoU 1)
      f3: nothing predicted, g1 FN                 -> FN 3
      f4: g1-p2 match (IoU 2/3), prev was p1       -> IDSW 1
      f5: g1-p2 match (IoU 2/3)
    MOTA = 1 - (3 + 1 + 1)/8 = 0.375
    MOTP = (1+1+1+2/3+2/3)/5 = 13/15
    """
    gt = {
        "g1": {f: A for f in range(6)},
        "g2": {0: B, 1: B},
    }
    pred = {
        "p1": {0: A, 1: A, 2: A},
        "p2": {4: A_SHIFT, 5: A_SHIFT},
        "p3": {0: FAR},
    }
    r = evaluate_clear_mot(gt, pred, iou_threshold=0.5)
    assert r["FN"] == 3
    assert r["FP"] == 1
    assert r["IDSW"] == 1
    np.testing.assert_allclose(r["MOTA"], 0.375, atol=1e-12)
    np.testing.assert_allclose(r["MOTP"], 13.0 / 15.0, atol=1e-12)


def test_track_map_hand_computed():
    """Scenario:

    GT: g1 frames 0-3 at A; g2 frames 0-1 at B.
    Pred (score order p1 > p2 > p3):
      p1 (0.9) frames 0-3 at A       -> track IoU 1.0 with g1
      p2 (0.8) frames 0-1 at B_SHRUNK -> per-frame IoU 4/5; track IoU
                                         (80+80)/(100+100) = 0.8 with g2
      p3 (0.7) frames 0-1 at FAR      -> IoU 0 with everything

    Thresholds 0.5..0.8 (7 of 10): both TPs match, p3 FP.
      tp=[1,1,0] -> recall [.5,1,1], precision envelope [1,1,2/3]
      -> all 101 recall points read precision 1 -> AP = 1.
    Thresholds 0.85..0.95 (3 of 10): only p1 matches.
      tp=[1,0,0] -> recall [.5,.5,.5], envelope [1,.5,1/3]
      -> the 51 points r<=0.5 read precision 1, the rest fall off the
         recall curve -> AP = 51/101.
    mAP = (7*1 + 3*51/101)/10 = 86/101.  mAP@50 = mAP@75 = 1.
    """
    gt = {"g1": {f: A for f in range(4)}, "g2": {0: B, 1: B}}
    pred = {
        "p1": {f: A for f in range(4)},
        "p2": {0: B_SHRUNK, 1: B_SHRUNK},
        "p3": {0: FAR, 1: FAR},
    }
    scores = {"p1": 0.9, "p2": 0.8, "p3": 0.7}
    r = evaluate_track_map(gt, pred, scores)
    np.testing.assert_allclose(r["track_mAP"], 86.0 / 101.0, atol=1e-12)
    np.testing.assert_allclose(r["track_mAP_50"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["track_mAP_75"], 1.0, atol=1e-12)


def test_teta_hand_computed_perfect_tracking():
    """Perfect single-track case: one GT, one prediction, identical boxes
    over 4 frames. Every alpha matches (sim=1), there are no localization
    FPs or FNs, association is a single always-matched pair:
    LocA = AssocA = ClsA = 1 at every alpha -> TETA = 1."""
    gt = {"g": {f: A for f in range(4)}}
    pred = {"p": {f: A for f in range(4)}}
    r = evaluate_teta(gt, pred)
    np.testing.assert_allclose(r["TETA"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["LocA"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["AssocA"], 1.0, atol=1e-12)
    np.testing.assert_allclose(r["ClsA"], 1.0, atol=1e-12)
