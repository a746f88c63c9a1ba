"""Cross-validate the SA-Co veval plumbing (eval/saco_veval.py) against the
REFERENCE's own file-level evaluators running over the pycocotools shim:

* phrase AP     — sam3/eval/saco_veval_evaluators.py::VideoPhraseApEvaluator
* video mAP     — ::YTVISPredFileEvaluator
* video cgF1    — ::VideoCGF1Evaluator (incl. IL_MCC + per-video-NP rows)
* phrase-HOTA COMBINED_SEQ pooling — vendored trackeval HOTA.combine_sequences

The reference module imports its vendored TETA/trackeval toolkits whose
``datasets`` submodules are NOT vendored (the packages cannot import as
shipped); those two submodules are stubbed in sys.modules so the pure
evaluator code under test here runs unmodified.

Workloads are randomized: multi-video, multi-category masklets with absent
frames (None), perturbed detections, false tracks, videos with no GT, and
negative video-NP pairs.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pycocotools_shim import encode, install

install()

from ref_oracle import HAS_REF, import_ref  # noqa: E402

from sam3_lora_tpu.eval.saco_veval import (  # noqa: E402
    SacoVevalWriter,
    combine_hota_sequences,
    dedup_video_predictions,
    evaluate_phrase_ap,
    evaluate_phrase_hota,
    evaluate_saco_veval,
    evaluate_video_cgf1,
    evaluate_video_map,
    evaluate_video_teta,
    prepare_video_predictions,
    remap_video_category_pairs,
)
from sam3_lora_tpu.eval.video_eval import evaluate_hota  # noqa: E402

H = W = 64
T = 5


def _import_saco_oracle():
    """Import the reference saco_veval_evaluators with the two missing
    vendored ``datasets`` submodules stubbed (they are only touched by code
    paths we do not run)."""
    import_ref("sam3")  # installs stubs + sys.path

    for name, attrs in (
        ("sam3.eval.hota_eval_toolkit.trackeval.datasets", ("YouTubeVIS",)),
        ("sam3.eval.teta_eval_toolkit.datasets", ("COCO", "TAO")),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for a in attrs:
                setattr(mod, a, type(a, (), {}))
            sys.modules[name] = mod
    return import_ref("sam3.eval.saco_veval_evaluators")


def _rand_mask(rng):
    m = np.zeros((H, W), np.uint8)
    y0 = rng.randint(0, H - 12)
    x0 = rng.randint(0, W - 12)
    m[y0 : y0 + rng.randint(6, 30), x0 : x0 + rng.randint(6, 30)] = 1
    return m


def _perturb(rng, m):
    dy, dx = rng.randint(-5, 6, size=2)
    return np.roll(np.roll(m, dy, axis=0), dx, axis=1)


def _rle(m):
    r = encode(np.asfortranarray(m))
    return {"size": r["size"], "counts": r["counts"].decode("ascii")}


def _xywh(m):
    ys, xs = np.nonzero(m)
    return [
        float(xs.min()),
        float(ys.min()),
        float(xs.max() - xs.min() + 1),
        float(ys.max() - ys.min() + 1),
    ]


def _masklet_fields(frames):
    """Per-frame masks (None = absent) -> YT-VIS segmentations/bboxes/areas."""
    segs, boxes, areas = [], [], []
    for m in frames:
        if m is None or m.sum() == 0:
            segs.append(None)
            boxes.append(None)
            areas.append(None)
        else:
            segs.append(_rle(m))
            boxes.append(_xywh(m))
            areas.append(int(m.sum()))
    return segs, boxes, areas


def _make_workload(seed, n_videos=5, n_cats=3):
    """Random YT-VIS GT json + prediction list."""
    rng = np.random.RandomState(seed)
    videos, gt_anns, preds, np_pairs = [], [], [], []
    ann_id = 1
    for vid in range(1, n_videos + 1):
        videos.append(
            {
                "id": vid,
                "height": H,
                "width": W,
                "length": T,
                "file_names": [f"v{vid}/{t}.jpg" for t in range(T)],
            }
        )
        for cid in range(1, n_cats + 1):
            np_pairs.append({"video_id": vid, "category_id": cid})
            if rng.rand() < 0.25:
                continue  # negative pair: no GT for this (video, category)
            gt_frames_all = []
            for _ in range(rng.randint(1, 3)):  # tracks
                base = _rand_mask(rng)
                frames = [
                    _perturb(rng, base) if rng.rand() < 0.8 else None
                    for _ in range(T)
                ]
                if all(f is None for f in frames):
                    frames[rng.randint(T)] = base
                segs, boxes, areas = _masklet_fields(frames)
                gt_anns.append(
                    {
                        "id": ann_id,
                        "video_id": vid,
                        "category_id": cid,
                        "segmentations": segs,
                        "bboxes": boxes,
                        "areas": areas,
                        "height": H,
                        "width": W,
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
                gt_frames_all.append(frames)
            # detections: perturbed tracks + occasional false track
            for frames in gt_frames_all:
                if rng.rand() < 0.85:
                    dfr = [
                        None if (m is None or rng.rand() < 0.15) else _perturb(rng, m)
                        for m in frames
                    ]
                    if all(f is None for f in dfr):
                        continue
                    segs, boxes, areas = _masklet_fields(dfr)
                    preds.append(
                        {
                            "video_id": vid,
                            "category_id": cid,
                            "score": float(np.clip(rng.rand() * 0.7 + 0.3, 0, 1)),
                            "segmentations": segs,
                            "bboxes": boxes,
                            "areas": areas,
                        }
                    )
            if rng.rand() < 0.4:  # false positive track
                frames = [_rand_mask(rng) if rng.rand() < 0.6 else None for _ in range(T)]
                if not all(f is None for f in frames):
                    segs, boxes, areas = _masklet_fields(frames)
                    preds.append(
                        {
                            "video_id": vid,
                            "category_id": cid,
                            "score": float(np.clip(rng.rand(), 0.05, 1)),
                            "segmentations": segs,
                            "bboxes": boxes,
                            "areas": areas,
                        }
                    )
    gt = {
        "videos": videos,
        "annotations": gt_anns,
        "categories": [{"id": c, "name": f"cat{c}"} for c in range(1, n_cats + 1)],
        "video_np_pairs": np_pairs,
    }
    return gt, preds


def _dump(tmp_path, seed, gt, preds):
    gt_path = tmp_path / f"gt_{seed}.json"
    dt_path = tmp_path / f"dt_{seed}.json"
    gt_path.write_text(json.dumps(gt))
    dt_path.write_text(json.dumps(preds))
    return str(gt_path), str(dt_path)


# ---------------------------------------------------------------------------
# phrase AP vs reference VideoPhraseApEvaluator
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1])
def test_phrase_ap_matches_reference(tmp_path, seed):
    gt, preds = _make_workload(seed)
    gt_path, dt_path = _dump(tmp_path, seed, gt, preds)
    saco = _import_saco_oracle()

    ev = saco.VideoPhraseApEvaluator(gt_path, dataset_name="video")
    ref, _ = ev.evaluate(dt_path)

    ours, _ = evaluate_phrase_ap(gt, preds)
    for key, val in ref.items():
        assert ours[key] == pytest.approx(val, abs=1e-9), key


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1])
def test_video_map_matches_reference(tmp_path, seed):
    gt, preds = _make_workload(seed)
    gt_path, dt_path = _dump(tmp_path, seed, gt, preds)
    saco = _import_saco_oracle()

    ev = saco.YTVISPredFileEvaluator(gt_path, dataset_name="video")
    ref, _ = ev.evaluate(dt_path)

    ours, _ = evaluate_video_map(gt, preds)
    for key, val in ref.items():
        assert ours[key] == pytest.approx(val, abs=1e-9), key


# ---------------------------------------------------------------------------
# video cgF1 vs reference VideoCGF1Evaluator
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1])
def test_video_cgf1_matches_reference(tmp_path, seed):
    gt, preds = _make_workload(seed)
    gt_path, dt_path = _dump(tmp_path, seed, gt, preds)
    saco = _import_saco_oracle()

    ev = saco.VideoCGF1Evaluator(gt_path, dataset_name="video", prob_thresh=0.5)
    ref, ref_np = ev.evaluate(dt_path)

    ours, ours_np = evaluate_video_cgf1(gt, preds, prob_thresh=0.5)
    for key, val in ref.items():
        # the _ilmcc_50/_75 keys are a 0/0 ratio when pm_f1 is 0 at that
        # threshold (reference computes the same nan)
        assert ours[key] == pytest.approx(val, abs=1e-9, nan_ok=True), key
    assert set(ours_np.keys()) == set(ref_np.keys())
    for pair, row in ref_np.items():
        for k, v in row.items():
            assert ours_np[pair][k] == pytest.approx(v, abs=1e-9), (pair, k)


# ---------------------------------------------------------------------------
# HOTA COMBINED_SEQ pooling vs vendored trackeval combine_sequences
# ---------------------------------------------------------------------------


def _rand_tracks(rng, n_frames=8):
    gt_tracks, pred_tracks = {}, {}
    for tid in range(rng.randint(1, 4)):
        base = _rand_mask(rng)
        gt_tracks[tid] = {
            f: _perturb(rng, base) for f in range(n_frames) if rng.rand() < 0.8
        }
        if not gt_tracks[tid]:
            gt_tracks[tid][0] = base
        if rng.rand() < 0.85:
            pred_tracks[100 + tid] = {
                f: _perturb(rng, m) for f, m in gt_tracks[tid].items()
                if rng.rand() < 0.85
            }
            if not pred_tracks[100 + tid]:
                del pred_tracks[100 + tid]
    if rng.rand() < 0.5:
        pred_tracks[999] = {0: _rand_mask(rng)}
    return gt_tracks, pred_tracks


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_combine_hota_matches_vendored_trackeval():
    from test_eval_crosscheck import _load_vendored_trackeval_hota, _trackeval_data

    HOTA = _load_vendored_trackeval_hota()
    rng = np.random.RandomState(7)
    seqs = [_rand_tracks(rng) for _ in range(5)]

    metric = HOTA()
    ref_per_seq = {i: metric.eval_sequence(_trackeval_data(g, p)) for i, (g, p) in enumerate(seqs)}
    ref = metric.combine_sequences(ref_per_seq)

    ours = combine_hota_sequences([evaluate_hota(g, p) for g, p in seqs])
    for m in ("HOTA", "DetA", "AssA", "DetRe", "DetPr", "AssRe", "AssPr", "LocA", "OWTA"):
        np.testing.assert_allclose(
            ours[m + "_array"], ref[m], rtol=0, atol=1e-12, err_msg=m
        )


# ---------------------------------------------------------------------------
# plumbing behavior (no oracle needed)
# ---------------------------------------------------------------------------


def test_remap_assigns_unique_pseudo_videos():
    gt, preds = _make_workload(3)
    gt_r, dt_r = remap_video_category_pairs(gt, preds, add_negative_np_pairs=True)
    ids = [v["id"] for v in gt_r["videos"]]
    assert len(ids) == len(set(ids))
    # every (orig video, orig category) pair appears exactly once
    pairs = {(v["orig_video_id"], v["orig_category_id"]) for v in gt_r["videos"]}
    assert len(pairs) == len(ids)
    # negatives included: all np_pairs present
    for vnp in gt["video_np_pairs"]:
        assert (vnp["video_id"], vnp["category_id"]) in pairs
    # ann/pred video ids point at remapped videos of the matching pair
    by_id = {v["id"]: v for v in gt_r["videos"]}
    for a, a0 in zip(gt_r["annotations"], gt["annotations"]):
        v = by_id[a["video_id"]]
        assert (v["orig_video_id"], v["orig_category_id"]) == (
            a0["video_id"], a0["category_id"],
        )
    for d, d0 in zip(dt_r, preds):
        v = by_id[d["video_id"]]
        assert (v["orig_video_id"], v["orig_category_id"]) == (
            d0["video_id"], d0["category_id"],
        )


def test_phrase_hota_thresholds_and_empty_frames():
    """A det track at score <= prob_thresh is dropped (strict >); zero-area
    frames never count as detections (saco_veval_evaluators.py:534-545)."""
    m = np.zeros((H, W), np.uint8)
    m[10:30, 10:30] = 1
    segs, boxes, areas = _masklet_fields([m] * T)
    gt = {
        "videos": [{"id": 1, "height": H, "width": W, "length": T,
                    "file_names": [f"{t}.jpg" for t in range(T)]}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": segs, "bboxes": boxes, "areas": areas}],
        "categories": [{"id": 1, "name": "c"}],
    }
    perfect = {"video_id": 1, "category_id": 1, "score": 0.9,
               "segmentations": segs, "bboxes": boxes, "areas": areas}
    res, _ = evaluate_phrase_hota(gt, [perfect], iou_types=("segm",))
    assert res["video_mask_all_phrase_HOTA"] == pytest.approx(1.0)

    # at exactly the threshold the track is dropped -> all GT dets are misses
    at_thresh = dict(perfect, score=0.5)
    res, _ = evaluate_phrase_hota(gt, [at_thresh], iou_types=("segm",))
    assert res["video_mask_all_phrase_HOTA"] == 0.0

    # zero-area frames are nulled out: only frame 0 remains a detection
    z = np.zeros((H, W), np.uint8)
    segs2, boxes2, areas2 = _masklet_fields([m, z, z, z, z])
    partial = {"video_id": 1, "category_id": 1, "score": 0.9,
               "segmentations": [segs2[0]] + [_rle(z)] * 4,
               "bboxes": [boxes2[0]] + [[0, 0, 0, 0]] * 4,
               "areas": [areas2[0], 0, 0, 0, 0]}
    res, _ = evaluate_phrase_hota(gt, [partial], iou_types=("segm",))
    # 1 TP + 4 FN at every alpha: DetA = 1/5; the matched pair's association
    # Jaccard = 1 match / (5 gt dets + 1 pred det - 1) = 1/5 -> HOTA = 0.2
    assert res["video_mask_all_phrase_DetA"] == pytest.approx(0.2)
    assert res["video_mask_all_phrase_AssA"] == pytest.approx(0.2)
    assert res["video_mask_all_phrase_HOTA"] == pytest.approx(0.2)


def test_phrase_hota_mask_only_prediction():
    """A record with NO bboxes key (mask-only) keeps its detections: frame
    emptiness falls back to area/segmentation instead of treating a missing
    box as an empty frame (ADVICE r4 #2 — previously every frame of such a
    record was silently nulled before HOTA)."""
    m = np.zeros((H, W), np.uint8)
    m[10:30, 10:30] = 1
    segs, boxes, areas = _masklet_fields([m] * T)
    gt = {
        "videos": [{"id": 1, "height": H, "width": W, "length": T,
                    "file_names": [f"{t}.jpg" for t in range(T)]}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": segs, "bboxes": boxes, "areas": areas}],
        "categories": [{"id": 1, "name": "c"}],
    }
    mask_only = {"video_id": 1, "category_id": 1, "score": 0.9,
                 "segmentations": segs, "areas": areas}
    res, _ = evaluate_phrase_hota(gt, [mask_only], iou_types=("segm",))
    assert res["video_mask_all_phrase_HOTA"] == pytest.approx(1.0)

    # and a frame with a None segmentation / zero area is still dropped
    z = np.zeros((H, W), np.uint8)
    partial = {"video_id": 1, "category_id": 1, "score": 0.9,
               "segmentations": [segs[0], None, None, None, None],
               "areas": [areas[0], 0, 0, 0, 0]}
    res, _ = evaluate_phrase_hota(gt, [partial], iou_types=("segm",))
    assert res["video_mask_all_phrase_DetA"] == pytest.approx(0.2)


def test_video_teta_keys_and_perfect_tracker():
    gt, preds = _make_workload(4)
    res, _ = evaluate_video_teta(gt, preds, use_mask=True)
    assert set(res) == {
        f"video_mask_{k}" for k in (
            "teta", "loc_a", "assoc_a", "cls_a", "loc_re", "loc_pr",
            "assoc_re", "assoc_pr", "cls_re", "cls_pr",
        )
    }
    # a perfect tracker scores TETA 100
    m = np.zeros((H, W), np.uint8)
    m[5:25, 5:25] = 1
    segs, boxes, areas = _masklet_fields([m] * T)
    gt1 = {
        "videos": [{"id": 1, "height": H, "width": W, "length": T,
                    "file_names": [f"{t}.jpg" for t in range(T)]}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": segs, "bboxes": boxes, "areas": areas}],
        "categories": [{"id": 1, "name": "c"}],
    }
    perfect = {"video_id": 1, "category_id": 1, "score": 0.9,
               "segmentations": segs, "bboxes": boxes, "areas": areas}
    res, _ = evaluate_video_teta(gt1, [perfect], use_mask=True)
    assert res["video_mask_teta"] == pytest.approx(100.0)


def test_writer_roundtrip_and_dedup(tmp_path):
    rng = np.random.RandomState(0)
    masks = np.stack([
        np.stack([_rand_mask(rng).astype(bool) for _ in range(T)])
        for _ in range(3)
    ])
    boxes = np.zeros((3, T, 4))
    for i in range(3):
        for t in range(T):
            x, y, w, h = _xywh(masks[i, t])
            boxes[i, t] = [x, y, x + w, y + h]
    recs = prepare_video_predictions(
        video_id=7, scores=np.array([0.9, 0.8, 0.7]),
        labels=np.array([1, 1, 2]), boxes=boxes, masks=masks,
    )
    assert len(recs) == 3
    assert recs[0]["bboxes"][0][2] > 0  # xywh
    assert recs[0]["areas"][0] == int(masks[0, 0].sum())

    # dedup keeps one host's records per (video, category)
    merged = dedup_video_predictions([recs, recs])
    assert len(merged) == len(recs)

    # end-to-end writer
    m = np.zeros((H, W), bool)
    m[5:25, 5:25] = True
    gt = {
        "videos": [{"id": 7, "height": H, "width": W, "length": T,
                    "file_names": [f"{t}.jpg" for t in range(T)]}],
        "annotations": [{
            "id": 1, "video_id": 7, "category_id": 1,
            **dict(zip(("segmentations", "bboxes", "areas"),
                       _masklet_fields([m.astype(np.uint8)] * T))),
        }],
        "categories": [{"id": 1, "name": "c"}],
        "video_np_pairs": [{"video_id": 7, "category_id": 1}],
    }
    w = SacoVevalWriter(str(tmp_path / "preds.json"),
                        evaluators=("phrase_ap", "video_cgf1"))
    w.update(7, np.array([0.95]), np.array([1]),
             boxes=None, masks=np.stack([m] * T)[None])
    meters = w.finalize(gt)
    assert meters["video_mask_phrase_ap_50"] == pytest.approx(1.0)
    assert os.path.exists(str(tmp_path / "preds.json"))
    assert os.path.exists(str(tmp_path / "preds.json") + ".sam3_eval_metrics")
