"""Cross-validate our eval stack against the REFERENCE evaluators on
randomized workloads (VERDICT r1 item 4, r2 items 4-5).

* cgF1: the reference's own ``sam3/eval/cgf1_eval.py`` (its vendored
  evaluateImg/accumulate/summarize) runs unmodified on top of
  ``tests/pycocotools_shim.py`` and must agree with ``eval/cgf1.py``.
* COCO mAP: two oracles — (a) the stock-COCOeval shim (independent
  implementation of the canonical pycocotools matcher/accumulator, driven
  class-agnostically the way the reference's CocoEvaluator drives it), and
  (b) the REFERENCE's own ``sam3/eval/coco_eval.py`` module functions
  (``loadRes``/``evaluate``/``accumulate``/``summarize`` — its
  CocoEvaluator's exact single-process flow) running over the shim.
* HOTA: the reference's VENDORED trackeval toolkit
  (``sam3/eval/hota_eval_toolkit/trackeval/metrics/hota.py``) runs
  unmodified as the oracle for ``eval/video_eval.py::evaluate_hota`` on
  randomized multi-track workloads with id switches, fragmentation, track
  gaps and false tracks.

These are randomized workloads with empty-GT images, empty-DT images,
crowds (mAP path) and near-duplicate detections — not hand-made golden
cases.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pycocotools_shim import COCO, COCOeval, encode, install

install()

from ref_oracle import HAS_REF, import_ref  # noqa: E402  (after install())

from sam3_lora_tpu.eval.cgf1 import evaluate_cgf1  # noqa: E402
from sam3_lora_tpu.eval.coco_map import evaluate_coco_map  # noqa: E402

H = W = 96


def _rand_mask(rng, h=H, w=W):
    """Random axis-aligned blob mask."""
    m = np.zeros((h, w), np.uint8)
    y0 = rng.randint(0, h - 12)
    x0 = rng.randint(0, w - 12)
    bh = rng.randint(6, min(40, h - y0))
    bw = rng.randint(6, min(40, w - x0))
    m[y0 : y0 + bh, x0 : x0 + bw] = 1
    return m


def _perturb(rng, m):
    """Shift a mask by a few pixels (IoU lands spread over the thresholds)."""
    dy, dx = rng.randint(-6, 7, size=2)
    return np.roll(np.roll(m, dy, axis=0), dx, axis=1)


def _make_workload(seed, with_crowd=False):
    """Returns (gts, dts) in our in-memory format + COCO-json dicts."""
    rng = np.random.RandomState(seed)
    gts, dts = {}, {}
    images, gt_anns, dt_anns = [], [], []
    ann_id = 1
    for img_id in range(25):
        images.append(
            {
                "id": img_id,
                "height": H,
                "width": W,
                "is_instance_exhaustive": True,
            }
        )
        gts[img_id] = []
        dts[img_id] = []
        n_gt = rng.randint(0, 5)  # some images have no GT
        gt_masks = []
        for _ in range(n_gt):
            m = _rand_mask(rng)
            crowd = bool(with_crowd and rng.rand() < 0.15)
            gt_masks.append(m)
            rle = encode(np.asfortranarray(m))
            rle = {"size": rle["size"], "counts": rle["counts"].decode("ascii")}
            ys, xs = np.nonzero(m)
            bbox = [
                float(xs.min()), float(ys.min()),
                float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1),
            ]
            gt_anns.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "segmentation": rle,
                    "area": float(m.sum()),
                    "bbox": bbox,
                    "iscrowd": int(crowd),
                }
            )
            gts[img_id].append(
                {"mask": m, "iscrowd": int(crowd), "ignore": bool(crowd)}
            )
            ann_id += 1
        # detections: perturbed copies + false positives; some images get none
        if rng.rand() < 0.15:
            continue
        for m in gt_masks:
            if rng.rand() < 0.8:
                d = _perturb(rng, m)
                score = float(np.clip(rng.rand() * 0.6 + 0.4, 0, 1))
                dts[img_id].append({"mask": d, "score": score})
                rle = encode(np.asfortranarray(d))
                dt_anns.append(
                    {
                        "image_id": img_id,
                        "category_id": 1,
                        "segmentation": {
                            "size": rle["size"],
                            "counts": rle["counts"].decode("ascii"),
                        },
                        "score": score,
                    }
                )
        for _ in range(rng.randint(0, 3)):  # false positives
            d = _rand_mask(rng)
            score = float(np.clip(rng.rand(), 0.05, 1))
            dts[img_id].append({"mask": d, "score": score})
            rle = encode(np.asfortranarray(d))
            dt_anns.append(
                {
                    "image_id": img_id,
                    "category_id": 1,
                    "segmentation": {
                        "size": rle["size"],
                        "counts": rle["counts"].decode("ascii"),
                    },
                    "score": score,
                }
            )
    gt_json = {
        "images": images,
        "annotations": gt_anns,
        "categories": [{"id": 1, "name": "thing"}],
    }
    return gts, dts, gt_json, dt_anns


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cgf1_matches_reference_evaluator(tmp_path, seed):
    gts, dts, gt_json, dt_anns = _make_workload(seed, with_crowd=False)

    gt_path = tmp_path / f"gt_{seed}.json"
    dt_path = tmp_path / f"dt_{seed}.json"
    gt_path.write_text(json.dumps(gt_json))
    dt_path.write_text(json.dumps(dt_anns))

    cgf1_eval = import_ref("sam3.eval.cgf1_eval")
    ev = cgf1_eval.CGF1Evaluator(str(gt_path), iou_type="segm")
    ref = ev.evaluate(str(dt_path))

    ours = evaluate_cgf1(gts, dts, iou_type="segm", score_threshold=0.5)

    assert ref["cgF1_eval_segm_cgF1@0.5"] == pytest.approx(ours["cgF1_50"], abs=1e-9)
    assert ref["cgF1_eval_segm_cgF1@0.75"] == pytest.approx(ours["cgF1_75"], abs=1e-9)
    assert ref["cgF1_eval_segm_cgF1"] == pytest.approx(ours["cgF1"], abs=1e-9)
    assert ref["cgF1_eval_segm_IL_MCC"] == pytest.approx(ours["IL_MCC"], abs=1e-9)
    assert ref["cgF1_eval_segm_IL_F1"] == pytest.approx(ours["IL_F1"], abs=1e-9)
    assert ref["cgF1_eval_segm_positive_micro_precision"] == pytest.approx(
        ours["precision"], abs=1e-9
    )
    assert ref["cgF1_eval_segm_recall"] == pytest.approx(ours["recall"], abs=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_crowd", [False, True])
def test_coco_map_matches_stock_cocoeval(seed, with_crowd):
    """eval/coco_map.py vs an independent implementation of the canonical
    pycocotools matcher + 101-point accumulator, run class-agnostically."""
    gts, dts, gt_json, dt_anns = _make_workload(seed, with_crowd=with_crowd)

    coco_gt = COCO(gt_json)
    coco_dt = coco_gt.loadRes([dict(a) for a in dt_anns])
    E = COCOeval(coco_gt, coco_dt, iouType="segm")
    # class-agnostic single-area single-maxDet driving (the reference's
    # CGF1/CocoEvaluator pattern: useCats=0, areaRng all)
    E.params.useCats = 0
    E.params.areaRng = [[0.0, 1e10]]
    E.params.areaRngLbl = ["all"]
    E.params.maxDets = [100]
    E.evaluate()
    E.accumulate()
    prec = E.eval["precision"]  # (T, R, K=1, A=1, M=1)
    rec = E.eval["recall"]

    def ap_at(t_idx=None):
        s = prec if t_idx is None else prec[t_idx : t_idx + 1]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    ours = evaluate_coco_map(gts, dts, iou_type="segm", max_dets=100)

    assert ours["mAP"] == pytest.approx(ap_at(), abs=1e-9)
    assert ours["mAP_50"] == pytest.approx(ap_at(0), abs=1e-9)
    assert ours["mAP_75"] == pytest.approx(ap_at(5), abs=1e-9)
    r = rec[rec > -1]
    assert ours["AR_100"] == pytest.approx(float(np.mean(r)), abs=1e-9)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("with_crowd", [False, True])
def test_coco_map_matches_reference_coco_eval(seed, with_crowd):
    """eval/coco_map.py vs the REFERENCE's own coco_eval.py module functions
    (loadRes/evaluate/accumulate/summarize — the exact single-process flow of
    its CocoEvaluator, coco_eval.py:168-290) driving a shim COCOeval.

    This de-self-references the plain-mAP oracle (VERDICT r2 weak #4): the
    loadRes conversion, evaluation driver and summarizer are reference-
    authored, only the COCO container + canonical evaluateImg matcher come
    from the byte-identical-tested shim.
    """
    import copy

    gts, dts, gt_json, dt_anns = _make_workload(seed, with_crowd=with_crowd)

    ref_ce = import_ref("sam3.eval.coco_eval")

    coco_gt = COCO(gt_json)
    # the reference's prepare_for_coco_segmentation attaches mask areas before
    # loadRes (coco_eval.py:452-466; its loadRes deliberately does not compute
    # them, :779-786) — mirror that here. Values only bucket small/medium/
    # large, which this test does not compare.
    from pycocotools_shim import decode as shim_decode

    dt_with_area = []
    for a in dt_anns:
        a = dict(a)
        a["area"] = float(
            shim_decode(
                {"size": a["segmentation"]["size"],
                 "counts": a["segmentation"]["counts"].encode("ascii")}
            ).sum()
        )
        dt_with_area.append(a)
    coco_dt = ref_ce.loadRes(coco_gt, dt_with_area)
    E = COCOeval(coco_gt, coco_dt, iouType="segm")
    E.params.useCats = 0
    E.params.maxDets = [1, 10, 100]
    E.params.imgIds = coco_gt.getImgIds()
    # reference evaluate() (use_self_evaluate=True tier — the shipped one;
    # the CPP tier is disabled in the reference itself, coco_eval.py:99)
    img_ids, eval_imgs = ref_ce.evaluate(E, True)
    # reference create_common_coco_eval's single-process tail (:585-590)
    E.evalImgs = list(eval_imgs.flatten())
    E.params.imgIds = list(img_ids)
    E._paramsEval = copy.deepcopy(E.params)
    ref_ce.accumulate(E, use_self_eval=True)
    ref_ce.summarize(E)
    keys, stats = E.stats
    ref = dict(zip(keys, stats))

    ours = evaluate_coco_map(gts, dts, iou_type="segm", max_dets=100)

    assert ours["mAP"] == pytest.approx(ref["AP"], abs=1e-9)
    assert ours["mAP_50"] == pytest.approx(ref["AP_50"], abs=1e-9)
    assert ours["mAP_75"] == pytest.approx(ref["AP_75"], abs=1e-9)
    # the reference's "AR_75" key is AR@maxDets=100 (summarize() names the
    # three maxDets tiers AR/AR_50/AR_75 — coco_eval.py:869-874)
    assert ours["AR_100"] == pytest.approx(ref["AR_75"], abs=1e-9)


# ---------------------------------------------------------------------------
# HOTA vs the vendored trackeval toolkit
# ---------------------------------------------------------------------------


def _load_vendored_trackeval_hota():
    """Import the reference's vendored trackeval HOTA class unmodified.

    The vendored package's __init__ imports a ``datasets`` submodule that was
    not vendored, so the package is assembled manually in sys.modules and the
    metric modules execute their own (unmodified) sources."""
    import importlib.util
    import types

    base = "/root/reference/sam3/eval/hota_eval_toolkit/trackeval"
    if not os.path.isdir(base):
        return None
    if "trackeval.metrics.hota" in sys.modules:
        return sys.modules["trackeval.metrics.hota"].HOTA

    pkg = types.ModuleType("trackeval")
    pkg.__path__ = [base]
    sys.modules["trackeval"] = pkg
    mpkg = types.ModuleType("trackeval.metrics")
    mpkg.__path__ = [os.path.join(base, "metrics")]
    sys.modules["trackeval.metrics"] = mpkg
    for fq, rel in (
        ("trackeval._timing", "_timing.py"),
        ("trackeval.utils", "utils.py"),
        ("trackeval.metrics._base_metric", "metrics/_base_metric.py"),
        ("trackeval.metrics.hota", "metrics/hota.py"),
    ):
        spec = importlib.util.spec_from_file_location(fq, os.path.join(base, rel))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[fq] = mod
        spec.loader.exec_module(mod)
    pkg._timing = sys.modules["trackeval._timing"]
    pkg.utils = sys.modules["trackeval.utils"]
    return sys.modules["trackeval.metrics.hota"].HOTA


def _make_track_workload(seed, n_frames=24, n_gt=4):
    """Randomized mask tracks with id switches, fragmentation, gaps, false
    tracks and frames where only one side is present."""
    rng = np.random.RandomState(seed)
    size = 64

    def blob(cx, cy, r=7):
        yy, xx = np.mgrid[:size, :size]
        return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r

    gt_tracks = {}
    centers = {}
    for g in range(n_gt):
        start = rng.randint(0, 6)
        end = rng.randint(n_frames - 6, n_frames)
        cx, cy = rng.randint(10, 54, size=2)
        vx, vy = rng.randint(-2, 3, size=2)
        trk = {}
        for f in range(start, end):
            if rng.rand() < 0.1:  # gap
                continue
            x = int(np.clip(cx + vx * f, 8, 55))
            y = int(np.clip(cy + vy * f, 8, 55))
            trk[f] = blob(x, y)
            centers[(g, f)] = (x, y)
        if trk:
            gt_tracks[g] = trk

    pred_tracks = {}
    next_id = 100
    for g, trk in gt_tracks.items():
        frames = sorted(trk.keys())
        # fragmentation: some gt tracks split into two pred ids
        n_parts = 2 if rng.rand() < 0.4 else 1
        cut = len(frames) // 2 if n_parts == 2 else len(frames)
        parts = [frames[:cut], frames[cut:]][:n_parts]
        for part in parts:
            pid = next_id
            next_id += 1
            ptrk = {}
            for f in part:
                if rng.rand() < 0.15:  # missed detection
                    continue
                x, y = centers[(g, f)]
                dx, dy = rng.randint(-4, 5, size=2)
                ptrk[f] = blob(int(np.clip(x + dx, 8, 55)),
                               int(np.clip(y + dy, 8, 55)))
            if ptrk:
                pred_tracks[pid] = ptrk
    # id switch: swap the frame-assignments of two pred tracks halfway
    pids = sorted(pred_tracks.keys())
    if len(pids) >= 2:
        a, b = pids[0], pids[1]
        half = n_frames // 2
        ta = {f: m for f, m in pred_tracks[a].items() if f < half}
        tb = {f: m for f, m in pred_tracks[b].items() if f < half}
        ta.update({f: m for f, m in pred_tracks[b].items() if f >= half})
        tb.update({f: m for f, m in pred_tracks[a].items() if f >= half})
        if ta:
            pred_tracks[a] = ta
        if tb:
            pred_tracks[b] = tb
    # false tracks
    for _ in range(rng.randint(1, 3)):
        pid = next_id
        next_id += 1
        f0 = rng.randint(0, n_frames - 4)
        pred_tracks[pid] = {
            f: blob(*rng.randint(10, 54, size=2)) for f in range(f0, f0 + 4)
        }
    return gt_tracks, pred_tracks


def _trackeval_data(gt_tracks, pred_tracks):
    """Convert track dicts to the vendored toolkit's eval_sequence data."""
    from sam3_lora_tpu.eval.video_eval import _iou

    gt_ids = sorted(gt_tracks.keys())
    pr_ids = sorted(pred_tracks.keys())
    frames = sorted({f for t in list(gt_tracks.values()) + list(pred_tracks.values())
                     for f in t})
    data = {
        "num_gt_ids": len(gt_ids),
        "num_tracker_ids": len(pr_ids),
        "num_gt_dets": 0,
        "num_tracker_dets": 0,
        "gt_ids": [],
        "tracker_ids": [],
        "similarity_scores": [],
    }
    for f in frames:
        gi = np.array([i for i, g in enumerate(gt_ids) if f in gt_tracks[g]], int)
        pi = np.array([j for j, p in enumerate(pr_ids) if f in pred_tracks[p]], int)
        sim = np.zeros((len(gi), len(pi)))
        for a, i in enumerate(gi):
            for b, j in enumerate(pi):
                sim[a, b] = _iou(gt_tracks[gt_ids[i]][f], pred_tracks[pr_ids[j]][f])
        data["gt_ids"].append(gi)
        data["tracker_ids"].append(pi)
        data["similarity_scores"].append(sim)
        data["num_gt_dets"] += len(gi)
        data["num_tracker_dets"] += len(pi)
    return data


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hota_matches_vendored_trackeval(seed):
    from sam3_lora_tpu.eval.video_eval import evaluate_hota

    HOTA = _load_vendored_trackeval_hota()
    assert HOTA is not None
    gt_tracks, pred_tracks = _make_track_workload(seed)
    ref = HOTA().eval_sequence(_trackeval_data(gt_tracks, pred_tracks))
    ours = evaluate_hota(gt_tracks, pred_tracks)

    for k in ("HOTA", "DetA", "AssA", "LocA", "DetRe", "DetPr",
              "AssRe", "AssPr", "OWTA"):
        np.testing.assert_allclose(
            ours[k + "_array"], ref[k], atol=1e-12,
            err_msg=f"{k} disagrees with vendored trackeval",
        )
        assert ours[k] == pytest.approx(float(np.mean(ref[k])), abs=1e-12)
    for k in ("HOTA(0)", "LocA(0)", "HOTALocA(0)"):
        assert ours[k] == pytest.approx(float(ref[k]), abs=1e-12)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_hota_matches_vendored_trackeval_empty_pred():
    from sam3_lora_tpu.eval.video_eval import evaluate_hota

    HOTA = _load_vendored_trackeval_hota()
    gt_tracks, _ = _make_track_workload(7)
    ref = HOTA().eval_sequence(_trackeval_data(gt_tracks, {}))
    ours = evaluate_hota(gt_tracks, {})
    np.testing.assert_allclose(ours["HOTA_array"], ref["HOTA"], atol=1e-12)
    np.testing.assert_allclose(ours["LocA_array"], ref["LocA"], atol=1e-12)
    assert ours["LocA(0)"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# TETA vs the vendored teta_eval_toolkit metric class
# ---------------------------------------------------------------------------


def _load_vendored_teta():
    """Import the reference's vendored TETA metric class unmodified.

    The vendored teta_eval_toolkit ships WITHOUT its ``datasets`` module
    (``__init__.py:4`` imports it, so the package cannot import as shipped
    and the reference's own saco_veval TETA path is broken); the metric
    modules themselves are intact and execute their own sources here."""
    import importlib.util
    import types

    base = "/root/reference/sam3/eval/teta_eval_toolkit"
    if not os.path.isdir(base):
        return None
    if "teta_tk.metrics.teta" in sys.modules:
        return sys.modules["teta_tk.metrics.teta"].TETA

    pkg = types.ModuleType("teta_tk")
    pkg.__path__ = [base]
    sys.modules["teta_tk"] = pkg
    mpkg = types.ModuleType("teta_tk.metrics")
    mpkg.__path__ = [os.path.join(base, "metrics")]
    sys.modules["teta_tk.metrics"] = mpkg
    for fq, rel in (
        ("teta_tk._timing", "_timing.py"),
        ("teta_tk.utils", "utils.py"),
        ("teta_tk.metrics._base_metric", "metrics/_base_metric.py"),
        ("teta_tk.metrics.teta", "metrics/teta.py"),
    ):
        spec = importlib.util.spec_from_file_location(fq, os.path.join(base, rel))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[fq] = mod
        spec.loader.exec_module(mod)
    pkg._timing = sys.modules["teta_tk._timing"]
    pkg.utils = sys.modules["teta_tk.utils"]
    return sys.modules["teta_tk.metrics.teta"].TETA


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_teta_matches_vendored_toolkit(seed):
    """evaluate_teta == the vendored TETA class on the SAME data dict.

    The randomized workloads include id switches, fragmentation, gaps, false
    tracks, empty frames and (seed 3) an empty prediction side."""
    TETA = _load_vendored_teta()
    if TETA is None:
        pytest.skip("reference teta toolkit not present")
    from sam3_lora_tpu.eval.video_eval import _teta_build_data, evaluate_teta

    gt_tracks, pred_tracks = _make_track_workload(seed)
    if seed == 3:
        pred_tracks = {}

    ours = evaluate_teta(gt_tracks, pred_tracks, thr=50)

    metric = TETA(exhaustive=False)
    data = _teta_build_data(gt_tracks, pred_tracks)
    cls_fp = {"crack": np.zeros(len(metric.cls_array_labels))}
    ref, _, _ = metric.eval_sequence_single_thr(
        data, "crack", {1: "crack"}, cls_fp, 50
    )

    for field in ("TETA", "LocA", "AssocA", "ClsA", "LocRe", "LocPr",
                  "AssocRe", "AssocPr"):
        np.testing.assert_allclose(
            ours[field + "_array"], ref[field], atol=1e-12,
            err_msg=f"TETA field {field} diverges from the vendored oracle",
        )
    for field in ("Loc_TP", "Loc_FN", "Loc_FP", "Cls_TP", "Cls_FN", "Cls_FP"):
        np.testing.assert_array_equal(ours[field + "_array"], ref[field])
    np.testing.assert_allclose(ours["TETA"], float(np.mean(ref["TETA"])), atol=1e-12)
