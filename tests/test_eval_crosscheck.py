"""Cross-validate our eval stack against the REFERENCE evaluators on
randomized workloads (VERDICT r1 item 4).

* cgF1: the reference's own ``sam3/eval/cgf1_eval.py`` (its vendored
  evaluateImg/accumulate/summarize) runs unmodified on top of
  ``tests/pycocotools_shim.py`` and must agree with ``eval/cgf1.py``.
* COCO mAP: the stock-COCOeval shim (independent implementation of the
  canonical pycocotools matcher/accumulator, driven class-agnostically the
  way the reference's CocoEvaluator drives it) must agree with
  ``eval/coco_map.py``.

These are randomized 25-image workloads with empty-GT images, empty-DT
images, crowds (mAP path) and near-duplicate detections — not hand-made
golden cases.
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
