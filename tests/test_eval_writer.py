"""Tests for the streaming PredictionDumper + offline eval (eval/writer.py)."""

import json
import os

import numpy as np
import pytest

from sam3_lora_tpu.eval.coco_map import evaluate_coco_map
from sam3_lora_tpu.eval.writer import (
    PredictionDumper,
    evaluate_pred_file,
    load_predictions,
)


def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_top_k_heap_policy(tmp_path):
    d = PredictionDumper(str(tmp_path), top_k=3)
    scores = [0.1, 0.9, 0.5, 0.7, 0.3]
    d.add(1, scores, boxes=np.arange(20).reshape(5, 4).astype(float))
    path = d.finalize()
    recs = load_predictions(path)
    assert len(recs) == 3
    assert [r["score"] for r in recs] == [0.9, 0.7, 0.5]  # sorted desc


def test_incremental_flush_and_merge(tmp_path):
    d = PredictionDumper(str(tmp_path), top_k=10)
    d.add(1, [0.5], masks=_disk_mask(16, 16, 8, 8, 4)[None])
    d.flush([1])
    d.add(2, [0.8], masks=_disk_mask(16, 16, 4, 4, 2)[None])
    path = d.finalize()
    recs = load_predictions(path)
    assert sorted(r["image_id"] for r in recs) == [1, 2]
    # records are valid JSON with RLE segmentation
    for r in recs:
        assert r["segmentation"]["size"] == [16, 16]
        assert isinstance(r["segmentation"]["counts"], str)


def test_sharded_merge(tmp_path):
    d0 = PredictionDumper(str(tmp_path), top_k=5, shard=0)
    d1 = PredictionDumper(str(tmp_path), top_k=5, shard=1)
    d0.add(1, [0.9])
    d1.add(2, [0.8])
    d0.flush()
    path = d1.finalize()  # merge sees both shards
    recs = load_predictions(path)
    assert sorted(r["image_id"] for r in recs) == [1, 2]


def test_offline_eval_round_trip(tmp_path):
    """Dump perfect predictions -> offline eval returns mAP 1.0, matching
    the live evaluator on the same data."""
    h = w = 32
    gts, live_dts = {}, {}
    d = PredictionDumper(str(tmp_path), top_k=10)
    rng = np.random.RandomState(0)
    for iid in range(3):
        masks = np.stack(
            [
                _disk_mask(h, w, rng.randint(8, 24), rng.randint(8, 24), 5),
                _disk_mask(h, w, rng.randint(8, 24), rng.randint(8, 24), 3),
            ]
        )
        gts[iid] = [{"mask": m.astype(bool), "iscrowd": 0} for m in masks]
        live_dts[iid] = [
            {"mask": m.astype(bool), "score": 0.9 - 0.1 * i}
            for i, m in enumerate(masks)
        ]
        d.add(iid, [0.9, 0.8], masks=masks)
    path = d.finalize()

    offline = evaluate_pred_file(path, gts)
    live = evaluate_coco_map(gts, live_dts)
    assert offline["mAP"] == pytest.approx(1.0)
    assert offline["mAP"] == pytest.approx(live["mAP"])
    assert "cgF1" in offline


def test_offline_eval_custom_evaluator(tmp_path):
    d = PredictionDumper(str(tmp_path))
    d.add(0, [0.7], masks=_disk_mask(8, 8, 4, 4, 2)[None])
    path = d.finalize()
    out = evaluate_pred_file(
        path,
        {0: [{"mask": _disk_mask(8, 8, 4, 4, 2).astype(bool), "iscrowd": 0}]},
        evaluators={"n_images": lambda gts, dts: float(len(dts))},
    )
    assert out == {"n_images": 1.0}
