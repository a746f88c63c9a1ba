"""Multi-step interactive grounding loop (reference sam3_image.py:550-576):
error-driven prompt sampling + per-stage outputs over a cached backbone."""

import numpy as np
import pytest

from sam3_lora_tpu.config import tiny_model_config
from sam3_lora_tpu.interactive import (
    ErrorDrivenBoxSampler,
    InteractiveSession,
    interactive_ground,
)
from sam3_lora_tpu.processor import Sam3Processor

pytestmark = pytest.mark.fast


# ------------------------------------------------------------------ #
# sampler unit tests (pure numpy)
# ------------------------------------------------------------------ #
def _sample(pred_boxes, pred_scores, gt_boxes, **kw):
    boxes, labels = [], []
    s = ErrorDrivenBoxSampler(**kw)
    added = s.sample(
        np.asarray(pred_boxes, np.float32).reshape(-1, 4),
        np.asarray(pred_scores, np.float32).reshape(-1),
        np.asarray(gt_boxes, np.float32).reshape(-1, 4),
        boxes,
        labels,
    )
    return added, boxes, labels


def test_miss_becomes_positive_prompt():
    gt = [[0.7, 0.7, 0.2, 0.2]]
    added, boxes, labels = _sample(
        pred_boxes=[[0.2, 0.2, 0.1, 0.1]], pred_scores=[0.9], gt_boxes=gt
    )
    assert added
    assert 1 in labels
    pos = boxes[labels.index(1)]
    np.testing.assert_allclose(pos, gt[0], atol=1e-6)


def test_false_positive_becomes_negative_prompt():
    fp = [0.2, 0.2, 0.1, 0.1]
    added, boxes, labels = _sample(
        pred_boxes=[fp, [0.7, 0.7, 0.2, 0.2]],
        pred_scores=[0.9, 0.95],
        gt_boxes=[[0.7, 0.7, 0.2, 0.2]],
    )
    assert added
    assert 0 in labels
    neg = boxes[labels.index(0)]
    np.testing.assert_allclose(neg, fp, atol=1e-6)
    # the correct detection is NOT marked negative
    assert not any(
        l == 0 and np.allclose(b, [0.7, 0.7, 0.2, 0.2]) for b, l in zip(boxes, labels)
    )


def test_perfect_predictions_add_nothing():
    gt = [[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]
    added, boxes, labels = _sample(
        pred_boxes=gt, pred_scores=[0.9, 0.9], gt_boxes=gt
    )
    assert not added and not boxes


def test_no_gt_marks_confident_preds_negative():
    added, boxes, labels = _sample(
        pred_boxes=[[0.5, 0.5, 0.3, 0.3]], pred_scores=[0.99], gt_boxes=np.zeros((0, 4))
    )
    assert added and labels == [0]


def test_low_confidence_preds_ignored():
    # below score_threshold the FP is invisible; the missed GT still prompts
    added, boxes, labels = _sample(
        pred_boxes=[[0.2, 0.2, 0.1, 0.1]],
        pred_scores=[0.1],
        gt_boxes=[[0.7, 0.7, 0.2, 0.2]],
    )
    assert added and labels == [1]


def test_no_duplicate_prompts_across_steps():
    gt = np.asarray([[0.7, 0.7, 0.2, 0.2]], np.float32)
    boxes, labels = [], []
    s = ErrorDrivenBoxSampler()
    preds = np.asarray([[0.2, 0.2, 0.1, 0.1]], np.float32)
    scores = np.asarray([0.9], np.float32)
    assert s.sample(preds, scores, gt, boxes, labels)
    n1 = len(boxes)
    # same errors again: the object is already prompted, only dedup applies
    s.sample(preds, scores, gt, boxes, labels)
    pos = [b for b, l in zip(boxes, labels) if l == 1]
    assert len(pos) == 1, "missed GT must not be re-prompted every step"
    assert len(boxes) <= n1 + 1


# ------------------------------------------------------------------ #
# loop integration on the tiny model
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def proc():
    return Sam3Processor(model_cfg=tiny_model_config(), threshold=0.0)


def test_session_runs_stages_and_grows_prompts(proc):
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    proc.set_image(img)
    sess = InteractiveSession(
        proc,
        "crack",
        gt_boxes=np.array([[0.75, 0.75, 0.2, 0.2]], np.float32),
        threshold=2.0,  # force zero detections -> guaranteed miss
    )
    stages = sess.run(num_interactive_steps=2)
    assert 1 <= len(stages) <= 3
    # stage 0 is promptless; later stages carry the sampled positive box
    assert stages[0]["prompt_boxes"] == []
    if len(stages) > 1:
        assert len(stages[1]["prompt_boxes"]) >= 1
        assert 1 in stages[1]["prompt_labels"]
    for st in stages:
        assert np.isfinite(st["scores"]).all()


def test_interactive_ground_one_call(proc):
    rng = np.random.RandomState(1)
    img = (rng.rand(48, 80, 3) * 255).astype(np.uint8)
    stages = interactive_ground(
        proc,
        img,
        "crack",
        gt_boxes=np.array([[0.5, 0.5, 0.3, 0.3]], np.float32),
        num_interactive_steps=1,
        threshold=2.0,
    )
    assert len(stages) >= 1
    assert stages[-1]["num_detections"] >= 0


def test_prompt_cap_respected(proc):
    """More errors than prompt slots: the session must clamp to
    max_prompt_boxes so the jitted executable's shapes never change."""
    rng = np.random.RandomState(2)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    proc.set_image(img)
    g = np.stack(
        [
            [0.1 + 0.2 * i, 0.1 + 0.2 * j, 0.08, 0.08]
            for i in range(4)
            for j in range(4)
        ]
    ).astype(np.float32)
    sess = InteractiveSession(
        proc,
        "crack",
        gt_boxes=g,
        sampler=ErrorDrivenBoxSampler(max_new_positives=8, max_new_negatives=8),
        threshold=2.0,
    )
    stages = sess.run(num_interactive_steps=4)
    cap = proc.cfg.max_prompt_boxes
    for st in stages:
        assert len(st["prompt_boxes"]) <= max(
            cap, len(sess.prompt_boxes)
        )  # session may track more, but the model only sees <= cap
    # and the model call itself never saw more than cap slots (no crash)
    assert np.isfinite(stages[-1]["scores"]).all()
