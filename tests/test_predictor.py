"""SAM1-task interactive predictor tests (tiny config, CPU)."""

import numpy as np
import pytest

from sam3_lora_tpu.config import tiny_model_config
from sam3_lora_tpu.predictor import MAX_POINTS, SAM3InteractiveImagePredictor
from sam3_lora_tpu.processor import Sam3Processor


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_model_config()
    proc = Sam3Processor(model_cfg=cfg)
    return SAM3InteractiveImagePredictor(proc)


def make_image(cfg_size=56, h=80, w=100, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_predict_point(predictor):
    img = make_image()
    predictor.set_image(img)
    masks, iou, low = predictor.predict(
        point_coords=np.array([[50.0, 40.0]]), point_labels=np.array([1])
    )
    assert masks.shape == (3, 80, 100) and masks.dtype == bool
    assert iou.shape == (3,)
    assert np.isfinite(iou).all()
    assert low.shape[0] == 3


def test_predict_box_and_single_mask(predictor):
    img = make_image(seed=1)
    predictor.set_image(img)
    masks, iou, low = predictor.predict(
        box=np.array([10.0, 10.0, 70.0, 60.0]), multimask_output=False,
        return_logits=True,
    )
    assert masks.shape == (1, 80, 100) and masks.dtype == np.float32
    assert np.isfinite(masks).all()


def test_same_compiled_program_any_click_count(predictor):
    """1 click and 5 clicks pad to the same static slots -> no recompile."""
    img = make_image(seed=2)
    predictor.set_image(img)
    c1, l1 = predictor._prep_prompts(
        np.array([[5.0, 5.0]]), np.array([1]), None
    )
    c5, l5 = predictor._prep_prompts(
        np.tile([[5.0, 5.0]], (5, 1)), np.ones(5, np.int32), None
    )
    assert c1.shape == c5.shape == (1, MAX_POINTS, 2)
    assert l1.shape == l5.shape
    # both run through the cached jit
    predictor.predict(np.array([[5.0, 5.0]]), np.array([1]))
    predictor.predict(np.tile([[5.0, 5.0]], (5, 1)), np.ones(5, np.int32))


def test_requires_set_image(predictor):
    predictor.reset_predictor()
    with pytest.raises(RuntimeError, match="set_image"):
        predictor.predict(np.array([[1.0, 1.0]]), np.array([1]))
