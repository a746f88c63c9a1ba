"""Sam3Processor public-API tests (the reference Sam3Processor surface,
sam3_image_processor.py:14-223): cached backbone, text prompts, geometric
prompts, threshold semantics."""

import numpy as np
import pytest

from sam3_lora_tpu.config import tiny_model_config
from sam3_lora_tpu.processor import Sam3Processor


@pytest.fixture(scope="module")
def proc():
    return Sam3Processor(model_cfg=tiny_model_config(), threshold=0.0)


def image(seed=0, h=70, w=90):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_set_image_caches_backbone(proc):
    proc.set_image(image())
    st1 = proc._state
    assert st1 is not None and st1["orig_size"] == (70, 90)
    # two prompts on the same image reuse the cached features
    r1 = proc.set_text_prompt("crack", threshold=0.0)
    r2 = proc.set_text_prompt("object", threshold=0.0)
    assert proc._state is st1
    for r in (r1, r2):
        assert {"scores", "boxes", "masks_lowres", "presence",
                "num_detections"} <= set(r)
        assert np.isfinite(r["scores"]).all()


def test_threshold_filters(proc):
    proc.set_image(image(1))
    r_all = proc.set_text_prompt("crack", threshold=-1.0)
    r_none = proc.set_text_prompt("crack", threshold=2.0)
    assert r_all["num_detections"] >= r_none["num_detections"]
    assert r_none["num_detections"] == 0


def test_boxes_scaled_to_original(proc):
    """Boxes come back as xyxy in ORIGINAL pixel coordinates. Like the
    reference postprocess, corners are not clipped (cx,cy are sigmoid-
    bounded but w,h can overshoot), so assert the centers are in-bounds
    and the scale matches the original size, not the model's 56^2."""
    proc.set_image(image(2))
    r = proc.set_text_prompt("crack", threshold=-1.0)
    boxes = r["boxes"]
    if len(boxes):
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        assert (cx >= 0).all() and (cx <= 90).all()
        assert (cy >= 0).all() and (cy <= 70).all()


def test_add_geometric_prompt(proc):
    proc.set_image(image(3))
    out = proc.add_geometric_prompt(
        "crack", boxes=np.array([[10.0, 10.0, 50.0, 40.0]])
    )
    assert "scores" in out and np.isfinite(out["scores"]).all()
    # geometric prompt changes the grounding vs pure text
    base = proc.set_text_prompt("crack", threshold=-1.0)
    assert out["scores"].shape == base["scores"].shape


def test_requires_image_first():
    p = Sam3Processor(model_cfg=tiny_model_config())
    with pytest.raises((RuntimeError, TypeError, KeyError)):
        p.set_text_prompt("crack")


def test_int8_processor_prequantizes_and_matches_dynamic():
    """base_quant=int8 processor: base kernels become int8 at construction,
    and results are IDENTICAL to the dynamic-quant path (prequantization is a
    bit-exact reparameterization, ops/quant.py docstring)."""
    import jax.numpy as jnp
    from flax import traverse_util

    cfg = tiny_model_config(base_quant="int8", base_quant_min_dim=16)
    p_pre = Sam3Processor(model_cfg=cfg, threshold=0.0, seed=3)
    n_int8 = sum(
        1
        for k, v in traverse_util.flatten_dict(p_pre.params).items()
        if k[-1] == "kernel" and v.dtype == jnp.int8
    )
    assert n_int8 > 0, "no base kernel was pre-quantized at construction"

    # dynamic-path twin: same seed, prequantization undone by rebuilding the
    # params without the auto-prequant (construct then restore bf16 leaves)
    p_dyn = Sam3Processor(model_cfg=cfg, threshold=0.0, seed=3)
    from sam3_lora_tpu.models import build_sam3_image_model, init_model
    import jax

    model = build_sam3_image_model(cfg)
    p_dyn.params = init_model(model, jax.random.PRNGKey(3))

    img = image(seed=7)
    r_pre = p_pre.set_image(img).set_text_prompt("crack", threshold=0.0)
    r_dyn = p_dyn.set_image(img).set_text_prompt("crack", threshold=0.0)
    np.testing.assert_array_equal(r_pre["scores"], r_dyn["scores"])
    np.testing.assert_array_equal(r_pre["boxes"], r_dyn["boxes"])
