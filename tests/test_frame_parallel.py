"""Frame-parallel detection over the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam3_lora_tpu.parallel import make_mesh
from sam3_lora_tpu.parallel.frame_parallel import FrameParallelDetector


def test_mesh_has_8_devices():
    assert jax.device_count() == 8  # conftest forces the virtual CPU mesh


def make_detect_fn():
    """Stand-in detector with the real contract: (params, images, token_ids)
    -> dict of batch-first leaves, sharding-propagated through jit."""

    def detect(params, images, token_ids):
        feat = jnp.mean(images, axis=(1, 2, 3)) * params["scale"]
        scores = jax.nn.sigmoid(feat)[:, None] * jnp.ones((1, 4))
        return {"scores": scores, "tok_sum": token_ids.sum(axis=-1)}

    return detect


def test_frame_parallel_matches_sequential():
    mesh = make_mesh()
    params = {"scale": jnp.float32(3.0)}
    fn = make_detect_fn()
    det = FrameParallelDetector(fn, params, mesh=mesh)
    rng = np.random.RandomState(0)
    frames = [rng.randn(3, 8, 8).astype(np.float32) for _ in range(19)]
    toks = np.arange(5, dtype=np.int32)

    outs = list(det.detect_video(frames, toks))
    assert len(outs) == 19
    # sequential oracle
    seq = fn(params, jnp.stack(frames), jnp.broadcast_to(toks, (19, 5)))
    np.testing.assert_allclose(
        np.stack([o["scores"] for o in outs]), np.asarray(seq["scores"]),
        rtol=1e-6,
    )


def test_chunk_is_sharded_over_data_axis():
    """The chunk batch actually lands sharded across all 8 devices."""
    mesh = make_mesh()
    captured = {}

    def detect(params, images, token_ids):
        captured["traced"] = True
        return {"m": images.mean(axis=(1, 2, 3))}

    det = FrameParallelDetector(detect, {}, mesh=mesh)
    imgs, toks = det._put(
        np.zeros((8, 3, 4, 4), np.float32), np.zeros((8, 2), np.int32)
    )
    assert len(imgs.sharding.device_set) == 8


def test_bad_chunk_size_rejected():
    mesh = make_mesh()
    with pytest.raises(ValueError, match="divisible"):
        FrameParallelDetector(lambda *a: None, {}, mesh=mesh, chunk_size=3)
