"""Tests for grouped optimizer construction + layer decay (train/optim.py)
and the host-side distributed utilities (parallel/dist_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sam3_lora_tpu.train.optim import (
    get_vit_layer_id,
    layer_decay_scales,
    make_grouped_optimizer,
    path_str,
)


def make_flat_params():
    return {
        ("trunk", "patch_embed", "kernel"): jnp.ones((4, 4)),
        ("trunk", "blocks.0", "attn", "q_proj", "lora_a"): jnp.ones((4, 2)),
        ("trunk", "blocks.31", "attn", "q_proj", "lora_a"): jnp.ones((4, 2)),
        ("trunk", "scan_blocks_0", "block", "mlp", "fc1", "lora_a"): jnp.ones((7, 4, 2)),
        ("decoder", "layers.0", "linear1", "lora_a"): jnp.ones((4, 2)),
        ("text", "resblocks.3", "fc1", "lora_b"): jnp.ones((2, 4)),
    }


def test_layer_ids():
    assert get_vit_layer_id("trunk/patch_embed/kernel", 32) == 0
    assert get_vit_layer_id("trunk/blocks.0/attn/q", 32) == 1
    assert get_vit_layer_id("trunk/blocks.31/attn/q", 32) == 32
    # scan group 0 covers blocks 0..6 -> midpoint 3 -> id 4
    assert get_vit_layer_id("trunk/scan_blocks_0/block/mlp", 32) == 4
    # scan group 2 covers blocks 16..22 -> midpoint 19 -> id 20
    assert get_vit_layer_id("trunk/scan_blocks_2/block/mlp", 32) == 20
    # non-ViT params get no decay
    assert get_vit_layer_id("decoder/layers.0/linear1", 32) == 33


def test_layer_decay_scales_monotone():
    flat = make_flat_params()
    scales = layer_decay_scales(flat, decay=0.9, num_layers=32)
    s0 = scales[("trunk", "blocks.0", "attn", "q_proj", "lora_a")]
    s31 = scales[("trunk", "blocks.31", "attn", "q_proj", "lora_a")]
    assert s0 == pytest.approx(0.9**32)
    assert s31 == pytest.approx(0.9**1)
    assert s0 < s31
    # non-ViT param untouched
    assert scales[("decoder", "layers.0", "linear1", "lora_a")] == 1.0


def test_grouped_optimizer_lr_scales():
    flat = make_flat_params()
    tx, labels = make_grouped_optimizer(
        flat,
        base_lr_schedule=lambda step: 1e-3,
        groups=[
            {"name": "text", "patterns": ["text/*"], "lr_scale": 0.1},
        ],
        weight_decay=0.0,
        max_grad_norm=None,
    )
    state = tx.init(flat)
    grads = jax.tree_util.tree_map(jnp.ones_like, flat)
    updates, _ = tx.update(grads, state, flat)
    # text param update magnitude ~= 0.1x the decoder param's
    u_text = float(jnp.abs(updates[("text", "resblocks.3", "fc1", "lora_b")]).mean())
    u_dec = float(jnp.abs(updates[("decoder", "layers.0", "linear1", "lora_a")]).mean())
    assert u_text == pytest.approx(0.1 * u_dec, rel=1e-3)
    assert labels[("text", "resblocks.3", "fc1", "lora_b")].startswith("text|")


def test_grouped_optimizer_with_layer_decay():
    flat = make_flat_params()
    tx, labels = make_grouped_optimizer(
        flat,
        base_lr_schedule=lambda step: 1e-3,
        layer_decay=0.9,
        weight_decay=0.0,
        max_grad_norm=None,
    )
    state = tx.init(flat)
    grads = jax.tree_util.tree_map(jnp.ones_like, flat)
    updates, _ = tx.update(grads, state, flat)
    u0 = float(jnp.abs(updates[("trunk", "blocks.0", "attn", "q_proj", "lora_a")]).mean())
    u31 = float(jnp.abs(updates[("trunk", "blocks.31", "attn", "q_proj", "lora_a")]).mean())
    assert u0 == pytest.approx(0.9**31 * u31, rel=1e-3)


def test_overlapping_patterns_rejected():
    flat = make_flat_params()
    with pytest.raises(ValueError, match="matched 2 patterns"):
        make_grouped_optimizer(
            flat,
            base_lr_schedule=lambda s: 1e-3,
            groups=[{"patterns": ["text/*", "*fc1*"], "lr_scale": 0.5}],
        )


def test_weight_decay_per_group():
    flat = {("a", "w"): jnp.ones((4,)) * 10.0, ("b", "w"): jnp.ones((4,)) * 10.0}
    tx, _ = make_grouped_optimizer(
        flat,
        base_lr_schedule=lambda s: 1.0,
        groups=[{"name": "nodecay", "patterns": ["a/*"], "lr_scale": 1.0,
                 "weight_decay": 0.0}],
        weight_decay=0.5,
        max_grad_norm=None,
    )
    state = tx.init(flat)
    grads = jax.tree_util.tree_map(jnp.zeros_like, flat)
    updates, _ = tx.update(grads, state, flat)
    assert float(jnp.abs(updates[("a", "w")]).max()) == pytest.approx(0.0, abs=1e-9)
    assert float(jnp.abs(updates[("b", "w")]).max()) > 1.0  # wd pulls toward 0


# --- dist utils (single-process degradation, SURVEY §4) ---------------------


def test_all_gather_objects_single():
    from sam3_lora_tpu.parallel.dist_utils import (
        all_gather_objects,
        broadcast_object,
        get_rank,
        get_world_size,
        is_main_process,
    )

    assert get_world_size() == 1 and get_rank() == 0 and is_main_process()
    payload = {"preds": np.arange(5), "name": "x"}
    out = all_gather_objects(payload)
    assert len(out) == 1 and out[0]["name"] == "x"
    assert broadcast_object(payload)["name"] == "x"


def test_filesystem_gather(tmp_path):
    from sam3_lora_tpu.parallel.dist_utils import filesystem_gather

    out = filesystem_gather({"rank_data": [1, 2, 3]}, str(tmp_path), tag="t")
    assert out == [{"rank_data": [1, 2, 3]}]
    # cleanup removed the shard files
    import os

    assert not any(f.endswith(".pkl") for f in os.listdir(tmp_path))
