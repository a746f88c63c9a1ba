"""int8 frozen-base GEMM tier (ops/quant.py + LoRALinear base_quant).

No reference analogue (the reference's perf tier is fp8 attention only,
sam3/perflib/fa3.py); these tests pin the quantization scheme's own contract:
fwd W8A8 within dynamic-quant error, bwd exact w.r.t. the dequantized weight,
and the LoRALinear wiring (threshold gating + adapter-grad exactness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops.quant import int8_matmul, quantize_weight


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_forward_close_to_fp32(rng):
    x = jax.random.normal(jax.random.fold_in(rng, 1), (64, 1024), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 2), (1024, 512), jnp.float32) * 0.02
    y = int8_matmul(x, w, False)
    y_ref = x @ w
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 0.03  # dynamic W8A8: both operands carry <=1/254 rel noise


def test_weight_quant_grid(rng):
    # Per-channel symmetric: |w - dequant(w)| <= ws/2 elementwise, and the
    # channel max hits the grid end exactly (127 * ws).
    w = jax.random.normal(jax.random.fold_in(rng, 4), (256, 128), jnp.float32)
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (1, 128)
    wdq = np.asarray(wq.astype(jnp.float32) * ws)
    err = np.abs(np.asarray(w) - wdq)
    assert np.all(err <= np.asarray(ws)[0] / 2 + 1e-7)
    np.testing.assert_allclose(
        np.abs(np.asarray(w)).max(axis=0), np.abs(wdq).max(axis=0), rtol=1e-5
    )


def test_backward_exact_vs_dequant_weight(rng):
    # Linear head => dy is constant => dx must equal dy @ dequant(W)^T exactly.
    x = jax.random.normal(jax.random.fold_in(rng, 5), (16, 512), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 6), (512, 256), jnp.float32) * 0.05
    c = jax.random.normal(jax.random.fold_in(rng, 7), (16, 256), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(int8_matmul(x, w, False) * c))(x)
    wq, ws = quantize_weight(w)
    wdq = wq.astype(jnp.float32) * ws
    g_ref = jax.grad(lambda x: jnp.sum((x @ wdq) * c))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_backward_int8_variant_close(rng):
    x = jax.random.normal(jax.random.fold_in(rng, 8), (16, 512), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 9), (512, 256), jnp.float32) * 0.05
    c = jax.random.normal(jax.random.fold_in(rng, 10), (16, 256), jnp.float32)
    g8 = jax.grad(lambda x: jnp.sum(int8_matmul(x, w, True) * c))(x)
    wq, ws = quantize_weight(w)
    wdq = wq.astype(jnp.float32) * ws
    g_ref = jax.grad(lambda x: jnp.sum((x @ wdq) * c))(x)
    rel = float(jnp.max(jnp.abs(g8 - g_ref)) / jnp.max(jnp.abs(g_ref)))
    assert rel < 0.03


def test_bf16_and_batched_and_jit(rng):
    x = jax.random.normal(jax.random.fold_in(rng, 11), (2, 8, 1024), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(rng, 12), (1024, 512), jnp.float32)
    y = jax.jit(lambda x: int8_matmul(x, w, False))(x)
    assert y.shape == (2, 8, 512) and y.dtype == jnp.bfloat16
    g = jax.jit(
        jax.grad(lambda x: jnp.sum(int8_matmul(x, w, False).astype(jnp.float32)))
    )(x)
    assert g.shape == x.shape and g.dtype == jnp.bfloat16


def test_zero_rows_and_channels(rng):
    x = jnp.zeros((4, 64), jnp.float32)
    w = jnp.zeros((64, 32), jnp.float32)
    y = int8_matmul(x, w, False)
    assert np.all(np.isfinite(np.asarray(y))) and float(jnp.abs(y).max()) == 0.0


def test_lora_linear_base_quant_gating_and_adapter_grads(rng):
    """base_quant wires into LoRALinear above min_dim only; adapter grads stay
    exact for the quantized forward (y = q(W)x + BAx)."""
    from sam3_lora_tpu.config import LoRAConfig, ModelConfig
    from sam3_lora_tpu.models.layers import LoRALinear, Spec

    mcfg = ModelConfig(
        dtype="float32", param_dtype="float32", base_quant="int8", base_quant_min_dim=512
    )
    lcfg = LoRAConfig(rank=4, alpha=8.0, dropout=0.0, target_modules=("big",))
    spec = Spec(model=mcfg, lora=lcfg)

    import flax.linen as nn

    class Wrap(nn.Module):
        spec: Spec
        feat: int

        @nn.compact
        def __call__(self, x):
            # LoRA path targeting works on the module path, so the Linear must
            # be a *submodule* named "big" (root modules have an empty path)
            return LoRALinear(features=self.feat, spec=self.spec, name="big")(x)

    x = jax.random.normal(jax.random.fold_in(rng, 13), (4, 1024), jnp.float32)
    big = Wrap(spec=spec, feat=1024)
    params = big.init(jax.random.fold_in(rng, 14), x)

    # quantized forward == q(W) x + b + scaled BA x (B zero-init => just base)
    y = big.apply(params, x)
    k = params["params"]["big"]["kernel"]
    b = params["params"]["big"]["bias"]
    wq, ws = quantize_weight(k)
    # x here is NOT on the int8 grid, so compare against the full scheme
    y_manual = int8_matmul(x, k, False) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_manual), rtol=1e-5, atol=1e-5)

    # adapter grad nonzero and finite under the quantized base (lora_b: with
    # B zero-init, grad_A is structurally zero at init but grad_B is not)
    def loss(p):
        return jnp.sum(big.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    gb = np.asarray(g["params"]["big"]["lora_b"])
    assert np.all(np.isfinite(gb)) and np.abs(gb).max() > 0

    # below min_dim: plain fp path (bit-identical to base_quant="none")
    xs = jax.random.normal(jax.random.fold_in(rng, 15), (4, 128), jnp.float32)
    small = Wrap(spec=spec, feat=128)
    ps = small.init(jax.random.fold_in(rng, 16), xs)
    spec_off = Spec(model=ModelConfig(dtype="float32", param_dtype="float32"), lora=lcfg)
    small_off = Wrap(spec=spec_off, feat=128)
    np.testing.assert_array_equal(
        np.asarray(small.apply(ps, xs)), np.asarray(small_off.apply(ps, xs))
    )


@pytest.mark.fast
def test_prequantize_base_bit_identical(rng):
    """prequantize_base + int8_matmul_prequant == dynamic int8 path exactly
    (same (wq, ws) derivation, same int8 dot, same rescale)."""
    from sam3_lora_tpu.config import LoRAConfig, ModelConfig
    from sam3_lora_tpu.models.layers import LoRALinear, Spec
    from sam3_lora_tpu.ops.quant import prequantize_base
    from sam3_lora_tpu.train.trainer import merge_trainable, split_trainable

    import flax.linen as nn

    mcfg = ModelConfig(
        dtype="float32", param_dtype="float32", base_quant="int8",
        base_quant_min_dim=512,
    )
    lcfg = LoRAConfig(rank=4, alpha=8.0, dropout=0.0, target_modules=("big",))
    spec = Spec(model=mcfg, lora=lcfg)

    class Wrap(nn.Module):
        spec: Spec
        feat: int
        perm: tuple = None

        @nn.compact
        def __call__(self, x):
            return LoRALinear(
                features=self.feat, spec=self.spec, name="big",
                out_perm=self.perm,
            )(x)

    x = jax.random.normal(jax.random.fold_in(rng, 20), (4, 1024), jnp.float32)
    for perm in (None, tuple(np.random.RandomState(0).permutation(1024))):
        m = Wrap(spec=spec, feat=1024, perm=perm)
        params = m.init(jax.random.fold_in(rng, 21), x)
        y_dyn = m.apply(params, x)
        trainable, frozen = split_trainable(params)

        # grads w.r.t. the adapters only (the production train step never
        # differentiates the frozen tree — int8 leaves are not inexact)
        def loss(tr, fr):
            return jnp.sum(m.apply(merge_trainable(tr, fr), x) ** 2)

        g_dyn = jax.grad(loss)(trainable, frozen)
        frozen_q = prequantize_base(frozen, min_dim=512)
        k = ("params", "big", "kernel")
        assert frozen_q[k].dtype == jnp.int8
        y_pre = m.apply(merge_trainable(trainable, frozen_q), x)
        g_pre = jax.grad(loss)(trainable, frozen_q)
        np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))
        kb = ("params", "big", "lora_b")
        np.testing.assert_array_equal(np.asarray(g_dyn[kb]), np.asarray(g_pre[kb]))


@pytest.mark.fast
def test_trainer_fit_with_prequantized_base(tmp_path):
    """Full Trainer.fit with base_quant=int8: the frozen tree is pre-quantized
    once (kernel leaves become int8) and training still converges finitely."""
    import os

    from sam3_lora_tpu.config import LoRAConfig, TrainConfig, tiny_model_config
    from sam3_lora_tpu.train.data import (
        COCOSegmentDataset,
        DataLoader,
        make_synthetic_coco,
    )
    from sam3_lora_tpu.train.trainer import Trainer

    root = str(tmp_path / "ds")
    make_synthetic_coco(root, "train", num_images=8, img_size=56)
    cfg = tiny_model_config(base_quant="int8", base_quant_min_dim=16)
    tr = Trainer(
        model_cfg=cfg,
        lora_cfg=LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2")),
        train_cfg=TrainConfig(
            batch_size=4, num_epochs=2, logging_steps=1,
            output_dir=str(tmp_path / "out"), learning_rate=1e-3,
        ),
    )
    ds = COCOSegmentDataset(root, "train", model_config=cfg)
    res = tr.fit(DataLoader(ds, 4, seed=0), None)
    assert np.isfinite(res["history"]["train_loss"]).all()
    n_int8 = sum(
        1 for k, v in tr.state.frozen.items()
        if k[-1] == "kernel" and v.dtype == jnp.int8
    )
    assert n_int8 > 0, "no frozen kernel was pre-quantized"


def test_base_checkpoint_roundtrip_across_quant_configs(tmp_path, rng):
    """A base checkpoint saved from a non-quant model loads STRICTLY into a
    quant-enabled model (kernel_scale leaves are quant-tier params filled by
    prequantize_base, never part of a converted checkpoint), and vice versa."""
    import jax.random as jrandom

    from sam3_lora_tpu.config import LoRAConfig, tiny_model_config
    from sam3_lora_tpu.models import build_sam3_image_model, init_model
    from sam3_lora_tpu.utils.checkpoint import (
        load_base_checkpoint,
        save_base_checkpoint,
    )

    lora = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
    plain = build_sam3_image_model(tiny_model_config(), lora=lora)
    quant = build_sam3_image_model(
        tiny_model_config(base_quant="int8", base_quant_min_dim=16), lora=lora
    )
    p_plain = init_model(plain, jrandom.PRNGKey(0))
    p_quant = init_model(quant, jrandom.PRNGKey(1))

    path = str(tmp_path / "base.npz")
    save_base_checkpoint(p_plain, path)
    loaded, n = load_base_checkpoint(p_quant, path, strict=True)
    assert n > 0
    # quant-only leaves survive untouched; base leaves match the checkpoint
    from flax import traverse_util

    flat_src = traverse_util.flatten_dict(p_plain)
    flat_dst = traverse_util.flatten_dict(loaded)
    for k, v in flat_dst.items():
        if k[-1] == "kernel_scale":
            continue
        if k[-1] in ("lora_a", "lora_b"):
            continue
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(flat_src[k], np.float32),
            err_msg=str(k),
        )

    # reverse direction: checkpoint saved from the quant model must not leak
    # kernel_scale keys (they would break strict load into a plain model)
    path2 = str(tmp_path / "base2.npz")
    save_base_checkpoint(p_quant, path2)
    load_base_checkpoint(p_plain, path2, strict=True)


@pytest.mark.slow
def test_multichip_int8_fsdp_train_step():
    """The headline-bench combination on the virtual mesh: int8-prequantized
    frozen base, FSDP-sharded over the data axis of an 8-device (4,2) mesh,
    one jitted train step compiles and yields a finite loss. De-risks the
    sharded-int8 path (int8 kernel leaves + f32 scale siblings under GSPMD)
    that single-device tests cannot see."""
    import jax
    import optax

    from sam3_lora_tpu.config import LoRAConfig, tiny_model_config
    from sam3_lora_tpu.models import build_sam3_image_model, init_model
    from sam3_lora_tpu.models.builder import dummy_batch
    from sam3_lora_tpu.ops.quant import prequantize_base
    from sam3_lora_tpu.parallel import (
        make_mesh,
        param_shardings,
        replicated,
        shard_batch,
    )
    from sam3_lora_tpu.train.losses import LossConfig
    from sam3_lora_tpu.train.trainer import make_train_step, split_trainable

    cfg = tiny_model_config(base_quant="int8", base_quant_min_dim=16)
    lcfg = LoRAConfig(rank=2, alpha=4.0, target_modules=("fc1", "fc2"))
    model = build_sam3_image_model(cfg, lora=lcfg)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    b = mesh.shape["data"] * 2
    batch = dummy_batch(cfg, batch_size=b, with_targets=True)

    with mesh:
        params = init_model(model, jax.random.PRNGKey(0), train=False)
        params = jax.device_put(
            params, param_shardings(params, mesh, shard_base=True)
        )
        trainable, frozen = split_trainable(params)
        frozen = prequantize_base(frozen, min_dim=16)
        n_int8 = sum(
            1 for k, v in frozen.items()
            if k[-1] == "kernel" and v.dtype == jnp.int8
        )
        assert n_int8 > 0
        tx = optax.sgd(1e-2)
        opt_state = jax.device_put(tx.init(trainable), replicated(mesh))
        step = make_train_step(model, tx, LossConfig(), accum=2, mesh=mesh)
        trainable, opt_state, losses = step(
            trainable, frozen, opt_state, shard_batch(batch, mesh),
            jax.random.PRNGKey(1),
        )
        assert np.isfinite(float(losses["core_loss"]))
