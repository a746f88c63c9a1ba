"""Parity tests for the whole-weight-resident int8 GEMM Pallas kernel
(``ops/gemm_int8.py``) vs the XLA W8A8 expression (``ops/quant.py``), run
off-TPU via the Pallas interpreter.

The two paths share the quantization scheme exactly (same per-row s_x,
per-channel s_w, same rounding), so outputs must agree to float rounding on
the final scaled product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops import gemm_int8, quant

pytestmark = pytest.mark.fast


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setattr(gemm_int8, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(gemm_int8, "GEMM_KERNEL", True)


def _xla_ref(x, wq, ws):
    xq, xs = quant._quant_lastdim(x)
    return (quant._int8_dot(xq, wq).astype(jnp.float32) * xs * ws).astype(
        x.dtype
    )


@pytest.mark.parametrize(
    "m,k,n", [(64, 128, 256), (96, 256, 128), (256, 128, 384)]
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_int8_path(interpret, m, k, n, dtype):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    got = gemm_int8.int8_gemm_wres(x, wq, ws, out_dtype=dtype)
    ref = _xla_ref(x, wq, ws)
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-3 if dtype == jnp.bfloat16 else err / scale < 1e-6


def test_zero_rows_quantize_to_zero(interpret):
    x = jnp.zeros((32, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 128), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    out = gemm_int8.int8_gemm_wres(x, wq, ws, out_dtype=jnp.float32)
    assert np.all(np.asarray(out) == 0.0)


def test_supported_gating():
    assert gemm_int8.supported(41472, 1024, 4736)   # fc1
    assert gemm_int8.supported(41472, 4736, 1024)   # fc2
    assert gemm_int8.supported(41472, 1024, 3072)   # qkv (wins at BM=512)
    assert gemm_int8.supported(41472, 1024, 1024)   # proj
    assert not gemm_int8.supported(41471, 4736, 1024)  # M not 32-aligned
    assert not gemm_int8.supported(256, 1000, 4736)    # K not lane-aligned
    assert not gemm_int8.supported(256, 4096, 4096)    # W panel > budget


def test_prequant_matmul_routes_and_grads_match(interpret):
    """int8_matmul_prequant through the kernel: forward matches the XLA
    expression and dx (custom VJP, unchanged) stays exact."""
    key = jax.random.PRNGKey(3)
    # n >= 4096 so the routing gate actually admits the kernel
    x = jax.random.normal(key, (128, 128), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 4736), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    ct = jax.random.normal(jax.random.fold_in(key, 2), (128, 4736), jnp.float32)
    assert quant._kernel_ok(x, wq)

    def loss(x):
        return jnp.sum(quant.int8_matmul_prequant(x, wq, ws) * ct)

    ref = _xla_ref(x, wq, ws)
    got = quant.int8_matmul_prequant(x, wq, ws)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4
    )
    # dx = ct @ dequant(W)^T regardless of the forward implementation
    dx = jax.grad(loss)(x)
    w_deq = (wq.astype(jnp.float32) * ws).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(ct @ w_deq.T), rtol=1e-4, atol=1e-4
    )


def test_bf16_nt_kernel_matches_dot_general(interpret):
    key = jax.random.PRNGKey(5)
    m, k, n = 64, 256, 128
    dy = jax.random.normal(key, (m, n), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.float32)
    got = gemm_int8.bf16_gemm_wres_nt(dy, w, out_dtype=jnp.float32)
    ref = jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bwd_kernel_routing_dx_exact(interpret, monkeypatch):
    """With SAM3_GEMM_BWD_KERNEL on, int8_matmul_prequant's dx routes
    through bf16_gemm_wres_nt and stays exact vs ct @ dequant(W)^T."""
    monkeypatch.setattr(gemm_int8, "GEMM_BWD_KERNEL", True)
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (128, 128), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 4736), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    ct = jax.random.normal(jax.random.fold_in(key, 2), (128, 4736), jnp.float32)
    assert gemm_int8.supported_nt(64, 128, 4736)
    dx = jax.grad(
        lambda x: jnp.sum(quant.int8_matmul_prequant(x, wq, ws) * ct)
    )(x)
    w_deq = wq.astype(jnp.float32) * ws
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(ct @ w_deq.T), rtol=1e-4, atol=1e-4
    )


def test_fused_lora_gemm_matches_unfused_chain(interpret):
    """int8_lora_matmul_prequant (fused kernel) vs the unfused reference:
    base dequant GEMM + (x@A)@B*scale in the compute dtype — forward AND
    dx/dA/dB gradients (mirroring models/layers.py's XLA chain autodiff)."""
    key = jax.random.PRNGKey(7)
    m, k, n, r = 64, 128, 4736, 32
    scale = 2.0
    x = jax.random.normal(key, (m, k), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    la = jax.random.normal(jax.random.fold_in(key, 2), (k, r), jnp.float32)
    lb = jax.random.normal(jax.random.fold_in(key, 3), (r, n), jnp.float32)
    ct = jax.random.normal(jax.random.fold_in(key, 4), (m, n), jnp.float32)

    def unfused(x, la, lb):
        y = _xla_ref(x, wq, ws)
        delta = (x @ la) @ lb
        return y + delta * scale

    def fused_loss(x, la, lb):
        return jnp.sum(
            quant.int8_lora_matmul_prequant(x, wq, ws, la, lb, scale) * ct
        )

    got = quant.int8_lora_matmul_prequant(x, wq, ws, la, lb, scale)
    ref = unfused(x, la, lb)
    sc = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / sc < 1e-5

    dx, da, db = jax.grad(fused_loss, argnums=(0, 1, 2))(x, la, lb)
    # reference grads: the custom-VJP semantics (dx through the DEQUANTIZED
    # weight — NOT autodiff of the round()-containing quantization
    # expression, whose dx is zero-a.e.-plus-amax-terms garbage) + the plain
    # adapter chain
    w_deq = wq.astype(jnp.float32) * ws
    rx = ct @ w_deq.T + scale * (ct @ lb.T) @ la.T
    ra = scale * x.T @ (ct @ lb.T)
    rb = scale * (x @ la).T @ ct
    for g, rref in ((dx, rx), (da, ra), (db, rb)):
        s_ = float(jnp.max(jnp.abs(rref))) + 1e-6
        assert float(jnp.max(jnp.abs(g - rref))) / s_ < 1e-4


def test_lora_linear_fused_path_matches_unfused(interpret, monkeypatch):
    monkeypatch.setattr(gemm_int8, "GEMM_LORA_FUSED", True)
    """Model-level: a prequantized LoRALinear whose shape qualifies routes
    through the fused base+adapter kernel (TPU/interpret only) and matches
    the unfused path (SAM3_GEMM_KERNEL=0) to bf16-rounding tolerance, with
    identical param structure."""
    import flax.linen as nn

    from sam3_lora_tpu.config import LoRAConfig, ModelConfig
    from sam3_lora_tpu.models.layers import LoRALinear, Spec
    from sam3_lora_tpu.ops.quant import prequantize_tree

    mcfg = ModelConfig(
        dtype="float32", param_dtype="float32", base_quant="int8",
        base_quant_min_dim=512,
    )
    lcfg = LoRAConfig(rank=32, alpha=64.0, dropout=0.0, target_modules=("big",))
    spec = Spec(model=mcfg, lora=lcfg)

    class Wrap(nn.Module):
        spec: Spec

        @nn.compact
        def __call__(self, x, train=False):
            return LoRALinear(features=4736, spec=self.spec, name="big")(
                x, train=train
            )

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (64, 1024), jnp.float32)
    m = Wrap(spec=spec)
    params = m.init(jax.random.fold_in(key, 1), x)
    # give lora_b nonzero values so the adapter actually contributes
    params = jax.tree_util.tree_map(lambda v: v, params)
    import flax

    pdict = flax.core.unfreeze(params)
    pdict["params"]["big"]["lora_b"] = (
        jax.random.normal(jax.random.fold_in(key, 2), (32, 4736), jnp.float32)
        * 0.02
    )
    pdict["params"] = prequantize_tree(pdict["params"], min_dim=512)
    assert pdict["params"]["big"]["kernel"].dtype == jnp.int8

    y_fused = m.apply(pdict, x, train=True)
    try:
        gemm_int8.GEMM_KERNEL = False
        y_unfused = m.apply(pdict, x, train=True)
    finally:
        gemm_int8.GEMM_KERNEL = True
    s = float(jnp.max(jnp.abs(y_unfused))) + 1e-6
    assert float(jnp.max(jnp.abs(y_fused - y_unfused))) / s < 1e-5


def test_batched_leading_dims_flatten(interpret):
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 64, 128), jnp.float32)  # (B, L, K)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 4736), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    assert quant._kernel_ok(x, wq)
    got = quant.int8_matmul_prequant(x, wq, ws)
    ref = _xla_ref(x, wq, ws)
    assert got.shape == (2, 64, 4736)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4
    )
