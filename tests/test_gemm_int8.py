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
    # qkv/proj measured SLOWER through the kernel (bench_gemm A/B) — gated out
    assert not gemm_int8.supported(41472, 1024, 3072)
    assert not gemm_int8.supported(41472, 1024, 1024)
    assert not gemm_int8.supported(41471, 4736, 1024)  # M not 32-aligned
    assert not gemm_int8.supported(256, 1000, 4736)    # K not lane-aligned
    assert not gemm_int8.supported(256, 4096, 4096)    # W panel > budget


def test_prequant_matmul_routes_and_grads_match(interpret):
    """int8_matmul_prequant through the kernel: forward matches the XLA
    expression and dx (custom VJP, unchanged) stays exact."""
    key = jax.random.PRNGKey(3)
    # n >= 4096 so the routing gate actually admits the kernel
    x = jax.random.normal(key, (64, 128), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 4736), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    ct = jax.random.normal(jax.random.fold_in(key, 2), (64, 4736), jnp.float32)
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
    x = jax.random.normal(key, (64, 128), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 4736), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    ct = jax.random.normal(jax.random.fold_in(key, 2), (64, 4736), jnp.float32)
    assert gemm_int8.supported_nt(64, 128, 4736)
    dx = jax.grad(
        lambda x: jnp.sum(quant.int8_matmul_prequant(x, wq, ws) * ct)
    )(x)
    w_deq = wq.astype(jnp.float32) * ws
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(ct @ w_deq.T), rtol=1e-4, atol=1e-4
    )


def test_batched_leading_dims_flatten(interpret):
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 32, 128), jnp.float32)  # (B, L, K)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 4736), jnp.float32)
    wq, ws = jax.jit(quant.quantize_weight)(w)
    assert quant._kernel_ok(x, wq)
    got = quant.int8_matmul_prequant(x, wq, ws)
    ref = _xla_ref(x, wq, ws)
    assert got.shape == (2, 32, 4736)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4
    )
