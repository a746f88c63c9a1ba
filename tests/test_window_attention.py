"""Parity tests for the fused window-attention Pallas kernels, run off-TPU via
the Pallas interpreter (``window_attention._FORCE_INTERPRET``).

Oracle: the plain XLA attention expression (``dot_product_attention``
impl="xla"), plus ``apply_rope_half`` for the fused-RoPE variant. Covers
forward and dq/dk/dv for both the plain kernel and the RoPE-fused kernel
(which must also invert the rotation on dq/dk).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops import window_attention as wa
from sam3_lora_tpu.ops.attention import dot_product_attention
from sam3_lora_tpu.ops.rope import apply_rope_half, compute_axial_freqs

pytestmark = pytest.mark.fast


@pytest.fixture(params=[False, True], ids=["grouped", "packed"])
def interpret_kernels(monkeypatch, request):
    """Runs every kernel parity test in both block layouts: the head-grouped
    (1, G, L, D) layout and the head-pair-packed (wpp, L, 2D) lane layout
    (wa._PACKED; D%64 gate relaxed under the interpreter)."""
    monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(wa, "_PACKED", request.param)


def _qkv(b=2, h=4, l=64, d=16, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, l, d), dtype)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d), dtype)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, l, d), dtype)
    return q, k, v


def _maxerr(a, b):
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_window_kernel_fwd_and_grads_match_xla(interpret_kernels, dtype, tol):
    q, k, v = _qkv(dtype=dtype)
    scale = q.shape[-1] ** -0.5

    out_k = wa.window_attention(q, k, v, scale)
    out_o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert _maxerr(out_k, out_o) < tol

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * c),
            argnums=(0, 1, 2),
        )

    gk = loss(lambda q, k, v: wa.window_attention(q, k, v, scale))(q, k, v)
    go = loss(
        lambda q, k, v: dot_product_attention(q, k, v, impl="xla", scale=scale)
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, go):
        assert _maxerr(a, b) < tol * 10, name


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_window_rope_kernel_matches_unfused(interpret_kernels, dtype, tol):
    """Fused-RoPE kernel == apply_rope_half outside + plain attention."""
    q, k, v = _qkv(l=36, d=16, dtype=dtype)  # 6x6 grid
    scale = q.shape[-1] ** -0.5
    angles = compute_axial_freqs(q.shape[-1], 6, 6)
    cos = jnp.asarray(np.cos(angles))
    sin = jnp.asarray(np.sin(angles))

    def oracle(q, k, v):
        qr = apply_rope_half(q, cos, sin)
        kr = apply_rope_half(k, cos, sin)
        return dot_product_attention(qr, kr, v, impl="xla", scale=scale)

    out_k = wa.window_attention_rope(q, k, v, scale, cos, sin)
    out_o = oracle(q, k, v)
    assert _maxerr(out_k, out_o) < tol

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * c),
            argnums=(0, 1, 2),
        )

    gk = loss(
        lambda q, k, v: wa.window_attention_rope(q, k, v, scale, cos, sin)
    )(q, k, v)
    go = loss(oracle)(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, go):
        assert _maxerr(a, b) < tol * 10, name


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_mxu_sum_variant_matches_oracle(
    interpret_kernels, monkeypatch, dtype, tol
):
    """SAM3_WINDOW_MXU_SUM (rowsum as a ones-column of the PV matmul + exp2
    scores) must match the XLA oracle in both kernels, fwd and grads."""
    monkeypatch.setattr(wa, "_MXU_SUM", True)
    q, k, v = _qkv(l=36, d=16, dtype=dtype)
    scale = q.shape[-1] ** -0.5
    angles = compute_axial_freqs(q.shape[-1], 6, 6)
    cos = jnp.asarray(np.cos(angles))
    sin = jnp.asarray(np.sin(angles))

    out_k = wa.window_attention(q, k, v, scale)
    out_o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert _maxerr(out_k, out_o) < tol

    def rope_oracle(q, k, v):
        qr = apply_rope_half(q, cos, sin)
        kr = apply_rope_half(k, cos, sin)
        return dot_product_attention(qr, kr, v, impl="xla", scale=scale)

    out_kr = wa.window_attention_rope(q, k, v, scale, cos, sin)
    assert _maxerr(out_kr, rope_oracle(q, k, v)) < tol

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * c),
            argnums=(0, 1, 2),
        )

    gk = loss(
        lambda q, k, v: wa.window_attention_rope(q, k, v, scale, cos, sin)
    )(q, k, v)
    go = loss(rope_oracle)(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, go):
        assert _maxerr(a, b) < tol * 10, name

    # the PLAIN kernel's backward must also hold under _MXU_SUM
    gkp = loss(lambda q, k, v: wa.window_attention(q, k, v, scale))(q, k, v)
    gop = loss(
        lambda q, k, v: dot_product_attention(q, k, v, impl="xla", scale=scale)
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gkp, gop):
        assert _maxerr(a, b) < tol * 10, name


@pytest.mark.parametrize("mxu_sum", [False, True])
def test_clamp_variant_matches_oracle(interpret_kernels, monkeypatch, mxu_sum):
    """SAM3_WINDOW_CLAMP (exp(min(s, 70)) — one VPU pass instead of the
    max-reduce + subtract) must be exact for bounded logits, and must stay
    FINITE (soft saturation, not NaN) for scores past the clamp."""
    monkeypatch.setattr(wa, "_CLAMP_MAX", True)
    monkeypatch.setattr(wa, "_MXU_SUM", mxu_sum)
    q, k, v = _qkv(l=36, d=16)
    scale = q.shape[-1] ** -0.5

    out_k = wa.window_attention(q, k, v, scale)
    out_o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert _maxerr(out_k, out_o) < 2e-5

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * c),
            argnums=(0, 1, 2),
        )

    gk = loss(lambda q, k, v: wa.window_attention(q, k, v, scale))(q, k, v)
    go = loss(
        lambda q, k, v: dot_product_attention(q, k, v, impl="xla", scale=scale)
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, go):
        assert _maxerr(a, b) < 2e-4, name

    # scores far past the clamp: raw exp would be inf/NaN, clamp saturates
    big = wa.window_attention(q * 500.0, k * 500.0, v, scale)
    assert bool(jnp.isfinite(big.astype(jnp.float32)).all())


@pytest.mark.parametrize("mxu_sum", [False, True])
def test_no_max_variant_matches_oracle(interpret_kernels, monkeypatch, mxu_sum):
    """SAM3_WINDOW_NO_MAX (skip the softmax max-subtraction) must be exact for
    bounded logits — fwd and grads, plain and RoPE-fused kernels, with and
    without _MXU_SUM's exp2 path."""
    monkeypatch.setattr(wa, "_NO_MAX", True)
    monkeypatch.setattr(wa, "_MXU_SUM", mxu_sum)
    q, k, v = _qkv(l=36, d=16)
    scale = q.shape[-1] ** -0.5
    angles = compute_axial_freqs(q.shape[-1], 6, 6)
    cos = jnp.asarray(np.cos(angles))
    sin = jnp.asarray(np.sin(angles))

    out_k = wa.window_attention(q, k, v, scale)
    out_o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert _maxerr(out_k, out_o) < 2e-5

    def rope_oracle(q, k, v):
        qr = apply_rope_half(q, cos, sin)
        kr = apply_rope_half(k, cos, sin)
        return dot_product_attention(qr, kr, v, impl="xla", scale=scale)

    assert _maxerr(
        wa.window_attention_rope(q, k, v, scale, cos, sin), rope_oracle(q, k, v)
    ) < 2e-5

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * c),
            argnums=(0, 1, 2),
        )

    gk = loss(
        lambda q, k, v: wa.window_attention_rope(q, k, v, scale, cos, sin)
    )(q, k, v)
    go = loss(rope_oracle)(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, go):
        assert _maxerr(a, b) < 2e-4, name


@pytest.mark.parametrize("mxu_sum", [False, True])
def test_rope_interleave_fwd_matches_unfused(
    interpret_kernels, monkeypatch, mxu_sum
):
    """SAM3_WINDOW_INTERLEAVE composes with the fused-RoPE forward."""
    monkeypatch.setattr(wa, "_INTERLEAVE", True)
    monkeypatch.setattr(wa, "_MXU_SUM", mxu_sum)
    q, k, v = _qkv(l=36, d=16)
    scale = q.shape[-1] ** -0.5
    angles = compute_axial_freqs(q.shape[-1], 6, 6)
    cos = jnp.asarray(np.cos(angles))
    sin = jnp.asarray(np.sin(angles))
    out = wa.window_attention_rope(q, k, v, scale, cos, sin)
    qr = apply_rope_half(q, cos, sin)
    kr = apply_rope_half(k, cos, sin)
    ref = dot_product_attention(qr, kr, v, impl="xla", scale=scale)
    assert _maxerr(out, ref) < 2e-5


def test_window_rope_kernel_accepts_bf16_tables(interpret_kernels):
    """grad through window_attention_rope with non-fp32 cos/sin tables must
    not crash (the vjp's zero cotangents must match the primal dtypes)."""
    q, k, v = _qkv(l=36, d=16, dtype=jnp.bfloat16)
    scale = q.shape[-1] ** -0.5
    angles = compute_axial_freqs(q.shape[-1], 6, 6)
    cos = jnp.asarray(np.cos(angles), jnp.bfloat16)
    sin = jnp.asarray(np.sin(angles), jnp.bfloat16)
    g = jax.grad(
        lambda q: jnp.sum(
            wa.window_attention_rope(q, k, v, scale, cos, sin).astype(
                jnp.float32
            )
        )
    )(q)
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_rope_dispatch_cpu_fallback_applies_rotation():
    """dot_product_attention(impl='window', rope_cos=...) off-TPU must rotate
    q/k before falling through to XLA (the env-gated fused path must never
    silently skip RoPE on CPU)."""
    q, k, v = _qkv(l=36, d=16)
    angles = compute_axial_freqs(q.shape[-1], 6, 6)
    cos = jnp.asarray(np.cos(angles))
    sin = jnp.asarray(np.sin(angles))
    out = dot_product_attention(
        q, k, v, impl="window", rope_cos=cos, rope_sin=sin
    )
    qr = apply_rope_half(q, cos, sin)
    kr = apply_rope_half(k, cos, sin)
    ref = dot_product_attention(qr, kr, v, impl="xla")
    assert _maxerr(out, ref) < 1e-6


class TestVitPackedNativeChain:
    """The ViT Attention module's head-pair-packed chain (models/vit.py:
    qkv projection -> (B*H/2, L, 2D) -> window_attention_rope_packed -> merge)
    must match the grouped/XLA path numerically — output AND input grads."""

    def _attn(self):
        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.models.layers import Spec
        from sam3_lora_tpu.models.vit import Attention

        cfg = tiny_model_config()
        spec = Spec(model=cfg, lora=None)
        ws = cfg.vit_window_size
        attn = Attention(spec=spec, input_size=(ws, ws), rope_scale_pos=1.0)
        x = jax.random.normal(
            jax.random.PRNGKey(0), (3, ws, ws, cfg.vit_dim), jnp.float32
        )
        params = attn.init(jax.random.PRNGKey(1), x)
        return attn, params, x

    def test_packed_chain_matches_xla_reference(self, monkeypatch):
        attn, params, x = self._attn()

        def loss(x):
            return jnp.sum(attn.apply(params, x).astype(jnp.float32) ** 2)

        # reference: CPU fallthrough (packed_native_ok False w/o interpret)
        monkeypatch.setattr(wa, "_FORCE_INTERPRET", False)
        ref = attn.apply(params, x)
        ref_g = jax.grad(loss)(x)

        # packed-native chain via the Pallas interpreter
        monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)
        monkeypatch.setattr(wa, "_PACKED", True)
        assert wa.packed_native_ok(2, attn.spec.model.vit_dim // 2)
        got = attn.apply(params, x)
        got_g = jax.grad(loss)(x)

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), atol=2e-4, rtol=1e-4)
