"""Tests for the clamp-softmax safety rails (ADVICE r4 #1 + VERDICT r4 #6).

1. The _RS_EPS reciprocal guard: a fully-degenerate row (every score below
   the f32 exp underflow line, so rowsum(e) == 0 under clamp mode) must
   produce finite ~0 outputs and finite gradients instead of 0 * inf = NaN —
   in both the window and the long kernel (Pallas interpreter).
2. The SAM3_SOFTMAX_CHECK debug env (ops/softmax_check.py): records max|s|
   per attention call on plain/packed/RoPE layouts and on the XLA oracle
   path, and assert_margin() trips when the clamp-exactness bound is
   violated — the runtime check the golden-checkpoint test runs the day real
   weights land.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops import long_attention as la
from sam3_lora_tpu.ops import softmax_check
from sam3_lora_tpu.ops import window_attention as wa
from sam3_lora_tpu.ops.attention import dot_product_attention
from sam3_lora_tpu.ops.rope import apply_rope_half

pytestmark = pytest.mark.fast


def _degenerate_qkv(b, h, l, d, dtype=jnp.float32):
    """Scores s = scale * q.k == -150 for EVERY pair: exp underflows to an
    exact 0 in f32 (below even the denormal range), so rowsum == 0 without
    the _RS_EPS guard and 1/rowsum would be inf -> NaN outputs."""
    scale = d**-0.5
    # q = a*ones, k = -ones -> s = -a*d*scale; pick a so s = -150
    a = 150.0 / (d * scale)
    q = jnp.full((b, h, l, d), a, dtype)
    k = jnp.full((b, h, l, d), -1.0, dtype)
    v = jax.random.normal(jax.random.PRNGKey(0), (b, h, l, d), dtype)
    return q, k, v, scale


def test_window_degenerate_row_finite(monkeypatch):
    monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)
    assert wa._CLAMP_MAX, "clamp must be the default for this test"
    q, k, v, scale = _degenerate_qkv(1, 2, 64, 16)
    out = wa.window_attention(q, k, v, scale)
    assert np.all(np.isfinite(np.asarray(out)))
    # degenerate rows output ~0 (rowsum eps-dominated), never NaN
    assert float(jnp.max(jnp.abs(out))) < 1e-3
    c = jnp.ones_like(out)
    grads = jax.grad(
        lambda q, k, v: jnp.sum(wa.window_attention(q, k, v, scale) * c),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_long_degenerate_row_finite(monkeypatch):
    monkeypatch.setattr(la, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(la, "LONG_ATTENTION", True)
    assert la._SOFTMAX_MODE == "clamp", "clamp must be the default"
    q, k, v, scale = _degenerate_qkv(1, 4, 320, 32)
    out = la.long_attention(q, k, v, scale)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.max(jnp.abs(out))) < 1e-3
    c = jnp.ones_like(out)
    grads = jax.grad(
        lambda q, k, v: jnp.sum(la.long_attention(q, k, v, scale) * c),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_exp2_fold_matches_oracle_window(monkeypatch):
    """SAM3_WINDOW_EXP2: log2(e) folded into the score scale + bare exp2 —
    forward and grads must match the XLA oracle (gradient scalings are
    invariant because log2e*ln2 == 1)."""
    monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(wa, "_EXP2", True)
    assert wa._CLAMP_MAX
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (1, 2, 64, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.float32)
    scale = q.shape[-1] ** -0.5
    out = wa.window_attention(q, k, v, scale)
    ref = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-5
    c = jax.random.normal(jax.random.fold_in(key, 3), q.shape, jnp.float32)
    g = jax.grad(
        lambda q, k, v: jnp.sum(wa.window_attention(q, k, v, scale) * c),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(
            dot_product_attention(q, k, v, impl="xla", scale=scale) * c
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g, gr):
        assert float(jnp.max(jnp.abs(a - b))) < 3e-4


def test_exp2_fold_matches_oracle_long(monkeypatch):
    monkeypatch.setattr(la, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(la, "LONG_ATTENTION", True)
    monkeypatch.setattr(la, "_EXP2", True)
    assert la._SOFTMAX_MODE == "clamp"
    key = jax.random.PRNGKey(6)
    q = jax.random.normal(key, (1, 4, 320, 32), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.float32)
    scale = q.shape[-1] ** -0.5
    out = la.long_attention(q, k, v, scale)
    ref = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-5
    c = jax.random.normal(jax.random.fold_in(key, 3), q.shape, jnp.float32)
    g = jax.grad(
        lambda q, k, v: jnp.sum(la.long_attention(q, k, v, scale) * c),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(
            dot_product_attention(q, k, v, impl="xla", scale=scale) * c
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g, gr):
        assert float(jnp.max(jnp.abs(a - b))) < 3e-4


def test_normal_rows_unchanged_by_eps(monkeypatch):
    """The reciprocal guard must be invisible on non-degenerate inputs:
    kernel output still matches the XLA oracle tightly."""
    monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 2, 64, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.float32)
    scale = q.shape[-1] ** -0.5
    out = wa.window_attention(q, k, v, scale)
    ref = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_observe_plain_and_packed_record_true_max():
    softmax_check.reset()
    b, l, h, d = 2, 32, 4, 16
    q4 = _rand((b, h, l, d), 0)
    k4 = _rand((b, h, l, d), 1)
    scale = d**-0.5
    expected = float(
        jnp.max(jnp.abs(jnp.einsum("bhqd,bhkd->bhqk", q4, k4) * scale))
    )
    # packed layout (B, L, H*D) with heads adjacent in lanes
    qp = q4.transpose(0, 2, 1, 3).reshape(b, l, h * d)
    kp = k4.transpose(0, 2, 1, 3).reshape(b, l, h * d)
    with softmax_check.enabled():
        softmax_check.observe("packed", qp, kp, scale, d)
    assert len(softmax_check.records) == 1
    tag, got = softmax_check.records[0]
    assert tag == "packed"
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    assert abs(softmax_check.max_observed() - expected) < 1e-4
    softmax_check.reset()


def test_observe_rope_rotates_before_scoring():
    softmax_check.reset()
    l, d = 32, 16
    q = _rand((1, l, d), 0)
    k = _rand((1, l, d), 1)
    ang = _rand((l, d // 2), 2) * 0.5
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    qr = apply_rope_half(q, cos, sin)
    kr = apply_rope_half(k, cos, sin)
    scale = d**-0.5
    expected = float(jnp.max(jnp.abs(jnp.einsum("nqd,nkd->nqk", qr, kr) * scale)))
    with softmax_check.enabled():
        softmax_check.observe("rope", q, k, scale, d, cos, sin)
    np.testing.assert_allclose(softmax_check.records[0][1], expected, rtol=1e-5)
    softmax_check.reset()


def test_xla_path_records_and_margin_asserts():
    softmax_check.reset()
    q = _rand((1, 2, 16, 8), 0) * 40.0  # big scores: |s| >> 60
    k = _rand((1, 2, 16, 8), 1)
    with softmax_check.enabled():
        dot_product_attention(q, k, k, impl="xla")
    assert softmax_check.records and softmax_check.records[0][0] == "xla"
    with pytest.raises(AssertionError, match="margin violated"):
        softmax_check.assert_margin()
    # and passes with a loose bound
    softmax_check.assert_margin(bound=1e9)
    softmax_check.reset()


def test_disabled_records_nothing():
    softmax_check.reset()
    q = _rand((1, 1, 8, 8), 0)
    dot_product_attention(q, q, q, impl="xla")
    softmax_check.observe("x", q[0], q[0], 1.0, 8)
    assert softmax_check.records == []
