"""Parity tests for the qkv-native window kernels (ops/window_qkv.py):
(N, L, 3*dim) in, (N, L, dim) out, vs an XLA oracle built from explicit
head split / merge. Runs on CPU via the Pallas interpreter."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops import window_attention as wa
from sam3_lora_tpu.ops import window_qkv as wq
from sam3_lora_tpu.ops.attention import dot_product_attention
from sam3_lora_tpu.ops.rope import apply_rope_half, compute_axial_freqs

pytestmark = pytest.mark.fast


@pytest.fixture(autouse=True)
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)


def _qkv(n=3, heads=2, l=36, d=16, dtype=jnp.float32, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, (n, l, 3 * heads * d), dtype)


def _oracle(qkv, heads, scale, cos=None, sin=None):
    n, l, td = qkv.shape
    d = td // 3 // heads
    q, k, v = [
        jnp.transpose(
            qkv.reshape(n, l, 3, heads, d)[:, :, i], (0, 2, 1, 3)
        )
        for i in range(3)
    ]
    if cos is not None:
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
    o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(n, l, heads * d)


def _maxerr(a, b):
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


@pytest.mark.parametrize("heads", [2, 3], ids=["even-heads", "odd-heads"])
def test_qkv_forward_matches_oracle(heads):
    qkv = _qkv(heads=heads)
    scale = 0.23
    out = wq.window_attention_qkv(qkv, heads, scale)
    assert out.shape == (qkv.shape[0], qkv.shape[1], qkv.shape[2] // 3)
    assert _maxerr(out, _oracle(qkv, heads, scale)) < 2e-5


@pytest.mark.parametrize("heads", [2, 3], ids=["even-heads", "odd-heads"])
def test_qkv_grads_match_oracle(heads):
    qkv = _qkv(heads=heads)
    scale = 0.23

    def loss_k(qkv):
        return jnp.sum(wq.window_attention_qkv(qkv, heads, scale) ** 2)

    def loss_o(qkv):
        return jnp.sum(_oracle(qkv, heads, scale) ** 2)

    g_k = jax.grad(loss_k)(qkv)
    g_o = jax.grad(loss_o)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_o), atol=3e-4, rtol=1e-4
    )


def test_qkv_rope_forward_and_grads_match_oracle():
    heads, l, d = 2, 36, 16
    qkv = _qkv(heads=heads, l=l, d=d)
    scale = d**-0.5
    angles = compute_axial_freqs(d, 6, 6)
    cos = jnp.asarray(np.cos(angles))
    sin = jnp.asarray(np.sin(angles))

    out = wq.window_attention_rope_qkv(qkv, heads, scale, cos, sin)
    ref = _oracle(qkv, heads, scale, cos, sin)
    assert _maxerr(out, ref) < 2e-5

    def loss_k(qkv):
        return jnp.sum(
            wq.window_attention_rope_qkv(qkv, heads, scale, cos, sin) ** 2
        )

    def loss_o(qkv):
        return jnp.sum(_oracle(qkv, heads, scale, cos, sin) ** 2)

    g_k = jax.grad(loss_k)(qkv)
    g_o = jax.grad(loss_o)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_o), atol=3e-4, rtol=1e-4
    )


def test_qkv_bf16_finite_and_close():
    heads, l, d = 2, 36, 16
    qkv = _qkv(heads=heads, l=l, d=d, dtype=jnp.bfloat16)
    scale = d**-0.5
    out = wq.window_attention_qkv(qkv, heads, scale)
    ref = _oracle(qkv, heads, scale)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert _maxerr(out, ref) < 3e-2


@pytest.mark.parametrize("flag", ["_MXU_SUM", "_NO_MAX"])
def test_qkv_softmax_variants_match_oracle(monkeypatch, flag):
    """The shared softmax-variant flags must produce identical values
    through the qkv-native kernels too."""
    monkeypatch.setattr(wa, flag, True)
    heads = 2
    qkv = _qkv(heads=heads)
    scale = 0.23
    out = wq.window_attention_qkv(qkv, heads, scale)
    assert _maxerr(out, _oracle(qkv, heads, scale)) < 2e-5


class TestVitQkvNativeChain:
    """The ViT Attention module's qkv-native chain (models/vit.py: qkv
    projection -> window_attention_rope_qkv -> output projection, zero
    relayouts) must match the CPU/XLA fallthrough — output AND input grads."""

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

    def test_qkv_native_chain_matches_xla_reference(self, monkeypatch):
        attn, params, x = self._attn()

        def loss(x):
            return jnp.sum(attn.apply(params, x).astype(jnp.float32) ** 2)

        # reference: CPU fallthrough (qkv_native_ok False w/o interpret)
        monkeypatch.setattr(wa, "_FORCE_INTERPRET", False)
        ref = attn.apply(params, x)
        ref_g = jax.grad(loss)(x)

        # qkv-native chain via the Pallas interpreter
        monkeypatch.setattr(wa, "_FORCE_INTERPRET", True)
        monkeypatch.setattr(wq, "QKV_NATIVE", True)
        assert wq.qkv_native_ok(2, attn.spec.model.vit_dim // 2)
        got = attn.apply(params, x)
        got_g = jax.grad(loss)(x)

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(ref_g), atol=2e-4, rtol=1e-4
        )
