"""Parity tests for the whole-KV-resident long-attention Pallas kernel
(``ops/long_attention.py``), run off-TPU via the Pallas interpreter.

Oracle: the plain XLA attention expression (``dot_product_attention``
impl="xla"), plus ``apply_rope_half`` for the fused-RoPE variant. The shapes
exercise everything the 5184-token production cases hit: KV-column padding
(L not a multiple of 128), multiple Q tiles per row (the dK/dV scratch
accumulation), both packing factors (p=4 at D=32, p=2 at D=64), and the
model-level packed dispatches (fusion-encoder MultiHeadAttention and the ViT
global-block chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam3_lora_tpu.ops import long_attention as la
from sam3_lora_tpu.ops.attention import dot_product_attention
from sam3_lora_tpu.ops.rope import apply_rope_half

pytestmark = pytest.mark.fast


@pytest.fixture
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(la, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(la, "LONG_ATTENTION", True)


def _qkv(b, h, l, d, dtype):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, l, d), dtype)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d), dtype)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, l, d), dtype)
    return q, k, v


def _maxerr(a, b):
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


def _grads(fn, q, k, v, c):
    return jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) * c),
        argnums=(0, 1, 2),
    )(q, k, v)


# L=320: pads to Lp=384 (column masking) and splits into 2 Q tiles per row
# (dK/dV accumulate in scratch across sequential grid steps).
@pytest.mark.parametrize(
    "h,d", [(4, 32), (2, 64)], ids=["p4-d32", "p2-d64"]
)
@pytest.mark.parametrize(
    "dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)]
)
def test_long_kernel_fwd_and_grads_match_xla(interpret_kernels, h, d, dtype, tol):
    q, k, v = _qkv(2, h, 320, d, dtype)
    scale = d ** -0.5
    assert la.supported(320, h, d)

    out_k = la.long_attention(q, k, v, scale)
    out_o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert _maxerr(out_k, out_o) < tol

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)
    gk = _grads(lambda q, k, v: la.long_attention(q, k, v, scale), q, k, v, c)
    go = _grads(
        lambda q, k, v: dot_product_attention(q, k, v, impl="xla", scale=scale),
        q, k, v, c,
    )
    for a, b in zip(gk, go):
        assert _maxerr(a, b) < tol


@pytest.mark.parametrize(
    "dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)]
)
def test_long_rope_kernel_matches_unfused(interpret_kernels, dtype, tol):
    b, h, l, d = 1, 4, 320, 32
    q, k, v = _qkv(b, h, l, d, dtype)
    ang = np.random.RandomState(3).randn(l, d // 2).astype(np.float32) * 0.5
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    scale = d ** -0.5
    p = 128 // d

    def kern(q, k, v):
        o = la.long_attention_rope_packed(
            la._pack(q, p), la._pack(k, p), la._pack(v, p), scale, d, cos, sin
        )
        return la._unpack(o, b, h, p)

    def oracle(q, k, v):
        return dot_product_attention(
            apply_rope_half(q, cos, sin), apply_rope_half(k, cos, sin), v,
            impl="xla", scale=scale,
        )

    assert _maxerr(kern(q, k, v), oracle(q, k, v)) < tol
    c = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)
    for a, b in zip(_grads(kern, q, k, v, c), _grads(oracle, q, k, v, c)):
        assert _maxerr(a, b) < tol


def test_clamp_softmax_matches_oracle(interpret_kernels, monkeypatch):
    """SAM3_LONG_SOFTMAX=clamp (exp(min(s, 70)), one VPU pass instead of the
    row-max reduce + subtract) must be exact for bounded logits and finite
    (soft saturation, never NaN) past the clamp."""
    monkeypatch.setattr(la, "_SOFTMAX_MODE", "clamp")
    q, k, v = _qkv(2, 4, 320, 32, jnp.float32)
    scale = 32 ** -0.5
    out_k = la.long_attention(q, k, v, scale)
    out_o = dot_product_attention(q, k, v, impl="xla", scale=scale)
    assert _maxerr(out_k, out_o) < 2e-5

    c = jax.random.normal(jax.random.PRNGKey(9), out_o.shape, jnp.float32)
    gk = _grads(lambda q, k, v: la.long_attention(q, k, v, scale), q, k, v, c)
    go = _grads(
        lambda q, k, v: dot_product_attention(q, k, v, impl="xla", scale=scale),
        q, k, v, c,
    )
    for a, b in zip(gk, go):
        assert _maxerr(a, b) < 2e-4

    big = la.long_attention(q * 500.0, k * 500.0, v, scale)
    assert bool(jnp.isfinite(big.astype(jnp.float32)).all())


def test_supported_gates():
    assert la.supported(5184, 16, 64)   # ViT global blocks
    assert la.supported(5184, 8, 32)    # fusion-encoder self-attn
    assert not la.supported(5184, 3, 64)   # heads don't pack
    assert not la.supported(5184, 8, 48)   # 128 % d != 0
    assert not la.supported(13, 8, 32)     # no usable Q tile


class TestModelDispatch:
    """The packed model-side chains (MultiHeadAttention's encoder path and
    the ViT global-block path) must match their XLA references exactly —
    the relayout/pack bookkeeping is new code even though the kernel is
    tested above."""

    def test_mha_long_path_matches_xla(self, monkeypatch):
        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.models.layers import MultiHeadAttention, Spec

        # eligible dims: d % 128 == 0, head_dim packs into 128 lanes
        cfg = tiny_model_config(
            use_flash_attention=True, flash_attention_min_seq=64
        )
        spec = Spec(model=cfg, lora=None)
        b, lseq, d, heads = 2, 320, 128, 4
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, lseq, d), jnp.float32)
        mha = MultiHeadAttention(d, heads, spec)
        params = mha.init(jax.random.PRNGKey(1), x, x, x)

        monkeypatch.setattr(la, "LONG_ATTENTION", False)
        ref = mha.apply(params, x, x, x)
        monkeypatch.setattr(la, "LONG_ATTENTION", True)
        monkeypatch.setattr(la, "_FORCE_INTERPRET", True)
        out = mha.apply(params, x, x, x)
        assert _maxerr(out, ref) < 2e-5

    def test_vit_global_path_matches_xla(self, monkeypatch):
        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.models.layers import Spec
        from sam3_lora_tpu.models.vit import Attention

        cfg = tiny_model_config(
            vit_dim=128, vit_heads=2,  # head_dim 64 -> pair-packed
            use_flash_attention=True, flash_attention_min_seq=64,
        )
        spec = Spec(model=cfg, lora=None)
        b, g = 1, 8  # 8x8 global grid -> l=64 >= min_seq
        x = jax.random.normal(jax.random.PRNGKey(0), (b, g, g, 128), jnp.float32)
        attn = Attention(spec, input_size=(g, g), rope_scale_pos=1.0)
        params = attn.init(jax.random.PRNGKey(1), x)

        monkeypatch.setattr(la, "LONG_ATTENTION", False)
        ref = attn.apply(params, x)
        monkeypatch.setattr(la, "LONG_ATTENTION", True)
        monkeypatch.setattr(la, "_FORCE_INTERPRET", True)
        out = attn.apply(params, x)
        assert _maxerr(out, ref) < 2e-5
