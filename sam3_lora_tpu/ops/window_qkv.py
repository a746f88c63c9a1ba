"""Window attention that consumes the fused qkv projection output directly.

The ViT's windowed attention (vitdet.py:597-613 in the reference) is
DMA-bound on TPU, and the measured bottleneck of the grouped/packed kernels
is not the kernel itself but the LAYOUT CHAIN around it: the qkv projection
emits (WB, L, 3*dim) and every (B, H, L, D)-shaped kernel forces XLA to
materialize a head-split relayout on the way in and a head-merge on the way
out. scripts/probe_packed_chain.py (v5e, bs8): the packed kernel's isolated
1.65x win shrank to +9% fwd / +1.4% grad at chain level — the relayouts ate
it.

These kernels remove the relayouts entirely:

* forward  — reads the projection output ``qkv`` (N, L, 3*dim) as one fully
  contiguous (1, L, 3, dim) VMEM block per window (3.5 MB streamed at the
  full-lane DMA rate, scripts/probe_dma_floor.py), slices heads apart in
  VMEM (free), and writes the attention output (1, L, dim) — which is
  byte-for-byte the merge_heads layout the output projection consumes.
  ZERO transposes in the whole chain.
* backward — same idea: (qkv, dO) in, dqkv out, where dqkv is exactly the
  cotangent layout the qkv projection's backward GEMM consumes.

Both directions split the head axis across a second grid dimension: Mosaic's
scoped-VMEM stack is ~16 MB, and at production shapes (L=576, 16 heads) the
fully-unrolled per-head softmax temporaries are ~3 MB f32 per head forward
(measured: a whole-16-head program demanded a 47.8 MB scoped allocation on
v5e and failed to compile) and more backward. The default split leaves TWO
heads per program — a (1, L, 3, 128) block, i.e. the full-lane DMA
granularity the head-pair-packed kernel was measured at — tunable via
SAM3_WINDOW_QKV_FWD_SPLIT / SAM3_WINDOW_QKV_BWD_SPLIT (number of grid
slices of the head axis; clamped to keep blocks 128-lane aligned).

Softmax math is shared with ops/window_attention.py (_scores /
_pv_and_recip_rowsum / _bwd_core), so the SAM3_WINDOW_MXU_SUM /
SAM3_WINDOW_NO_MAX variants apply unchanged, as does the fused rotate-half
RoPE (tables (L, head_dim//2); q/k arrive UNROTATED, backward
inverse-rotates dq/dk so residuals stay unrotated).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import window_attention as wa
from .rope import apply_rope_half, apply_rope_half_inv


# Consume the qkv projection output directly (zero relayouts in the whole
# attention chain). Default OFF: measured on v5e bs8 wo_block_mid, the
# qkv-native chain at FWD_SPLIT=4 ran 3.17 s/step vs the head-pair-packed
# chain's 2.55 s — the relayout saving did not beat the packed kernel's
# schedule. SAM3_WINDOW_QKV_NATIVE=1 enables it for A/B runs.
QKV_NATIVE = os.environ.get("SAM3_WINDOW_QKV_NATIVE", "0") == "1"

# Head-axis grid splits (see module docstring). Defaults leave 2 heads per
# program at the production 16-head config.
_FWD_SPLIT = int(os.environ.get("SAM3_WINDOW_QKV_FWD_SPLIT", "8"))
_BWD_SPLIT = int(os.environ.get("SAM3_WINDOW_QKV_BWD_SPLIT", "8"))


def _head_split(heads: int, dim: int, want: int) -> int:
    """Largest split <= want that divides the head axis evenly and keeps the
    per-block channel width 128-lane aligned (alignment relaxed under the
    interpreter, where tests run tiny head dims)."""
    s = max(1, min(want, heads))
    while s > 1 and (
        heads % s != 0
        or ((dim // s) % 128 != 0 and not wa._FORCE_INTERPRET)
    ):
        s -= 1
    return s


def qkv_native_ok(heads: int, head_dim: int) -> bool:
    """Same gate as the packed chain: even head count, full-lane head pairs
    (relaxed under the interpreter for CPU parity tests), TPU backend."""
    return QKV_NATIVE and wa.packed_native_ok(heads, head_dim)


# ---------------------------------------------------------------------------
# kernels — ``heads`` is heads-per-block (the bwd grid splits the head axis)
# ---------------------------------------------------------------------------


def _fwd_plain(qkv_ref, o_ref, *, heads, scale):
    dim = o_ref.shape[-1]
    d = dim // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = qkv_ref[0, :, 0, sl][None]
        k = qkv_ref[0, :, 1, sl][None]
        v = qkv_ref[0, :, 2, sl][None]
        p = wa._scores(q, k, scale)
        o, r = wa._pv_and_recip_rowsum(p, v)
        outs.append((o[0] * r[0][:, None]).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _fwd_rope(qkv_ref, cos_ref, sin_ref, o_ref, *, heads, scale):
    cos, sin = cos_ref[...], sin_ref[...]
    dim = o_ref.shape[-1]
    d = dim // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = apply_rope_half(qkv_ref[0, :, 0, sl], cos, sin)[None]
        k = apply_rope_half(qkv_ref[0, :, 1, sl], cos, sin)[None]
        v = qkv_ref[0, :, 2, sl][None]
        p = wa._scores(q, k, scale)
        o, r = wa._pv_and_recip_rowsum(p, v)
        outs.append((o[0] * r[0][:, None]).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_plain(qkv_ref, do_ref, dqkv_ref, *, heads, scale):
    dim = do_ref.shape[-1]
    d = dim // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        dq, dk, dv = wa._bwd_core(
            qkv_ref[0, :, 0, sl][None],
            qkv_ref[0, :, 1, sl][None],
            qkv_ref[0, :, 2, sl][None],
            do_ref[0, :, sl][None],
            scale,
        )
        dqs.append(dq[0])
        dks.append(dk[0])
        dvs.append(dv[0])
    dqkv_ref[0, :, 0, :] = jnp.concatenate(dqs, -1).astype(dqkv_ref.dtype)
    dqkv_ref[0, :, 1, :] = jnp.concatenate(dks, -1).astype(dqkv_ref.dtype)
    dqkv_ref[0, :, 2, :] = jnp.concatenate(dvs, -1).astype(dqkv_ref.dtype)


def _bwd_rope(qkv_ref, do_ref, cos_ref, sin_ref, dqkv_ref, *, heads, scale):
    cos, sin = cos_ref[...], sin_ref[...]
    dim = do_ref.shape[-1]
    d = dim // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = apply_rope_half(qkv_ref[0, :, 0, sl], cos, sin)[None]
        k = apply_rope_half(qkv_ref[0, :, 1, sl], cos, sin)[None]
        dq, dk, dv = wa._bwd_core(
            q, k, qkv_ref[0, :, 2, sl][None], do_ref[0, :, sl][None], scale
        )
        dqs.append(apply_rope_half_inv(dq[0].astype(dqkv_ref.dtype), cos, sin))
        dks.append(apply_rope_half_inv(dk[0].astype(dqkv_ref.dtype), cos, sin))
        dvs.append(dv[0])
    dqkv_ref[0, :, 0, :] = jnp.concatenate(dqs, -1).astype(dqkv_ref.dtype)
    dqkv_ref[0, :, 1, :] = jnp.concatenate(dks, -1).astype(dqkv_ref.dtype)
    dqkv_ref[0, :, 2, :] = jnp.concatenate(dvs, -1).astype(dqkv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

_PARALLEL2 = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    # Mosaic's default scoped-VMEM cap is 16 MB; the fully-unrolled 2-head
    # program's softmax temporaries measured 18.21 MB on v5e (the stack does
    # not reuse slots across the unrolled head loop). v5e has 128 MB VMEM and
    # the pipeline buffers here are <2 MB, so raising the per-kernel budget is
    # strictly better than splitting below 128-lane block granularity.
    vmem_limit_bytes=64 * 1024 * 1024,
)


def _call_fwd(qkv, heads, scale, tables):
    n, l, td = qkv.shape
    dim = td // 3
    qkv4 = qkv.reshape(n, l, 3, dim)  # pure view, no data movement
    d2 = (dim // heads) // 2
    s = _head_split(heads, dim, _FWD_SPLIT)
    hb = heads // s
    db = dim // s
    kern = _fwd_rope if tables else _fwd_plain
    return pl.pallas_call(
        functools.partial(kern, heads=hb, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, l, dim), qkv.dtype),
        grid=(n, s),
        in_specs=[
            pl.BlockSpec(
                (1, l, 3, db), lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            )
        ]
        + [
            pl.BlockSpec((l, d2), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        ] * len(tables),
        out_specs=pl.BlockSpec(
            (1, l, db), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        compiler_params=_PARALLEL2,
        interpret=wa._FORCE_INTERPRET,
    )(qkv4, *[t.astype(jnp.float32) for t in tables])


def _call_bwd(qkv, do, heads, scale, tables):
    n, l, td = qkv.shape
    dim = td // 3
    # Head-axis split keeps the per-program scoped-VMEM stack (the per-head
    # (L, L) f32 softmax temporaries) under Mosaic's ~16 MB limit.
    s = _head_split(heads, dim, _BWD_SPLIT)
    hb = heads // s
    db = dim // s
    d2 = (dim // heads) // 2
    qkv4 = qkv.reshape(n, l, 3, dim)
    kern = _bwd_rope if tables else _bwd_plain
    spec_qkv = pl.BlockSpec(
        (1, l, 3, db), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    spec_do = pl.BlockSpec(
        (1, l, db), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    rope_spec = pl.BlockSpec(
        (l, d2), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    dqkv = pl.pallas_call(
        functools.partial(kern, heads=hb, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, l, 3, dim), qkv.dtype),
        grid=(n, s),
        in_specs=[spec_qkv, spec_do] + [rope_spec] * len(tables),
        out_specs=spec_qkv,
        compiler_params=_PARALLEL2,
        interpret=wa._FORCE_INTERPRET,
    )(qkv4, do, *[t.astype(jnp.float32) for t in tables])
    return dqkv.reshape(n, l, td)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def window_attention_qkv(qkv, heads: int, scale: float):
    """Fused window attention straight off the qkv projection.

    qkv: (N, L, 3*dim) = [q | k | v] channels, dim = heads * head_dim.
    Returns (N, L, dim) in merge_heads channel order (head-major)."""
    return _wq_fwd(qkv, heads, scale)[0]


def _wq_fwd(qkv, heads, scale):
    return _call_fwd(qkv, heads, scale, ()), qkv


def _wq_bwd(heads, scale, qkv, do):
    return (_call_bwd(qkv, do, heads, scale, ()),)


window_attention_qkv.defvjp(_wq_fwd, _wq_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def window_attention_rope_qkv(qkv, heads: int, scale: float, cos, sin):
    """window_attention_qkv with the rotate-half RoPE fused in-kernel.
    q/k channels arrive UNROTATED in rotate-half layout per head
    (ops/rope.py::rope_half_perm); cos/sin: (L, head_dim//2)."""
    return _wqr_fwd(qkv, heads, scale, cos, sin)[0]


def _wqr_fwd(qkv, heads, scale, cos, sin):
    out = _call_fwd(qkv, heads, scale, (cos, sin))
    return out, (qkv, cos, sin)


def _wqr_bwd(heads, scale, res, do):
    qkv, cos, sin = res
    dqkv = _call_bwd(qkv, do, heads, scale, (cos, sin))
    # cos/sin are position tables (constants) — zero grads keep the vjp total
    return dqkv, jnp.zeros_like(cos), jnp.zeros_like(sin)


window_attention_rope_qkv.defvjp(_wqr_fwd, _wqr_bwd)
