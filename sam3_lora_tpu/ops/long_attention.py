"""Fused long-sequence attention — whole-KV-resident, Q-tiled, packed heads.

Serves the two remaining library-flash consumers in the train step, both of
which attend over the full 5184-token stride-14 grid with a head dim far
below the 128-lane vreg width:

* the 4 ViT GLOBAL blocks (16 heads x D=64) — reference perf path
  ``sam3/perflib/fa3.py`` + ``sam3/perflib/vitdet.py:502``;
* the 6 fusion-encoder self-attentions (8 heads x D=32) —
  ``sam3/model/encoder.py:139-201``.

Why not the stock flash kernel: at D=32/64 it lane-pads every operand and
its f32 softmax stats to 128 lanes (2-4x DMA + HBM waste; the stats are the
~352 MB-per-global-block temps in every r3/r4 OOM dump), and its tiled
backward measured ~15 TF/s on these shapes (scripts/bench_enc_attn.py:
fwd 13.1 ms / fwd+bwd 38.9 ms at (8, 8, 5632, 32)). The right TPU shape for
L ~= 5k is different: the ENTIRE packed K/V panel is only Lp*128*2B ~= 1.3 MB,
so one grid row per (batch*head-group) keeps K/V resident in VMEM across all
Q tiles — no online-softmax bookkeeping, no KV re-streaming — and each
(QT, Lp) f32 score tile lives and dies in VMEM.

Layout: p = 128//D adjacent heads ride side by side in lanes ((B*H/p, L, 128)
blocks), the same trick as ops/window_attention.py::_PACKED — adjacent heads
are adjacent channels of the qkv projection, so packing costs ONE relayout
each way and the kernel DMAs full 128-lane blocks. In-kernel the heads are
sliced apart and run standard per-head math (measured faster than
block-diagonal packed matmuls, scripts/probe_packed.py).

Backward follows ops/window_attention.py::_bwd_core (unnormalized softmax,
1/rowsum folded into row scalings) but gets rowsum(dP o P) for free from the
flash identity rowsum_D(dO o O) on the SAVED forward output — residuals are
just the bf16 q/k/v/O, no lane-padded stats. dK/dV accumulate across Q tiles
in f32 VMEM scratch and are written once on the last tile.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rope import apply_rope_half, apply_rope_half_inv

# Tests set this to run the kernels off-TPU via the Pallas interpreter.
_FORCE_INTERPRET = False

# Route the ViT global blocks and the fusion-encoder self-attention through
# this kernel instead of the library flash kernel (SAM3_LONG_ATTENTION=0
# restores the library path for A/Bs).
LONG_ATTENTION = os.environ.get("SAM3_LONG_ATTENTION", "1") == "1"

# Softmax range handling: "max" = exact row-max subtraction (a full reduce +
# broadcast-subtract pass over every (QT, Lp) score tile, fwd and bwd);
# "clamp" = exp(min(s, 70)) — ONE elementwise pass, exact whenever the row
# max is <= 70 and NEVER NaN/inf above it: the bound is set so even a
# fully-saturated Lp-wide row sum stays under f32 max
# (e^70 * 5248 * |v| ~ 1e36 << 3.4e38). LN-bounded attention scores
# measure |s| < 30 at this repo's converted init
# (ops/window_attention.py provenance note) — 70 leaves ~40 points of
# margin, and the failure mode beyond it is a soft saturation (scores
# > 70 treated as equal), not the NaN of a raw exp. The NEGATIVE side is
# guarded at the reciprocal, not the scores: without the row-max shift a
# row whose every valid score is < ~-87 (f32 exp underflow) would have
# rowsum 0 and r = 1/0 = inf -> 0*inf = NaN, so every 1/rowsum below is
# 1/(rowsum + _RS_EPS) — a degenerate row then outputs ~0 instead of NaN
# (r <= 1e35, all products finite), and for any non-degenerate row the
# eps is below one f32 ulp of the sum (bit-identical in "max" mode where
# rowsum >= 1). Margin: |s| < 30 measured leaves ~57 points to the -87
# underflow line, mirroring the ~40-point +70 margin.
# Default "clamp": measured 3.545 vs 3.445 img/s/chip on the full v5e bs8
# train bench together with SAM3_WINDOW_CLAMP (2026-08-20 queue F); flip to
# "max" for the exact-shift path. Re-verify the |s| margin on trained
# weights when a golden checkpoint lands (PARITY.md).
_SOFTMAX_MODE = os.environ.get("SAM3_LONG_SOFTMAX", "clamp")
_CLAMP = 70.0


# exp2 fold (clamp mode only): bake log2(e) into the SCORE scale so the
# exponential is a bare exp2 — exp(x) lowers to exp2(x*log2e) anyway, so
# this deletes one VPU multiply pass over every (QT, Lp) score tile, fwd
# AND bwd. Gradients are invariant: s2 = log2e*s and d exp2(s2)/d s2 = ln2*
# exp2(s2), and log2e*ln2 == 1, so the backward's dq/dk row scalings keep
# the ORIGINAL scale unchanged. SAM3_LONG_EXP2=1 (A/B'd before defaulting).
_LOG2E = 1.4426950408889634
_EXP2 = os.environ.get("SAM3_LONG_EXP2", "0") == "1"


def _sscale(scale: float) -> float:
    """The scale folded into the score dot: x log2(e) under the exp2 fold."""
    if _EXP2 and _SOFTMAX_MODE == "clamp":
        return float(scale) * _LOG2E
    return float(scale)


def _exp_range(s):
    """exp with range protection per _SOFTMAX_MODE; returns (e, m) where m
    is the per-row shift (None under clamp — no shift applied). Under the
    exp2 fold the caller has pre-multiplied scores by log2(e)."""
    if _SOFTMAX_MODE == "clamp":
        if _EXP2:
            return jnp.exp2(jnp.minimum(s, _CLAMP * _LOG2E)), None
        return jnp.exp(jnp.minimum(s, _CLAMP)), None
    m = jnp.max(s, axis=-1)  # padded cols are exactly 0 — max(true, 0)
    return jnp.exp(s - m[:, None]), m

_NEG_BIG = -1e30  # finite -inf stand-in: exp(_NEG_BIG - m) == 0 exactly

# Reciprocal guard for clamp/no-shift softmax (see _SOFTMAX_MODE note):
# normal f32 (not denormal), so 1/_RS_EPS = 1e35 stays finite.
_RS_EPS = 1e-35

# Q rows per program. The (QT, Lp) f32 score tile is held live for every
# unrolled head of the group (Mosaic does not slot-reuse unrolled
# temporaries — see window_qkv.py), so QT shrinks as heads-per-group grows:
# p=2 (D=64): 2 * 576*5248*4 = 24 MB; p=4 (D=32): 4 * 288*5248*4 = 24 MB.
# SAM3_LONG_QT2 / SAM3_LONG_QT4 override the cap for sweeps (e.g. 864 at
# p=2 or 576 at p=4 stay under the 96 MB scoped-VMEM budget with fewer,
# larger programs).
# p=4 default 576 (not 288): fewer, larger programs measured faster on the
# encoder shape (fwd 11.1 vs 13.3 ms, fwd+bwd 27.6 vs 31.5 — queue F
# LONGQT_MICRO_QT4_576); 4 * 576*5248*4B = 48 MB of unrolled score tiles
# stays under the 96 MB budget.
_QT_BY_GROUP = {1: 1152, 2: 576, 4: 576, 8: 144}
for _p in (2, 4):
    _ov = os.environ.get(f"SAM3_LONG_QT{_p}")
    if _ov:
        # normalize to a multiple of 8 — _choose_qt scans cap, cap-8, ... and
        # every candidate must satisfy the 8-sublane row requirement
        _QT_BY_GROUP[_p] = max(8, (int(_ov) // 8) * 8)

# Grid rows (batch*head-group) are independent; Q tiles within a row are
# sequential — the backward accumulates dK/dV across them in scratch.
_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=96 * 1024 * 1024,
)


def _choose_qt(l: int, p: int) -> Optional[int]:
    """Largest Q tile under the VMEM-budget cap that divides L (rows must be
    a multiple of 8 sublanes)."""
    cap = _QT_BY_GROUP.get(p, 128)
    for qt in range(cap, 7, -8):
        if l % qt == 0:
            return qt
    return None


def _pad_cols(l: int) -> int:
    """KV length padded to the 128-lane score width."""
    return ((l + 127) // 128) * 128


def _zero_pad_cols(e, valid: int):
    """Zero the padded score columns of e (QT, Lp). Padded K rows are exactly
    zero, so their scores are exactly 0; taking the row max over the FULL
    padded row stays exact (softmax is shift-invariant and m = max(true, 0)
    can never overflow exp) — only the row SUM needs the pad mass removed.
    A (QT, pad) dynamic_update_slice would be ~1/80th the work but Mosaic
    has no TC lowering for it (found on-chip; the interpreter accepts it),
    so this is a lane-iota select pass."""
    qt, lp = e.shape
    if valid == lp:
        return e
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, lp), 1)
    return jnp.where(col < valid, e, 0.0)


def _dot(a, b, contract: Tuple[int, int]):
    return jax.lax.dot_general(
        a, b, dimension_numbers=((contract[0:1], contract[1:2]), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_fwd_kernel(scale, dh, valid, qt, rope):
    """One (QT, 128) Q tile against the VMEM-resident (Lp, 128) K/V panel.
    With ``rope``, cos/sin (Lp, dh//2) f32 tables ride as the last two inputs
    (q rows sliced at the tile's position) and q/k arrive UNROTATED in
    rotate-half channel layout."""

    def kernel(*refs):
        if rope:
            # tables arrive TWICE under different specs: full (Lp, dh/2)
            # panels for the K rotation (pinned like K/V), and a (QT, dh/2)
            # tile tracking the Q block — a static block index instead of an
            # in-kernel dynamic slice (which sent Mosaic compile time
            # unbounded at the (5248, 32) table size).
            (q_ref, k_ref, v_ref, cos_ref, sin_ref, cq_ref, sq_ref,
             o_ref) = refs
            cos_q, sin_q = cq_ref[...], sq_ref[...]
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            cos_ref = sin_ref = None
        p = q_ref.shape[-1] // dh
        for h in range(p):
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[0][:, sl]  # (QT, dh) bf16
            k = k_ref[0][:, sl]  # (Lp, dh) bf16
            v = v_ref[0][:, sl]
            if rope:
                q = apply_rope_half(q, cos_q, sin_q)
                k = apply_rope_half(k, cos_ref[...], sin_ref[...])
            s = _dot(q, k, (1, 1)) * _sscale(scale)  # (QT, Lp) f32
            e = _zero_pad_cols(_exp_range(s)[0], valid)
            r = 1.0 / (jnp.sum(e, axis=-1) + _RS_EPS)  # (QT,)
            o = _dot(e.astype(v.dtype), v, (1, 0))  # (QT, dh) f32
            o_ref[0, :, sl] = (o * r[:, None]).astype(o_ref.dtype)

    return kernel


def _make_bwd_kernel(scale, dh, valid, qt, n_qt, rope):
    """Standard attention backward per Q tile; dK/dV accumulate in f32
    scratch across the row's tiles (grid dim 1 is sequential) and are emitted
    on the last tile. Unnormalized softmax with 1/rowsum folded into
    (rows, dh) scalings — no (QT, Lp) tensor is normalized — and
    rowsum(dP o P) taken from the saved output via the flash identity."""

    def kernel(*refs):
        if rope:
            (q_ref, k_ref, v_ref, o_ref, do_ref, cos_ref, sin_ref,
             cq_ref, sq_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
            cos_q, sin_q = cq_ref[...], sq_ref[...]
        else:
            (q_ref, k_ref, v_ref, o_ref, do_ref,
             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
            cos_ref = sin_ref = None
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _zero():
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

        p = q_ref.shape[-1] // dh
        for h in range(p):
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            v = v_ref[0][:, sl]
            if rope:
                q = apply_rope_half(q, cos_q, sin_q)
                k = apply_rope_half(k, cos_ref[...], sin_ref[...])
            do = do_ref[0][:, sl]
            o = o_ref[0][:, sl]
            # exp2 fold: sscale only affects the exponential's argument; the
            # dq/dk row scalings below keep the ORIGINAL scale (log2e*ln2=1)
            s = _dot(q, k, (1, 1)) * _sscale(scale)
            # (QT, Lp) f32, unnormalized; pad cols zeroed
            e = _zero_pad_cols(_exp_range(s)[0], valid)
            inv = 1.0 / (jnp.sum(e, axis=-1) + _RS_EPS)  # (QT,)
            eb = e.astype(q.dtype)
            # dV = P^T dO = e^T (inv * dO)
            dv_h = _dot(eb, do * inv[:, None].astype(do.dtype), (0, 0))
            dp = _dot(do, v, (1, 1))  # (QT, Lp) f32 = dO V^T
            # flash identity: rowsum(dP o P) = rowsum_D(dO o O), O saved
            c = jnp.sum(
                do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
            )
            ds = (e * (dp - c[:, None])).astype(q.dtype)  # unnormalized
            # dQ = (scale*inv) * (ds K) — row scaling on the (QT, dh) output
            dq_h = _dot(ds, k, (1, 0)) * (scale * inv)[:, None]
            # dK = ds^T (scale*inv*Q) — row scaling on the (QT, dh) input
            dk_h = _dot(
                ds, q * (scale * inv)[:, None].astype(q.dtype), (0, 0)
            )
            if rope:
                dq_h = apply_rope_half_inv(dq_h, cos_q, sin_q)
                dk_h = apply_rope_half_inv(dk_h, cos_ref[...], sin_ref[...])
            dq_ref[0, :, sl] = dq_h.astype(dq_ref.dtype)
            dk_acc[:, sl] += dk_h
            dv_acc[:, sl] += dv_h

        @pl.when(i == n_qt - 1)
        def _emit():
            dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    return kernel


def _pad_kv(x, lp):
    l = x.shape[1]
    if l == lp:
        return x
    return jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))


def _pad_tables(t, lp):
    l = t.shape[0]
    if l == lp:
        return t
    return jnp.pad(t, ((0, lp - l), (0, 0)))


def _table_specs(lp, qt, dh):
    """RoPE tables ride twice: full (Lp, dh/2) panels pinned like K/V (for
    the K rotation) + a (QT, dh/2) tile tracking the Q block."""
    full = pl.BlockSpec(
        (lp, dh // 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec(
        (qt, dh // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    return [full, full, tile, tile]


def _table_ins(tables, lp):
    cos, sin = (t.astype(jnp.float32) for t in tables)
    return [_pad_tables(cos, lp), _pad_tables(sin, lp), cos, sin]


def _specs(n, l, lp, dp, qt):
    q_spec = pl.BlockSpec(
        (1, qt, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, lp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return q_spec, kv_spec


def _fwd_call(q, k, v, scale, dh, tables):
    """q/k/v packed (N, L, p*dh) -> o (N, L, p*dh)."""
    n, l, dp = q.shape
    p = dp // dh
    qt = _choose_qt(l, p)
    lp = _pad_cols(l)
    kp, vp = _pad_kv(k, lp), _pad_kv(v, lp)
    rope = bool(tables)
    q_spec, kv_spec = _specs(n, l, lp, dp, qt)
    in_specs = [q_spec, kv_spec, kv_spec]
    ins = [q, kp, vp]
    if rope:
        in_specs += _table_specs(lp, qt, dh)
        ins += _table_ins(tables, lp)
    return pl.pallas_call(
        _make_fwd_kernel(scale, dh, l, qt, rope),
        out_shape=jax.ShapeDtypeStruct((n, l, dp), q.dtype),
        grid=(n, l // qt),
        in_specs=in_specs,
        out_specs=q_spec,
        compiler_params=_PARAMS,
        interpret=_FORCE_INTERPRET,
    )(*ins)


def _bwd_call(q, k, v, o, do, scale, dh, tables):
    n, l, dp = q.shape
    p = dp // dh
    qt = _choose_qt(l, p)
    lp = _pad_cols(l)
    kp, vp = _pad_kv(k, lp), _pad_kv(v, lp)
    rope = bool(tables)
    q_spec, kv_spec = _specs(n, l, lp, dp, qt)
    in_specs = [q_spec, kv_spec, kv_spec, q_spec, q_spec]
    ins = [q, kp, vp, o, do]
    if rope:
        in_specs += _table_specs(lp, qt, dh)
        ins += _table_ins(tables, lp)
    dq, dk, dv = pl.pallas_call(
        _make_bwd_kernel(scale, dh, l, qt, l // qt, rope),
        out_shape=(
            jax.ShapeDtypeStruct((n, l, dp), q.dtype),
            jax.ShapeDtypeStruct((n, lp, dp), q.dtype),
            jax.ShapeDtypeStruct((n, lp, dp), q.dtype),
        ),
        grid=(n, l // qt),
        in_specs=in_specs,
        out_specs=(q_spec, kv_spec, kv_spec),
        scratch_shapes=[
            pltpu.VMEM((lp, dp), jnp.float32),
            pltpu.VMEM((lp, dp), jnp.float32),
        ],
        compiler_params=_PARAMS,
        interpret=_FORCE_INTERPRET,
    )(*ins)
    if lp != l:
        dk, dv = dk[:, :l], dv[:, :l]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def supported(l: int, heads: int, head_dim: int) -> bool:
    """Whether the packed long kernel handles this shape: heads pack to the
    128-lane vreg width and a Q tile divides L."""
    if head_dim > 128 or 128 % head_dim != 0:
        return False
    p = 128 // head_dim
    if heads % p != 0:
        return False
    return _choose_qt(l, p) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def long_attention_packed(q, k, v, scale: float, head_dim: int):
    """Fused long attention over packed (N, L, p*head_dim) tensors, p =
    128//head_dim adjacent heads side by side in lanes, N = B*H/p. No
    mask/bias (callers with padding keep the library flash path)."""
    return _lap_fwd(q, k, v, scale, head_dim)[0]


def _lap_fwd(q, k, v, scale, head_dim):
    o = _fwd_call(q, k, v, scale, head_dim, ())
    return o, (q, k, v, o)


def _lap_bwd(scale, head_dim, res, do):
    q, k, v, o = res
    return _bwd_call(q, k, v, o, do, scale, head_dim, ())


long_attention_packed.defvjp(_lap_fwd, _lap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def long_attention_rope_packed(q, k, v, scale: float, head_dim: int, cos, sin):
    """long_attention_packed with the RoPE rotation fused in-kernel: q/k
    arrive UNROTATED in rotate-half channel layout (ops/rope.py); cos/sin are
    (L, head_dim//2) angle tables."""
    return _larp_fwd(q, k, v, scale, head_dim, cos, sin)[0]


def _larp_fwd(q, k, v, scale, head_dim, cos, sin):
    o = _fwd_call(q, k, v, scale, head_dim, (cos, sin))
    return o, (q, k, v, o, cos, sin)


def _larp_bwd(scale, head_dim, res, do):
    q, k, v, o, cos, sin = res
    dq, dk, dv = _bwd_call(q, k, v, o, do, scale, head_dim, (cos, sin))
    # cos/sin are position tables (constants) — zero grads keep the vjp total
    return dq, dk, dv, jnp.zeros_like(cos), jnp.zeros_like(sin)


long_attention_rope_packed.defvjp(_larp_fwd, _larp_bwd)


def _pack(x, p):
    """(B, H, L, D) -> (B*H/p, L, p*D): adjacent heads side by side in lanes."""
    b, h, l, d = x.shape
    return (
        x.reshape(b, h // p, p, l, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b * (h // p), l, p * d)
    )


def _unpack(x, b, h, p):
    n, l, dp = x.shape
    d = dp // p
    return (
        x.reshape(b, h // p, l, p, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h, l, d)
    )


def long_attention(q, k, v, scale: float):
    """(B, H, L, D) convenience wrapper: packs 128//D adjacent heads, runs
    the packed kernel, unpacks. Callers that own their layout should build
    the packed (N, L, 128) chain directly and call long_attention_packed."""
    b, h, l, d = q.shape
    p = 128 // d
    o = long_attention_packed(_pack(q, p), _pack(k, p), _pack(v, p), scale, d)
    return _unpack(o, b, h, p)
