"""Fused windowed attention — custom Pallas kernel (fwd + bwd).

The ViT's 28 windowed blocks attend within 576-token windows. The stock
flash kernel pads 576->640 and tiles 128-wide (grid 72*16*5 tiny programs),
and the XLA path round-trips ~1.5 GB of fp32 logits through HBM per block —
both measured slower than they should be. A 576-token window's entire score
matrix is only 576*576*4 = 1.3 MB, so the right TPU shape is ONE program per
(window-batch, head-group) that keeps Q*K^T, the fp32 softmax, and P*V
entirely in VMEM — no padding, no online-softmax bookkeeping, no HBM logits.

Backward is the standard attention backward, also one program per window
with everything resident in VMEM:
    P  = softmax(s * QK^T)
    dV = P^T dO
    dP = dO V^T
    dS = s * P * (dP - rowsum(dP * P))
    dQ = dS K ;  dK = dS^T Q

Used by ``dot_product_attention(impl="window")`` for bias-free intra-window
attention; falls back to the XLA expression off-TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rope import apply_rope_half, apply_rope_half_inv

import os

def _head_group_from_env() -> int:
    raw = os.environ.get("SAM3_WINDOW_HEAD_GROUP", "2")
    try:
        g = int(raw)
    except ValueError:
        g = 2
    return max(1, g)


HEAD_GROUP = _head_group_from_env()
# heads per program: logits VMEM = HEAD_GROUP * L^2 * 4 bytes
# (g=2 measured fastest at (72,16,576,64): 6.7 ms vs 7.1 ms g=4, 8.9 ms XLA;
# g=1 degenerates catastrophically and g=8 exceeds the 16 MB VMEM budget)


_INTERLEAVE = os.environ.get("SAM3_WINDOW_INTERLEAVE", "0") == "1"

# Fuse the RoPE rotation of q/k into the kernel (rotate-half layout, see
# ops/rope.py::apply_rope_half): the rotation happens on VMEM-resident tiles
# where its VPU work can overlap the MXU matmuls, and the backward replay
# under remat recomputes it for free instead of re-running the separate
# elementwise pass. Default ON: measured 2.80 -> 2.99 img/s/chip on the
# full-config v5e bs8 train bench (+6.8%, 2026-08-18); parity-tested vs the
# XLA oracle in both modes. SAM3_WINDOW_FUSE_ROPE=0 restores the unfused path.
FUSE_ROPE = os.environ.get("SAM3_WINDOW_FUSE_ROPE", "1") == "1"

# Move the softmax row-sum off the VPU and onto the MXU by appending a ones
# column to V: o_ext = P @ [V | 1] yields P@V and rowsum(P) in ONE matmul —
# the output tile was only D=64 of 128 lanes wide, so the extra column is
# free. Also rescales scores by log2(e) once so the exponential is a bare
# exp2. The kernels are VPU-bound (exp/max/sum passes over the 576^2 scores
# serialize against ~1.7us of MXU work), so shaving VPU passes is the lever.
# Env-gated experiment (SAM3_WINDOW_MXU_SUM=1).
_MXU_SUM = os.environ.get("SAM3_WINDOW_MXU_SUM", "0") == "1"

# exp2 fold WITHOUT the MXU rowsum: bake log2(e) into the score scale so
# the clamp softmax is a bare exp2 (exp lowers to exp2(x*log2e) anyway —
# this deletes one VPU multiply pass over every score tile, fwd and bwd).
# Gradients invariant: the bwd dq/dk row scalings keep the ORIGINAL scale
# (log2e*ln2 == 1), exactly as under _MXU_SUM. SAM3_WINDOW_EXP2=1.
_EXP2 = os.environ.get("SAM3_WINDOW_EXP2", "0") == "1"


def _use_exp2() -> bool:
    """Scores carry the folded log2(e) factor and exponentials are exp2."""
    return _MXU_SUM or (_EXP2 and _CLAMP_MAX)


# Skip the softmax max-subtraction (p = exp(s) directly): removes a full
# (L, L) VPU max-reduction pass plus the subtract pass from every program of
# a VPU-bound kernel. Numerically safe only while |scale*QK^T| stays well
# below exp's fp32 overflow (~88, or ~127 under _MXU_SUM's exp2): holds for
# LN-bounded ViT activations but NOT guaranteed for arbitrary inputs, so this
# is an env-gated experiment (SAM3_WINDOW_NO_MAX=1), default OFF.
# Provenance of the |s| < 30 bound: measured at the repo's converted random
# init, not yet at trained SAM3 weights (no checkpoint reachable from this
# box — see PARITY.md "golden checkpoint"); pre-softmax scores are bounded by
# scale*|q||k| with q,k LayerNorm-bounded, which is weight-scale dependent, so
# re-verify the margin once real weights land before enabling in production.
_NO_MAX = os.environ.get("SAM3_WINDOW_NO_MAX", "0") == "1"

# Middle ground between the exact max path (reduce + broadcast-subtract, 2
# VPU passes over every (L, L) score tile) and _NO_MAX (0 passes, but raw
# exp overflows to inf/NaN past s ~ 88): exp(min(s, 70)) — ONE pass, exact
# whenever the row max is <= 70, and the failure mode beyond is a soft
# saturation (all scores > 70 weighted equally), never NaN — 70 keeps even
# a fully-saturated 576-wide row sum far below f32 overflow. |s| < 30 at
# the repo's converted init (see _NO_MAX provenance note); 70 leaves ~40
# points of margin. SAM3_WINDOW_CLAMP=1; takes precedence over _NO_MAX.
# Default ON (with SAM3_LONG_SOFTMAX=clamp): 3.545 vs 3.445 img/s/chip on
# the full v5e bs8 train bench (2026-08-20 queue F).
# NEGATIVE-side guard: without the row-max shift, a row whose every score is
# < ~-87 (f32 exp underflow) has rowsum 0 and 1/rowsum = inf -> NaN; all
# reciprocals below add _RS_EPS so such a row outputs ~0 instead (see
# ops/long_attention.py for the full margin analysis — |s| < 30 measured
# leaves ~57 points to the underflow line).
_CLAMP_MAX = os.environ.get("SAM3_WINDOW_CLAMP", "1") == "1"

# Normal f32 (not denormal): 1/_RS_EPS = 1e35 stays finite. Bit-identical
# in the exact-max path (rowsum >= 1 there; eps is below one f32 ulp).
_RS_EPS = 1e-35

# Head-PAIR-packed lane layout: kernel blocks are (wpp, L, 2*D) with two
# 64-channel heads side by side in lanes instead of (1, G, L, D). Rationale
# (measured, scripts/probe_dma_floor.py, v5e): D=64 blocks DMA at ~95 GB/s
# while 128-lane blocks DMA at ~260 GB/s — the kernels are ~87% DMA-bound
# (the pure-copy stage costs 3.6 ms of the 4.15 ms forward), so full-lane
# blocks are worth far more than any VPU shaving. In-kernel the two heads are
# sliced apart in VMEM and run the standard per-head math (measured faster
# than a block-diagonal 128-deep packed matmul: 2.52 vs 3.29 ms fwd,
# scripts/probe_packed.py). Default ON; SAM3_WINDOW_PACKED=0 restores the
# head-grouped layout.
_PACKED = os.environ.get("SAM3_WINDOW_PACKED", "1") == "1"

# Window-pairs per program for the packed kernels. Larger blocks mean larger
# contiguous DMA bursts (the forward is DMA-bound: scripts/probe_dma_floor.py
# measured the pure-copy stage at 3.6 ms of a 4.15 ms fwd) and fewer program
# launches, at the cost of scoped-VMEM growth — each (window, head) iteration
# of the unrolled in-kernel loop holds a 576^2 fp32 score matrix (1.33 MB)
# that Mosaic's stack does not reuse across unrolled iterations (see
# window_qkv.py). Swept via SAM3_WINDOW_WPP under the raised VMEM budget.
_WPP = max(1, int(os.environ.get("SAM3_WINDOW_WPP", "2")))


def _wpp_for(n: int) -> int:
    """Largest usable windows-per-program for an n-window grid: the configured
    _WPP when it divides n, else the old 2/1 fallback."""
    if n % _WPP == 0:
        return _WPP
    return 2 if n % 2 == 0 else 1

_LOG2E = 1.4426950408889634

# Tests set this to run the kernels off-TPU via the Pallas interpreter.
_FORCE_INTERPRET = False


def _exp_shifted(s):
    """exp(s - rowmax(s)) on the VPU; under _MXU_SUM the caller has folded
    log2(e) into s so this is a bare exp2; under _CLAMP_MAX the shift is
    replaced by a single clamp pass (exp(min(s, 70))); under _NO_MAX the
    max-reduction and subtract passes are skipped entirely (see flags)."""
    if _CLAMP_MAX:
        # exp2 threshold = 70 * log2(e), the same effective score bound
        return (
            jnp.exp2(jnp.minimum(s, 70.0 * _LOG2E))
            if _use_exp2()
            else jnp.exp(jnp.minimum(s, 70.0))
        )
    if _NO_MAX:
        return jnp.exp2(s) if _use_exp2() else jnp.exp(s)
    m = jnp.max(s, axis=-1, keepdims=True)
    return jnp.exp2(s - m) if _use_exp2() else jnp.exp(s - m)


def _scores(q, k, scale):
    """Unnormalized softmax numerator p = exp(s - rowmax(s)) in fp32, for
    (G, L, D) operands. Under _MXU_SUM the log2(e) factor is folded into the
    score scale so the exponential is a bare exp2 (identical values)."""
    mult = scale * _LOG2E if _use_exp2() else scale
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * mult
    return _exp_shifted(s)


def _pv_and_recip_rowsum(p, v):
    """o = P@V (fp32) and r = 1/rowsum(P). Under _MXU_SUM the rowsum rides
    the PV matmul as an appended ones column of V (the output tile is only
    D=64 of 128 lanes wide — the extra column is free MXU work and removes a
    VPU reduction pass over the (L, L) scores)."""
    if _MXU_SUM:
        g, l, d = v.shape
        vx = jnp.concatenate([v, jnp.ones((g, l, 1), v.dtype)], axis=-1)
        ox = jax.lax.dot_general(
            p.astype(v.dtype), vx,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return ox[..., :d], 1.0 / (ox[..., d] + _RS_EPS)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return o, 1.0 / (jnp.sum(p, axis=-1) + _RS_EPS)


def _recip_rowsum(p, dtype):
    """1/rowsum(p) for (G, L, L) p — ones-matmul on the MXU under _MXU_SUM
    (operand cast to ``dtype``), VPU reduction otherwise."""
    if _MXU_SUM:
        g, l, _ = p.shape
        ones = jnp.ones((l, 1), dtype)
        return 1.0 / (jax.lax.dot_general(
            p.astype(dtype), ones,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., 0] + _RS_EPS)
    return 1.0 / (jnp.sum(p, axis=-1) + _RS_EPS)


def _fwd_kernel_interleave(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Per-head software pipeline: issue head i+1's QK^T (MXU) before head
    i's softmax (VPU) so the compiler can overlap the two units — the batched
    dot_general formulation forces MXU -> VPU -> MXU serialization per
    program. Numerics identical to _fwd_kernel; env-gated experiment
    (SAM3_WINDOW_INTERLEAVE=1)."""
    q = q_ref[0]  # (G, L, D)
    k = k_ref[0]
    v = v_ref[0]
    g = q.shape[0]

    mult = scale * _LOG2E if _use_exp2() else scale

    def qk(i):
        return jax.lax.dot_general(
            q[i], k[i], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * mult

    s_next = qk(0)
    for i in range(g):
        s_i = s_next
        if i + 1 < g:
            s_next = qk(i + 1)  # MXU work issued before head i's VPU passes
        p = _exp_shifted(s_i)
        o, r = _pv_and_recip_rowsum(p[None], v[i][None])
        o_ref[0, i] = (o[0] * r[0][:, None]).astype(o_ref.dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # softmax with the normalization moved off the (L, L) matrix: the MXU
    # work here is only ~1.7 us/program, so every elementwise pass over the
    # 576x576 scores is on the critical (VPU) path. exp(s-max) is unavoidable,
    # but the divide is applied to the (L, D) OUTPUT via reciprocal-multiply
    # (9x fewer elements than normalizing p, and mul not div).
    q = q_ref[0]  # (G, L, D)
    k = k_ref[0]
    v = v_ref[0]
    p = _scores(q, k, scale)  # (G, L, L) fp32, lives in VMEM only
    o, r = _pv_and_recip_rowsum(p, v)
    o_ref[0] = (o * r[..., None]).astype(o_ref.dtype)


def _rowsum_dp_p(pb, v, do, inv):
    """c = inv * rowsum_j(dP_ij * P_ij) via the flash-attention identity
    rowsum(dP ⊙ P) = rowsum_D(dO ⊙ (P@V)): one extra (L,L)x(L,D) MXU matmul
    replaces a full (G,L,L) VPU elementwise-multiply pass with a (G,L,D) one
    (9x fewer elements at L=576, D=64) — these kernels are VPU-bound, so the
    idle MXU work is free. pb: bf16 unnormalized softmax; returns (G, L)."""
    o_un = jax.lax.dot_general(
        pb, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return inv * jnp.sum(do.astype(jnp.float32) * o_un, axis=-1)


def _bwd_core(q, k, v, do, scale):
    """Standard attention backward for (G, L, D) operands, everything
    VMEM-resident. Returns fp32 (dq, dk, dv).

    Unnormalized softmax; the 1/rowsum factor is folded into (G, L, D)
    row-scalings (dO for dV, Q for dK, the dQ output) so no (G, L, L)
    tensor is ever divided or normalized — rationale as in _fwd_kernel.
    """
    p = _scores(q, k, scale)  # (G, L, L) fp32
    inv = _recip_rowsum(p, q.dtype)  # (G, L)
    # Matmul operands are cast to bf16 (fp32 accumulation via
    # preferred_element_type): fp32-operand matmuls run the MXU at a
    # fraction of its bf16 rate, and this backward is 5 matmuls.
    pb = p.astype(q.dtype)
    # dV = P^T dO = p^T (inv * dO)
    dv = jax.lax.dot_general(
        pb, (do * inv[..., None].astype(do.dtype)),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # ds = P*(dP - rowsum(dP*P)) = inv * [p * (dP - c)],  c = inv*rowsum(dP*p)
    c = _rowsum_dp_p(pb, v, do, inv)                     # (G, L)
    ds = (p * (dp - c[..., None])).astype(q.dtype)
    # dQ = (scale*inv) * (ds' K)   — row scaling applied to the (L, D) output
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (scale * inv[..., None])
    # dK = ds'^T (scale*inv*Q)     — row scaling applied to the (L, D) input
    dk = jax.lax.dot_general(
        ds, (q * (scale * inv[..., None]).astype(q.dtype)),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    dq, dk, dv = _bwd_core(q_ref[0], k_ref[0], v_ref[0], do_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fwd_kernel_rope(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale):
    """_fwd_kernel with the q/k RoPE rotation fused in (VMEM-resident).
    Rotation = ops/rope.py::apply_rope_half (pure jnp — traces in-kernel)."""
    cos, sin = cos_ref[...], sin_ref[...]
    q = apply_rope_half(q_ref[0], cos, sin)  # (G, L, D)
    k = apply_rope_half(k_ref[0], cos, sin)
    v = v_ref[0]
    p = _scores(q, k, scale)
    o, r = _pv_and_recip_rowsum(p, v)
    o_ref[0] = (o * r[..., None]).astype(o_ref.dtype)


def _fwd_kernel_rope_interleave(
    q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale
):
    """Fused-RoPE forward with the per-head MXU/VPU software pipeline of
    _fwd_kernel_interleave (head i+1's rotation + QK^T issued before head
    i's softmax passes)."""
    cos, sin = cos_ref[...], sin_ref[...]
    q = q_ref[0]  # (G, L, D) unrotated
    k = k_ref[0]
    v = v_ref[0]
    g = q.shape[0]
    mult = scale * _LOG2E if _use_exp2() else scale

    def qk(i):
        return jax.lax.dot_general(
            apply_rope_half(q[i], cos, sin),
            apply_rope_half(k[i], cos, sin),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * mult

    s_next = qk(0)
    for i in range(g):
        s_i = s_next
        if i + 1 < g:
            s_next = qk(i + 1)
        p = _exp_shifted(s_i)
        o, r = _pv_and_recip_rowsum(p[None], v[i][None])
        o_ref[0, i] = (o[0] * r[0][:, None]).astype(o_ref.dtype)


def _bwd_kernel_rope(
    q_ref, k_ref, v_ref, do_ref, cos_ref, sin_ref, dq_ref, dk_ref, dv_ref,
    *, scale,
):
    """_bwd_kernel on rotated q/k; dq/dk are inverse-rotated before the write
    so they are gradients w.r.t. the UNROTATED inputs."""
    cos, sin = cos_ref[...], sin_ref[...]
    q = apply_rope_half(q_ref[0], cos, sin)
    k = apply_rope_half(k_ref[0], cos, sin)
    dq, dk, dv = _bwd_core(q, k, v_ref[0], do_ref[0], scale)
    dq_ref[0] = apply_rope_half_inv(dq.astype(dq_ref.dtype), cos, sin)
    dk_ref[0] = apply_rope_half_inv(dk.astype(dk_ref.dtype), cos, sin)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Head-pair-packed kernels (see _PACKED): blocks are (wpp, L, 2D), two heads
# side by side in lanes for full-width DMA; the heads are sliced apart on the
# VMEM-resident block and run the standard per-head math. All softmax-variant
# flags (_MXU_SUM, _NO_MAX) apply unchanged via _scores/_pv_and_recip_rowsum.
# ---------------------------------------------------------------------------


def _head_slices(ref_last_dim):
    d = ref_last_dim // 2
    return d, (slice(0, d), slice(d, None))


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale):
    _, slices = _head_slices(q_ref.shape[-1])
    for w in range(q_ref.shape[0]):
        outs = []
        for sl in slices:
            q = q_ref[w, :, sl][None]  # (1, L, D)
            k = k_ref[w, :, sl][None]
            v = v_ref[w, :, sl][None]
            p = _scores(q, k, scale)
            o, r = _pv_and_recip_rowsum(p, v)
            outs.append((o[0] * r[0][:, None]).astype(o_ref.dtype))
        o_ref[w] = jnp.concatenate(outs, axis=-1)


def _fwd_kernel_rope_packed(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale):
    cos, sin = cos_ref[...], sin_ref[...]
    _, slices = _head_slices(q_ref.shape[-1])
    for w in range(q_ref.shape[0]):
        outs = []
        for sl in slices:
            q = apply_rope_half(q_ref[w, :, sl], cos, sin)[None]
            k = apply_rope_half(k_ref[w, :, sl], cos, sin)[None]
            v = v_ref[w, :, sl][None]
            p = _scores(q, k, scale)
            o, r = _pv_and_recip_rowsum(p, v)
            outs.append((o[0] * r[0][:, None]).astype(o_ref.dtype))
        o_ref[w] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel_packed(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale
):
    _, slices = _head_slices(q_ref.shape[-1])
    for w in range(q_ref.shape[0]):
        dqs, dks, dvs = [], [], []
        for sl in slices:
            dq, dk, dv = _bwd_core(
                q_ref[w, :, sl][None], k_ref[w, :, sl][None],
                v_ref[w, :, sl][None], do_ref[w, :, sl][None], scale,
            )
            dqs.append(dq[0])
            dks.append(dk[0])
            dvs.append(dv[0])
        dq_ref[w] = jnp.concatenate(dqs, -1).astype(dq_ref.dtype)
        dk_ref[w] = jnp.concatenate(dks, -1).astype(dk_ref.dtype)
        dv_ref[w] = jnp.concatenate(dvs, -1).astype(dv_ref.dtype)


def _bwd_kernel_rope_packed(
    q_ref, k_ref, v_ref, do_ref, cos_ref, sin_ref,
    dq_ref, dk_ref, dv_ref, *, scale,
):
    cos, sin = cos_ref[...], sin_ref[...]
    _, slices = _head_slices(q_ref.shape[-1])
    for w in range(q_ref.shape[0]):
        dqs, dks, dvs = [], [], []
        for sl in slices:
            q = apply_rope_half(q_ref[w, :, sl], cos, sin)[None]
            k = apply_rope_half(k_ref[w, :, sl], cos, sin)[None]
            dq, dk, dv = _bwd_core(
                q, k, v_ref[w, :, sl][None], do_ref[w, :, sl][None], scale
            )
            dqs.append(apply_rope_half_inv(dq[0].astype(dq_ref.dtype), cos, sin))
            dks.append(apply_rope_half_inv(dk[0].astype(dk_ref.dtype), cos, sin))
            dvs.append(dv[0])
        dq_ref[w] = jnp.concatenate(dqs, -1)
        dk_ref[w] = jnp.concatenate(dks, -1)
        dv_ref[w] = jnp.concatenate(dvs, -1).astype(dv_ref.dtype)


def _group(h: int) -> int:
    """Heads per program, falling back to 1 when h is not divisible."""
    return HEAD_GROUP if h % HEAD_GROUP == 0 else 1


def _grouped(x, g):
    b, h, l, d = x.shape
    return x.reshape(b * (h // g), g, l, d)


def _ungrouped(x, b, h):
    bg, g, l, d = x.shape
    return x.reshape(b, h, l, d)


def _specs(g, l, d):
    return pl.BlockSpec((1, g, l, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)


def _rope_specs(l, d2):
    # cos/sin (L, D//2) shared by every program: block index pinned to (0, 0)
    return pl.BlockSpec(
        (l, d2), lambda i: (0, 0), memory_space=pltpu.VMEM
    )


# Grid iterations are independent — telling Mosaic lets it overlap the next
# iteration's DMA with this iteration's compute far more aggressively.
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))

# Packed kernels at wpp > 2 exceed Mosaic's default 16 MB scoped-VMEM cap
# (unrolled per-head score temporaries are not slot-reused); v5e has 128 MB
# VMEM and the pipeline buffers stay small, so raise the per-kernel budget
# (same rationale as window_qkv.py::_PARALLEL2).
_PARALLEL_BIG = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=96 * 1024 * 1024,
)


def _window_pallas(kernel, scale, tensors, tables, n_outputs):
    """Shared pallas_call boilerplate for every window kernel: head-grouped
    (B, H, L, D) ``tensors`` become one program per (window-batch,
    head-group); fp32 ``tables`` (RoPE cos/sin, (L, D//2)) broadcast to all
    programs. Returns ungrouped (B, H, L, D) output(s)."""
    b, h, l, d = tensors[0].shape
    g = _group(h)
    grouped = [_grouped(t, g) for t in tensors]
    out_shape = [
        jax.ShapeDtypeStruct(grouped[0].shape, t.dtype)
        for t in tensors[:n_outputs]
    ]
    out_specs = [_specs(g, l, d)] * n_outputs
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=out_shape if n_outputs > 1 else out_shape[0],
        grid=(grouped[0].shape[0],),
        in_specs=[_specs(g, l, d)] * len(tensors)
        + [_rope_specs(l, d // 2)] * len(tables),
        out_specs=out_specs if n_outputs > 1 else out_specs[0],
        compiler_params=_PARALLEL,
        interpret=_FORCE_INTERPRET,
    )(*grouped, *[t.astype(jnp.float32) for t in tables])
    if n_outputs == 1:
        return _ungrouped(out, b, h)
    return tuple(_ungrouped(o, b, h) for o in out)


def _use_packed(q) -> bool:
    """Packed layout needs an even head count; the full-lane win needs
    D % 64 == 0 (2D a multiple of the 128-lane vreg width) — relaxed under
    the interpreter so CPU parity tests can exercise the packed kernels at
    small D."""
    b, h, l, d = q.shape
    return _PACKED and h % 2 == 0 and (d % 64 == 0 or _FORCE_INTERPRET)


def packed_native_ok(heads: int, head_dim: int) -> bool:
    """Whether a caller that OWNS its layout (models/vit.py Attention) should
    build the head-pair-packed (B*H/2, L, 2D) chain and call
    window_attention[_rope]_packed directly — paying one relayout each way
    instead of the wrapper's pack/unpack on top of the head split (measured:
    the wrapper transposes ate the kernel's isolated 1.65x win at step
    level, scripts/probe_packed_chain.py)."""
    from .pallas_attention import _is_tpu_backend

    return (
        _PACKED
        and heads % 2 == 0
        and (head_dim % 64 == 0 or _FORCE_INTERPRET)
        and (_is_tpu_backend() or _FORCE_INTERPRET)
    )


def _pack(x):
    """(B, H, L, D) -> (B*H/2, L, 2D): head pair (2i, 2i+1) side by side in
    lanes. Composes with the caller's (B, L, H, D) -> (B, H, L, D) transpose
    into the same single relayout XLA already materializes for the grouped
    layout (heads 2i, 2i+1 are adjacent channels of the qkv projection)."""
    b, h, l, d = x.shape
    return (
        x.reshape(b, h // 2, 2, l, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b * (h // 2), l, 2 * d)
    )


def _unpack(x, b, h):
    n, l, d2 = x.shape
    d = d2 // 2
    return (
        x.reshape(b, h // 2, l, 2, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h, l, d)
    )


def _window_pallas_packed(kernel, scale, tensors, tables, n_outputs):
    """Packed-layout counterpart of _window_pallas: (B, H, L, D) tensors ride
    as (wpp, L, 2D) full-lane blocks, wpp=2 window-pairs per program when the
    grid divides (measured another ~15% over wpp=1: scripts/probe_packed.py)."""
    b, h, l, d = tensors[0].shape
    packed = [_pack(t) for t in tensors]
    n = packed[0].shape[0]
    wpp = _wpp_for(n)
    spec = pl.BlockSpec((wpp, l, 2 * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(packed[0].shape, t.dtype)
        for t in tensors[:n_outputs]
    ]
    out_specs = [spec] * n_outputs
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=out_shape if n_outputs > 1 else out_shape[0],
        grid=(n // wpp,),
        in_specs=[spec] * len(tensors)
        + [_rope_specs(l, d // 2)] * len(tables),
        out_specs=out_specs if n_outputs > 1 else out_specs[0],
        compiler_params=_PARALLEL_BIG,
        interpret=_FORCE_INTERPRET,
    )(*packed, *[t.astype(jnp.float32) for t in tables])
    if n_outputs == 1:
        return _unpack(out, b, h)
    return tuple(_unpack(o, b, h) for o in out)


def _packed_pallas(kernel, scale, tensors, tables, n_outputs):
    """pallas_call plumbing for tensors ALREADY in packed (N, L, 2D) layout —
    no pack/unpack relayouts (the caller owns the layout; see
    window_attention_packed)."""
    n, l, d2 = tensors[0].shape
    wpp = _wpp_for(n)
    spec = pl.BlockSpec((wpp, l, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(tensors[0].shape, t.dtype)
        for t in tensors[:n_outputs]
    ]
    out_specs = [spec] * n_outputs
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=out_shape if n_outputs > 1 else out_shape[0],
        grid=(n // wpp,),
        in_specs=[spec] * len(tensors)
        + [_rope_specs(l, d2 // 4)] * len(tables),
        out_specs=out_specs if n_outputs > 1 else out_specs[0],
        compiler_params=_PARALLEL_BIG,
        interpret=_FORCE_INTERPRET,
    )(*tensors, *[t.astype(jnp.float32) for t in tables])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def window_attention_packed(q, k, v, scale: float):
    """Fused window attention over head-pair-packed (N, L, 2D) tensors,
    N = B*H/2, heads (2i, 2i+1) side by side in lanes. The packed layout
    falls straight out of the qkv projection (heads are adjacent channels),
    so callers pay ONE relayout each way — same count as the grouped path —
    while the kernel DMAs full-width 128-lane blocks (~2.7x the D=64 rate,
    scripts/probe_dma_floor.py)."""
    return _wap_fwd(q, k, v, scale)[0]


def _wap_fwd(q, k, v, scale):
    out = _packed_pallas(_fwd_kernel_packed, scale, (q, k, v), (), 1)
    return out, (q, k, v)


def _wap_bwd(scale, residuals, do):
    q, k, v = residuals
    return _packed_pallas(_bwd_kernel_packed, scale, (q, k, v, do), (), 3)


window_attention_packed.defvjp(_wap_fwd, _wap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def window_attention_rope_packed(q, k, v, scale: float, cos, sin):
    """window_attention_packed with the RoPE rotation fused in-kernel.
    q/k UNROTATED in rotate-half layout per head; cos/sin: (L, D//2) with
    D the per-head dim (= q.shape[-1] // 2)."""
    return _warp_fwd(q, k, v, scale, cos, sin)[0]


def _warp_fwd(q, k, v, scale, cos, sin):
    out = _packed_pallas(
        _fwd_kernel_rope_packed, scale, (q, k, v), (cos, sin), 1
    )
    return out, (q, k, v, cos, sin)


def _warp_bwd(scale, residuals, do):
    q, k, v, cos, sin = residuals
    dq, dk, dv = _packed_pallas(
        _bwd_kernel_rope_packed, scale, (q, k, v, do), (cos, sin), 3
    )
    return dq, dk, dv, jnp.zeros_like(cos), jnp.zeros_like(sin)


window_attention_rope_packed.defvjp(_warp_fwd, _warp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def window_attention(q, k, v, scale: float):
    """Fused attention over full windows. q/k/v: (B, H, L, D), no mask."""
    return _wa_fwd(q, k, v, scale)[0]


def _wa_fwd(q, k, v, scale):
    if _use_packed(q):
        out = _window_pallas_packed(_fwd_kernel_packed, scale, (q, k, v), (), 1)
    else:
        fwd = _fwd_kernel_interleave if _INTERLEAVE else _fwd_kernel
        out = _window_pallas(fwd, scale, (q, k, v), (), 1)
    return out, (q, k, v)


def _wa_bwd(scale, residuals, do):
    q, k, v = residuals
    if _use_packed(q):
        return _window_pallas_packed(
            _bwd_kernel_packed, scale, (q, k, v, do), (), 3
        )
    return _window_pallas(_bwd_kernel, scale, (q, k, v, do), (), 3)


window_attention.defvjp(_wa_fwd, _wa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def window_attention_rope(q, k, v, scale: float, cos, sin):
    """Fused window attention with the RoPE rotation of q/k applied INSIDE the
    kernel. q/k: (B, H, L, D) UNROTATED, in rotate-half channel layout (see
    ops/rope.py::rope_half_perm); cos/sin: (L, D//2) angle tables (any float
    dtype; rotated in fp32 in-kernel). Numerics identical to
    ``apply_rope_half`` followed by ``window_attention``. Composes with the
    SAM3_WINDOW_INTERLEAVE forward pipeline (backward has no interleave
    variant in either path)."""
    return _war_fwd(q, k, v, scale, cos, sin)[0]


def _war_fwd(q, k, v, scale, cos, sin):
    if _use_packed(q):
        out = _window_pallas_packed(
            _fwd_kernel_rope_packed, scale, (q, k, v), (cos, sin), 1
        )
    else:
        fwd = _fwd_kernel_rope_interleave if _INTERLEAVE else _fwd_kernel_rope
        out = _window_pallas(fwd, scale, (q, k, v), (cos, sin), 1)
    return out, (q, k, v, cos, sin)


def _war_bwd(scale, residuals, do):
    q, k, v, cos, sin = residuals
    bwd_pallas = (
        _window_pallas_packed if _use_packed(q) else _window_pallas
    )
    bwd_kernel = (
        _bwd_kernel_rope_packed if _use_packed(q) else _bwd_kernel_rope
    )
    dq, dk, dv = bwd_pallas(
        bwd_kernel, scale, (q, k, v, do), (cos, sin), 3
    )
    # cos/sin are position tables (constants) — zero grads keep the vjp total
    return dq, dk, dv, jnp.zeros_like(cos), jnp.zeros_like(sin)


window_attention_rope.defvjp(_war_fwd, _war_bwd)
