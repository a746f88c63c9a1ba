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

    def qk(i):
        return jax.lax.dot_general(
            q[i], k[i], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    s_next = qk(0)
    for i in range(g):
        s_i = s_next
        if i + 1 < g:
            s_next = qk(i + 1)  # MXU work issued before head i's VPU passes
        p = jnp.exp(s_i - jnp.max(s_i, axis=-1, keepdims=True))
        r = 1.0 / jnp.sum(p, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, i] = (o * r[:, None]).astype(o_ref.dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (G, L, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, L, L) fp32, lives in VMEM only
    # softmax with the normalization moved off the (L, L) matrix: the MXU
    # work here is only ~1.7 us/program, so every elementwise pass over the
    # 576x576 scores is on the critical (VPU) path. exp(s-max) is unavoidable,
    # but the divide is applied to the (L, D) OUTPUT via reciprocal-multiply
    # (9x fewer elements than normalizing p, and mul not div).
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))  # unnormalized
    r = 1.0 / jnp.sum(p, axis=-1)                        # (G, L)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o * r[..., None]).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    # Unnormalized softmax; the 1/rowsum factor is folded into (G, L, D)
    # row-scalings (dO for dV, Q for dK, the dQ output) so no (G, L, L)
    # tensor is ever divided or normalized — rationale as in _fwd_kernel.
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))  # (G, L, L) fp32
    inv = 1.0 / jnp.sum(p, axis=-1)                      # (G, L)
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
    c = inv * jnp.sum(dp * p, axis=-1)                   # (G, L)
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
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _grouped(x, g):
    b, h, l, d = x.shape
    return x.reshape(b * (h // g), g, l, d)


def _ungrouped(x, b, h):
    bg, g, l, d = x.shape
    return x.reshape(b, h, l, d)


def _specs(g, l, d):
    return pl.BlockSpec((1, g, l, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)


# Grid iterations are independent — telling Mosaic lets it overlap the next
# iteration's DMA with this iteration's compute far more aggressively.
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def window_attention(q, k, v, scale: float):
    """Fused attention over full windows. q/k/v: (B, H, L, D), no mask."""
    return _wa_fwd(q, k, v, scale)[0]


def _wa_fwd(q, k, v, scale):
    b, h, l, d = q.shape
    g = HEAD_GROUP if h % HEAD_GROUP == 0 else 1
    qg, kg, vg = _grouped(q, g), _grouped(k, g), _grouped(v, g)
    fwd = _fwd_kernel_interleave if _INTERLEAVE else _fwd_kernel
    out = pl.pallas_call(
        functools.partial(fwd, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qg.shape, v.dtype),
        grid=(qg.shape[0],),
        in_specs=[_specs(g, l, d)] * 3,
        out_specs=_specs(g, l, d),
        compiler_params=_PARALLEL,
    )(qg, kg, vg)
    return _ungrouped(out, b, h), (q, k, v)


def _wa_bwd(scale, residuals, do):
    q, k, v = residuals
    b, h, l, d = q.shape
    g = HEAD_GROUP if h % HEAD_GROUP == 0 else 1
    qg, kg, vg, dog = (
        _grouped(q, g), _grouped(k, g), _grouped(v, g), _grouped(do, g)
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct(qg.shape, q.dtype),
            jax.ShapeDtypeStruct(kg.shape, k.dtype),
            jax.ShapeDtypeStruct(vg.shape, v.dtype),
        ],
        grid=(qg.shape[0],),
        in_specs=[_specs(g, l, d)] * 4,
        out_specs=[_specs(g, l, d)] * 3,
        compiler_params=_PARALLEL,
    )(qg, kg, vg, dog)
    return (
        _ungrouped(dq, b, h),
        _ungrouped(dk, b, h),
        _ungrouped(dv, b, h),
    )


window_attention.defvjp(_wa_fwd, _wa_bwd)
