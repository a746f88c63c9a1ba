"""Stage-cost probe for the fused window-attention kernel.

The r2 finding "20-24 TF/s across ALL structural variants" is suspicious: if
the kernel were bound by the max/sum VPU passes, removing them (NO_MAX /
MXU_SUM) should have moved the number. This probe isolates each stage with
pallas kernels that share the SAME grid / DMA profile as the production
kernel (one program per (window-batch, head-group), g=2, L=576, D=64) and
differ by exactly one stage, so subtraction attributes the time:

    copy         o = q                          (DMA floor)
    qk_pv        o = (QK^T)bf16 @ V             (MXU only)
    qk_exp_pv    o = exp(QK^T) @ V              (+ exp pass)
    qk_fexp_pv   o = fast_exp2(QK^T*log2e) @ V  (+ polynomial exp2 instead)
    qk_mexp_pv   o = exp(QK^T - rowmax) @ V     (+ max & subtract passes)
    full         production forward             (+ rowsum + reciprocal-scale)
    full_bf16s   scores accumulated in bf16     (halves score VMEM traffic)

Plus raw VPU op-rate probes (elem/s for add / max-reduce / exp / exp2 /
fast_exp2, fp32 vs bf16) on a resident (576, 576) tile.

Run on the real chip:  python scripts/probe_window_cost.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "30"))
WB, H, L, D, G = B * 9, 16, 576, 64, 2
_LOG2E = 1.4426950408889634


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timeit(name, fn, *args, flops=None, elems=None):
    fn = jax.jit(fn)
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:7.1f} TF/s"
    if elems:
        extra += f"  {elems / dt / 1e9:8.2f} Gelem/s"
    print(f"{name:34s} {dt * 1e3:8.3f} ms{extra}", flush=True)
    return dt


def fast_exp2(x):
    """Polynomial 2^x (fp32): round/poly/bitcast-scale, all full-rate VPU ops.

    Max relative error ~3e-5 on the fractional part — far inside the bf16
    cast noise (eps 7.8e-3) the production kernel applies to p anyway.
    """
    xi = jnp.clip(jnp.round(x), -126.0, 127.0)
    f = x - xi
    p = 1.0 + f * (
        0.6931471805599453
        + f * (0.2402265069591007 + f * (0.05550410866482158 + f * 0.009618129107628477))
    )
    scale = jax.lax.bitcast_convert_type(
        ((xi.astype(jnp.int32) + 127) << 23), jnp.float32
    )
    return p * scale


# ---------------- stage kernels (production grid/DMA profile) ----------------

def _qk(q, k, mult=1.0):
    return jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * mult


def _pv(p, v):
    return jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def k_copy(q_ref, k_ref, v_ref, o_ref, *, scale):
    o_ref[0] = q_ref[0]


def k_qk_pv(q_ref, k_ref, v_ref, o_ref, *, scale):
    s = _qk(q_ref[0], k_ref[0], scale)
    o_ref[0] = _pv(s, v_ref[0]).astype(o_ref.dtype)


def k_qk_exp_pv(q_ref, k_ref, v_ref, o_ref, *, scale):
    p = jnp.exp(_qk(q_ref[0], k_ref[0], scale))
    o_ref[0] = _pv(p, v_ref[0]).astype(o_ref.dtype)


def k_qk_exp2_pv(q_ref, k_ref, v_ref, o_ref, *, scale):
    p = jnp.exp2(_qk(q_ref[0], k_ref[0], scale * _LOG2E))
    o_ref[0] = _pv(p, v_ref[0]).astype(o_ref.dtype)


def k_qk_fexp_pv(q_ref, k_ref, v_ref, o_ref, *, scale):
    p = fast_exp2(_qk(q_ref[0], k_ref[0], scale * _LOG2E))
    o_ref[0] = _pv(p, v_ref[0]).astype(o_ref.dtype)


def k_qk_mexp_pv(q_ref, k_ref, v_ref, o_ref, *, scale):
    s = _qk(q_ref[0], k_ref[0], scale)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    o_ref[0] = _pv(p, v_ref[0]).astype(o_ref.dtype)


def k_full(q_ref, k_ref, v_ref, o_ref, *, scale):
    s = _qk(q_ref[0], k_ref[0], scale)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    o = _pv(p, v_ref[0])
    r = 1.0 / jnp.sum(p, axis=-1)
    o_ref[0] = (o * r[..., None]).astype(o_ref.dtype)


def k_full_fexp(q_ref, k_ref, v_ref, o_ref, *, scale):
    s = _qk(q_ref[0], k_ref[0], scale * _LOG2E)
    p = fast_exp2(s - jnp.max(s, axis=-1, keepdims=True))
    o = _pv(p, v_ref[0])
    r = 1.0 / jnp.sum(p, axis=-1)
    o_ref[0] = (o * r[..., None]).astype(o_ref.dtype)


def k_full_bf16s(q_ref, k_ref, v_ref, o_ref, *, scale):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16,
    ) * jnp.bfloat16(scale)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    o = _pv(p, v_ref[0])
    r = 1.0 / jnp.sum(p.astype(jnp.float32), axis=-1)
    o_ref[0] = (o * r[..., None]).astype(o_ref.dtype)


def _pack_ops(q, k, v):
    """Head-packed operands (VERDICT r2 lever): qp = [q0|q1] (L, 2D);
    kp/vp block-diagonal (2L, 2D). Then qp@kp^T = [q0k0^T | q1k1^T] with a
    FULL 128-deep contraction, and p_packed@vp = [p0v0 | p1v1] with a FULL
    128-wide output — both matmuls hit native MXU shape; the price is the
    zero-multiplies (same MAC count as the 50%-utilized unpacked pair) plus
    building the block-diagonal operands on the VPU."""
    z = jnp.zeros((L, D), k.dtype)
    qp = jnp.concatenate([q[0], q[1]], axis=-1)                      # (L, 2D)
    kp = jnp.concatenate(
        [jnp.concatenate([k[0], z], -1), jnp.concatenate([z, k[1]], -1)], 0
    )                                                                # (2L, 2D)
    vp = jnp.concatenate(
        [jnp.concatenate([v[0], z], -1), jnp.concatenate([z, v[1]], -1)], 0
    )
    return qp, kp, vp


def k_qk_pv_packed(q_ref, k_ref, v_ref, o_ref, *, scale):
    qp, kp, vp = _pack_ops(q_ref[0], k_ref[0], v_ref[0])
    s = jax.lax.dot_general(
        qp, kp, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                                        # (L, 2L)
    o = jax.lax.dot_general(
        s.astype(vp.dtype), vp, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                                # (L, 2D)
    o_ref[0, 0] = o[:, :D].astype(o_ref.dtype)
    o_ref[0, 1] = o[:, D:].astype(o_ref.dtype)


def k_full_packed(q_ref, k_ref, v_ref, o_ref, *, scale):
    qp, kp, vp = _pack_ops(q_ref[0], k_ref[0], v_ref[0])
    s = jax.lax.dot_general(
        qp, kp, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    # per-head rowmax: the packed row holds BOTH heads' scores side by side
    m0 = jnp.max(s[:, :L], axis=-1, keepdims=True)
    m1 = jnp.max(s[:, L:], axis=-1, keepdims=True)
    p = jnp.exp(s - jnp.concatenate(
        [jnp.broadcast_to(m0, (L, L)), jnp.broadcast_to(m1, (L, L))], -1))
    o = jax.lax.dot_general(
        p.astype(vp.dtype), vp, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r0 = 1.0 / jnp.sum(p[:, :L], axis=-1)
    r1 = 1.0 / jnp.sum(p[:, L:], axis=-1)
    o_ref[0, 0] = (o[:, :D] * r0[:, None]).astype(o_ref.dtype)
    o_ref[0, 1] = (o[:, D:] * r1[:, None]).astype(o_ref.dtype)


def run_stage(name, kernel, q, k, v, flops):
    spec = pl.BlockSpec((1, G, L, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(kernel, scale=D ** -0.5),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(q.shape[0],),
        in_specs=[spec] * 3,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )
    timeit(name, call, q, k, v, flops=flops)


# ---------------- raw VPU op-rate probes ----------------

def vpu_probe(name, body, x, n=64, elems_per_pass=L * L):
    def kern(x_ref, o_ref):
        y = x_ref[...]
        y = jax.lax.fori_loop(0, n, lambda i, y: body(y), y)
        o_ref[...] = y

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    timeit(name, call, x, elems=n * elems_per_pass)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (WB * H // G, G, L, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape, jnp.bfloat16)
    flops = 4 * WB * H * L * L * D

    print(f"== stage kernels (grid {q.shape[0]}, g={G}, L={L}, D={D}) ==")
    run_stage("copy (DMA floor)", k_copy, q, k, v, flops)
    run_stage("qk_pv (MXU only)", k_qk_pv, q, k, v, flops)
    run_stage("qk_exp_pv (+exp)", k_qk_exp_pv, q, k, v, flops)
    run_stage("qk_exp2_pv (+exp2)", k_qk_exp2_pv, q, k, v, flops)
    run_stage("qk_fexp_pv (+fast_exp2)", k_qk_fexp_pv, q, k, v, flops)
    run_stage("qk_mexp_pv (+max+sub+exp)", k_qk_mexp_pv, q, k, v, flops)
    run_stage("full (prod fwd)", k_full, q, k, v, flops)
    run_stage("full_fexp (prod + fast_exp2)", k_full_fexp, q, k, v, flops)
    run_stage("full_bf16s (bf16 scores)", k_full_bf16s, q, k, v, flops)
    run_stage("qk_pv_packed (128-wide MXU)", k_qk_pv_packed, q, k, v, flops)
    run_stage("full_packed (prod, 128-wide)", k_full_packed, q, k, v, flops)

    print("== raw VPU op rates (resident 576x576 tile, 64 chained passes) ==")
    x32 = jnp.abs(jax.random.normal(key, (L, L), jnp.float32)) + 0.5
    x16 = x32.astype(jnp.bfloat16)
    vpu_probe("add fp32", lambda y: y + 1e-7, x32)
    vpu_probe("mul fp32", lambda y: y * 1.0000001, x32)
    vpu_probe("exp fp32 (chained)", lambda y: jnp.exp(-y) + 0.5, x32)
    vpu_probe("exp2 fp32 (chained)", lambda y: jnp.exp2(-y) + 0.5, x32)
    vpu_probe("fast_exp2 fp32", lambda y: fast_exp2(-y) + 0.5, x32)
    vpu_probe("maxreduce fp32",
              lambda y: y + jnp.max(y, axis=-1, keepdims=True) * 1e-9, x32)
    vpu_probe("add bf16", lambda y: y + jnp.bfloat16(1e-3), x16)
    vpu_probe("exp bf16 (chained)",
              lambda y: jnp.exp(-y) + jnp.bfloat16(0.5), x16)

    # correctness of fast_exp2 vs exp2 on the probe range
    xs = jnp.linspace(-30.0, 5.0, 4097, dtype=jnp.float32)
    ref = jnp.exp2(xs)
    got = jax.jit(fast_exp2)(xs)
    rel = np.asarray(jnp.max(jnp.abs(got - ref) / jnp.maximum(ref, 1e-30)))
    print(f"fast_exp2 max rel err on [-30, 5]: {rel:.3e}")


if __name__ == "__main__":
    main()
