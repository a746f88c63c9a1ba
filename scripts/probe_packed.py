"""Packed-lane window-attention candidates.

probe_dma_floor.py: D=64 blocks DMA at ~95 GB/s, 128-lane blocks at ~258
GB/s (2.8x). So the kernel input should be head-PAIR-packed (N, L, 128)
(two 64-channel heads side by side in lanes). This probe times the in-kernel
math options on that layout, fwd and bwd:

  slice    split qp[:, :64] / qp[:, 64:] in VMEM, run the per-head math
  blockdiag keep the packed qp; build block-diagonal kp/vp (2L, 128) so the
           contraction is a single full-128-deep MXU pass (same MACs, no
           cross-head terms)

plus the packed copy floor and the current production forward for reference.

Run on the real chip:  python scripts/probe_packed.py
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
WB, H, L, D = B * 9, 16, 576, 64
N = WB * H // 2  # packed pairs
TOTAL_BYTES = 4 * WB * H * L * D * 2
FLOPS = 4 * WB * H * L * L * D
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timeit(name, fn, *args):
    fn = jax.jit(fn)
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    print(
        f"{name:44s} {dt * 1e3:8.3f} ms  "
        f"{TOTAL_BYTES / dt / 1e9:7.1f} GB/s  {FLOPS / dt / 1e12:6.1f} TF/s",
        flush=True,
    )
    return dt


def _head_attn(q, k, v, scale):
    """(L, D) per-head production forward math, fp32 softmax."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (o / jnp.sum(p, axis=-1)[:, None]).astype(v.dtype)


def k_copy(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...]


def k_slice(q_ref, k_ref, v_ref, o_ref, *, scale):
    for w in range(q_ref.shape[0]):
        qp, kp, vp = q_ref[w], k_ref[w], v_ref[w]
        o0 = _head_attn(qp[:, :D], kp[:, :D], vp[:, :D], scale)
        o1 = _head_attn(qp[:, D:], kp[:, D:], vp[:, D:], scale)
        o_ref[w] = jnp.concatenate([o0, o1], axis=-1)


def k_blockdiag(q_ref, k_ref, v_ref, o_ref, *, scale):
    z = jnp.zeros((L, D), k_ref.dtype)
    for w in range(q_ref.shape[0]):
        qp, kp_in, vp_in = q_ref[w], k_ref[w], v_ref[w]
        kp = jnp.concatenate(
            [jnp.concatenate([kp_in[:, :D], z], -1),
             jnp.concatenate([z, kp_in[:, D:]], -1)], 0)        # (2L, 2D)
        vp = jnp.concatenate(
            [jnp.concatenate([vp_in[:, :D], z], -1),
             jnp.concatenate([z, vp_in[:, D:]], -1)], 0)
        s = jax.lax.dot_general(
            qp, kp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                               # (L, 2L)
        m0 = jnp.max(s[:, :L], axis=-1, keepdims=True)
        m1 = jnp.max(s[:, L:], axis=-1, keepdims=True)
        p = jnp.exp(s - jnp.concatenate(
            [jnp.broadcast_to(m0, (L, L)), jnp.broadcast_to(m1, (L, L))], -1))
        o = jax.lax.dot_general(
            p.astype(vp.dtype), vp, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # (L, 2D)
        r0 = 1.0 / jnp.sum(p[:, :L], axis=-1)
        r1 = 1.0 / jnp.sum(p[:, L:], axis=-1)
        o_ref[w] = jnp.concatenate(
            [o[:, :D] * r0[:, None], o[:, D:] * r1[:, None]], -1
        ).astype(o_ref.dtype)


def _head_bwd(q, k, v, do, scale):
    """(L, D) per-head production backward math (see ops/window_attention)."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    inv = (1.0 / jnp.sum(p, axis=-1))[:, None]
    pb = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        pb, do * inv.astype(do.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_un = jax.lax.dot_general(
        pb, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c = inv * jnp.sum(do.astype(jnp.float32) * o_un, axis=-1, keepdims=True)
    ds = (p * (dp - c)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * inv)
    dk = jax.lax.dot_general(
        ds, q * (scale * inv).astype(q.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq.astype(q.dtype), dk.astype(q.dtype), dv.astype(q.dtype)


def k_bwd_slice(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    for w in range(q_ref.shape[0]):
        qp, kp, vp, dop = q_ref[w], k_ref[w], v_ref[w], do_ref[w]
        g0 = _head_bwd(qp[:, :D], kp[:, :D], vp[:, :D], dop[:, :D], scale)
        g1 = _head_bwd(qp[:, D:], kp[:, D:], vp[:, D:], dop[:, D:], scale)
        dq_ref[w] = jnp.concatenate([g0[0], g1[0]], -1)
        dk_ref[w] = jnp.concatenate([g0[1], g1[1]], -1)
        dv_ref[w] = jnp.concatenate([g0[2], g1[2]], -1)


def run(name, kernel, wpp, n_in, n_out, with_scale):
    """wpp: window-pairs per program."""
    shape = (N, L, 2 * D)
    args = [
        jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
        for i in range(n_in)
    ]
    spec = pl.BlockSpec((wpp, L, 2 * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(kernel, scale=D ** -0.5) if with_scale else kernel
    out_shape = [jax.ShapeDtypeStruct(shape, jnp.bfloat16)] * n_out
    call = pl.pallas_call(
        kern,
        out_shape=out_shape if n_out > 1 else out_shape[0],
        grid=(N // wpp,),
        in_specs=[spec] * n_in,
        out_specs=[spec] * n_out if n_out > 1 else spec,
        compiler_params=_PARALLEL,
    )
    timeit(f"{name} grid={N // wpp}", call, *args)


def main():
    print(f"== packed-lane candidates (N={N} pairs, {TOTAL_BYTES/1e6:.0f} MB fwd traffic) ==")
    run("copy packed", k_copy, 1, 3, 1, False)
    run("fwd slice (wpp=1)", k_slice, 1, 3, 1, True)
    run("fwd slice (wpp=2)", k_slice, 2, 3, 1, True)
    run("fwd blockdiag (wpp=1)", k_blockdiag, 1, 3, 1, True)
    print("== backward (7 tensors traffic; GB/s column understates by 7/4) ==")
    run("bwd slice (wpp=1)", k_bwd_slice, 1, 4, 3, True)
    run("bwd slice (wpp=2)", k_bwd_slice, 2, 4, 3, True)

    # correctness: slice fwd vs reference math
    q = jax.random.normal(jax.random.PRNGKey(0), (4, L, 2 * D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), q.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), q.shape, jnp.bfloat16)
    spec = pl.BlockSpec((1, L, 2 * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    for name, kern in (("slice", k_slice), ("blockdiag", k_blockdiag)):
        got = pl.pallas_call(
            functools.partial(kern, scale=D ** -0.5),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(4,), in_specs=[spec] * 3, out_specs=spec,
            compiler_params=_PARALLEL,
        )(q, k, v)
        ref = jnp.concatenate(
            [jax.vmap(_head_attn, (0, 0, 0, None))(
                q[..., s], k[..., s], v[..., s], D ** -0.5)
             for s in (slice(None, D), slice(D, None))], -1)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"fwd {name} max abs err vs per-head math: {err:.2e}")


if __name__ == "__main__":
    main()
