"""DMA-floor block-shape sweep for the window-attention kernel.

probe_window_cost.py showed the production kernel is ~87% DMA/overhead-bound:
the pure-copy stage (same grid/blocks, no compute) costs 3.61 ms of the full
forward's 4.15 ms, i.e. ~94 GB/s effective for 340 MB of q/k/v/o traffic —
~11% of v5e HBM bandwidth. 576 programs x ~6.3 us each smells like
per-program overhead, not bandwidth. This sweep varies ONLY the block shape
(heads-per-program G, windows-per-program W, and a lane-packed D=128 layout)
on the pure-copy and the full-forward kernels to find the shape that
amortizes the overhead.

Run on the real chip:  python scripts/probe_dma_floor.py
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
TOTAL_BYTES = 4 * WB * H * L * D * 2  # q,k,v read + o write, bf16
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


def k_copy(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...]


def k_full(q_ref, k_ref, v_ref, o_ref, *, scale):
    # production forward math over however many (L, D) heads live in the block
    q = q_ref[...].reshape(-1, L, q_ref.shape[-1])
    k = k_ref[...].reshape(q.shape)
    v = v_ref[...].reshape(q.shape)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    r = 1.0 / jnp.sum(p, axis=-1)
    o_ref[...] = (o * r[..., None]).astype(o_ref.dtype).reshape(o_ref.shape)


def run(name, kernel, shape, block, with_scale):
    """shape: logical array shape; block: block shape, grid = shape[0]/block[0]."""
    q = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.bfloat16)
    nd = len(shape)
    idx = lambda i: (i,) + (0,) * (nd - 1)
    spec = pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)
    kern = functools.partial(kernel, scale=D ** -0.5) if with_scale else kernel
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shape, q.dtype),
        grid=(shape[0] // block[0],),
        in_specs=[spec] * 3,
        out_specs=spec,
        compiler_params=_PARALLEL,
    )
    timeit(f"{name} grid={shape[0] // block[0]}", call, q, k, v)


def main():
    n = WB * H  # 1152 head-windows
    print(f"== copy (DMA floor) block sweep, total {TOTAL_BYTES / 1e6:.0f} MB ==")
    # current production shape: (1, G, L, D)
    for g in (2, 4, 8):  # g=16 exceeds the 16 MB scoped-VMEM stack (18 MB)
        run(f"copy ({1},{g},{L},{D})", k_copy, (n // g, g, L, D), (1, g, L, D), False)
    # multiple windows per program at g=2
    for w in (2, 4):
        run(
            f"copy ({w},2,{L},{D})", k_copy,
            (n // 2, 2, L, D), (w, 2, L, D), False,
        )
    # lane-packed: two heads side by side in lanes -> (n/2, L, 128)
    run(f"copy packed ({1},{L},128)", k_copy, (n // 2, L, 128), (1, L, 128), False)
    run(f"copy packed ({4},{L},128)", k_copy, (n // 2, L, 128), (4, L, 128), False)
    # flat 2D giant blocks: pure bandwidth ceiling reference
    run("copy flat (8, 4608, 128)", k_copy, (n // 2 // 8, 8 * L, 128), (1, 8 * L, 128), False)

    print("== full forward block sweep ==")
    for g in (2, 4):
        run(f"full ({1},{g},{L},{D})", k_full, (n // g, g, L, D), (1, g, L, D), True)
    run(f"full ({2},2,{L},{D})", k_full, (n // 2, 2, L, D), (2, 2, L, D), True)
    run(f"full ({4},2,{L},{D})", k_full, (n // 2, 2, L, D), (4, 2, L, D), True)


if __name__ == "__main__":
    main()
