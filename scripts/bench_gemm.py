"""On-chip A/B: whole-weight-resident int8 GEMM kernel vs the XLA W8A8 path
vs plain bf16, at the trunk's real shapes (fc1/fc2/qkv/proj, bs8 tokens).

The roofline (scripts/roofline.py) puts ~56 TF/step of fwd+replay work in
these GEMMs; the XLA int8 path measured 133 TF/s (queue A). Prints achieved
TF/s per shape per path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.ops import gemm_int8
from sam3_lora_tpu.ops.quant import _int8_dot, _quant_lastdim, quantize_weight

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "30"))
N_TOK = B * 5184


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timeit(name, fn, *args, flops=None):
    fn = jax.jit(fn)
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    tf = f"  {flops / dt / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:8.2f} ms{tf}", flush=True)
    return dt


def xla_int8(x, wq, ws):
    xq, xs = _quant_lastdim(x)
    return (_int8_dot(xq, wq).astype(jnp.float32) * xs * ws).astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("fc1  (M,1024)x(1024,4736)", 1024, 4736),
        ("fc2  (M,4736)x(4736,1024)", 4736, 1024),
        ("qkv  (M,1024)x(1024,3072)", 1024, 3072),
        ("proj (M,1024)x(1024,1024)", 1024, 1024),
    ]
    for name, k, n in shapes:
        x = jax.random.normal(key, (N_TOK, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.float32)
        wq, ws = jax.jit(quantize_weight)(w)
        wb = w.astype(jnp.bfloat16)
        fl = 2 * N_TOK * k * n
        timeit(f"{name} bf16 XLA", lambda a, b_: a @ b_, x, wb, flops=fl)
        timeit(f"{name} int8 XLA W8A8", xla_int8, x, wq, ws, flops=fl)
        if gemm_int8.supported(N_TOK, k, n):
            timeit(
                f"{name} int8 PALLAS wres",
                lambda a, q_, s_: gemm_int8.int8_gemm_wres(a, q_, s_),
                x, wq, ws, flops=fl,
            )
        else:
            print(f"{name} int8 PALLAS wres: shape not supported")
        # dx = dy @ W^T at the same shape (the bwd's bf16 GEMM)
        dy = jax.random.normal(jax.random.fold_in(key, 2), (N_TOK, n),
                               jnp.bfloat16)
        timeit(
            f"{name} dx bf16 XLA (dy@W^T)",
            lambda d_, b_: jax.lax.dot_general(
                d_, b_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32),
            dy, wb, flops=fl,
        )
        if gemm_int8.supported_nt(N_TOK, k, n):
            timeit(
                f"{name} dx bf16 PALLAS wres",
                lambda d_, b_: gemm_int8.bf16_gemm_wres_nt(d_, b_),
                dy, wb, flops=fl,
            )


if __name__ == "__main__":
    main()
