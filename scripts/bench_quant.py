"""Microbench: int8 W8A8 GEMM tier vs bf16 at the ViT trunk shapes (real chip).

Measures fwd-only and fwd+bwd (grad w.r.t. x, the train-step pattern for a
frozen base) for mlp fc1 (1024x4736) and qkv (1024x3072) at the full-batch
token count. Run alone — concurrent host jobs skew tunnel benches.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.ops.quant import int8_matmul

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "20"))


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timeit(name, fn, *args, flops=None):
    fn = jax.jit(fn)
    out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    tf = f"  {flops / dt / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:44s} {dt * 1e3:8.2f} ms{tf}")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    N = B * 5184
    D = 1024

    for H, tag in ((4736, "mlp fc1"), (3072, "qkv")):
        x = jax.random.normal(key, (N, D), jnp.bfloat16)
        w = jax.random.normal(key, (D, H), jnp.bfloat16) * 0.02
        fl = 2 * N * D * H

        timeit(f"bf16 {tag} fwd", lambda a, b_: a @ b_, x, w, flops=fl)
        timeit(f"int8 {tag} fwd", lambda a, b_: int8_matmul(a, b_, False), x, w, flops=fl)
        timeit(f"int8 {tag} fwd (bwd_int8)", lambda a, b_: int8_matmul(a, b_, True), x, w, flops=fl)

        def loss_bf16(a, b_):
            return jnp.sum((a @ b_).astype(jnp.float32))

        def loss_i8(a, b_):
            return jnp.sum(int8_matmul(a, b_, False).astype(jnp.float32))

        def loss_i8b(a, b_):
            return jnp.sum(int8_matmul(a, b_, True).astype(jnp.float32))

        timeit(f"bf16 {tag} fwd+dx", jax.grad(loss_bf16, argnums=0), x, w, flops=4 * N * D * H)
        timeit(f"int8 {tag} fwd+dx", jax.grad(loss_i8, argnums=0), x, w, flops=4 * N * D * H)
        timeit(f"int8 {tag} fwd+dx (bwd_int8)", jax.grad(loss_i8b, argnums=0), x, w, flops=4 * N * D * H)


if __name__ == "__main__":
    main()
