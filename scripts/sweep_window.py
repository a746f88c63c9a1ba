"""Focused microbench of the fused window-attention kernel only.

Reads SAM3_WINDOW_HEAD_GROUP / SAM3_WINDOW_INTERLEAVE from the environment
(consumed at import inside ops/window_attention.py), so each configuration
must run in a fresh process:

    for g in 1 2 4; do for il in 0 1; do
      SAM3_WINDOW_HEAD_GROUP=$g SAM3_WINDOW_INTERLEAVE=$il python scripts/sweep_window.py
    done; done

Prints one line per timer tagged with the config so logs are greppable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "20"))


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
    print(f"{name:60s} {dt * 1e3:8.2f} ms{tf}", flush=True)
    return dt


def main():
    g = os.environ.get("SAM3_WINDOW_HEAD_GROUP", "?")
    il = os.environ.get("SAM3_WINDOW_INTERLEAVE", "0")
    tag = f"[g={g} il={il}]"
    key = jax.random.PRNGKey(0)

    WB, HD, L, DH = B * 9, 16, 576, 64
    q = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    k = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    v = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    attn_flops = 4 * WB * HD * L * L * DH

    from sam3_lora_tpu.ops.window_attention import window_attention

    scale = DH ** -0.5
    timeit(f"window attn fwd {tag}",
           lambda a, b_, c: window_attention(a, b_, c, scale),
           q, k, v, flops=attn_flops)

    def wa_bwd(a, b_, c):
        f = lambda a, b_, c: jnp.sum(
            window_attention(a, b_, c, scale).astype(jnp.float32))
        return jax.grad(f, argnums=(0, 1, 2))(a, b_, c)

    timeit(f"window attn fwd+bwd {tag}", wa_bwd, q, k, v,
           flops=attn_flops * 3.5)


if __name__ == "__main__":
    main()
