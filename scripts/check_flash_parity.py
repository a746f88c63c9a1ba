"""TPU-side parity check: Pallas flash path vs the chunked-XLA oracle.

Run on the real chip (CPU falls back to the oracle itself, so this script is
meaningful only on TPU). Covers the SAM3 global-attention shape (5184, whose
query axis now runs unpadded with 2592-wide q blocks), a padded shape, and a
key-padding-mask case; forward and dx/dk/dv grads.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.ops.pallas_attention import chunked_attention, flash_attention


def check(name, b, h, l, d, masked=False, tol=2e-2):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, l, d), jnp.bfloat16)
    kw = {}
    if masked:
        kpm = jnp.zeros((b, l), bool).at[:, l - 100 :].set(True)
        kw["key_padding_mask"] = kpm

    out_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, **kw))(q, k, v)
    out_o = jax.jit(lambda q, k, v: chunked_attention(q, k, v, **kw))(q, k, v)
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_o.astype(jnp.float32))))
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name:28s} fwd maxerr {err:.5f}", flush=True)

    c = jax.random.normal(jax.random.fold_in(key, 3), out_f.shape, jnp.float32)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v, **kw).astype(jnp.float32) * c)

        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    gf = loss(flash_attention)(q, k, v)
    go = loss(chunked_attention)(q, k, v)
    for nm, a, b_ in zip(("dq", "dk", "dv"), gf, go):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
        # grads accumulate over L=5184 terms in bf16 — wider tolerance
        s = "OK " if e < tol * 50 else "FAIL"
        print(f"{s} {name:28s} {nm} maxerr {e:.5f}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    check("5184 unpadded-q", 2, 4, 5184, 64)
    check("5184 key-padding-mask", 2, 4, 5184, 64, masked=True)
    check("4096 pow2", 2, 4, 4096, 64)
