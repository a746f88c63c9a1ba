"""Measures the window-attention CHAIN as the ViT block sees it: from the
qkv projection output (B, L, 3, H, D) through head split -> attention ->
head merge (B, L, H*D). Explains why the packed kernel won 1.65x in
isolation (scripts/probe_packed.py) but moved the full step 0%: the wrapper
packs (B, H, L, D) -> (B*H/2, L, 2D) with transposes XLA must materialize
on top of the caller's split/merge transposes. A packed-NATIVE chain does
ONE relayout each way (same count as the grouped path) straight from the
projection layout.

Run on the real chip:  python scripts/probe_packed_chain.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.ops import window_attention as wa

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "30"))
WB, H, L, D = B * 9, 16, 576, 64
SCALE = D ** -0.5


def _fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(name, fn, *args):
    fn = jax.jit(fn)
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:46s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def chain_grouped(qkv):
    # vit.py:107-110 split -> grouped kernel -> merge_heads
    q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]
    o = wa.window_attention(q, k, v, SCALE)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(WB, L, H * D)


def chain_packed_native(qkv):
    # ONE transpose each way, straight from the projection layout
    qkv_p = qkv.reshape(WB, L, 3, H // 2, 2 * D)
    q, k, v = [
        jnp.transpose(qkv_p[:, :, i], (0, 2, 1, 3)).reshape(-1, L, 2 * D)
        for i in range(3)
    ]
    o = wa.window_attention_packed(q, k, v, SCALE)
    o = o.reshape(WB, H // 2, L, 2 * D)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(WB, L, H * D)


def main():
    qkv = jax.random.normal(
        jax.random.PRNGKey(0), (WB, L, 3, H, D), jnp.bfloat16
    )

    wa._PACKED = False
    timeit("chain grouped (_PACKED=0)", chain_grouped, qkv)
    wa._PACKED = True
    timeit("chain packed-via-wrapper (_PACKED=1)", chain_grouped, qkv)
    if hasattr(wa, "window_attention_packed"):
        timeit("chain packed-NATIVE", chain_packed_native, qkv)
        # correctness vs grouped
        wa._PACKED = False
        ref = jax.jit(chain_grouped)(qkv)
        got = jax.jit(chain_packed_native)(qkv)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"packed-native vs grouped max abs err: {err:.2e}")

    # gradient chains (what remat replay + bwd cost per block)
    def loss_grouped(qkv):
        return jnp.sum(chain_grouped(qkv).astype(jnp.float32) ** 2)

    def loss_packed(qkv):
        return jnp.sum(chain_packed_native(qkv).astype(jnp.float32) ** 2)

    wa._PACKED = False
    timeit("grad chain grouped", jax.grad(loss_grouped), qkv)
    if hasattr(wa, "window_attention_packed"):
        timeit("grad chain packed-NATIVE", jax.grad(loss_packed), qkv)


if __name__ == "__main__":
    main()
