"""Microbench the fusion encoder's self-attention shape on the real chip.

Shape (B, H, L, D) = (8, 8, 5632, 32): 5184 image tokens padded to 5632,
d_model 256 over 8 heads = head_dim 32. At D=32 the MXU contraction depth
caps utilization at 25%, so the question is where the library flash kernel
actually lands fwd and fwd+bwd, and what a chunked online-softmax XLA
formulation (HBM-traffic-bound) does in comparison — this decides whether a
custom head-grouped Pallas kernel (4 heads x 32 = 128 lanes per block) is
worth building for the encoder.

Prints per-impl: fwd ms / fwd TF/s, fwd+bwd ms / TF/s (bwd ~ 2.5x fwd
FLOPs). Host-fetch barriers (the tunnel ignores block_until_ready).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

B = int(os.environ.get("EB", "8"))
H = int(os.environ.get("EH", "8"))
L = int(os.environ.get("EL", "5632"))
D = int(os.environ.get("ED", "32"))
REPS = int(os.environ.get("REPS", "5"))

FWD_FLOPS = 2 * B * H * L * L * D * 2  # QK^T + PV
BWD_FLOPS = int(2.5 * FWD_FLOPS)


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, flops):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    fetch(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt * 1e3:9.2f} ms   {flops / dt / 1e12:6.1f} TF/s")
    return dt


def chunked_ckpt(q, k, v, *, chunk=512):
    """Online-softmax over k-chunks, jax.checkpoint'ed body (the rpb_attention
    pattern minus the bias): bwd replays per-chunk logits from small carries."""
    b, h, l, d = q.shape
    n = l // chunk
    kc = jnp.moveaxis(k.reshape(b, h, n, chunk, d), 2, 0)
    vc = jnp.moveaxis(v.reshape(b, h, n, chunk, d), 2, 0)
    scale = jnp.float32(d ** -0.5)

    def body(carry, args):
        m, s, acc = carry
        k_c, v_c = args
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_c, preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, logits.max(-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        s_new = s * corr + p.sum(-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_c.dtype), v_c,
            preferred_element_type=jnp.float32,
        )
        return (m_new, s_new, acc_new), None

    init = (
        jnp.full((b, h, l), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, l), jnp.float32),
        jnp.zeros((b, h, l, d), jnp.float32),
    )
    (m, s, acc), _ = jax.lax.scan(jax.checkpoint(body), init, (kc, vc))
    return (acc / s[..., None]).astype(v.dtype)


def main():
    from sam3_lora_tpu.ops.pallas_attention import flash_attention

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, L, D), jnp.bfloat16)
    print(f"shape B={B} H={H} L={L} D={D}  fwd {FWD_FLOPS/1e9:.0f} GF")

    from sam3_lora_tpu.ops.long_attention import long_attention, supported

    impls = {
        "library flash": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
        "chunked ckpt (xla online-softmax)": jax.jit(chunked_ckpt),
    }
    if supported(L, H, D):
        impls["long kernel (whole-KV packed)"] = jax.jit(
            lambda q, k, v: long_attention(q, k, v, D ** -0.5)
        )
    for name, fn in impls.items():
        try:
            timeit(f"{name} fwd", fn, q, k, v, flops=FWD_FLOPS)
        except Exception as e:  # noqa: BLE001
            print(f"{name} fwd FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        g = jax.jit(
            jax.grad(lambda q, k, v: (fn(q, k, v).astype(jnp.float32) ** 2).sum(),
                     argnums=(0, 1, 2))
        )
        try:
            timeit(f"{name} fwd+bwd", g, q, k, v, flops=FWD_FLOPS + BWD_FLOPS)
        except Exception as e:  # noqa: BLE001
            print(f"{name} fwd+bwd FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
