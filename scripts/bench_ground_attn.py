"""Microbench the grounding stack's two hot attentions on the real chip.

(a) Decoder image cross-attention (Lq=401, Lk=5184, 8 heads x d32) with the
    separable boxRPB bias, three formulations:
      1. dense  — rpb_dense_bias materialized then XLA attention (current)
      2. fused  — bias broadcast-added to logits in (H, W) view, no transpose
      3. chunked— online-softmax scan over K row-chunks, bias built per chunk
(b) Fusion-encoder self-attention (L=5184, 8 heads x d32):
      1. stock pallas flash at d=32 (current)
      2. d zero-padded 32->64 through the same kernel (same math, MXU tiles)

Each timed fwd and fwd+grad (grads wrt inputs — the adapter-training shape).
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
HEADS, DH = 8, 32
Q, GH, GW = 401, 72, 72
HW = GH * GW


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
    print(f"{name:46s} {dt * 1e3:8.2f} ms")
    return dt


def dense_bias_attn(q, k, v, dy, dx):
    from sam3_lora_tpu.models.decoder import rpb_dense_bias

    bias = rpb_dense_bias(dy, dx)  # (B, H, Q, HW)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (DH ** -0.5)
    probs = jax.nn.softmax(logits + bias.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def fused_bias_attn(q, k, v, dy, dx):
    # logits viewed as (B, H, Q, GH, GW); bias halves broadcast in place —
    # no (B,H,Q,HW) bias tensor, no transpose
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (DH ** -0.5)
    logits = logits.reshape(B, HEADS, Q, GH, GW)
    logits = logits + jnp.transpose(dy, (0, 3, 1, 2))[:, :, :, :, None]
    logits = logits + jnp.transpose(dx, (0, 3, 1, 2))[:, :, :, None, :]
    probs = jax.nn.softmax(logits.reshape(B, HEADS, Q, HW), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def chunked_bias_attn(q, k, v, dy, dx, rows: int = 8):
    """Online-softmax over K chunks of `rows` grid rows (rows*72 keys)."""
    n_chunks = GH // rows
    kc = k.reshape(B, HEADS, n_chunks, rows * GW, DH)
    vc = v.reshape(B, HEADS, n_chunks, rows * GW, DH)
    dyc = dy.reshape(B, Q, n_chunks, rows, HEADS)

    def body(carry, args):
        m, s, acc = carry
        k_c, v_c, dy_c = args  # (B,H,rc,D), (B,H,rc,D), (B,Q,rows,H)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_c, preferred_element_type=jnp.float32
        ) * (DH ** -0.5)
        logits = logits.reshape(B, HEADS, Q, rows, GW)
        logits = logits + jnp.transpose(dy_c, (0, 3, 1, 2))[:, :, :, :, None]
        logits = logits + jnp.transpose(dx, (0, 3, 1, 2))[:, :, :, None, :]
        logits = logits.reshape(B, HEADS, Q, rows * GW)
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
        jnp.full((B, HEADS, Q), -jnp.inf, jnp.float32),
        jnp.zeros((B, HEADS, Q), jnp.float32),
        jnp.zeros((B, HEADS, Q, DH), jnp.float32),
    )
    (m, s, acc), _ = jax.lax.scan(
        body, init,
        (
            jnp.moveaxis(kc, 2, 0),
            jnp.moveaxis(vc, 2, 0),
            jnp.moveaxis(dyc, 2, 0),
        ),
    )
    return (acc / s[..., None]).astype(v.dtype)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, HEADS, Q, DH), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HEADS, HW, DH), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HEADS, HW, DH), jnp.bfloat16)
    dy = jax.random.normal(ks[3], (B, Q, GH, HEADS), jnp.bfloat16)
    dx = jax.random.normal(ks[4], (B, Q, GW, HEADS), jnp.bfloat16)

    # numerical agreement check (CPU-irrelevant; quick sanity on-chip)
    o1 = jax.jit(dense_bias_attn)(q, k, v, dy, dx)
    o2 = jax.jit(fused_bias_attn)(q, k, v, dy, dx)
    o3 = jax.jit(chunked_bias_attn)(q, k, v, dy, dx)
    print("fused  max|diff|", float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max()))
    print("chunked max|diff|", float(jnp.abs(o1.astype(jnp.float32) - o3.astype(jnp.float32)).max()))

    for name, fn in [
        ("dense", dense_bias_attn),
        ("fused", fused_bias_attn),
        ("chunked", chunked_bias_attn),
    ]:
        timeit(f"dec x-attn {name} fwd", fn, q, k, v, dy, dx)

        def loss(args, fn=fn):
            return fn(*args).astype(jnp.float32).sum()

        timeit(f"dec x-attn {name} fwd+grad", jax.grad(loss), (q, k, v, dy, dx))

    # ---- encoder self-attention d=32 ----
    from sam3_lora_tpu.ops.pallas_attention import flash_attention

    L = HW
    eq = jax.random.normal(ks[5], (B, HEADS, L, DH), jnp.bfloat16)
    ek = jax.random.normal(ks[6], (B, HEADS, L, DH), jnp.bfloat16)
    ev = jax.random.normal(ks[7], (B, HEADS, L, DH), jnp.bfloat16)

    def enc_d32(a, b_, c):
        return flash_attention(a, b_, c)

    def enc_d64(a, b_, c):
        pad = ((0, 0), (0, 0), (0, 0), (0, DH))
        out = flash_attention(
            jnp.pad(a, pad), jnp.pad(b_, pad), jnp.pad(c, pad),
            scale=DH ** -0.5,
        )
        return out[..., :DH]

    o4 = jax.jit(enc_d32)(eq, ek, ev)
    o5 = jax.jit(enc_d64)(eq, ek, ev)
    print("d64-pad max|diff|", float(jnp.abs(o4.astype(jnp.float32) - o5.astype(jnp.float32)).max()))

    for name, fn in [("enc flash d32", enc_d32), ("enc flash d64pad", enc_d64)]:
        timeit(f"{name} fwd", fn, eq, ek, ev)

        def loss(args, fn=fn):
            return fn(*args).astype(jnp.float32).sum()

        timeit(f"{name} fwd+grad", jax.grad(loss), (eq, ek, ev))


if __name__ == "__main__":
    main()
