"""Microbenchmarks for the hot ViT shapes on the real chip.

Times (a) plain GEMMs at the ViT's qkv/mlp shapes, (b) the fused window
attention kernel vs the XLA expression, (c) global flash attention, (d) one
full windowed Block fwd and fwd+bwd. Prints achieved TFLOP/s so regressions
and tuning wins are attributable at the op level.
"""

import functools
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
    """Through the axon tunnel block_until_ready is not a real barrier; a
    host fetch of one scalar is (queue is FIFO, so it fences prior calls)."""
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
    print(f"{name:44s} {dt * 1e3:8.2f} ms{tf}", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    N = B * 5184  # all tokens in the batch
    D = 1024
    H = int(4.625 * D)  # 4736

    x = jax.random.normal(key, (N, D), jnp.bfloat16)
    w1 = jax.random.normal(key, (D, H), jnp.bfloat16)
    w2 = jax.random.normal(key, (H, D), jnp.bfloat16)
    w3 = jax.random.normal(key, (D, 3 * D), jnp.bfloat16)

    timeit("gemm NxD@DxH (mlp fc1)", lambda a, b_: a @ b_, x, w1,
           flops=2 * N * D * H)
    timeit("gemm NxD@Dx3D (qkv)", lambda a, b_: a @ b_, x, w3,
           flops=2 * N * D * 3 * D)
    timeit("mlp fc1+gelu+fc2",
           lambda a, u, v: jax.nn.gelu(a @ u, approximate=False) @ v,
           x, w1, w2, flops=2 * N * D * H * 2)

    # int8 tiers at the same shapes: prequant (the production fwd path —
    # weight already int8+scales) vs dynamic (quantizes W per call), and the
    # bwd dx GEMM through the custom VJP. Rates here are the roofline
    # denominators for the GEMM stages (scripts/roofline.py).
    from sam3_lora_tpu.ops.quant import int8_matmul_prequant, quantize_weight

    w1q, w1s = jax.jit(quantize_weight)(w1)
    timeit("gemm int8 prequant (fc1 shape) fwd",
           lambda a, q_, s_: int8_matmul_prequant(a, q_, s_), x, w1q, w1s,
           flops=2 * N * D * H)

    # random cotangent: with a sum-loss XLA constant-folds the ones-dy dx
    # GEMM into a column reduction (first run measured a bogus 226 TF/s)
    ct = jax.random.normal(jax.random.fold_in(key, 7), (N, H), jnp.float32)

    def int8_dx(a, q_, s_, c_):
        f = lambda a: jnp.sum(
            int8_matmul_prequant(a, q_, s_).astype(jnp.float32) * c_)
        return jax.grad(f)(a)

    timeit("gemm int8 prequant (fc1 shape) fwd+dx", int8_dx, x, w1q, w1s, ct,
           flops=2 * N * D * H * 2)

    # window attention: (B*9 windows, 16 heads, 576, 64)
    WB, HD, L, DH = B * 9, 16, 576, 64
    q = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    k = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    v = jax.random.normal(key, (WB, HD, L, DH), jnp.bfloat16)
    attn_flops = 4 * WB * HD * L * L * DH

    from sam3_lora_tpu.ops.window_attention import window_attention
    from sam3_lora_tpu.ops.attention import dot_product_attention

    scale = DH ** -0.5
    timeit("window attn PALLAS fwd", lambda a, b_, c: window_attention(a, b_, c, scale),
           q, k, v, flops=attn_flops)
    timeit("window attn XLA fwd",
           lambda a, b_, c: dot_product_attention(a, b_, c, impl="xla"),
           q, k, v, flops=attn_flops)

    def wa_bwd(a, b_, c):
        f = lambda a, b_, c: jnp.sum(window_attention(a, b_, c, scale).astype(jnp.float32))
        return jax.grad(f, argnums=(0, 1, 2))(a, b_, c)

    timeit("window attn PALLAS fwd+bwd", wa_bwd, q, k, v, flops=attn_flops * 3.5)

    # global attention: (B, 16, 5184, 64)
    qg = jax.random.normal(key, (B, HD, 5184, DH), jnp.bfloat16)
    gflops = 4 * B * HD * 5184 * 5184 * DH
    timeit("global attn PALLAS fwd",
           lambda a: dot_product_attention(a, a, a, impl="pallas"), qg,
           flops=gflops)

    # fusion-encoder self-attention: (B, 8, 5184, 32) — head_dim 32 halves
    # the MXU tile width again; measure stock flash vs chunked XLA to see
    # which serves the encoder best (encoder bwd was 353 ms/step in r1)
    qe = jax.random.normal(key, (B, 8, 5184, 32), jnp.bfloat16)
    eflops = 4 * B * 8 * 5184 * 5184 * 32
    timeit("enc attn (D=32) PALLAS fwd",
           lambda a: dot_product_attention(a, a, a, impl="pallas"), qe,
           flops=eflops)
    from sam3_lora_tpu.ops.pallas_attention import chunked_attention
    timeit("enc attn (D=32) chunked-XLA fwd",
           lambda a: chunked_attention(a, a, a), qe, flops=eflops)

    def enc_bwd(a):
        f = lambda a: jnp.sum(
            dot_product_attention(a, a, a, impl="pallas").astype(jnp.float32))
        return jax.grad(f)(a)

    timeit("enc attn (D=32) PALLAS fwd+bwd", enc_bwd, qe, flops=eflops * 3.5)
    if os.environ.get("XLA_GLOBAL", "0") == "1":
        # materializes f32 (B,16,5184,5184) logits = 13 GB at B=8 — OOMs the
        # chip; opt-in at small B only
        timeit("global attn XLA fwd",
               lambda a: dot_product_attention(a, a, a, impl="xla"), qg,
               flops=gflops)

    # one full windowed block fwd and fwd+bwd (embedded in ViT structures)
    from sam3_lora_tpu.config import LoRAConfig, ModelConfig
    from sam3_lora_tpu.models.vit import Block
    from sam3_lora_tpu.models.layers import Spec

    # int8 dynamic tier: the Block numbers then measure the BENCH GEMM path
    # (the prequant variant only moves the per-call weight-quant pass)
    cfg = ModelConfig(
        dtype="bfloat16", base_quant=os.environ.get("MB_QUANT", "int8")
    )
    lcfg = LoRAConfig(rank=32, alpha=64.0,
                      target_modules=("q_proj", "k_proj", "v_proj", "out_proj",
                                      "fc1", "fc2", "linear1", "linear2"),
                      apply_to_geometry_encoder=True, apply_to_mask_decoder=True)
    spec = Spec(cfg, lcfg)
    blk = Block(spec, window_size=24)
    xb = jax.random.normal(key, (B, 72, 72, D), jnp.bfloat16)
    params = blk.init(key, xb, jnp.float32(0.0), False)
    # block flops (fwd): qkv+proj 8ND^2, mlp 4*4.625*ND^2, attn
    blk_flops = 8 * N * D * D + 4 * H * N * D + attn_flops

    timeit("windowed Block fwd",
           lambda p, a: blk.apply(p, a, jnp.float32(0.0), False), params, xb,
           flops=blk_flops)

    def blk_bwd(p, a):
        f = lambda a: jnp.sum(
            blk.apply(p, a, jnp.float32(0.0), False).astype(jnp.float32))
        return jax.grad(f)(a)

    timeit("windowed Block fwd+bwd(dx)", blk_bwd, params, xb,
           flops=blk_flops * 3)

    def blk_bwd_remat(p, a):
        g = jax.checkpoint(
            lambda a: blk.apply(p, a, jnp.float32(0.0), False))
        f = lambda a: jnp.sum(g(a).astype(jnp.float32))
        return jax.grad(f)(a)

    timeit("windowed Block fwd+bwd(dx) REMAT", blk_bwd_remat, params, xb,
           flops=blk_flops * 4)

    # the REAL in-step block backward: ADAPTER grads (fc1/fc2 lora_a/b skinny
    # GEMMs included) + dx, under the production wo_block_mid policy (mid
    # saved -> replay is qkv+fc1 only, not the full fwd)
    from sam3_lora_tpu.train.trainer import merge_trainable, split_trainable

    tr, fz = split_trainable(params)
    pol = jax.checkpoint_policies.save_only_these_names(
        "vit_block_mid", "vit_attn_out"
    )

    def blk_bwd_step(tr_, fz_, a):
        def f(tr_, a):
            p = merge_trainable(tr_, fz_)
            g = jax.checkpoint(
                lambda a: blk.apply(p, a, jnp.float32(0.0), False),
                policy=pol,
            )
            return jnp.sum(g(a).astype(jnp.float32))

        return jax.grad(f, argnums=(0, 1))(tr_, a)

    timeit("windowed Block fwd+bwd(adapters+dx) BLOCK_MID", blk_bwd_step,
           tr, fz, xb, flops=blk_flops * 3)


if __name__ == "__main__":
    main()
