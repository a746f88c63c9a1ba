"""Fused flash attention for TPU (Pallas) with an XLA-chunked fallback.

Why: the ViT's 4 global blocks attend over 5184 tokens; materializing the
(B, 16, 5184, 5184) fp32 logits is 13 GB at batch 8 — the reference leans on
torch SDPA/FA3 for exactly this (sam3/sam/transformer.py:247-258,
perflib/fa3.py). Here the hot path goes through the Pallas TPU flash-attention
kernel (blockwise online-softmax, fwd + custom-vjp bwd, never materializes the
logits), with block sizes chosen to divide SAM3's shapes (5184 = 9*576).

Entry: ``flash_attention(q, k, v, bias=, key_padding_mask=, scale=)`` over
(B, H, L, Dh), mirroring ``dot_product_attention``'s contract. Non-TPU
backends (CPU tests) fall back to a lax.scan chunked implementation with
identical semantics — also the numerical oracle for the kernel parity test.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _pick_block(n: int, target: int = 1024) -> int:
    """Largest divisor of n that is <= target and a multiple of 128 (the
    kernel's lane requirement); falls back to n itself (single block)."""
    best = None
    for b in range(128, min(n, target) + 1, 128):
        if n % b == 0:
            best = b
    return best or n


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Memory-bounded attention: scan over query chunks, fp32 softmax.

    Peak logits memory is (B, H, chunk, Lk) instead of (B, H, Lq, Lk).
    Used on CPU and as the oracle for the Pallas kernel.
    """
    from .attention import make_attention_bias

    b, h, lq, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    full_bias = make_attention_bias(key_padding_mask, bias)

    if lq % chunk != 0:
        # largest divisor of lq <= chunk (any granularity — XLA path)
        chunk = max(
            (c for c in range(1, min(lq, chunk) + 1) if lq % c == 0),
            default=lq,
        )
    n_chunks = lq // chunk
    qs = q.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    if full_bias is not None:
        bias_b = jnp.broadcast_to(
            full_bias, (b, h, lq, k.shape[2])
        ).reshape(b, h, n_chunks, chunk, -1).transpose(2, 0, 1, 3, 4)
    else:
        bias_b = None

    def one(q_c, bias_c):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q_c, k, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        if bias_c is not None:
            logits = logits + bias_c
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    if bias_b is None:
        out = jax.lax.map(lambda qc: one(qc, None), qs)
    else:
        out = jax.lax.map(lambda args: one(*args), (qs, bias_b))
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, lq, d)


@functools.lru_cache(maxsize=None)
def _is_tpu_backend() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat not in ("cpu", "gpu")


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fused attention (B, H, Lq, Dh) — Pallas on TPU, chunked XLA elsewhere."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale

    if not _is_tpu_backend():
        return chunked_attention(
            q, k, v, bias=bias, key_padding_mask=key_padding_mask, scale=scale
        )

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as tpu_flash,
    )

    b, h, lq, _ = q.shape
    lk = k.shape[2]

    # kernel wants seq lens divisible by 128-multiple blocks; SAM3's 5184
    # (= 2^6 * 81) has no such divisor — pad and mask the padding with
    # segment ids (real tokens = 0, padding = 1/2). Pad long sequences to a
    # 512 multiple so 512-wide blocks apply (5184 -> 5248 = 41*128 would
    # force 128-blocks since 41 is prime — a 4x grid-overhead tax; 5632
    # = 11*512 costs 8.6% padding and runs with full-size blocks).
    #
    # MEASURED DEAD END (r2, do not retry): leaving the query axis UNPADDED
    # with a non-128-multiple block_q (5184 = 3*1728; block_k must stay %128
    # so K/V still pad). Standalone fwd it wins ~12% (q2592: 19.9 vs 22.7 ms),
    # but q2592 blows the 16 MB scoped-VMEM stack inside the full train step
    # (needs 23.3 MB) and q1728 regresses the full-step bench 1.904 -> 1.544
    # img/s/chip — the dq/dkv passes handle non-aligned q blocks poorly.
    def pad_to(n):
        m = 512 if n > 1024 else 128
        return -(-n // m) * m

    lq_p, lk_p = pad_to(lq), pad_to(lk)
    need_segments = (lq_p != lq) or (lk_p != lk) or key_padding_mask is not None
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))

    segment_ids = None
    if need_segments:
        q_seg = jnp.zeros((b, lq_p), jnp.int32)
        q_seg = q_seg.at[:, lq:].set(1)  # padded queries isolated
        kv_seg = jnp.zeros((b, lk_p), jnp.int32)
        kv_seg = kv_seg.at[:, lk:].set(2)  # padded keys match nothing
        if key_padding_mask is not None:
            kv_seg = kv_seg.at[:, :lk].set(
                jnp.where(key_padding_mask, 2, 0)
            )
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)

    ab = None
    if bias is not None:
        ab = jnp.zeros((b, h, lq_p, lk_p), jnp.float32)
        ab = ab.at[:, :, :lq, :lk].set(
            jnp.broadcast_to(bias.astype(jnp.float32), (b, h, lq, lk))
        )

    # Measured on v5e (5632-seq, bs8): block_q 1408 / block_k 512 beats
    # 512/512 by ~8% fwd and ~12% bwd; 1408-wide K blocks fail to compile in
    # the dkv pass, so K stays at 512.
    block_q = _pick_block(lq_p, target=2048)
    block_k = _pick_block(lk_p, target=512)
    sizes = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=1,
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_k,
        block_k_dkv=block_k,
        block_q_dkv=block_q,
        block_k_major_dq=block_k,
        block_k_dq=block_k,
        block_q_dq=block_q,
    )
    out = tpu_flash(
        qp, kp, vp, ab=ab, segment_ids=segment_ids,
        causal=False, sm_scale=float(scale), block_sizes=sizes,
    )
    return out[:, :, :lq].astype(v.dtype)
