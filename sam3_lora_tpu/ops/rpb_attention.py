"""Separable-bias (boxRPB) cross-attention, chunked online-softmax.

The DETR decoder's image cross-attention adds a box-relative position bias
``bias[b, h, q, iy*W+ix] = dy[b, q, iy, h] + dx[b, q, ix, h]`` (reference
``sam3/model/decoder.py:331-408`` materializes the dense (B, H, Q, H*W)
tensor and hands it to SDPA). At SAM3 shapes (Q=401, HW=5184, fp32 logits)
the dense formulation is HBM-traffic-bound: bias + logits + probs + their
backward cousins are ~0.5 GB each per layer.

This op never materializes any (Q, HW) tensor wider than one K-chunk: it
scans over chunks of `rows` grid rows (rows*W keys), builds the bias block
from the tiny dy/dx operands in-register, and maintains the online-softmax
running (max, sum, acc). Measured on v5e at the decoder's training shape:
6.1 ms fwd / 14.4 ms fwd+grad vs 39+ ms for the dense path (bs8, per layer).

Pure jnp + lax.scan — identical code path on CPU (tests) and TPU (XLA fuses
the bias construction into the logits elementwise); a hand-written Pallas
kernel was unnecessary at these shapes.

Exact attention-prob dropout (torch ``nn.MultiheadAttention`` semantics) is
supported in-loop: the normalizer ``s`` accumulates undropped probabilities
(the softmax denominator is dropout-independent) while the value accumulator
sees ``mask * p / keep``, which reproduces ``dropout(softmax(S)) @ V``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pick_rows(gh: int, gw: int, target: int = 1024) -> int:
    """Largest divisor of gh whose chunk (rows*gw keys) stays <= target."""
    best = gh
    for r in range(1, gh + 1):
        if gh % r == 0 and r * gw <= target:
            best = r
    return best


def separable_bias_attention(
    q: jnp.ndarray,   # (B, H, Lq, Dh)
    k: jnp.ndarray,   # (B, H, GH*GW, Dh)
    v: jnp.ndarray,   # (B, H, GH*GW, Dh)
    dy: jnp.ndarray,  # (B, Lq, GH, H)  — per-query row bias
    dx: jnp.ndarray,  # (B, Lq, GW, H)  — per-query column bias
    *,
    grid_hw: Tuple[int, int],
    scale: Optional[float] = None,
    dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    rows: Optional[int] = None,
) -> jnp.ndarray:
    b, h, lq, dh = q.shape
    gh, gw = grid_hw
    assert k.shape[2] == gh * gw, (k.shape, grid_hw)
    scale = (dh ** -0.5) if scale is None else scale
    if rows is None:
        rows = _pick_rows(gh, gw)
    n_chunks = gh // rows
    chunk = rows * gw

    kc = jnp.moveaxis(k.reshape(b, h, n_chunks, chunk, dh), 2, 0)
    vc = jnp.moveaxis(v.reshape(b, h, n_chunks, chunk, dh), 2, 0)
    # (n, B, H, Lq, rows): bias rows per chunk, transposed head-major once
    dyc = jnp.moveaxis(
        jnp.transpose(dy, (0, 3, 1, 2)).reshape(b, h, lq, n_chunks, rows), 3, 0
    )
    dxt = jnp.transpose(dx, (0, 3, 1, 2))  # (B, H, Lq, GW)
    use_dropout = dropout > 0.0 and dropout_key is not None
    keys = (
        jax.random.split(dropout_key, n_chunks)
        if use_dropout
        else jnp.zeros((n_chunks, 2), jnp.uint32)
    )

    def body(carry, args):
        m, s, acc = carry
        k_c, v_c, dy_c, key_c = args
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_c, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        logits = logits.reshape(b, h, lq, rows, gw)
        logits = logits + dy_c[..., None].astype(jnp.float32)
        logits = logits + dxt[:, :, :, None, :].astype(jnp.float32)
        logits = logits.reshape(b, h, lq, chunk)
        m_new = jnp.maximum(m, logits.max(-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        s_new = s * corr + p.sum(-1)
        if use_dropout:
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(key_c, keep, p.shape)
            p_v = jnp.where(mask, p / keep, 0.0)
        else:
            p_v = p
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p_v.astype(v_c.dtype), v_c,
            preferred_element_type=jnp.float32,
        )
        return (m_new, s_new, acc_new), None

    init = (
        jnp.full((b, h, lq), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, lq), jnp.float32),
        jnp.zeros((b, h, lq, dh), jnp.float32),
    )
    # remat the chunk body: without it autodiff stores every chunk's logits/
    # probs residuals (re-materializing what this op exists to avoid — OOMs
    # the full train step). With it, bwd re-builds each chunk from the small
    # carries; the dropout mask regenerates deterministically from key_c.
    (m, s, acc), _ = jax.lax.scan(jax.checkpoint(body), init, (kc, vc, dyc, keys))
    return (acc / s[..., None]).astype(v.dtype)
