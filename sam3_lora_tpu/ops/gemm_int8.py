"""Whole-weight-resident int8 GEMM Pallas kernel (W8A8 dynamic, fused scales).

Motivation (r5 roofline, PARITY session 16): the XLA int8 path
(ops/quant.py) measures only ~133 TF/s on the trunk's big GEMM shapes — 34%
of the v5e int8 MXU peak — because the activation-quantization pass (row
amax + scale + round over the bf16 input) and the int32->f32 dequant scaling
of the output each cost a full extra HBM round-trip that XLA does not fuse
into the matmul. The trunk forward + remat replay spend ~56 TF/step in these
GEMMs, so the rate IS the step time.

Design (same playbook as ops/long_attention.py's whole-KV residency):

* Grid is 1-D over M tiles only. The int8 weight panel (K, N) and its
  per-channel scale row ride as pinned blocks (constant index_map), so they
  are DMA'd into VMEM ONCE and stay resident across all M/BM programs —
  4.85 MB for the fc1/fc2 shapes, well under the budget.
* Each program: load one (BM, K) bf16 activation tile, compute per-row
  amax/127 on the VPU, round to int8 IN VMEM, run one (BM, K) x (K, N)
  int8 MXU contraction to int32, scale rows by s_x and columns by s_w, and
  write bf16. The quantize and dequant passes never touch HBM.
* Tiling: int8 min tile is (32, 128); BM is 256 (or the largest of
  256/128/64/32 dividing M), K and N must be lane-aligned (128 | K, N).
  Shapes that don't qualify (or whose W panel exceeds the VMEM budget) fall
  back to the XLA path in the caller (ops/quant.py).

Numerics: identical scheme to ops/quant.py (symmetric per-row s_x, per-
channel s_w, round-half-even via jnp.round) — parity-tested against the XLA
path in tests/test_gemm_int8.py at 0 ULP on the int8 products and ~1e-6 on
the scaled outputs.

No reference analogue: the reference's CUDA perf tier has no frozen-base
int8 GEMM at all (sam3/perflib/ is fp8 flash attention only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Master switch, default ON for the shapes `supported` admits (measured
# winners only); SAM3_GEMM_KERNEL=0 restores the XLA int8 expression.
GEMM_KERNEL = os.environ.get("SAM3_GEMM_KERNEL", "1") == "1"

# Adapter-fused variant (int8_lora_gemm_wres): measured a ~1% full-step
# LOSS as default (3.643 vs 3.678 img/s/chip, v5e bs8 flat layout,
# 2026-08-20) — the in-kernel skinny adapter dots serialize against the big
# int8 dot in every M-tile program, where the XLA chain overlaps them
# across blocks. Kept opt-in for configs where launch count dominates.
GEMM_LORA_FUSED = os.environ.get("SAM3_GEMM_LORA_FUSED", "0") == "1"

# VMEM budget: W panel + scales + x/xq/out tiles, double-buffered x.
_VMEM_LIMIT = 100 * 1024 * 1024
_W_PANEL_MAX = 12 * 1024 * 1024  # int8 bytes; fc1/fc2 panels are 4.85 MB

_FORCE_INTERPRET = False  # tests flip this to run off-TPU


def supported(m: int, k: int, n: int) -> bool:
    """Kernel handles (M,K)x(K,N) iff tiles align and the W panel fits.

    On-chip A/B at BM=512 (scripts/bench_gemm.py GEMM_BM sweep, v5e,
    M=41472): the kernel beats the XLA W8A8 path on EVERY trunk shape —
    fc1 206.5 vs 176.7 TF/s, fc2 194.4 vs 121.2, qkv 160.1 vs 145.6,
    proj 74.0 vs 61.3. (The first A/B's qkv "regression" — 73.7 at BM=256
    — was a block-size artifact; 512-row tiles amortize the pinned-panel
    revolve and keep the MXU fed.)"""
    # m % 128: smaller M forces <=64-row tiles, measured SLOWER than XLA
    # (bs1 serving, M=5184 -> BM 64: int8 encode p50 92.2 vs 84.9 ms) —
    # such shapes fall back to the XLA path.
    if m % 128 or k % 128 or n % 128:
        return False
    if k * n > _W_PANEL_MAX:
        return False
    return True


def _pick_bm(m: int) -> int:
    ov = os.environ.get("SAM3_GEMM_BM")  # sweep knob (scripts/bench_gemm.py)
    if ov and m % int(ov) == 0:
        return int(ov)
    # 512 first: best across every trunk shape in the GEMM_BM sweep (fc1
    # 206.5 / qkv 160.1 / proj 74.0 TF/s vs 199.9 / 73.7 / 55.0 at 256)
    for bm in (512, 256, 128, 64, 32):
        if m % bm == 0:
            return bm
    return 32


def _kernel(x_ref, wq_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (BM, K)
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) * (1.0 / 127.0)
    s = jnp.maximum(s, 1e-12)  # zero rows quantize to zeros (quant.py)
    xq = jnp.clip(jnp.round(x * (1.0 / s)), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (acc.astype(jnp.float32) * s * ws_ref[...]).astype(
        o_ref.dtype
    )


def _make_lora_kernel(scale: float, cdtype):
    """int8 base GEMM + fused LoRA branch: o = deq(xq @ wq) + scale*(x a) b.

    The adapter panels a (K, r) / b (r, N) ride pinned in VMEM (r=32: 64 KB
    + 300 KB at the MLP shapes); the two skinny dots run in the compute
    dtype with f32 accumulation, matching models/layers.py's XLA chain, and
    the delta add fuses into the output write — the XLA path materializes
    the (M, N) delta and re-reads y for the add (one full HBM round-trip
    per adapted GEMM, fwd AND replay)."""

    def kernel(x_ref, wq_ref, ws_ref, a_ref, b_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        s = jnp.max(jnp.abs(x), axis=1, keepdims=True) * (1.0 / 127.0)
        s = jnp.maximum(s, 1e-12)
        xq = jnp.clip(jnp.round(x * (1.0 / s)), -127.0, 127.0).astype(
            jnp.int8
        )
        acc = jax.lax.dot_general(
            xq, wq_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        xa = jax.lax.dot_general(
            x_ref[...].astype(cdtype), a_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jax.lax.dot_general(
            xa.astype(cdtype), b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = (
            acc.astype(jnp.float32) * s * ws_ref[...] + delta * scale
        ).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("scale", "out_dtype", "compute_dtype")
)
def int8_lora_gemm_wres(
    x, wq, ws, a, b, scale, out_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
):
    """Fused y = dequant(x @ wq) + scale * (x @ a) @ b; W/a/b panels pinned.

    a: (K, r) / b: (r, N) in the COMPUTE dtype (cast by the caller, as the
    XLA chain does); r must be a multiple of 8 (sublane) — rank 32 is.
    """
    m, k = x.shape
    n = wq.shape[1]
    r = a.shape[1]
    bm = _pick_bm(m)
    return pl.pallas_call(
        _make_lora_kernel(float(scale), compute_dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),  # pinned W panel
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((k, r), lambda i: (0, 0)),  # pinned adapters
            pl.BlockSpec((r, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * (k + r) + 2 * m * k * r,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=_FORCE_INTERPRET,
    )(x, wq, ws, a, b)


# --- bf16 dx variant: dx = dy @ W^T with the (K, N) W panel pinned --------
# The backward's dx GEMMs run bf16 (int8 dy quantization measured a net
# loss, PARITY session 13) at XLA's ~110-136 TF/s; this kernel streams
# (BM, N) dy tiles against the resident dequantized W panel and contracts
# over N in one MXU call per tile. Opt-in until the on-chip A/B
# (SAM3_GEMM_BWD_KERNEL=1; scripts/bench_gemm.py --bwd rows).
GEMM_BWD_KERNEL = os.environ.get("SAM3_GEMM_BWD_KERNEL", "0") == "1"


def supported_nt(m: int, k: int, n: int) -> bool:
    """dy (M, N) x W (K, N) -> (M, K), contracting N. bf16 panel budget."""
    if m % 32 or k % 128 or n % 128:
        return False
    if k * n * 2 > _W_PANEL_MAX:
        return False
    if max(k, n) < 4096:
        return False
    return True


def _kernel_nt(dy_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        dy_ref[...], w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def bf16_gemm_wres_nt(dy, w, out_dtype=jnp.bfloat16):
    """(M, N) dy @ (K, N) w^T -> (M, K); w panel pinned in VMEM."""
    m, n = dy.shape
    k = w.shape[0]
    bm = _pick_bm(m)
    return pl.pallas_call(
        _kernel_nt,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),  # pinned W panel
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * n * 2 + k * n * 2 + m * k * 2,
            transcendentals=0,
        ),
        interpret=_FORCE_INTERPRET,
    )(dy, w)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int8_gemm_wres(x, wq, ws, out_dtype=jnp.bfloat16):
    """(M, K) float x @ dequant((K, N) int8 wq, (1, N) f32 ws) -> (M, N).

    Caller guarantees ``supported(M, K, N)``. Leading batch dims must be
    pre-flattened into M.
    """
    m, k = x.shape
    n = wq.shape[1]
    bm = _pick_bm(m)
    return pl.pallas_call(
        _kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),  # pinned W panel
            pl.BlockSpec((1, n), lambda i: (0, 0)),  # pinned scales
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=_FORCE_INTERPRET,
    )(x, wq, ws)
