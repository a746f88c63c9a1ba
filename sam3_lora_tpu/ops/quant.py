"""Dynamic int8 GEMMs for the frozen SAM3 base (TPU MXU int8 tier).

The LoRA training recipe freezes every base weight (reference
``lora_layers.py:158-228``), which makes weight quantization *exact* with
respect to what is being learned: the adapters train against the quantized
base, ``y = q(W)x + (alpha/r)BAx``, so there is no train/serve mismatch.
v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 FLOP rate, and the
quantized weight halves base-weight HBM traffic.

Scheme: symmetric per-output-channel weight scales + dynamic symmetric
per-row activation scales (standard W8A8 dynamic quantization):

    s_x[r]  = max_k |x[r, k]| / 127          (per token row)
    s_w[n]  = max_k |W[k, n]| / 127          (per output channel)
    y[r, n] = (int8(x/s_x) . int8(W/s_w))[r, n] * s_x[r] * s_w[n]

Backward (``int8_matmul`` is a ``custom_vjp``): dx = dy @ dequant(W)^T.
The grad is taken w.r.t. the *dequantized* weight the forward actually used,
so adapter gradients are exact for the quantized forward. dW is returned as
zeros — every consumer is a frozen leaf, XLA dead-code-eliminates it (the
train step differentiates only the adapter pytree, train/trainer.py).
With ``bwd_int8=True`` the dx GEMM itself also runs on the int8 MXU path
(column scales fold into dy before quantization, keeping the contraction
scale-free); this perturbs adapter gradients by the dy-quantization noise
and is therefore a separate opt-in.

No reference analogue: the reference's perf tier is fp8 flash attention only
(``sam3/perflib/fa3.py``); PyTorch/CUDA has no frozen-base int8 GEMM path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _quant_lastdim(t: jnp.ndarray):
    """Symmetric int8 quantization along the last axis.

    Returns (q int8, scale f32 with keepdims). Zero rows get scale 1/127
    (quantize to zeros) rather than dividing by zero.
    """
    t = t.astype(jnp.float32)
    s = jnp.max(jnp.abs(t), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(t / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def quantize_weight(w: jnp.ndarray):
    """(K, N) weight -> (int8 (K, N), f32 per-channel scale (1, N))."""
    q, s = _quant_lastdim(w.T)
    return q.T, s.T


def _int8_dot(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """int8 (..., K) . int8 (K, N) -> int32 (..., N) on the MXU."""
    return jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_matmul(x: jnp.ndarray, w: jnp.ndarray, bwd_int8: bool = False):
    """y = x @ w with dynamic W8A8 int8 quantization (see module docstring).

    x: (..., K) activations (any float dtype); w: (K, N) frozen weight.
    Returns (..., N) in x.dtype.
    """
    return _int8_fwd(x, w, bwd_int8)[0]


def _kernel_ok(x, wq) -> bool:
    """Route through the whole-weight-resident Pallas GEMM
    (ops/gemm_int8.py) when the shape qualifies — fused activation-quant +
    dequant epilogue, measured well above the XLA int8 path's ~133 TF/s on
    the trunk shapes."""
    from . import gemm_int8

    if not gemm_int8.GEMM_KERNEL:
        return False
    if not gemm_int8._FORCE_INTERPRET:
        from .pallas_attention import _is_tpu_backend

        if not _is_tpu_backend():
            return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return gemm_int8.supported(m, x.shape[-1], wq.shape[1])


def _int8_apply(x, wq, ws):
    """x @ dequant(wq, ws) via the Pallas kernel or the XLA expression."""
    if _kernel_ok(x, wq):
        from .gemm_int8 import int8_gemm_wres

        lead = x.shape[:-1]
        y = int8_gemm_wres(
            x.reshape(-1, x.shape[-1]), wq, ws, out_dtype=x.dtype
        )
        return y.reshape(*lead, wq.shape[1])
    xq, xs = _quant_lastdim(x)
    return (_int8_dot(xq, wq).astype(jnp.float32) * xs * ws).astype(x.dtype)


def _int8_fwd(x, w, bwd_int8):
    wq, ws = quantize_weight(w)
    return _int8_apply(x, wq, ws), (wq, ws)


def _int8_bwd(bwd_int8, res, dy):
    # y (and hence dy) carries x's dtype, so dx matches it without storing a
    # dtype object in the residuals (dtype objects are not valid JAX types).
    wq, ws = res
    xdtype = dy.dtype
    if bwd_int8:
        # fold the per-channel scales into dy, then the contraction over N is
        # scale-free: dx[r,k] = sum_n (dy*ws)[r,n] wq[k,n]
        dyq, dys = _quant_lastdim(dy.astype(jnp.float32) * ws)
        dx = (
            jax.lax.dot_general(
                dyq,
                wq,
                (((dyq.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * dys
        )
    else:
        w_deq = (wq.astype(jnp.float32) * ws).astype(xdtype)
        from . import gemm_int8

        m = 1
        for d in dy.shape[:-1]:
            m *= d
        k, n = wq.shape
        use_nt = gemm_int8.GEMM_BWD_KERNEL and gemm_int8.supported_nt(m, k, n)
        if use_nt and not gemm_int8._FORCE_INTERPRET:
            from .pallas_attention import _is_tpu_backend

            use_nt = _is_tpu_backend()
        if use_nt:
            dx = gemm_int8.bf16_gemm_wres_nt(
                dy.astype(xdtype).reshape(m, n), w_deq, out_dtype=jnp.float32
            ).reshape(*dy.shape[:-1], k)
        else:
            dx = jax.lax.dot_general(
                dy.astype(xdtype),
                w_deq,
                (((dy.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    dw = jnp.zeros(wq.shape, jnp.float32)  # frozen leaf: DCE'd by XLA
    return dx.astype(xdtype), dw


int8_matmul.defvjp(_int8_fwd, _int8_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_matmul_prequant(
    x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray, bwd_int8: bool = False
):
    """y = x @ dequant(wq, ws) on the int8 MXU path, with the weight already
    quantized offline (``quantize_weight``). Numerically identical to
    ``int8_matmul`` — the dynamic path re-derives exactly this (wq, ws) every
    step (and again in every remat replay); pre-quantizing removes that
    per-step pass and halves frozen-base HBM (int8 weights instead of bf16).

    wq: int8 (K, N); ws: f32 (1, N) per-output-channel scale.
    """
    return _int8_pre_fwd(x, wq, ws, bwd_int8)[0]


def _int8_pre_fwd(x, wq, ws, bwd_int8):
    return _int8_apply(x, wq, ws), (wq, ws)


def _int8_pre_bwd(bwd_int8, res, dy):
    wq, ws = res
    dx, _ = _int8_bwd(bwd_int8, res, dy)
    return dx, jnp.zeros(wq.shape, jnp.float32), jnp.zeros(ws.shape, jnp.float32)


int8_matmul_prequant.defvjp(_int8_pre_fwd, _int8_pre_bwd)


# --- fused base + LoRA-adapter GEMM -----------------------------------------
# y = dequant(x @ wq) + scale * (x @ la) @ lb in ONE kernel launch
# (ops/gemm_int8.py::int8_lora_gemm_wres): the adapter panels ride pinned in
# VMEM and the delta add fuses into the output write, where the XLA chain
# materializes the (M, N) delta and re-reads y (a full HBM round-trip per
# adapted GEMM, forward AND remat replay). Backward mirrors the autodiff of
# models/layers.py's unfused chain: skinny adapter grads in the compute
# dtype with f32 accumulation, base dx through the dequantized weight.


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def int8_lora_matmul_prequant(x, wq, ws, la, lb, scale: float):
    """x: (..., K); wq int8 (K, N); ws f32 (1, N); la f32 (K, r);
    lb f32 (r, N); scale = alpha/rank. Returns (..., N) in x.dtype."""
    return _int8_lora_fwd(x, wq, ws, la, lb, scale)[0]


def _adapter_delta(x, la, lb, dtype):
    xa = jax.lax.dot_general(
        x.astype(dtype), la.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(
        xa.astype(dtype), lb.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _int8_lora_fwd(x, wq, ws, la, lb, scale):
    dtype = x.dtype
    if _kernel_ok(x, wq):
        from .gemm_int8 import int8_lora_gemm_wres

        lead = x.shape[:-1]
        y = int8_lora_gemm_wres(
            x.reshape(-1, x.shape[-1]), wq, ws,
            la.astype(dtype), lb.astype(dtype), float(scale),
            out_dtype=dtype, compute_dtype=dtype,
        ).reshape(*lead, wq.shape[1])
    else:
        y = _int8_apply(x, wq, ws)
        y = (
            y.astype(jnp.float32) + _adapter_delta(x, la, lb, dtype) * scale
        ).astype(dtype)
    return y, (x, wq, ws, la, lb)


def _int8_lora_bwd(scale, res, dy):
    x, wq, ws, la, lb = res
    dtype = dy.dtype
    k, n = wq.shape
    r = la.shape[1]
    # base dx (same expression as _int8_bwd's bf16 branch)
    w_deq = (wq.astype(jnp.float32) * ws).astype(dtype)
    dx = jax.lax.dot_general(
        dy, w_deq, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # adapter contributions, skinny GEMMs in the compute dtype
    dyb = jax.lax.dot_general(  # (..., r) = dy @ lb^T
        dy, lb.astype(dtype), (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = dx + scale * jax.lax.dot_general(
        dyb.astype(dtype), la.astype(dtype),
        (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xf = x.reshape(-1, k).astype(dtype)
    dyf = dy.reshape(-1, n)
    dybf = dyb.reshape(-1, r).astype(dtype)
    da = scale * jax.lax.dot_general(  # (K, r) = x^T @ (dy lb^T)
        xf, dybf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xa = jax.lax.dot_general(
        xf, la.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    db = scale * jax.lax.dot_general(  # (r, N) = (x la)^T @ dy
        xa, dyf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (
        dx.astype(dtype),
        jnp.zeros(wq.shape, jnp.float32),
        jnp.zeros(ws.shape, jnp.float32),
        da.astype(jnp.float32),
        db.astype(jnp.float32),
    )


int8_lora_matmul_prequant.defvjp(_int8_lora_fwd, _int8_lora_bwd)


def prequantize_tree(params, min_dim: int = 512):
    """Nested-pytree variant of ``prequantize_base`` for the serving paths
    (Sam3Processor / SAM3LoRAInference): quantizes every eligible base kernel
    in place of its bf16 leaf. Adapter leaves (lora_a/lora_b) are untouched —
    only ``kernel`` leaves with a ``kernel_scale`` sibling are candidates."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict(prequantize_base(flat, min_dim=min_dim))


def prequantize_base(frozen_flat: dict, min_dim: int = 512) -> dict:
    """Quantize every eligible frozen LoRALinear kernel offline.

    Input/output: the tuple-keyed flat frozen dict from
    ``train.trainer.split_trainable``. A kernel is eligible iff its module
    declared a ``kernel_scale`` sibling (LoRALinear does so exactly when the
    config's quant gate covers it) and ``min(K, N) >= min_dim``. The bf16
    kernel leaf is replaced by the int8 tensor and the sibling scale is
    filled in; everything else passes through unchanged.
    """
    out = dict(frozen_flat)
    for key, w in frozen_flat.items():
        if key[-1] != "kernel":
            continue
        skey = key[:-1] + ("kernel_scale",)
        if skey not in frozen_flat:
            continue
        if w.ndim != 2 or min(w.shape) < min_dim or w.dtype == jnp.int8:
            continue
        wq, ws = quantize_weight(w)
        out[key] = wq
        out[skey] = ws
    return out
