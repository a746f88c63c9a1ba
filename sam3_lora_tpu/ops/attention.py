"""Attention primitives — the single entry point for every attention in the model.

The reference routes all attention through ``F.scaled_dot_product_attention``
(or nn.MultiheadAttention); here everything goes through
``dot_product_attention`` so the implementation can be swapped centrally:

* ``impl="xla"`` — einsum -> fp32 softmax -> einsum. XLA fuses the mask/bias
  add and keeps the contractions on the MXU. Default, and the reference
  implementation for tests.
* ``impl="pallas"`` — fused Pallas flash-attention kernel (see
  ``sam3_lora_tpu/ops/pallas_attention.py``) used on TPU for the hot paths
  (ViT global/window blocks, decoder boxRPB cross-attention).

Conventions: q, k, v are (B, H, L, Dh). ``bias`` is additive, broadcastable to
(B, H, Lq, Lk). ``key_padding_mask`` is (B, Lk) with True = PADDING (torch
convention). Softmax is computed in float32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # finite fill: avoids NaNs for fully-masked rows


def make_attention_bias(
    key_padding_mask: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    dtype=jnp.float32,
) -> Optional[jnp.ndarray]:
    """Combine an additive bias and a bool key-padding mask into one bias."""
    out = None
    if bias is not None:
        out = bias.astype(dtype)
    if key_padding_mask is not None:
        pad = jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(dtype)
        pad = pad[:, None, None, :]  # (B, 1, 1, Lk)
        out = pad if out is None else out + pad
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "xla",
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, L, Dh) tensors.

    ``rope_cos``/``rope_sin`` (L, Dh//2): when given, q/k arrive UNROTATED in
    rotate-half channel layout and the RoPE rotation is applied here — fused
    into the window kernel on TPU, as a separate ``apply_rope_half`` pass
    otherwise. Only ``impl="window"`` accepts them.

    ``remat=True`` (``impl="pallas"`` only) checkpoints the flash call: the
    backward saves just the bf16 q/k/v inputs and re-runs the flash forward.
    The library kernel's residuals are FAT — its softmax stats l/m are
    stored 128-lane-tiled f32 (B, H, Lpad, 128), i.e. 128x the information
    content, plus padded input copies — ~370 MB per ViT global block and
    ~190 MB per fusion-encoder layer at bs8. Trading one flash forward
    replay for that HBM lets otherwise-OOM remat configs (enc FFN-only
    remat) fit.
    """
    if impl == "pallas":
        from .pallas_attention import flash_attention

        assert rope_cos is None

        def _flash(q, k, v, bias, kpm):
            return flash_attention(
                q, k, v, bias=bias, key_padding_mask=kpm, scale=scale
            )

        if remat:
            _flash = jax.remat(_flash)
        return _flash(q, k, v, bias, key_padding_mask)
    if impl == "window":
        # fused whole-window kernel (no mask/bias support by design)
        from .pallas_attention import _is_tpu_backend
        from .window_attention import window_attention, window_attention_rope

        assert bias is None and key_padding_mask is None
        if _is_tpu_backend():
            d = q.shape[-1]
            s = float(d ** -0.5) if scale is None else float(scale)
            if rope_cos is not None:
                return window_attention_rope(q, k, v, s, rope_cos, rope_sin)
            return window_attention(q, k, v, s)
        if rope_cos is not None:
            from .rope import apply_rope_half

            q = apply_rope_half(q, rope_cos, rope_sin)
            k = apply_rope_half(k, rope_cos, rope_sin)
        impl = "xla"  # CPU tests fall through to the reference expression
    else:
        assert rope_cos is None
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    from . import softmax_check

    # pre-bias: this is the s the clamp kernels see (they take no bias)
    softmax_check.observe_scores("xla", logits)
    full_bias = make_attention_bias(key_padding_mask, bias)
    if full_bias is not None:
        logits = logits + full_bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, D) -> (B, H, L, D/H)."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, Dh) -> (B, L, H*Dh)."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
