"""Image/feature-map resizing matching torch.nn.functional.interpolate.

* ``resize_bilinear`` — align_corners=False half-pixel bilinear; identical to
  ``jax.image.resize(method="linear", antialias=False)`` which uses the same
  half-pixel convention as torch.
* ``resize_nearest`` — torch's asymmetric nearest (src = floor(dst * in/out)),
  which differs from jax.image.resize's rounding; used by the pixel decoder
  (``maskformer_segmentation.py:210-212``) where parity matters.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """x: (..., H, W) -> (..., size). fp32 internally (torch upcasts bf16)."""
    h, w = size
    out_shape = x.shape[:-2] + (h, w)
    orig = x.dtype
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="linear", antialias=False)
    return y.astype(orig)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """x: (..., H, W) -> (..., size), torch 'nearest' index convention."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    ys = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    return x[..., ys, :][..., :, xs]
