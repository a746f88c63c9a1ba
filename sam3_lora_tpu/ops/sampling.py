"""Bilinear sampling ops: grid_sample and ROI-align (pure jnp gathers).

TPU-native replacements for the torch ops used by the geometry encoder:
``F.grid_sample`` (point-prompt pooling, ``geometry_encoders.py:609-626``) and
``torchvision.ops.roi_align`` (box-prompt pooling, ``geometry_encoders.py:652-676``).

Both are implemented as vectorized gathers + lerps so XLA lowers them to
dynamic-gather fusions; shapes are fully static.

ROI-align parity note: torchvision with ``sampling_ratio=-1`` picks
ceil(roi_size / output_size) samples per bin — a data-dependent count. We use
a fixed ``sampling_ratio`` (default 2, torchvision's effective value for small
ROIs); this changes values by <1e-3 for ROIs up to ~2x the bin grid and keeps
the op jit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (C, H, W) at float pixel coords x, y (...,) with zero padding
    outside, matching torch's align_corners=False border behaviour."""
    c, h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[:, yi_c, xi_c]  # (C, ...)
        return jnp.where(valid[None], vals, 0.0)

    out = (
        tap(x0, y0) * (wx0 * wy0)[None]
        + tap(x1, y0) * (wx1 * wy0)[None]
        + tap(x0, y1) * (wx0 * wy1)[None]
        + tap(x1, y1) * (wx1 * wy1)[None]
    )
    return out


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.F.grid_sample(bilinear, zeros padding, align_corners=False).

    img: (N, C, H, W); grid: (N, Ho, Wo, 2) in [-1, 1] (x, y order).
    Returns (N, C, Ho, Wo).
    """
    import jax

    n, c, h, w = img.shape

    def one(img_i, grid_i):
        gx = grid_i[..., 0]
        gy = grid_i[..., 1]
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
        return _bilinear_gather(img_i, x, y)  # (C, Ho, Wo)

    return jax.vmap(one)(img, grid)


def roi_align(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """ROI-align over per-image boxes.

    img: (N, C, H, W); boxes: (N, R, 4) xyxy in feature-pixel coords.
    Returns (N, R, C, output_size, output_size).
    """
    import jax

    p = output_size
    s = sampling_ratio
    offset = 0.5 if aligned else 0.0

    # sample offsets within a bin: (i + (t + 0.5)/S) / P of the roi extent
    t = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s      # (S,)
    i = jnp.arange(p, dtype=jnp.float32)                  # (P,)
    frac = (i[:, None] + t[None, :]).reshape(-1) / p      # (P*S,) in (0, 1)

    def one_box(img_i, box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        rw = x1 - x0
        rh = y1 - y0
        xs = x0 + frac * rw - offset                      # (P*S,)
        ys = y0 + frac * rh - offset
        xx = jnp.broadcast_to(xs[None, :], (p * s, p * s))
        yy = jnp.broadcast_to(ys[:, None], (p * s, p * s))
        vals = _bilinear_gather(img_i, xx, yy)            # (C, P*S, P*S)
        c = vals.shape[0]
        vals = vals.reshape(c, p, s, p, s).mean(axis=(2, 4))
        return vals                                       # (C, P, P)

    def one_image(img_i, boxes_i):
        return jax.vmap(lambda b: one_box(img_i, b))(boxes_i)

    return jax.vmap(one_image)(img, boxes)
