"""Bilinear sampling ops: grid_sample and ROI-align (pure jnp gathers).

TPU-native replacements for the torch ops used by the geometry encoder:
``F.grid_sample`` (point-prompt pooling, ``geometry_encoders.py:609-626``) and
``torchvision.ops.roi_align`` (box-prompt pooling, ``geometry_encoders.py:652-676``).

Both are implemented as vectorized gathers + lerps so XLA lowers them to
dynamic-gather fusions; shapes are fully static.

ROI-align matches torchvision exactly (aligned=False, sampling_ratio=-1
defaults, the ones the reference's geometry encoder uses): the adaptive
ceil(bin)-samples-per-bin rule is expressed with a static upper bound
``max_samples`` and a mask over the unused sample slots, so the per-ROI
sample count is a traced scalar and the op stays jit-compatible. Border
handling follows torchvision's roi_align bilinear (clamp into the image,
zero only beyond 1px outside) — different from grid_sample's per-tap
zero padding.
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


def _roi_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """torchvision roi_align's bilinear taps (roi_align_kernel bilinear_
    interpolate): zero only when >1px outside the image; otherwise clamp the
    coordinate into [0, size-1] and lerp. NOT the same as grid_sample's
    per-tap zero padding."""
    c, h, w = img.shape
    invalid = (x < -1.0) | (x > w) | (y < -1.0) | (y > h)
    x = jnp.clip(x, 0.0, None)
    y = jnp.clip(y, 0.0, None)
    x_low = jnp.minimum(jnp.floor(x), w - 1)
    y_low = jnp.minimum(jnp.floor(y), h - 1)
    x_eff = jnp.where(x >= w - 1, x_low, x)
    y_eff = jnp.where(y >= h - 1, y_low, y)
    x_high = jnp.minimum(x_low + 1, w - 1)
    y_high = jnp.minimum(y_low + 1, h - 1)
    lx = x_eff - x_low
    ly = y_eff - y_low
    hx = 1.0 - lx
    hy = 1.0 - ly

    def tap(xi, yi):
        return img[:, yi.astype(jnp.int32), xi.astype(jnp.int32)]  # (C, ...)

    out = (
        tap(x_low, y_low) * (hx * hy)[None]
        + tap(x_high, y_low) * (lx * hy)[None]
        + tap(x_low, y_high) * (hx * ly)[None]
        + tap(x_high, y_high) * (lx * ly)[None]
    )
    return jnp.where(invalid[None], 0.0, out)


def roi_align(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = -1,
    aligned: bool = False,
    max_samples: int = 16,
) -> jnp.ndarray:
    """torchvision.ops.roi_align, exactly (defaults = torchvision defaults,
    which the reference geometry encoder uses: geometry_encoders.py:666-668).

    img: (N, C, H, W); boxes: (N, R, 4) xyxy in feature-pixel coords.
    Returns (N, R, C, output_size, output_size).

    sampling_ratio=-1 -> per-ROI adaptive ceil(bin) samples per bin, realized
    with ``max_samples`` static slots + masking (raise it if ROIs can exceed
    ``max_samples * output_size`` feature pixels on a side).
    """
    import jax

    p = output_size
    smax = sampling_ratio if sampling_ratio > 0 else max_samples
    offset = 0.5 if aligned else 0.0

    i = jnp.arange(p, dtype=jnp.float32)                   # (P,)
    t = jnp.arange(smax, dtype=jnp.float32)                # (S,)

    def one_box(img_i, box):
        x0 = box[0] - offset
        y0 = box[1] - offset
        rw = box[2] - box[0]
        rh = box[3] - box[1]
        if not aligned:  # torchvision forces >=1px rois when not aligned
            rw = jnp.maximum(rw, 1.0)
            rh = jnp.maximum(rh, 1.0)
        bin_w = rw / p
        bin_h = rh / p
        if sampling_ratio > 0:
            kw = kh = jnp.float32(sampling_ratio)
        else:
            kw = jnp.clip(jnp.ceil(bin_w), 1.0, smax)
            kh = jnp.clip(jnp.ceil(bin_h), 1.0, smax)
        # sample grids (P, S): x0 + bin*(i) + bin*(t+0.5)/k, slots t>=k masked
        xs = x0 + bin_w * (i[:, None] + (t[None, :] + 0.5) / kw)
        ys = y0 + bin_h * (i[:, None] + (t[None, :] + 0.5) / kh)
        mx = (t[None, :] < kw).astype(jnp.float32)          # (1, S)
        my = (t[None, :] < kh).astype(jnp.float32)
        xx = xs.reshape(-1)[None, :].repeat(p * smax, 0)    # (PS, PS)
        yy = ys.reshape(-1)[:, None].repeat(p * smax, 1)
        vals = _roi_bilinear(img_i, xx, yy)                 # (C, PS, PS)
        c = vals.shape[0]
        mxf = jnp.broadcast_to(mx, (p, smax)).reshape(-1)   # (PS,)
        myf = jnp.broadcast_to(my, (p, smax)).reshape(-1)
        wgt = myf[:, None] * mxf[None, :]                   # (PS, PS)
        vals = (vals * wgt[None]).reshape(c, p, smax, p, smax).sum(axis=(2, 4))
        return vals / (kw * kh)                             # (C, P, P)

    def one_image(img_i, boxes_i):
        return jax.vmap(lambda b: one_box(img_i, b))(boxes_i)

    return jax.vmap(one_image)(img, boxes)
