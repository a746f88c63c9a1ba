"""Window partition / unpartition for windowed ViT attention.

TPU-native equivalent of ``sam3/model/vitdet.py:93-139``. At the SAM3
resolution (72x72 tokens, window 24) H and W divide evenly, so the padding
branch is statically elided by Python control flow (shapes are static under
jit) — no dynamic padding ever reaches XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def window_partition(
    x: jnp.ndarray, window_size: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, win, win, C), plus padded (Hp, Wp)."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        -1, window_size, window_size, c
    )
    return windows, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray,
    window_size: int,
    pad_hw: Tuple[int, int],
    hw: Tuple[int, int],
) -> jnp.ndarray:
    """Inverse of window_partition; crops any padding."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(
        b, hp // window_size, wp // window_size, window_size, window_size, -1
    )
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    if hp > h or wp > w:
        x = x[:, :h, :w, :]
    return x
