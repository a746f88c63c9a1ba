"""Sine position encodings (pure functions, precomputable constants).

Re-derivations of the reference's ``PositionEmbeddingSine``
(``sam3/model/position_encoding.py:10-124``) and
``gen_sineembed_for_position`` (``sam3/model/model_misc.py:238-274``).
The reference caches grids in a dict keyed by runtime shape; here every
function is shape-static so XLA constant-folds the grids at compile time.
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)


def _interleave_sin_cos(x: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(x[..., 0::2]), cos(x[..., 1::2])) then flatten — the
    reference's interleaving (position_encoding.py:63-68)."""
    s = jnp.sin(x[..., 0::2])
    c = jnp.cos(x[..., 1::2])
    # explicit final dim: a -1 reshape is ambiguous for zero-size inputs
    # (e.g. encoding an empty prompt-slot axis)
    out_dim = s.shape[-1] + c.shape[-1]
    return jnp.stack([s, c], axis=-1).reshape(*x.shape[:-1], out_dim)


def sine_pos_grid(
    h: int,
    w: int,
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = TWO_PI,
) -> jnp.ndarray:
    """2D sine position encoding grid -> (num_pos_feats, H, W) float32.

    ``num_pos_feats`` is the total channel count (split evenly across y, x),
    matching ``PositionEmbeddingSine(num_pos_feats=256)`` which halves
    internally (position_encoding.py:26).
    """
    npf = num_pos_feats // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)
    x = jnp.arange(1, w + 1, dtype=jnp.float32)
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = _dim_t(npf, temperature)
    pos_y = _interleave_sin_cos(y[:, None] / dim_t)  # (H, npf)
    pos_x = _interleave_sin_cos(x[:, None] / dim_t)  # (W, npf)
    pos_y = jnp.broadcast_to(pos_y[:, None, :], (h, w, npf))
    pos_x = jnp.broadcast_to(pos_x[None, :, :], (h, w, npf))
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)  # (H, W, num_pos_feats)
    return jnp.transpose(pos, (2, 0, 1))


def encode_xy(
    x: jnp.ndarray,
    y: jnp.ndarray,
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    scale: float = TWO_PI,
):
    """Encode normalized point coords -> (pos_x, pos_y), each (..., npf).

    Mirrors ``PositionEmbeddingSine._encode_xy`` (position_encoding.py:52-69).
    """
    npf = num_pos_feats // 2
    dim_t = _dim_t(npf, temperature)
    pos_x = _interleave_sin_cos((x * scale)[..., None] / dim_t)
    pos_y = _interleave_sin_cos((y * scale)[..., None] / dim_t)
    return pos_x, pos_y


def encode_boxes(
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    num_pos_feats: int = 256,
) -> jnp.ndarray:
    """(pos_y | pos_x | h | w) box encoding -> (..., num_pos_feats + 2).

    Mirrors ``PositionEmbeddingSine.encode_boxes`` (position_encoding.py:71-75).
    """
    pos_x, pos_y = encode_xy(cx, cy, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x, h[..., None], w[..., None]], axis=-1)


def gen_sineembed_for_position(pos: jnp.ndarray, num_feats: int = 256) -> jnp.ndarray:
    """DETR conditional-query sine embedding (model_misc.py:238-274).

    pos: (..., 2|4) normalized coords -> (..., num_feats * pos.shape[-1] / 2).
    Note this uses a *different* dim_t convention than ``sine_pos_grid``
    (10000^(2*(i//2)/128) with num_feats//2 = 128), kept for parity.
    """
    nf = num_feats // 2
    dim_t = _dim_t(nf, 10000.0)
    parts = []
    order = [1, 0] if pos.shape[-1] == 2 else [1, 0, 2, 3]  # y, x (, w, h)
    for j in order:
        e = _interleave_sin_cos((pos[..., j] * TWO_PI)[..., None] / dim_t)
        parts.append(e)
    return jnp.concatenate(parts, axis=-1)


def get_1d_sine_pe(pos: jnp.ndarray, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """1D sine PE as in the original Transformer paper, matching the
    tracker's temporal embedding (sam3_tracker_utils.py:327-337):
    (...,) positions -> (..., dim) with [sin | cos] halves."""
    pe_dim = dim // 2
    i = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / pe_dim)
    x = pos.astype(jnp.float32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)
