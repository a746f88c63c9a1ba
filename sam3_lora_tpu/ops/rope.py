"""2D axial rotary position embeddings (RoPE) for ViT attention.

Re-derivation of the reference's complex-valued axial RoPE
(``sam3/model/vitdet.py:32-90``, ``sam3/sam/rope.py``) in real arithmetic
(cos/sin tables), which XLA fuses into the surrounding attention matmuls.

Layout parity notes:
* ``compute_axial_freqs(dim, end_x, end_y)`` returns angles of shape
  (end_x*end_y, dim//2) where the first dim//4 channels rotate with the x
  coordinate and the last dim//4 with y — same ordering as the reference's
  ``compute_axial_cis`` (vitdet.py:41-57).
* Tokens are laid out row-major with t_x = t % end_x, t_y = t // end_x
  (vitdet.py:32-38).
* ``apply_rope`` rotates adjacent channel pairs (2i, 2i+1), matching
  ``torch.view_as_complex`` semantics on the last dim.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def compute_axial_freqs(
    dim: int,
    end_x: int,
    end_y: int,
    theta: float = 10000.0,
    scale_pos: float = 1.0,
    offset: float = 0.0,
) -> np.ndarray:
    """Angle table for 2D axial RoPE -> (end_x*end_y, dim//2) float32 (numpy,
    host-computed once at model build; becomes an XLA constant)."""
    freqs = 1.0 / (
        theta ** (np.arange(0, dim, 4, dtype=np.float32)[: dim // 4] / dim)
    )
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = (t % end_x) * scale_pos + offset
    t_y = np.floor(t / end_x) * scale_pos + offset
    ang_x = np.outer(t_x, freqs)  # (L, dim//4)
    ang_y = np.outer(t_y, freqs)  # (L, dim//4)
    return np.concatenate([ang_x, ang_y], axis=-1)  # (L, dim//2)


def rope_cos_sin(angles) -> Tuple[jnp.ndarray, jnp.ndarray]:
    a = jnp.asarray(angles, dtype=jnp.float32)
    return jnp.cos(a), jnp.sin(a)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate adjacent channel pairs of x (..., L, D) by per-position angles.

    cos/sin: (L, D//2). Equivalent to complex multiply of
    ``view_as_complex(x)`` by ``polar(1, angles)`` (vitdet.py:68-90).
    Computed in fp32 and cast back, matching the reference's ``.float()``
    upcast inside ``apply_rotary_enc``.

    NOTE (TPU): the stride-2 lane access here breaks (8, 128) vector tiling
    and measures ~28% of a ViT block forward. The hot path uses
    :func:`apply_rope_half` on weight-permuted q/k instead (see
    ``rope_half_perm``); this interleaved form is kept for parity oracles
    and the tracker's memory attention.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def rope_half_perm(head_dim: int) -> np.ndarray:
    """Channel permutation mapping interleaved RoPE pairs (2i, 2i+1) to
    rotate-half layout (i, i + D/2): ``new[j] = old[perm[j]]`` with
    ``perm = [0, 2, .., D-2, 1, 3, .., D-1]``.

    Because attention scores are invariant under any permutation applied to
    BOTH q and k channels (S = sum_d q_d k_d), this permutation can be folded
    into the q/k projection **weight columns** once per step (weight-sized
    gather, ~free) — after which the rotation itself touches only contiguous
    half-slices instead of stride-2 lanes. Pair i's angle is unchanged, so
    the cos/sin tables from ``compute_axial_freqs`` apply as-is.
    """
    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def apply_rope_half(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """RoPE in rotate-half layout: x (..., L, D) whose channels are ordered
    (all even pair-members | all odd pair-members) — see ``rope_half_perm``.
    cos/sin: (L, D//2). Contiguous half-slices only; fp32 math as in
    ``apply_rope``. Pure jnp — also traces inside Pallas kernels
    (ops/window_attention.py fuses it into the window kernel)."""
    orig_dtype = x.dtype
    h = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    xe = xf[..., :h]
    xo = xf[..., h:]
    out = jnp.concatenate([xe * cos - xo * sin, xe * sin + xo * cos], axis=-1)
    return out.astype(orig_dtype)


def apply_rope_half_inv(
    y: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Inverse (= transpose) of ``apply_rope_half``: rotates by the negated
    angles. Maps d/d(rotated) cotangents to d/d(unrotated) — used by the
    fused-RoPE window kernel's backward."""
    orig_dtype = y.dtype
    h = y.shape[-1] // 2
    yf = y.astype(jnp.float32)
    ye = yf[..., :h]
    yo = yf[..., h:]
    out = jnp.concatenate([ye * cos + yo * sin, yo * cos - ye * sin], axis=-1)
    return out.astype(orig_dtype)
