"""Connected components + Euclidean distance transform (device, XLA).

TPU-native equivalents of the reference's Triton kernels:

* ``connected_components`` — 8-connected labeling
  (``sam3/perflib/triton/connected_components.py:28-468``). The reference
  runs parallel union-find with atomic_min retries; atomics don't map to the
  TPU's vector model, so this is an iterative *label-propagation* fixpoint:
  labels start as linear indices and each sweep takes the min over the 8
  neighbourhood (a max-pool-style reduce_window on negated labels), doubled
  with pointer-jumping (label <- label[label]) so long snakes converge in
  O(log diameter) sweeps instead of O(diameter).
* ``edt`` — exact squared Euclidean distance transform, separable two-pass
  (Felzenszwalb). The reference implements the O(N^2) variant in Triton
  (``sam3/model/edt.py:54-173``); here each 1D pass is the same O(N^2)
  min-plus reduction expressed as a blocked broadcast-min so XLA keeps it on
  the VPU — exact, no lower-envelope serial scan.

Both are used by the video/interactive tier (point sampling from error
regions, hole filling — sam3_tracker_utils.py:11-427).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def connected_components(mask: jnp.ndarray, max_iters: int = 32) -> jnp.ndarray:
    """8-connected components of a bool mask (H, W) -> int32 labels.

    Background = -1; components keep the smallest linear index they contain.
    ``max_iters`` sweeps of (min-neighbour + pointer jumping); with pointer
    jumping, 32 iterations covers any component in images up to ~2^32 pixels
    of diameter — far beyond 1008^2 in practice (validated vs scipy in
    tests/test_ops_cc.py).
    """
    h, w = mask.shape
    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(n)
    labels = jnp.where(mask, idx, big)

    def sweep(labels):
        # min over the 3x3 neighbourhood (8-connectivity)
        neg = jnp.where(mask, labels, big)
        nb = -jax.lax.reduce_window(
            -neg,
            -big,
            jax.lax.max,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
        )
        flat = labels.reshape(-1)
        nbf = jnp.where(mask, nb, big).reshape(-1)
        # HOOK (Shiloach-Vishkin): when a pixel sees a smaller neighbour
        # label, its current ROOT adopts it (scatter-min). Without this, a
        # minimum entering at a chain's tail can only crawl one pixel per
        # sweep against the pointer direction.
        root = jnp.clip(flat, 0, n - 1)
        flat = flat.at[jnp.where(flat < n, root, n - 1)].min(
            jnp.where(flat < n, nbf, big)
        )
        flat = jnp.minimum(flat, nbf)
        # pointer doubling: label <- label[label]
        def jump(_, f):
            safe = jnp.clip(f, 0, n - 1)
            return jnp.minimum(f, jnp.where(f < n, f[safe], big))

        flat = jax.lax.fori_loop(0, 12, jump, flat)
        return flat.reshape(h, w)

    def body(_, labels):
        return sweep(labels)

    labels = jax.lax.fori_loop(0, max_iters, body, labels)
    return jnp.where(mask, labels, -1)


def component_sizes(labels: jnp.ndarray) -> jnp.ndarray:
    """Pixel count per label id (flat, same size as the image; zeros for
    ids that are not component roots)."""
    h, w = labels.shape
    n = h * w
    flat = jnp.clip(labels.reshape(-1), -1, n - 1)
    valid = flat >= 0
    sizes = jnp.zeros((n,), jnp.int32).at[jnp.where(valid, flat, 0)].add(
        valid.astype(jnp.int32)
    )
    return sizes


def _edt_1d(f: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Exact 1D squared-EDT min-plus: d[i] = min_j (i-j)^2 + f[j].

    f: (..., N). Blocked over j to bound the (..., N, chunk) broadcast.
    """
    n = f.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32)
    out = jnp.full(f.shape, jnp.inf, jnp.float32)
    n_chunks = -(-n // chunk)
    for c in range(n_chunks):
        j0 = c * chunk
        width = min(chunk, n - j0)
        j = j0 + jnp.arange(width, dtype=jnp.float32)
        d2 = (i[:, None] - j[None, :]) ** 2  # (N, width)
        cand = f[..., j0 : j0 + width][..., None, :] + d2  # (..., N, width)
        out = jnp.minimum(out, cand.min(-1))
    return out


def edt(mask: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Squared Euclidean distance to the nearest zero pixel (like
    cv2.distanceTransform(DIST_L2)**2 on the binary mask; reference
    edt_triton, sam3/model/edt.py:54-173).

    mask: (H, W) bool/0-1 — distances computed for True pixels to the
    nearest False pixel. Returns float32 (H, W) of SQUARED distances.
    """
    big = jnp.float32(1e12)
    f = jnp.where(mask > 0, big, 0.0).astype(jnp.float32)
    # pass 1: along rows (W axis)
    d = _edt_1d(f, chunk)
    # pass 2: along cols (H axis)
    d = _edt_1d(d.T, chunk).T
    return d


def sample_point_from_error_region(
    pred_mask: jnp.ndarray,
    gt_mask: jnp.ndarray,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Interactive-refinement point selection (sam3_tracker_utils.py): pick
    the point deepest inside the largest error region — approximated as the
    max-EDT pixel of the error mask (ties broken by linear index).

    Returns ((y, x) int32, is_positive bool) — positive when the error is a
    false negative (missed foreground)."""
    fn = jnp.logical_and(gt_mask > 0, pred_mask <= 0)
    fp = jnp.logical_and(gt_mask <= 0, pred_mask > 0)
    use_fn = fn.sum() >= fp.sum()
    err = jnp.where(use_fn, fn, fp)
    d = edt(err)
    flat_idx = jnp.argmax(d.reshape(-1))
    h, w = err.shape
    y = (flat_idx // w).astype(jnp.int32)
    x = (flat_idx % w).astype(jnp.int32)
    return jnp.stack([y, x]), use_fn
