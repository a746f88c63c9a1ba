"""Fused focal / dice / BCE losses (pure jnp).

TPU-native equivalents of the reference's Triton focal-loss kernels
(``sam3/train/loss/sigmoid_focal_loss.py:35-321``) and dice loss
(``loss_fns.py:79-123``). On TPU these elementwise chains fuse into a single
VPU kernel under XLA, so no Pallas kernel is needed (SURVEY.md §2.1 note);
the math matches the reference's non-Triton branch (loss_fns.py:159-167) which
the Triton kernels replicate.

All functions take an optional ``weights`` array for static-shape masking
(replacing the reference's dynamic filtering of matched pairs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy_with_logits, elementwise, numerically stable."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss (no reduction), matching loss_fns.py:159-167."""
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_bce(logits, targets)
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def masked_focal_loss_mean(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes,
    weights: Optional[jnp.ndarray] = None,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Reference reduction ``loss.mean(1).sum() / num_boxes`` over (N, P)
    with optional per-row validity weights (N,)."""
    loss = sigmoid_focal_loss(logits, targets, alpha, gamma)
    per_row = loss.mean(axis=-1)
    if weights is not None:
        per_row = per_row * weights
    return per_row.sum() / num_boxes


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dice loss over (N, P) flattened masks, reduced sum / num_boxes
    (loss_fns.py:105-123)."""
    inputs = jax.nn.sigmoid(logits)
    numerator = 2.0 * (inputs * targets).sum(axis=-1)
    denominator = inputs.sum(axis=-1) + targets.sum(axis=-1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    if weights is not None:
        loss = loss * weights
    return loss.sum() / num_boxes
