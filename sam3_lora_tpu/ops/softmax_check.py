"""Debug-mode attention-score range check (``SAM3_SOFTMAX_CHECK=1``).

The window/long attention kernels default to clamp softmax — ``exp(min(s,
70))`` with the reciprocal guarded by ``_RS_EPS`` — which is exact only while
the per-row score max stays <= 70 and non-degenerate while any score stays
above the ~-87 f32 exp underflow line (see ops/long_attention.py's margin
note). That bound was calibrated at |s| < 30 on the repo's converted random
init; trained weights could differ. This module makes the assumption
*checkable at runtime* instead of remembered: with the env set, every kernel
call site also computes max|s| over the per-head scaled scores on the plain
XLA path and records it host-side, and the parity / golden-checkpoint tests
assert the recorded maxima stay inside the margin
(VERDICT r4 next-#6).

Cost when enabled: one extra (L, L)-score einsum + max-reduce per attention
call — debug only, never on by default. The env is read at TRACE time: set it
before the first jit of the function under test (cached executables traced
without it will not re-trace).

Usage in tests::

    softmax_check.reset()
    with softmax_check.enabled():   # or env SAM3_SOFTMAX_CHECK=1
        out = jax.jit(model_fn)(...)
        jax.block_until_ready(out)
    softmax_check.assert_margin()   # max|s| <= 60 (10 under the 70 clamp)
"""

from __future__ import annotations

import contextlib
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

# (tag, max_abs_score) per executed (not traced) kernel call.
records: List[Tuple[str, float]] = []

# 70-clamp exactness bound minus a 10-point safety margin; the -87 underflow
# side has >2x this slack whenever the +side holds (scores are symmetric in
# magnitude terms around the LN-bounded |q||k| product).
DEFAULT_BOUND = 60.0


def is_enabled() -> bool:
    return os.environ.get("SAM3_SOFTMAX_CHECK", "0") == "1"


@contextlib.contextmanager
def enabled():
    old = os.environ.get("SAM3_SOFTMAX_CHECK")
    os.environ["SAM3_SOFTMAX_CHECK"] = "1"
    try:
        yield
    finally:
        if old is None:
            del os.environ["SAM3_SOFTMAX_CHECK"]
        else:
            os.environ["SAM3_SOFTMAX_CHECK"] = old


def reset() -> None:
    records.clear()


def max_observed() -> Optional[float]:
    return max((v for _, v in records), default=None)


def assert_margin(bound: float = DEFAULT_BOUND) -> None:
    """Assert every recorded max|s| is inside the clamp-exactness margin."""
    assert records, "softmax_check: nothing recorded (env not set at trace?)"
    bad = [(t, v) for t, v in records if not (v <= bound)]
    assert not bad, (
        f"softmax clamp margin violated: max|s| > {bound} at {bad[:8]} — "
        "the exp(min(s, 70)) kernels are no longer exact for these weights; "
        "flip SAM3_WINDOW_CLAMP=0 / SAM3_LONG_SOFTMAX=max and re-measure"
    )


def _record(tag: str):
    def cb(v):
        records.append((tag, float(v)))

    return cb


def observe(tag, q, k, scale, head_dim, cos=None, sin=None) -> None:
    """Record max|s| for a packed-or-plain attention call.

    q/k: (..., L, P*head_dim) with P >= 1 heads side by side in lanes (the
    kernels' packed layout; P=1 is the plain per-head layout). When cos/sin
    (L, head_dim//2) are given, q/k arrive UNROTATED in rotate-half layout
    and are rotated here first, matching the in-kernel fused RoPE scores.
    No-op (traces nothing) unless SAM3_SOFTMAX_CHECK=1 at trace time.
    """
    if not is_enabled():
        return
    *lead, l, dp = q.shape
    p = dp // head_dim
    qf = q.astype(jnp.float32).reshape(*lead, l, p, head_dim)
    kf = k.astype(jnp.float32).reshape(*lead, l, p, head_dim)
    if cos is not None:
        from .rope import apply_rope_half

        # tables broadcast over the head axis: (L, 1, dh/2)
        c = cos.astype(jnp.float32)[:, None, :]
        s_ = sin.astype(jnp.float32)[:, None, :]
        qf = apply_rope_half(qf, c, s_)
        kf = apply_rope_half(kf, c, s_)
    s = jnp.einsum("...qpd,...kpd->...pqk", qf, kf) * jnp.float32(scale)
    jax.debug.callback(_record(tag), jnp.max(jnp.abs(s)))


def observe_scores(tag, logits) -> None:
    """Record max|s| from already-computed scaled logits (XLA oracle path)."""
    if not is_enabled():
        return
    jax.debug.callback(_record(tag), jnp.max(jnp.abs(logits)))
