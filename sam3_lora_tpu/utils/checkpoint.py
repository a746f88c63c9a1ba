"""Base-model checkpoint IO.

The converted base checkpoint is a flat ``.npz`` whose keys are '.'-joined
flax param paths (identical to the reference torch state-dict keys after the
``detector.`` strip + the converter's transpose rules —
``scripts/convert_checkpoint.py``). Loading never round-trips the tree through
string paths (names contain dots); it looks up tuple paths by joined name.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def save_base_checkpoint(params, path: str) -> int:
    """Save all non-adapter tensors as flat npz."""
    flat = traverse_util.flatten_dict(params)
    out = {
        ".".join(k): np.asarray(v)
        for k, v in flat.items()
        if k[-1] not in ("lora_a", "lora_b", "kernel_scale")
    }
    np.savez(path, **out)
    return len(out)


def load_base_checkpoint(params, path: str, strict: bool = True) -> Tuple[Any, int]:
    """Replace base leaves of ``params`` from a flat npz. Adapter leaves are
    left untouched (they are not in a base checkpoint by construction)."""
    data = np.load(path)
    flat = traverse_util.flatten_dict(params)
    by_name = {".".join(k): k for k in flat}
    missing = []
    n = 0
    for name in data.files:
        k = by_name.get(name)
        if k is None:
            missing.append(name)
            continue
        arr = data[name]
        if tuple(arr.shape) != tuple(flat[k].shape):
            raise ValueError(
                f"shape mismatch for {name}: ckpt {arr.shape} vs model {flat[k].shape}"
            )
        flat[k] = jnp.asarray(arr, dtype=flat[k].dtype)
        n += 1
    if missing and strict:
        raise KeyError(
            f"{len(missing)} checkpoint keys not in model (first: {missing[:5]})"
        )
    # kernel_scale leaves exist only when the int8 quant tier is enabled;
    # they are filled by ops.quant.prequantize_base (and ignored by the
    # dynamic-quant forward while the kernel is still a float dtype), so a
    # converted base checkpoint legitimately lacks them.
    model_base = {
        name
        for name, k in by_name.items()
        if k[-1] not in ("lora_a", "lora_b", "kernel_scale")
    }
    not_loaded = model_base - set(data.files)
    if not_loaded and strict:
        raise KeyError(
            f"{len(not_loaded)} model params missing from checkpoint "
            f"(first: {sorted(not_loaded)[:5]})"
        )
    return traverse_util.unflatten_dict(flat), n
