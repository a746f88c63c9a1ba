"""LoRA parameter management: trainable partitioning, adapter-only IO, merge.

The reference mutates torch modules in place and tracks trainability via
requires_grad (``lora_layers.py:158-293``). In JAX, the adapters are just
parameters whose path ends in ``lora_a``/``lora_b``; this module provides

* ``lora_mask(params)`` — bool pytree: True for adapter leaves (the optax
  trainable mask / optimizer partition),
* ``split_params`` / ``merge_params`` — frozen-base vs adapter pytrees,
* ``save_lora_weights`` / ``load_lora_weights`` — adapter-only .npz
  checkpoints (10-50 MB, mirrors ``save_lora_weights`` lora_layers.py:265-293),
* ``merge_lora_into_base`` — fold adapters into base kernels
  (W <- W + A@B * alpha/r), the ``merge_weights`` capability of the
  reference's src/lora variant (src/lora/lora_layer.py:16-178),
* ``count_parameters`` — total/trainable stats (lora_layers.py:248-262).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..config import LoRAConfig

LORA_LEAF_NAMES = ("lora_a", "lora_b")


def _is_lora_path(path: Tuple[str, ...]) -> bool:
    return path[-1] in LORA_LEAF_NAMES


def lora_mask(params) -> Any:
    flat = traverse_util.flatten_dict(params)
    mask = {k: _is_lora_path(k) for k in flat}
    return traverse_util.unflatten_dict(mask)


def split_params(params) -> Tuple[Dict, Dict]:
    """-> (base_params_flat, lora_params_flat), '.'-joined keys."""
    flat = traverse_util.flatten_dict(params, sep=".")
    base = {k: v for k, v in flat.items() if not k.endswith(LORA_LEAF_NAMES)}
    lora = {k: v for k, v in flat.items() if k.endswith(LORA_LEAF_NAMES)}
    return base, lora


def save_lora_weights(params, path: str) -> int:
    """Save only adapter tensors as .npz; returns the number saved."""
    _, lora = split_params(params)
    np.savez(path, **{k: np.asarray(v) for k, v in lora.items()})
    return len(lora)


def load_lora_weights(params, path: str):
    """Return params with adapter leaves replaced from an .npz checkpoint.

    NB: flatten/unflatten with sep='.' would corrupt the tree — module and
    param names legitimately contain dots (``layers.0``, ``proj.kernel``).
    Work with tuple paths and only *look up* by joined name.
    """
    data = np.load(path)
    flat = traverse_util.flatten_dict(params)  # tuple keys
    by_name = {".".join(k): k for k in flat}
    n = 0
    for name in data.files:
        k = by_name.get(name)
        if k is None:
            raise KeyError(f"LoRA checkpoint key not in model params: {name}")
        flat[k] = jnp.asarray(data[name], dtype=flat[k].dtype).reshape(flat[k].shape)
        n += 1
    return traverse_util.unflatten_dict(flat), n


def merge_lora_into_base(params, lcfg: LoRAConfig):
    """Fold every (lora_a, lora_b) pair into its sibling kernel and drop the
    adapter leaves: W <- W + (A @ B) * alpha/rank."""
    flat = traverse_util.flatten_dict(params)
    out = dict(flat)
    for path in list(flat.keys()):
        if path[-1] != "lora_a":
            continue
        parent = path[:-1]
        a = flat[path]
        b = flat[parent + ("lora_b",)]
        kernel_path = parent + ("kernel",)
        w = flat[kernel_path]
        out[kernel_path] = (
            w.astype(jnp.float32) + (a @ b) * (lcfg.alpha / lcfg.rank)
        ).astype(w.dtype)
        del out[parent + ("lora_a",)]
        del out[parent + ("lora_b",)]
    return traverse_util.unflatten_dict(out)


def count_parameters(params) -> Dict[str, float]:
    flat = traverse_util.flatten_dict(params)
    total = sum(int(np.prod(v.shape)) for v in flat.values())
    trainable = sum(
        int(np.prod(v.shape)) for k, v in flat.items() if _is_lora_path(k)
    )
    return {
        "total_parameters": total,
        "trainable_parameters": trainable,
        "trainable_percentage": 100.0 * trainable / total if total else 0.0,
    }


def lora_optimizer(tx, params):
    """Wrap an optax transform so ONLY adapter leaves update.

    ``optax.masked`` alone is wrong here: it passes masked-out gradients
    through *unchanged*, so frozen base params would still step. Partition
    instead: adapters get ``tx``, everything else ``set_to_zero`` (the JAX
    analogue of the reference's requires_grad=False freeze,
    lora_layers.py:166-168).
    """
    import optax

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "lora"
        if str(getattr(path[-1], "key", path[-1])) in LORA_LEAF_NAMES
        else "frozen",
        params,
    )
    return optax.multi_transform(
        {"lora": tx, "frozen": optax.set_to_zero()}, labels
    )


def lora_module_names(params) -> list:
    """Torch-style names of modules that received adapters."""
    _, lora = split_params(params)
    return sorted({k.rsplit(".", 1)[0] for k in lora})
