"""Device mesh + sharding helpers (the TPU-native replacement of the
reference's NCCL/DDP layer, ``sam3/train/utils/distributed.py`` and
``sam3/train/trainer.py:303-324``).

Design (scaling-book style): a 2D mesh ``(data, model)``. LoRA finetuning is a
data-parallel workload (the reference only implements DDP — SURVEY.md §2.8), so
the default mesh puts every chip on the ``data`` axis and gradients are reduced
by ``psum`` inserted by XLA from sharding annotations — no hand-written
collectives. The ``model`` axis exists for optional tensor-sharding of the
frozen base (fsdp-style weight sharding for HBM headroom and for >8-chip
scale-out); LoRA adapters stay replicated (they are tiny and their all-reduce
rides ICI for free).

Everything goes through ``jax.jit`` with NamedSharding constraints — the
single-controller model replaces process groups, byte-tensor gathers, and
filesystem gathers wholesale (host eval payloads are gathered with
``jax.experimental.multihost_utils`` when multi-host, trivially local here).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """(data, model) mesh over the first ``n_devices`` devices.

    ``model_parallel`` chips are grouped on the inner (fast-ICI) axis; the
    rest go to data parallelism.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, leading axis split over ``data``.

    Works on any pytree whose leaves all carry the batch dim first (our
    ``Batch``/``Targets``/``GeoPrompt`` structs satisfy this).
    """
    s = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def param_shardings(params, mesh: Mesh, shard_base: bool = False):
    """Sharding tree for model params.

    Default: fully replicated (848M bf16 ≈ 1.7 GB — fits v5e HBM with room).
    ``shard_base=True`` fsdp-shards every base kernel's largest dim over the
    ``data`` axis (adapters and small leaves stay replicated) — the XLA
    compiler then inserts all-gathers at use and reduce-scatters on grads.
    """
    rep = replicated(mesh)
    if not shard_base:
        return jax.tree_util.tree_map(lambda _: rep, params)

    n_data = mesh.shape[DATA_AXIS]

    def rule(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("lora_a", "lora_b"):
            return rep
        shape = getattr(leaf, "shape", ())
        if len(shape) < 2 or int(np.prod(shape)) < 2**16:
            return rep
        # shard the largest divisible dim
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for ax in order:
            if shape[ax] % n_data == 0:
                spec = [None] * len(shape)
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)
