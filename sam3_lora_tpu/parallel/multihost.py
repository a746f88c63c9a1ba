"""Multi-host (pod-scale) launch support.

The reference scales out with submitit/torchrun spawning one process per GPU
and wiring NCCL process groups (``sam3/train/train.py:45-339``,
``sam3/train/utils/distributed.py``). The JAX analogue is one process per
HOST: ``jax.distributed.initialize`` joins the hosts into one runtime, every
process sees the global device set through the same ``Mesh``, and the jitted
train step is identical to single-host — XLA routes the gradient reduction
over ICI/DCN. What changes per host is only the INPUT: each host feeds its
own shard of the batch, assembled into a global array.

Usage (same script on every host; TPU pods set the env automatically):

    from sam3_lora_tpu.parallel import multihost
    multihost.initialize()                  # no-op on single host
    mesh = make_mesh()                      # global devices
    loader = DataLoader(ds, per_host_batch, host_shard=multihost.host_shard())
    batch = multihost.globalize(local_batch, mesh)   # host batch -> global

Cited reference behaviour this replaces: per-rank DistributedSampler
(train.py:233-247), NCCL allreduce via DDP, rank-0-only checkpoint writes
(trainer.py:362-398 — mirrored by ``is_primary()`` guards here).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host runtime. Returns True iff running multi-host.

    On TPU pods all three arguments come from the environment and may be
    omitted (``jax.distributed.initialize()`` autodetects). On CPU/GPU
    clusters pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Single-host (the common case and
    every test) is a no-op.
    """
    num = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num <= 1 and addr is None:
        return False
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # pass the RESOLVED values: jax.distributed's own autodetection knows
    # cluster envs (TPU pod, Slurm, GKE) but not these JAX_* variables, so
    # forwarding None here would fail on plain multi-process launches
    # (caught by tests/test_multihost.py::TestRealMultiProcess)
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num if num > 1 else None,
        process_id=process_id,
    )
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """Rank-0 guard for checkpoint/stats writes (reference rank==0 guards)."""
    return jax.process_index() == 0


@dataclass(frozen=True)
class HostShard:
    """Which slice of the dataset this host owns (DistributedSampler
    semantics: contiguous stride partition, train.py:233-247)."""

    index: int
    count: int

    def indices(self, n: int) -> np.ndarray:
        """Host's strided subset of ``range(n)`` (drop-last across hosts)."""
        per = n // self.count
        return np.arange(n)[self.index * per : (self.index + 1) * per]


def host_shard() -> HostShard:
    return HostShard(jax.process_index(), jax.process_count())


def globalize(local_batch: Any, mesh) -> Any:
    """Assemble per-host batches into global arrays sharded over the mesh.

    Each host passes its LOCAL per-host batch (leading dim =
    global_batch / process_count). Returns a pytree of global jax.Arrays
    whose leading dim is the global batch, data-sharded over the mesh —
    exactly what the jitted train step consumes. Single-host this is
    equivalent to ``shard_batch``.
    """
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(local_batch, mesh)
    return multihost_utils.host_local_array_to_global_array(
        local_batch, mesh, jax.sharding.PartitionSpec("data")
    )
