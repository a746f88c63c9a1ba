"""Host-side distributed utilities (multi-host gather/broadcast).

TPU-native replacement of the reference's ``sam3/train/utils/distributed.py``:

* rank/world helpers            distributed.py:230-270  -> jax.process_index/count
* pickled-object all_gather     distributed.py:116-185  -> byte-tensor gather
  over the ICI via ``multihost_utils.process_allgather`` (the NCCL
  byte-padding dance is replaced by one padded uint8 all-gather)
* filesystem gather for huge eval payloads  distributed.py:57-113 -> same
  strategy (shared filesystem), kept because multi-host eval merges of
  RLE-mask payloads are cheaper via files than via ICI.

Everything degrades to trivial single-process behavior at world size 1 —
exactly how the reference's paths are exercised on one device
(SURVEY.md §4) — so these run identically under tests and on a pod.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Any, List, Optional

import numpy as np

__all__ = [
    "get_rank",
    "get_world_size",
    "is_main_process",
    "all_gather_objects",
    "broadcast_object",
    "filesystem_gather",
    "barrier",
]


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def all_gather_objects(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host; returns the
    world-size list on every host (reference ``all_gather`` of pickled
    objects, distributed.py:116-185).

    Implementation: pickle -> pad to the global max length (one scalar
    all-gather) -> uint8 all-gather -> unpickle. Single-host: ``[data]``.
    """
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([buf.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)  # (world, max_size)
    return [
        pickle.loads(gathered[r, : int(sizes[r, 0])].tobytes())
        for r in range(world)
    ]


def broadcast_object(data: Any, src: int = 0) -> Any:
    """Broadcast a picklable object from ``src`` to all hosts
    (reference broadcast wrappers, distributed.py:272-330)."""
    if get_world_size() == 1:
        return data
    return all_gather_objects(data)[src]


def barrier(name: str = "barrier"):
    """Cross-host sync point (reference ``dist.barrier`` in the val loop,
    trainer.py:643-755)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def filesystem_gather(
    data: Any,
    shared_dir: str,
    tag: str = "gather",
    timeout_s: float = 3600.0,
    poll_s: float = 0.5,
    cleanup: bool = True,
) -> Optional[List[Any]]:
    """Gather huge picklable payloads through a shared filesystem
    (reference distributed.py:57-113): every host writes
    ``<shared_dir>/<tag>_rank<i>.pkl`` plus a ``.done`` marker; rank 0 polls
    until all markers exist, loads everything, and returns the list; other
    ranks return None. Used for multi-host eval merges where the payload
    (per-image RLE predictions) is too large to ship over collectives.
    """
    os.makedirs(shared_dir, exist_ok=True)
    rank, world = get_rank(), get_world_size()
    path = os.path.join(shared_dir, f"{tag}_rank{rank}.pkl")
    with open(path + ".tmp", "wb") as f:
        pickle.dump(data, f)
    os.replace(path + ".tmp", path)  # atomic publish (reference tmp+mv)
    open(path + ".done", "w").close()

    if rank != 0:
        return None
    deadline = time.time() + timeout_s
    paths = [
        os.path.join(shared_dir, f"{tag}_rank{r}.pkl") for r in range(world)
    ]
    while not all(os.path.exists(p + ".done") for p in paths):
        if time.time() > deadline:
            raise TimeoutError(f"filesystem_gather timed out waiting for {tag}")
        time.sleep(poll_s)
    out = []
    for p in paths:
        with open(p, "rb") as f:
            out.append(pickle.load(f))
        if cleanup:
            os.remove(p)
            os.remove(p + ".done")
    return out
