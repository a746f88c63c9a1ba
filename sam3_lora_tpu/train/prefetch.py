"""Device-side input prefetch: overlap host->device batch transfer with step
compute, and shrink the wire format.

The reference's loader (torch ``pin_memory`` + CUDA ``non_blocking`` copies,
``train_sam3_lora_native.py:823-843``) overlaps H2D transfer with compute via
CUDA streams. The JAX-native equivalent is simpler: ``jax.device_put`` is
asynchronous — it returns immediately with the transfer in flight — so a
small deque of batches already being transferred gives double buffering with
no extra machinery. Without it the transfer serializes into every step at
dispatch time (measured on the v5e tunnel host: a ~46 MB real-data batch
added ~0.7 s to a 2.55 s step).

``pack_bool`` additionally ships large boolean leaves (the (B, T, m, m)
target masks: 21 MB/batch as 1-byte bools) as packed bits — 8x fewer bytes
on the wire — and unpacks them on device with one jitted shift-and-mask per
batch (cheap VPU work, exact bool round-trip). Packing runs on the host
iterator thread; unpacking is dispatched asynchronously, so neither blocks
the step loop.

``sharding`` distributes each batch over a mesh (the multi-chip
data-parallel case: pass ``batch_sharding(mesh)``); None keeps the default
single-device placement. With a sharding, bool leaves are packed PER ROW
(``np.packbits(axis=1)`` over the flattened trailing dims) so the packed
uint8 array keeps the batch leading axis and shards exactly like the
unpacked leaf would; the jitted unpack is elementwise+reshape per row, so
GSPMD propagates the batch sharding through it with no collectives. Leaves
whose leading dim does not divide the mesh (scalars, per-batch metadata)
are replicated.
"""

from __future__ import annotations

import collections
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

_PACK_MIN_SIZE = 4096  # don't bother packing tiny leaves


def _pack_leaves(b, per_row: bool = False):
    """tree -> (leaves with big bool ndarrays bit-packed, shapes, treedef).

    ``shapes[i]`` is the original bool shape for packed leaves, else None.
    ``per_row`` packs each batch row independently (``packbits(axis=1)`` over
    the flattened trailing dims) so the packed (B, nbytes) array keeps the
    batch leading axis and accepts the same batch sharding as the unpacked
    leaf; the flat variant is a denser single vector for one device.
    """
    leaves, treedef = jax.tree_util.tree_flatten(b)
    out, shapes = [], []
    for x in leaves:
        if (
            isinstance(x, np.ndarray)
            and x.dtype == np.bool_
            and x.size >= _PACK_MIN_SIZE
            and (not per_row or x.ndim >= 1)
        ):
            if per_row:
                flat = x.reshape(x.shape[0], -1)
                out.append(np.packbits(flat, axis=1, bitorder="little"))
            else:
                out.append(np.packbits(x.ravel(), bitorder="little"))
            shapes.append(tuple(x.shape))
        else:
            out.append(x)
            shapes.append(None)
    return out, tuple(shapes), treedef


def _make_unpack(shapes, treedef, per_row: bool = False):
    def unpack(*leaves):
        res = []
        for x, shape in zip(leaves, shapes):
            if shape is None:
                res.append(x)
                continue
            n = int(np.prod(shape))
            if per_row:
                # (B, nbytes) -> (B, nbytes, 8) bits -> (B, trailing...)
                row_n = n // shape[0]
                bits = (x[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
                rows = bits.reshape(shape[0], -1)[:, :row_n]
                res.append(rows.reshape(shape).astype(jnp.bool_))
            else:
                bits = (x[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
                res.append(bits.reshape(-1)[:n].reshape(shape).astype(jnp.bool_))
        return jax.tree_util.tree_unflatten(treedef, res)

    return jax.jit(unpack)


def _leaf_shardings(leaves, sharding):
    """Per-leaf placement: the batch sharding where the leading dim divides
    the mesh, replication otherwise (scalars, ragged metadata)."""
    from jax.sharding import NamedSharding, PartitionSpec

    n = sharding.mesh.size if hasattr(sharding, "mesh") else 1
    replicated = (
        NamedSharding(sharding.mesh, PartitionSpec())
        if hasattr(sharding, "mesh")
        else sharding
    )
    out = []
    for x in leaves:
        shape = np.shape(x)
        out.append(sharding if (len(shape) >= 1 and shape[0] % n == 0) else replicated)
    return out


def prefetch_to_device(
    it: Iterator[Any],
    size: int = 2,
    sharding: Optional[Any] = None,
    pack_bool: bool = False,
) -> Iterator[Any]:
    """Yield batches from ``it`` with their H2D transfers started ``size``
    batches ahead. Each batch is a pytree of host arrays; static shapes
    across batches (the loader contract) keep the unpack jit to one compile."""
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    buf: collections.deque = collections.deque()
    unpack_cache = {}
    per_row = sharding is not None

    def put(b):
        if not pack_bool:
            if sharding is not None:
                leaves, treedef = jax.tree_util.tree_flatten(b)
                moved = jax.device_put(leaves, _leaf_shardings(leaves, sharding))
                return jax.tree_util.tree_unflatten(treedef, moved)
            return jax.device_put(b)
        leaves, shapes, treedef = _pack_leaves(b, per_row=per_row)
        key = (shapes, treedef)
        if key not in unpack_cache:
            unpack_cache[key] = _make_unpack(shapes, treedef, per_row=per_row)
        if sharding is not None:
            moved = jax.device_put(leaves, _leaf_shardings(leaves, sharding))
        else:
            moved = jax.device_put(leaves)
        return unpack_cache[key](*moved)

    for b in it:
        buf.append(put(b))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
