"""Frame-parallel video detection over a device mesh.

Re-design of the reference's multi-GPU video detector
(``Sam3ImageOnVideoMultiGPU.forward_video_grounding_multigpu``,
``sam3/model/sam3_image.py:687-883``): there, W GPUs each run the detector
on one frame of a W-frame chunk, exchange results through hand-written
async NCCL ``all_gather`` calls, and prefetch the next chunk to overlap
communication with compute.

TPU-native shape: frames ARE a batch dimension. One jitted detector step
takes a (W, ...) frame chunk sharded ``P("data")`` over the mesh; XLA runs
each frame's detection on its own device and the host-side fetch is the
all-gather (riding ICI). Prefetch = dispatching the next chunk's
``device_put`` while the current chunk computes (JAX dispatch is async).
No NCCL plumbing, no per-GPU buffer bookkeeping, no contiguity dances
(sam3_image.py:878-880).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import DATA_AXIS, batch_sharding, make_mesh

__all__ = ["FrameParallelDetector"]


class FrameParallelDetector:
    """Runs a per-frame detection function over chunks of frames sharded
    across the mesh's ``data`` axis, with double-buffered host->device
    transfer (the reference's chunk prefetch, sam3_image.py:729-812).

    ``detect_fn(params, images, token_ids) -> pytree`` must be batch-first
    on every output leaf (our ``SAM3LoRAInference._forward`` contract).
    """

    def __init__(
        self,
        detect_fn: Callable,
        params,
        mesh=None,
        chunk_size: Optional[int] = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.chunk = (
            chunk_size
            if chunk_size is not None
            else int(self.mesh.shape[DATA_AXIS])
        )
        if self.chunk % self.mesh.shape[DATA_AXIS] != 0:
            raise ValueError(
                f"chunk_size {self.chunk} must be divisible by the data axis "
                f"({self.mesh.shape[DATA_AXIS]} devices)"
            )
        self.params = params
        self._sharding = batch_sharding(self.mesh)
        self._fn = jax.jit(detect_fn)

    def _put(self, images: np.ndarray, token_ids: np.ndarray):
        return (
            jax.device_put(images, self._sharding),
            jax.device_put(token_ids, self._sharding),
        )

    def detect_video(
        self,
        frames: Sequence[np.ndarray],     # F x (3, R, R) preprocessed
        token_ids: np.ndarray,            # (L,) one prompt for the video
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield per-frame outputs in order. Frames are grouped into
        ``chunk``-sized device-sharded batches; the next chunk's transfer is
        dispatched before the current chunk's results are fetched (the
        reference's prefetch overlap, sam3_image.py:776-812)."""
        f = len(frames)
        w = self.chunk
        n_chunks = (f + w - 1) // w

        def chunk_arrays(ci: int):
            lo = ci * w
            hi = min(lo + w, f)
            imgs = np.stack(list(frames[lo:hi]))
            pad = w - imgs.shape[0]
            if pad:  # static chunk shape; padded frames are dropped on yield
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
                )
            toks = np.broadcast_to(token_ids, (w,) + token_ids.shape)
            return imgs, np.ascontiguousarray(toks), hi - lo

        dev_next = self._put(*chunk_arrays(0)[:2])
        for ci in range(n_chunks):
            imgs, toks, n_valid = chunk_arrays(ci)
            dev = dev_next
            out = self._fn(self.params, *dev)
            if ci + 1 < n_chunks:  # prefetch while the chunk computes
                dev_next = self._put(*chunk_arrays(ci + 1)[:2])
            host = jax.tree_util.tree_map(np.asarray, out)
            for i in range(n_valid):
                yield jax.tree_util.tree_map(lambda x: x[i], host)
