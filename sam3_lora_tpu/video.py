"""Video grounding + tracking orchestration (static object slots).

Re-design of the reference's per-frame loop (``sam3/model/sam3_video_base.py:
151-292`` ``_det_track_one_frame``): detector finds text-prompted instances,
the tracker propagates every live object through memory attention, and
detections are associated with tracks to spawn/refresh/retire objects.

TPU-first state design: the reference keeps per-object python dicts sharded
across GPUs (``_assign_new_det_to_gpus``, sam3_video_base.py:1298-1310); here
the tracked-object state is ONE pytree of fixed-size arrays with ``K``
object slots — objects are a batch dimension, so every per-frame stage is a
single jitted program and "sharding objects across devices" is just a
``data``-axis sharding of the slot dimension (SURVEY.md §2.8).

Round-1 scope: detector pass + slot assignment + tracker memory update +
association + keep-alive/hotstart counters. The reference's long tail of
heuristics (occlusion suppression, reconditioning cadence, hole filling) is
layered on this state in a later round.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .ops.association import associate_det_trk
from .ops.nms import nms_masks


class TrackState(NamedTuple):
    """Fixed K-slot tracked-object state (one pytree, jit-carried)."""

    alive: jnp.ndarray          # (K,) bool
    obj_ids: jnp.ndarray        # (K,) int32 — stable external ids, -1 free
    masks: jnp.ndarray          # (K, Hm, Wm) float32 last-frame mask logits
    scores: jnp.ndarray         # (K,) float32 running score
    mem_feats: jnp.ndarray      # (K, M, mem_dim) memory bank tokens
    mem_pos: jnp.ndarray        # (K, M, mem_dim)
    mem_valid: jnp.ndarray      # (K, M) bool
    missing_frames: jnp.ndarray  # (K,) int32 keep-alive counter
    hotstart: jnp.ndarray       # (K,) int32 frames since spawn
    next_id: jnp.ndarray        # () int32


def init_track_state(
    num_slots: int, mem_tokens: int, mem_dim: int, mask_hw: Tuple[int, int]
) -> TrackState:
    k = num_slots
    return TrackState(
        alive=jnp.zeros((k,), jnp.bool_),
        obj_ids=jnp.full((k,), -1, jnp.int32),
        masks=jnp.zeros((k,) + tuple(mask_hw), jnp.float32),
        scores=jnp.zeros((k,), jnp.float32),
        mem_feats=jnp.zeros((k, mem_tokens, mem_dim), jnp.float32),
        mem_pos=jnp.zeros((k, mem_tokens, mem_dim), jnp.float32),
        mem_valid=jnp.zeros((k, mem_tokens), jnp.bool_),
        missing_frames=jnp.zeros((k,), jnp.int32),
        hotstart=jnp.zeros((k,), jnp.int32),
        next_id=jnp.int32(0),
    )


def associate_and_update(
    state: TrackState,
    det_masks: jnp.ndarray,      # (N, Hm, Wm) detector mask logits
    det_scores: jnp.ndarray,     # (N,)
    det_valid: jnp.ndarray,      # (N,) bool (already thresholded+NMS'd)
    iou_threshold: float = 0.5,
    max_missing_frames: int = 8,
    hotstart_frames: int = 2,
    new_det_thresh: float = 0.5,
) -> TrackState:
    """One association step: refresh matched tracks, spawn new ones into
    free slots, age out tracks unseen for ``max_missing_frames``
    (reference keep-alive/hotstart counters, sam3_video_base.py:505-935)."""
    k = state.alive.shape[0]
    out = associate_det_trk(
        det_masks, state.masks,
        det_valid=det_valid, trk_valid=state.alive,
        det_scores=det_scores,
        iou_threshold=iou_threshold, iou_threshold_trk=iou_threshold,
        new_det_thresh=new_det_thresh,
    )

    # refresh matched tracks: adopt the best-IoU detection's mask/score
    best_det = jnp.argmax(out.iou, axis=0)                    # (K,)
    matched = state.alive & ~out.unmatched_trk
    masks = jnp.where(
        matched[:, None, None], det_masks[best_det], state.masks
    )
    scores = jnp.where(matched, out.matched_det_score, state.scores * 0.9)
    missing = jnp.where(matched, 0, state.missing_frames + 1)

    # retire tracks unseen too long (past their hotstart grace period)
    alive = state.alive & ~(
        (missing > max_missing_frames) & (state.hotstart >= hotstart_frames)
    )

    # spawn new detections into free slots (rank free slots x new dets)
    free = ~alive
    new_order = jnp.argsort(~out.new_det)  # new dets first
    slot_order = jnp.argsort(~free)        # free slots first
    n_new = jnp.minimum(out.new_det.sum(), free.sum())
    take = jnp.arange(k) < n_new
    spawn_slots = slot_order[: k]
    spawn_dets = new_order[: k]
    is_spawn = jnp.zeros((k,), jnp.bool_).at[spawn_slots].set(take)
    det_for_slot = jnp.zeros((k,), jnp.int32).at[spawn_slots].set(
        spawn_dets.astype(jnp.int32)
    )

    alive = alive | is_spawn
    masks = jnp.where(is_spawn[:, None, None], det_masks[det_for_slot], masks)
    scores = jnp.where(is_spawn, det_scores[det_for_slot], scores)
    missing = jnp.where(is_spawn, 0, missing)
    hotstart = jnp.where(is_spawn, 0, state.hotstart + 1)
    spawn_rank = jnp.cumsum(is_spawn) - 1
    obj_ids = jnp.where(
        is_spawn, state.next_id + spawn_rank.astype(jnp.int32), state.obj_ids
    )
    obj_ids = jnp.where(alive, obj_ids, -1)

    return TrackState(
        alive=alive,
        obj_ids=obj_ids,
        masks=masks,
        scores=scores,
        mem_feats=state.mem_feats,
        mem_pos=state.mem_pos,
        mem_valid=state.mem_valid,
        missing_frames=missing,
        hotstart=hotstart,
        next_id=state.next_id + n_new.astype(jnp.int32),
    )


class VideoGrounder:
    """Streaming text-prompted video grounding: detector every frame +
    K-slot track state (reference Sam3VideoInference, round-1 slice)."""

    def __init__(
        self,
        processor,                    # Sam3Processor (backbone+grounding)
        num_slots: int = 16,
        prob_threshold: float = 0.5,
        nms_iou: float = 0.7,
        mem_tokens: int = 1,          # placeholder bank until TrackerCore wiring
        mem_dim: int = 64,
    ):
        self.proc = processor
        self.num_slots = num_slots
        self.prob_threshold = prob_threshold
        self.nms_iou = nms_iou
        mr = self.proc.cfg.mask_loss_resolution
        self.state = init_track_state(num_slots, mem_tokens, mem_dim, (mr, mr))
        self._assoc = jax.jit(associate_and_update)
        self._nms = jax.jit(
            lambda m, s: nms_masks(m, s, self.nms_iou)
        )

    def reset(self):
        mr = self.proc.cfg.mask_loss_resolution
        self.state = init_track_state(
            self.num_slots, self.state.mem_valid.shape[1],
            self.state.mem_feats.shape[2], (mr, mr),
        )

    def step(self, frame, prompt: str) -> Dict[str, Any]:
        """Process one frame; returns live objects {id, score, mask_lowres}."""
        self.proc.set_image(frame)
        res = self.proc.set_text_prompt(prompt, threshold=-1.0)  # keep all
        # detector candidates at the seg-head resolution
        masks = jnp.asarray(res["masks_lowres"], jnp.float32)
        scores = jnp.asarray(res["scores"], jnp.float32)
        keep = scores >= self.prob_threshold
        keep = keep & np.asarray(self._nms(masks, scores))
        self.state = self._assoc(
            self.state, masks, scores, jnp.asarray(keep),
            new_det_thresh=self.prob_threshold,
        )
        alive = np.asarray(self.state.alive)
        return {
            "obj_ids": np.asarray(self.state.obj_ids)[alive],
            "scores": np.asarray(self.state.scores)[alive],
            "masks_lowres": np.asarray(self.state.masks)[alive] > 0,
        }
