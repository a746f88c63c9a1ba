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

Scope: detector pass + slot assignment + tracker memory update +
association + keep-alive/hotstart counters, plus the reference's heuristic
tail — occlusion suppression, reconditioning cadence and hole filling are
implemented on this slot state below (``suppress_by_recent_occlusion``,
``plan_reconditioning``/``apply_reconditioning``,
``fill_holes_in_mask_scores``; tests/test_video_heuristics.py).
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
    """Fixed K-slot tracked-object state (one pytree, jit-carried).

    Memory layout mirrors the reference tracker's per-object banks
    (sam3_tracker_base.py:586-766) with static slots: per object,
    ``num_maskmem`` spatial-memory frames (slot 0 = the spawn/"cond" frame,
    slots 1.. = ring of recent frames, each with an age counter) plus a ring
    of object pointers.
    """

    alive: jnp.ndarray          # (K,) bool
    obj_ids: jnp.ndarray        # (K,) int32 — stable external ids, -1 free
    masks: jnp.ndarray          # (K, Hm, Wm) float32 last-frame mask logits
    scores: jnp.ndarray         # (K,) float32 running score
    maskmem: jnp.ndarray        # (K, N, mem_dim, Hf, Wf) spatial memories
    maskmem_age: jnp.ndarray    # (K, N) int32 frames since written, -1 free
    obj_ptrs: jnp.ndarray       # (K, P, d_model) pointer ring
    obj_ptr_age: jnp.ndarray    # (K, P) int32, -1 free
    missing_frames: jnp.ndarray  # (K,) int32 keep-alive counter
    hotstart: jnp.ndarray       # (K,) int32 frames since spawn
    last_occluded: jnp.ndarray  # (K,) int32 frame of last occlusion, -1 never
    frame_idx: jnp.ndarray      # () int32 current frame
    next_id: jnp.ndarray        # () int32


NEVER_OCCLUDED = -1
# larger than any frame index: hotstart-removed objects always lose
# overlap-suppression ties (sam3_video_base.py:848-866)
ALWAYS_OCCLUDED = 100000
NO_OBJ_LOGIT = -10.0


def init_track_state(
    num_slots: int,
    mask_hw: Tuple[int, int],
    num_maskmem: int = 7,
    max_obj_ptrs: int = 16,
    mem_dim: int = 64,
    d_model: int = 256,
    feat_hw: Tuple[int, int] = (72, 72),
) -> TrackState:
    k = num_slots
    return TrackState(
        alive=jnp.zeros((k,), jnp.bool_),
        obj_ids=jnp.full((k,), -1, jnp.int32),
        masks=jnp.zeros((k,) + tuple(mask_hw), jnp.float32),
        scores=jnp.zeros((k,), jnp.float32),
        maskmem=jnp.zeros(
            (k, num_maskmem, mem_dim) + tuple(feat_hw), jnp.float32
        ),
        maskmem_age=jnp.full((k, num_maskmem), -1, jnp.int32),
        obj_ptrs=jnp.zeros((k, max_obj_ptrs, d_model), jnp.float32),
        obj_ptr_age=jnp.full((k, max_obj_ptrs), -1, jnp.int32),
        missing_frames=jnp.zeros((k,), jnp.int32),
        hotstart=jnp.zeros((k,), jnp.int32),
        last_occluded=jnp.full((k,), NEVER_OCCLUDED, jnp.int32),
        frame_idx=jnp.int32(0),
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
    spawn_slots = slot_order[:k]
    # fewer detection rows than slots is fine: pad the det order (padded
    # entries are never taken since n_new <= N)
    n_det = new_order.shape[0]
    spawn_dets = (
        jnp.pad(new_order, (0, k - n_det))[:k] if n_det < k else new_order[:k]
    )
    is_spawn = jnp.zeros((k,), jnp.bool_).at[spawn_slots].set(take)
    det_for_slot = jnp.zeros((k,), jnp.int32).at[spawn_slots].set(
        spawn_dets.astype(jnp.int32)
    )

    alive_new = alive | is_spawn
    masks = jnp.where(is_spawn[:, None, None], det_masks[det_for_slot], masks)
    scores = jnp.where(is_spawn, det_scores[det_for_slot], scores)
    missing = jnp.where(is_spawn, 0, missing)
    hotstart = jnp.where(is_spawn, 0, state.hotstart + 1)
    spawn_rank = jnp.cumsum(is_spawn) - 1
    obj_ids = jnp.where(
        is_spawn, state.next_id + spawn_rank.astype(jnp.int32), state.obj_ids
    )
    obj_ids = jnp.where(alive_new, obj_ids, -1)

    # spawned slots start with a clean memory bank (their cond frame is
    # written by the memory-update stage this same frame)
    fresh = is_spawn | ~alive_new
    maskmem_age = jnp.where(fresh[:, None], -1, state.maskmem_age)
    obj_ptr_age = jnp.where(fresh[:, None], -1, state.obj_ptr_age)

    # retired-this-frame slots always lose later overlap-suppression ties
    # (obj_ids_newly_removed -> ALWAYS_OCCLUDED, sam3_video_base.py:848-866);
    # spawned slots start never-occluded
    removed = state.alive & ~alive
    last_occluded = jnp.where(
        removed, ALWAYS_OCCLUDED, state.last_occluded
    )
    last_occluded = jnp.where(is_spawn, NEVER_OCCLUDED, last_occluded)

    return state._replace(
        alive=alive_new,
        obj_ids=obj_ids,
        masks=masks,
        scores=scores,
        maskmem_age=maskmem_age,
        obj_ptr_age=obj_ptr_age,
        missing_frames=missing,
        hotstart=hotstart,
        last_occluded=last_occluded,
        next_id=state.next_id + n_new.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Video heuristics tail (sam3_video_base.py:505-1014), slot-native
# ---------------------------------------------------------------------------


def fill_holes_in_mask_scores(
    mask_logits: jnp.ndarray,
    max_area: int,
    fill_holes: bool = True,
    remove_sprinkles: bool = True,
) -> jnp.ndarray:
    """Fill small background holes (-> +0.1) and remove small foreground
    sprinkles (-> -0.1) in mask logits (reference
    ``sam3_tracker_utils.py:369-406``, Triton CC replaced by the XLA
    label-propagation CC in ``ops/cc.py``).

    ``mask_logits``: (..., H, W); sprinkle removal thresholds at
    ``min(max_area, foreground_area // 2)`` per mask, exactly like the
    reference. Runs as a ``lax.map`` over the flattened leading dims so the
    fixpoint CC never materializes all masks' label grids at once.
    """
    if max_area <= 0:
        return mask_logits
    from .ops.cc import component_sizes, connected_components

    shape = mask_logits.shape
    flat = mask_logits.reshape((-1,) + shape[-2:])

    def one(m):
        if fill_holes:
            bg = m <= 0
            lab = connected_components(bg)
            area = jnp.where(
                lab >= 0, component_sizes(lab)[jnp.clip(lab, 0)], 0
            )
            small = bg & (area <= max_area)
            m = jnp.where(small, jnp.float32(0.1), m)
        if remove_sprinkles:
            fg = m > 0
            lab = connected_components(fg)
            area = jnp.where(
                lab >= 0, component_sizes(lab)[jnp.clip(lab, 0)], 0
            )
            thr = jnp.minimum(
                jnp.int32(max_area), fg.sum().astype(jnp.int32) // 2
            )
            small = fg & (area <= thr)
            m = jnp.where(small, jnp.float32(-0.1), m)
        return m

    return jax.lax.map(one, flat).reshape(shape)


def suppress_by_recent_occlusion(
    state: TrackState,
    iou_threshold: float,
    reverse: bool = False,
) -> TrackState:
    """Suppress overlapping track masks in favour of the less-recently
    occluded object (reference
    ``_suppress_overlapping_based_on_recent_occlusion`` +
    ``_get_objects_to_suppress_based_on_most_recently_occluded``,
    sam3_video_base.py:819-1097), then record this frame's occlusions.

    Literal reference semantics: for an overlapping pair (i, j), i is
    suppressed iff ``occ_i > occ_j`` AND ``occ_j > -1`` (both must have been
    occluded before; the more recently occluded one loses). Suppressed masks
    are set to ``NO_OBJ_LOGIT`` before memory encoding; occluded-or-
    suppressed objects get ``last_occluded = frame_idx``.
    """
    masks = state.masks
    alive = state.alive
    occ = state.last_occluded
    k = alive.shape[0]
    binary = masks > 0

    from .ops.masks import mask_iou

    iou = mask_iou(binary, binary)                          # (K, K)
    pair = alive[:, None] & alive[None, :]
    upper = jnp.triu(jnp.ones((k, k), jnp.bool_), 1)
    over = (iou >= iou_threshold) & pair & upper

    occ_i = occ[:, None]
    occ_j = occ[None, :]
    cmp = jnp.greater if not reverse else jnp.less
    sup_i = over & cmp(occ_i, occ_j) & (occ_j > NEVER_OCCLUDED)
    sup_j = over & cmp(occ_j, occ_i) & (occ_i > NEVER_OCCLUDED)
    to_suppress = sup_i.any(axis=1) | sup_j.any(axis=0)

    is_occluded = ~binary.any(axis=(-2, -1))
    occ_or_sup = (is_occluded | to_suppress) & alive
    new_occ = jnp.where(occ_or_sup, state.frame_idx, occ)
    new_masks = jnp.where(
        to_suppress[:, None, None], jnp.float32(NO_OBJ_LOGIT), masks
    )
    return state._replace(masks=new_masks, last_occluded=new_occ)


def plan_reconditioning(
    state: TrackState,
    det_masks: jnp.ndarray,       # (N, Hm, Wm) detector mask logits
    det_scores: jnp.ndarray,      # (N,)
    new_det: jnp.ndarray,         # (N,) bool (association output)
    iou: jnp.ndarray,             # (N, K) det-x-track mask IoU (association)
    recondition_every: int = -1,
    bbox_iou_thresh: float = 0.0,
    det_score_thresh: float = 0.8,
    high_conf_thresh: float = 0.8,
    high_iou_thresh: float = 0.8,
    obj_score_thresh: float = 0.8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decide which slots to recondition and with which detection.

    Mirrors the reference's two triggers (sam3_video_base.py:664-735):
    periodic (every ``recondition_every`` frames) and bbox-IoU mismatch
    (track box vs matched detection box IoU < ``bbox_iou_thresh`` with
    det score >= ``det_score_thresh``), restricted to the per-track
    max-IoU high-confidence detections (``trk_id_to_max_iou_high_conf_det``,
    sam3_video_base.py:1276-1289; ambiguity between several qualifying
    detections of one track resolves by max IoU instead of dict-insertion
    order) and to tracks whose running score clears ``obj_score_thresh``
    (``_recondition_masklets``'s HIGH_CONF gate, :484-489).

    Returns ``(recondition (K,) bool, det_for_slot (K,) int32)``. Apply with
    :func:`apply_reconditioning`.
    """
    from .ops.boxes import fast_diag_box_iou
    from .ops.masks import masks_to_boxes

    n, k = iou.shape
    qualify_det = (det_scores >= high_conf_thresh) & ~new_det  # (N,)
    det_max_trk = jnp.argmax(iou, axis=1)                     # (N,)
    det_high_iou = jnp.max(iou, axis=1) >= high_iou_thresh
    eligible = qualify_det & det_high_iou                      # (N,)

    # per-slot best eligible detection by IoU
    elig_iou = jnp.where(
        eligible[:, None]
        & (det_max_trk[:, None] == jnp.arange(k)[None, :]),
        iou,
        -1.0,
    )                                                          # (N, K)
    det_for_slot = jnp.argmax(elig_iou, axis=0).astype(jnp.int32)  # (K,)
    has_det = jnp.max(elig_iou, axis=0) >= 0.0                 # (K,)

    # bbox mismatch trigger
    trk_boxes = masks_to_boxes(state.masks > 0)                # (K, 4) pixels
    hm, wm = state.masks.shape[-2:]
    scale = jnp.array([wm, hm, wm, hm], jnp.float32)
    trk_boxes_n = trk_boxes / scale
    det_boxes = masks_to_boxes(det_masks > 0) / scale          # (N, 4)
    pair_iou = fast_diag_box_iou(
        det_boxes[det_for_slot], trk_boxes_n
    )                                                          # (K,)
    nonempty = (state.masks > 0).any(axis=(-2, -1))
    iou_trigger = (
        (bbox_iou_thresh > 0)
        & (pair_iou < bbox_iou_thresh)
        & (det_scores[det_for_slot] >= det_score_thresh)
        & nonempty
    )
    periodic = (
        (recondition_every > 0)
        & (state.frame_idx % jnp.maximum(recondition_every, 1) == 0)
    )
    recondition = (
        state.alive
        & has_det
        & (state.scores > obj_score_thresh)
        & (iou_trigger | periodic)
    )
    return recondition, det_for_slot


def apply_reconditioning(
    state: TrackState,
    det_masks: jnp.ndarray,
    recondition: jnp.ndarray,
    det_for_slot: jnp.ndarray,
) -> TrackState:
    """Adopt the detection mask as the slot's new conditioning mask and reset
    its memory bank, so the next memory update writes a fresh cond frame —
    the slot-native ``add_new_mask`` + ``propagate_in_video_preflight``
    (sam3_video_base.py:453-504)."""
    masks = jnp.where(
        recondition[:, None, None], det_masks[det_for_slot], state.masks
    )
    maskmem_age = jnp.where(
        recondition[:, None], -1, state.maskmem_age
    )
    obj_ptr_age = jnp.where(
        recondition[:, None], -1, state.obj_ptr_age
    )
    return state._replace(
        masks=masks, maskmem_age=maskmem_age, obj_ptr_age=obj_ptr_age
    )


# ---------------------------------------------------------------------------
# Tracker propagation (TrackerCore over the K object slots as a batch)
# ---------------------------------------------------------------------------


def make_tracker_fns(core, num_maskmem: int = 7, max_obj_ptrs: int = 16):
    """Build the two jitted tracker stages over a :class:`TrackerCore`:

    ``propagate(params, state, vis, pos, hi0, hi1)`` — memory-conditioned
    per-object mask prediction for all K slots (the reference's
    ``run_tracker_propagation``, sam3_video_base.py:401-452, with objects as
    the batch dimension instead of a python loop over per-GPU dicts);

    ``update_memory(params, state, vis, masks, obj_logits, tokens)`` —
    encode the final per-object masks into the ring-buffer memory banks +
    object-pointer ring (``_encode_new_memory`` + pointer bookkeeping).
    """

    def propagate(params, state: TrackState, vis, pos, hi0, hi1):
        k = state.alive.shape[0]
        visk = jnp.broadcast_to(vis, (k,) + vis.shape[1:])
        posk = jnp.broadcast_to(pos, (k,) + pos.shape[1:])
        hi0k = jnp.broadcast_to(hi0, (k,) + hi0.shape[1:])
        hi1k = jnp.broadcast_to(hi1, (k,) + hi1.shape[1:])

        age = state.maskmem_age                       # (K, N)
        # slot 0 = cond frame -> t_pos 0; ring slots: latest -> num_maskmem-1
        tpos = jnp.clip(num_maskmem - age, 1, num_maskmem - 1)
        tpos = tpos.at[:, 0].set(0)
        mem_valid = age >= 0
        # a ring frame older than the window drops out (cond never does)
        mem_valid = mem_valid & (
            (jnp.arange(age.shape[1])[None] == 0) | (age < num_maskmem)
        )
        pos_grid = _maskmem_pos_grid(core, state.maskmem.shape)
        ptr_valid = state.obj_ptr_age >= 0
        rel = jnp.maximum(state.obj_ptr_age, 0).astype(jnp.float32)

        has_mem = mem_valid.any(axis=1)               # (K,)

        def run(m):
            mem, mpos, mmask, n_ptr = m.assemble_memory(
                state.maskmem, pos_grid, tpos, mem_valid,
                state.obj_ptrs,
                rel,
                ptr_valid,
                num_frames=max_obj_ptrs,
            )
            # pointer-only banks could make every kv masked for dead slots;
            # force at least the cond slot so softmax stays finite
            mmask = mmask & ~jnp.all(mmask, axis=1, keepdims=True)
            cond = m.condition_features(
                visk, posk, mem, mpos, mem_mask=mmask,
                num_obj_ptr_tokens=n_ptr,
            )
            no_mem = m.no_memory_features(visk)
            cond = jnp.where(has_mem[:, None, None, None], cond, no_mem)
            masks, iou, tokens, obj_logits = m.predict_masks(
                cond, [hi0k, hi1k], multimask_output=True
            )
            # best-IoU mask (sam3_tracker_base.py:360-368)
            best = jnp.argmax(iou, axis=-1)
            bm = masks[jnp.arange(k), best]           # (K, Hm, Wm)
            btok = tokens[jnp.arange(k), best]        # (K, D)
            return bm, btok, obj_logits[..., 0], iou

        return core.apply({"params": params}, method=lambda m: run(m))

    def update_memory(params, state: TrackState, vis, masks, obj_logits, tokens):
        """masks: (K, Hm, Wm) final per-object logits for this frame."""
        k = state.alive.shape[0]
        visk = jnp.broadcast_to(vis, (k,) + vis.shape[1:])

        def run(m):
            mem_out = m.encode_memory(
                visk, masks[:, None], object_score_logits=obj_logits[:, None]
            )
            ptr = m.project_obj_ptr(tokens, (obj_logits > 0))
            return mem_out["vision_features"], ptr

        new_mem, new_ptr = core.apply({"params": params}, method=lambda m: run(m))

        age = state.maskmem_age
        has_cond = age[:, 0] >= 0
        # cond slot written once at spawn; ring slot = oldest (or free) of 1..
        ring_age = jnp.where(age[:, 1:] < 0, jnp.int32(10**6), age[:, 1:])
        ring_slot = 1 + jnp.argmax(ring_age, axis=1)            # (K,)
        write_slot = jnp.where(has_cond, ring_slot, 0)
        slot_oh = jax.nn.one_hot(write_slot, age.shape[1], dtype=jnp.bool_)
        write = state.alive[:, None] & slot_oh
        maskmem = jnp.where(
            write[..., None, None, None], new_mem[:, None], state.maskmem
        )
        age = jnp.where(write, 0, jnp.where(age >= 0, age + 1, age))

        p_age = state.obj_ptr_age
        p_ring = jnp.where(p_age < 0, jnp.int32(10**6), p_age)
        p_slot = jnp.argmax(p_ring, axis=1)
        p_oh = jax.nn.one_hot(p_slot, p_age.shape[1], dtype=jnp.bool_)
        p_write = state.alive[:, None] & p_oh
        obj_ptrs = jnp.where(p_write[..., None], new_ptr[:, None], state.obj_ptrs)
        p_age = jnp.where(p_write, 0, jnp.where(p_age >= 0, p_age + 1, p_age))

        return state._replace(
            maskmem=maskmem,
            maskmem_age=age,
            obj_ptrs=obj_ptrs,
            obj_ptr_age=p_age,
            frame_idx=state.frame_idx + 1,
        )

    return propagate, update_memory


def _maskmem_pos_grid(core, maskmem_shape):
    """Shared sine spatial PE for memory tokens, broadcast to the bank shape
    (the reference recomputes it per frame; it is input-independent)."""
    from .ops.posenc import sine_pos_grid

    k, n, c, h, w = maskmem_shape
    pos = sine_pos_grid(h, w, num_pos_feats=c)  # (c, h, w)
    return jnp.broadcast_to(pos[None, None], maskmem_shape).astype(jnp.float32)


class VideoGrounder:
    """Streaming text-prompted video grounding: per frame, detector pass +
    (optional) tracker memory propagation + association + slot update
    (reference Sam3VideoInference / _det_track_one_frame,
    sam3_video_base.py:151-292)."""

    def __init__(
        self,
        processor,                    # Sam3Processor (backbone+grounding)
        num_slots: int = 16,
        prob_threshold: float = 0.5,
        nms_iou: float = 0.7,
        num_maskmem: int = 7,
        max_obj_ptrs: int = 16,
        tracker_params=None,          # {"params": ...} subtree for TrackerCore
        propagate: bool = False,      # run memory propagation each frame
        # heuristics tail (reference defaults, sam3_video_base.py:36-137)
        fill_hole_area: int = 16,
        occlusion_suppression_iou: float = 0.0,   # 0 disables
        recondition_every: int = -1,              # -1 disables periodic
        recondition_bbox_iou: float = 0.0,        # 0 disables iou-mismatch
        recondition_det_score: float = 0.0,
    ):
        from .models.layers import Spec
        from .models.tracker import TrackerCore

        self.proc = processor
        cfg = self.proc.cfg
        self.num_slots = num_slots
        self.prob_threshold = prob_threshold
        self.nms_iou = nms_iou
        self.num_maskmem = num_maskmem
        self.max_obj_ptrs = max_obj_ptrs
        self.propagate = propagate

        fh = fw = cfg.img_size // cfg.patch_size
        self.feat_hw = (fh, fw)
        self.mem_dim = max(cfg.d_model // 4, 8)
        mr = cfg.mask_loss_resolution

        self.core = TrackerCore(
            Spec(model=cfg, lora=None),
            d_model=cfg.d_model,
            mem_dim=self.mem_dim,
            num_maskmem=num_maskmem,
            max_obj_ptrs=max_obj_ptrs,
            feat_sizes=self.feat_hw,
        )
        self.tracker_params = tracker_params
        if propagate and tracker_params is None:
            # standalone init (random weights) — real deployments load the
            # converted reference tracker checkpoint here
            key = jax.random.PRNGKey(0)
            d = cfg.d_model
            self.tracker_params = self.core.init(
                {"params": key},
                method=lambda m: _init_tracker_core(m, self, d),
            )["params"]

        self.state = init_track_state(
            num_slots, (mr, mr), num_maskmem, max_obj_ptrs,
            self.mem_dim, cfg.d_model, self.feat_hw,
        )
        self.fill_hole_area = fill_hole_area
        self.occlusion_suppression_iou = occlusion_suppression_iou
        self.recondition_every = recondition_every
        self.recondition_bbox_iou = recondition_bbox_iou
        self.recondition_det_score = recondition_det_score

        self._assoc = jax.jit(associate_and_update)
        self._nms = jax.jit(lambda m, s: nms_masks(m, s, self.nms_iou))
        self._fill_holes = jax.jit(
            lambda m: fill_holes_in_mask_scores(m, self.fill_hole_area)
        )
        self._suppress = jax.jit(
            lambda st: suppress_by_recent_occlusion(
                st, self.occlusion_suppression_iou
            )
        )
        def _recond(prev_st, st, dm, ds, nd, iou):
            # plan on the PRE-association state (the reference plans against
            # the previous frame's tracks, sam3_video_base.py:664-735), apply
            # to the post-association state, never to retired slots
            rec, det_for_slot = plan_reconditioning(
                prev_st, dm, ds, nd, iou,
                recondition_every=self.recondition_every,
                bbox_iou_thresh=self.recondition_bbox_iou,
                det_score_thresh=self.recondition_det_score,
            )
            return apply_reconditioning(st, dm, rec & st.alive, det_for_slot)

        self._recondition = jax.jit(_recond)
        self._assoc_raw = jax.jit(
            lambda dm, ds, dv, tm, tv: associate_det_trk(
                dm, tm, det_valid=dv, trk_valid=tv, det_scores=ds,
                new_det_thresh=self.prob_threshold,
            )
        )
        if propagate:
            prop, upd = make_tracker_fns(self.core, num_maskmem, max_obj_ptrs)
            self._propagate = jax.jit(prop)
            self._update_memory = jax.jit(upd)

    def reset(self):
        cfg = self.proc.cfg
        mr = cfg.mask_loss_resolution
        self.state = init_track_state(
            self.num_slots, (mr, mr), self.num_maskmem, self.max_obj_ptrs,
            self.mem_dim, cfg.d_model, self.feat_hw,
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

        if self.propagate:
            feats = self.proc._state["feats"]
            poss = self.proc._state["poss"]
            vis, pos = feats[-1], poss[-1]
            hi0, hi1 = feats[0], feats[1]
            pm, ptok, plogits, _ = self._propagate(
                self.tracker_params, self.state, vis, pos, hi0, hi1
            )
            alive = self.state.alive
            # propagated masks refresh live tracks before association;
            # occluded objects (logit <= 0) count as missing this frame
            self.state = self.state._replace(
                masks=jnp.where(alive[:, None, None], pm, self.state.masks),
            )

        prev_state = self.state
        self.state = self._assoc(
            self.state, masks, scores, jnp.asarray(keep),
            new_det_thresh=self.prob_threshold,
        )

        # heuristics tail (sam3_video_base.py:505-935): reconditioning against
        # the previous frame's tracks, then occlusion-based overlap
        # suppression before the memory encoder sees the masks
        if self.recondition_every > 0 or self.recondition_bbox_iou > 0:
            out = self._assoc_raw(
                masks, scores, jnp.asarray(keep),
                prev_state.masks, prev_state.alive,
            )
            self.state = self._recondition(
                prev_state, self.state, masks, scores, out.new_det, out.iou
            )
        if self.occlusion_suppression_iou > 0:
            self.state = self._suppress(self.state)

        if self.propagate:
            feats = self.proc._state["feats"]
            vis = feats[-1]
            obj_logits = jnp.where(
                self.state.alive, jnp.float32(10.0), jnp.float32(-10.0)
            )
            tokens = (
                ptok
                if ptok.shape[0] == self.state.alive.shape[0]
                else jnp.zeros(
                    (self.state.alive.shape[0], self.proc.cfg.d_model)
                )
            )
            self.state = self._update_memory(
                self.tracker_params, self.state, vis,
                self.state.masks, obj_logits, tokens,
            )
        else:
            self.state = self.state._replace(
                frame_idx=self.state.frame_idx + 1
            )

        alive = np.asarray(self.state.alive)
        out_masks = self.state.masks
        if self.fill_hole_area > 0:
            # output-only hole filling of THIS frame's newly spawned objects
            # (the reference fills new-detection masks in build_outputs,
            # sam3_video_base.py:969-975 — association/memory see raw logits)
            spawned = self.state.alive & (self.state.hotstart == 0)
            if bool(np.asarray(spawned).any()):
                out_masks = jnp.where(
                    spawned[:, None, None],
                    self._fill_holes(out_masks),
                    out_masks,
                )
        return {
            "obj_ids": np.asarray(self.state.obj_ids)[alive],
            "scores": np.asarray(self.state.scores)[alive],
            "masks_lowres": np.asarray(out_masks)[alive] > 0,
        }


def _init_tracker_core(m, grounder, d):
    """Trace every TrackerCore submodule once for init (mirrors the tracker
    parity test's init_all)."""
    fh, fw = grounder.feat_hw
    k = 1
    vis = jnp.zeros((k, d, fh, fw))
    mem = jnp.zeros((k, 1, grounder.mem_dim, fh, fw))
    tp = jnp.zeros((k, 1), jnp.int32)
    val = jnp.ones((k, 1), bool)
    ptr = jnp.zeros((k, 2, d))
    rel = jnp.zeros((k, 2))
    pval = jnp.ones((k, 2), bool)
    bank = m.assemble_memory(mem, mem, tp, val, ptr, rel, pval, num_frames=4)
    cond = m.condition_features(vis, vis, bank[0], bank[1], bank[2], bank[3])
    mr = grounder.proc.cfg.mask_loss_resolution
    m.encode_memory(vis, jnp.zeros((k, 1, mr, mr)),
                    object_score_logits=jnp.ones((k, 1)))
    m.project_obj_ptr(jnp.zeros((k, d)), jnp.ones((k,)))
    hi = [
        jnp.zeros((k, d, 4 * fh, 4 * fw)),
        jnp.zeros((k, d, 2 * fh, 2 * fw)),
    ]
    # pass point prompts + touch the mask-prompt path so point_embeddings /
    # not_a_point_embed / mask_downscaling all materialize (needed by the
    # interactive predictors that share these params)
    out = m.predict_masks(
        cond, hi,
        point_coords=jnp.zeros((k, 2, 2)),
        point_labels=jnp.ones((k, 2), jnp.int32),
        multimask_output=True,
    )
    m.sam_prompt_encoder.embed_masks(jnp.zeros((k, 1, 4 * fh, 4 * fw)))
    return out
