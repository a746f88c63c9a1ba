"""Interactive video tracking predictor (SAM2-task API on the tracker).

Re-design of the reference's ``Sam3TrackerPredictor`` session surface
(``sam3/model/sam3_tracking_predictor.py:56-1368``): ``init_state`` on a
video, ``add_new_points_or_box`` / ``add_new_mask`` to define objects on
conditioning frames, ``propagate_in_video`` to track every object through
the memory attention.

TPU-first state: the reference keeps per-object python dicts of per-frame
tensors and loops objects on the host; here the inference state is one
static (K objects, N memory slots) pytree — every propagation step is one
jitted program over all objects, and the memory bank layout is exactly the
parity-tested ``TrackerCore.assemble_memory`` slot scheme (cond frame in
slot 0 + recent-frame ring).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .io_utils import VideoFrameSource
from .video import TrackState, init_track_state, make_tracker_fns

__all__ = ["Sam3TrackerPredictor"]


@dataclass
class _SessionState:
    source: VideoFrameSource
    track: TrackState
    obj_slot: Dict[int, int] = field(default_factory=dict)  # user obj id -> slot
    cond_frame: Dict[int, int] = field(default_factory=dict)
    feats_cache: Dict[int, Tuple] = field(default_factory=dict)


class Sam3TrackerPredictor:
    """Click/box/mask-driven multi-object video tracking."""

    def __init__(
        self,
        processor,
        tracker_params=None,
        num_slots: int = 8,
        num_maskmem: int = 7,
        max_obj_ptrs: int = 16,
        seed: int = 0,
    ):
        from .models.layers import Spec
        from .models.tracker import TrackerCore
        from .predictor import MAX_POINTS

        self.proc = processor
        cfg = processor.cfg
        self.cfg = cfg
        self.num_slots = num_slots
        self.num_maskmem = num_maskmem
        self.max_obj_ptrs = max_obj_ptrs
        fh = fw = cfg.img_size // cfg.patch_size
        self.feat_hw = (fh, fw)
        self.mem_dim = max(cfg.d_model // 4, 8)
        self.core = TrackerCore(
            Spec(model=cfg, lora=None),
            d_model=cfg.d_model,
            mem_dim=self.mem_dim,
            num_maskmem=num_maskmem,
            max_obj_ptrs=max_obj_ptrs,
            feat_sizes=self.feat_hw,
        )
        if tracker_params is None:
            from .video import _init_tracker_core

            class _G:  # minimal shim for the shared init tracer
                feat_hw = self.feat_hw
                mem_dim = self.mem_dim
                proc = processor

            tracker_params = self.core.init(
                {"params": jax.random.PRNGKey(seed)},
                method=lambda m: _init_tracker_core(m, _G, cfg.d_model),
            )["params"]
        self.params = tracker_params
        self._prop, self._update = (
            jax.jit(f) for f in make_tracker_fns(
                self.core, num_maskmem, max_obj_ptrs
            )
        )
        core = self.core

        @jax.jit
        def _click_masks(params, vis, hi0, hi1, coords, labels):
            def run(m):
                cond = m.no_memory_features(vis)
                masks, iou, tok, obj = m.predict_masks(
                    cond, [hi0, hi1],
                    point_coords=coords, point_labels=labels,
                    multimask_output=True,
                )
                best = jnp.argmax(iou, axis=-1)
                i = jnp.arange(masks.shape[0])
                return masks[i, best], tok[i, best], obj[..., 0]

            return core.apply({"params": params}, method=run)

        @jax.jit
        def _encode_cond(params, vis, masks, obj_logits, tokens, state, slot):
            """Write one object's cond memory into slot 0 of its bank."""
            def run(m):
                mem = m.encode_memory(
                    vis, masks[:, None], object_score_logits=obj_logits[:, None]
                )
                ptr = m.project_obj_ptr(tokens, (obj_logits > 0))
                return mem["vision_features"], ptr

            new_mem, new_ptr = core.apply({"params": params}, method=run)
            maskmem = state.maskmem.at[slot, 0].set(new_mem[0])
            age = state.maskmem_age.at[slot, 0].set(0)
            ptrs = state.obj_ptrs.at[slot, 0].set(new_ptr[0])
            page = state.obj_ptr_age.at[slot, 0].set(0)
            return state._replace(
                maskmem=maskmem, maskmem_age=age,
                obj_ptrs=ptrs, obj_ptr_age=page,
            )

        self._click_masks = _click_masks
        self._encode_cond = _encode_cond
        self._state: Optional[_SessionState] = None

    # ------------------------------------------------------------------ #
    def init_state(self, video) -> "Sam3TrackerPredictor":
        """(reference init_state, sam3_tracking_predictor.py:56-178)."""
        mr = self.cfg.mask_loss_resolution
        self._state = _SessionState(
            source=VideoFrameSource(video),
            track=init_track_state(
                self.num_slots, (mr, mr), self.num_maskmem,
                self.max_obj_ptrs, self.mem_dim, self.cfg.d_model,
                self.feat_hw,
            ),
        )
        return self

    def reset_state(self) -> None:
        if self._state is not None:
            src = self._state.source
            mr = self.cfg.mask_loss_resolution
            self._state = _SessionState(
                source=src,
                track=init_track_state(
                    self.num_slots, (mr, mr), self.num_maskmem,
                    self.max_obj_ptrs, self.mem_dim, self.cfg.d_model,
                    self.feat_hw,
                ),
            )

    def _frame_feats(self, frame_idx: int):
        st = self._state
        if frame_idx not in st.feats_cache:
            self.proc.set_image(st.source.get(frame_idx))
            feats = self.proc._state["feats"]
            poss = self.proc._state["poss"]
            st.feats_cache[frame_idx] = (
                feats[-1], poss[-1], feats[0], feats[1]
            )
        return st.feats_cache[frame_idx]

    def _slot_for(self, obj_id: int) -> int:
        st = self._state
        if obj_id not in st.obj_slot:
            if len(st.obj_slot) >= self.num_slots:
                raise RuntimeError(f"more than {self.num_slots} objects")
            st.obj_slot[obj_id] = len(st.obj_slot)
        return st.obj_slot[obj_id]

    # ------------------------------------------------------------------ #
    def add_new_points_or_box(
        self,
        frame_idx: int,
        obj_id: int,
        points: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
    ) -> Tuple[int, np.ndarray]:
        """Define/refine an object on a conditioning frame from clicks/box
        (reference :179-341). Returns (obj_id, low-res mask logits)."""
        from .predictor import MAX_POINTS

        if self._state is None:
            raise RuntimeError("call init_state first")
        st = self._state
        slot = self._slot_for(obj_id)
        vis, pos, hi0, hi1 = self._frame_feats(frame_idx)

        r = self.cfg.img_size
        h, w = st.source.get(frame_idx).shape[:2]
        coords = np.zeros((1, MAX_POINTS, 2), np.float32)
        labs = np.full((1, MAX_POINTS), -1, np.int32)
        n = 0
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2)
            coords[0, :2] = bx
            labs[0, :2] = (2, 3)
            n = 2
        if points is not None:
            pc = np.asarray(points, np.float32).reshape(-1, 2)
            pl = np.asarray(labels, np.int32).reshape(-1)
            m = min(len(pc), MAX_POINTS - n)
            coords[0, n : n + m] = pc[:m]
            labs[0, n : n + m] = pl[:m]
        coords = coords * np.array([r / w, r / h], np.float32)

        masks, tokens, obj_logits = self._click_masks(
            self.params, vis, hi0, hi1, jnp.asarray(coords), jnp.asarray(labs)
        )
        st.track = self._encode_cond(
            self.params, vis, masks, obj_logits, tokens, st.track, slot
        )
        st.track = st.track._replace(
            alive=st.track.alive.at[slot].set(True),
            obj_ids=st.track.obj_ids.at[slot].set(obj_id),
            masks=st.track.masks.at[slot].set(
                np.asarray(
                    jax.image.resize(
                        masks[0], st.track.masks.shape[1:], "bilinear"
                    )
                )
            ),
        )
        st.cond_frame[obj_id] = frame_idx
        return obj_id, np.asarray(masks[0])

    def add_new_mask(
        self, frame_idx: int, obj_id: int, mask: np.ndarray
    ) -> Tuple[int, np.ndarray]:
        """Define an object from a binary mask (reference :342-459): the
        mask becomes ±10 logits (mask-as-output convention,
        sam3_tracker_base.py:389-400) and seeds the cond memory."""
        if self._state is None:
            raise RuntimeError("call init_state first")
        st = self._state
        slot = self._slot_for(obj_id)
        vis, pos, hi0, hi1 = self._frame_feats(frame_idx)

        mr = 4 * self.feat_hw[0]
        m = jnp.asarray(np.asarray(mask, np.float32))[None, None]
        m = jax.image.resize(m, (1, 1, mr, mr), "bilinear")
        logits = (m[:, 0] > 0.5).astype(jnp.float32) * 20.0 - 10.0

        def run(mm):
            memo = mm.encode_memory(
                vis, logits[:, None], skip_sigmoid=False,
                object_score_logits=jnp.full((1, 1), 10.0),
            )
            return memo["vision_features"]

        new_mem = self.core.apply({"params": self.params}, method=run)
        st.track = st.track._replace(
            maskmem=st.track.maskmem.at[slot, 0].set(new_mem[0]),
            maskmem_age=st.track.maskmem_age.at[slot, 0].set(0),
            alive=st.track.alive.at[slot].set(True),
            obj_ids=st.track.obj_ids.at[slot].set(obj_id),
            masks=st.track.masks.at[slot].set(
                np.asarray(
                    jax.image.resize(logits[0], st.track.masks.shape[1:],
                                     "bilinear")
                )
            ),
        )
        st.cond_frame[obj_id] = frame_idx
        return obj_id, np.asarray(logits[0])

    # ------------------------------------------------------------------ #
    def propagate_in_video(
        self,
        start_frame_idx: Optional[int] = None,
        max_frame_num_to_track: Optional[int] = None,
    ):
        """Track all defined objects through the video, yielding
        (frame_idx, obj_ids, low-res mask logits) per frame
        (reference :789-...)."""
        if self._state is None or not self._state.obj_slot:
            raise RuntimeError("add objects before propagating")
        st = self._state
        begin = (
            min(st.cond_frame.values())
            if start_frame_idx is None
            else start_frame_idx
        )
        end = len(st.source)
        if max_frame_num_to_track is not None:
            end = min(end, begin + max_frame_num_to_track)

        for fi in range(begin, end):
            vis, pos, hi0, hi1 = self._frame_feats(fi)
            pm, ptok, plogits, _ = self._prop(
                self.params, st.track, vis, pos, hi0, hi1
            )
            alive = st.track.alive
            masks = jnp.where(
                alive[:, None, None],
                jax.image.resize(pm, st.track.masks.shape, "bilinear"),
                st.track.masks,
            )
            st.track = st.track._replace(masks=masks)
            st.track = self._update(
                self.params, st.track, vis, st.track.masks, plogits, ptok
            )
            live = np.asarray(alive)
            yield (
                fi,
                np.asarray(st.track.obj_ids)[live],
                np.asarray(st.track.masks)[live],
            )
