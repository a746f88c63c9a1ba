"""Video heuristics tail: hole filling, occlusion-based overlap suppression,
reconditioning, and slot-dimension sharding over the virtual mesh
(reference ``sam3_video_base.py:505-1014`` + ``sam3_tracker_utils.py:369-406``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam3_lora_tpu.video import (
    ALWAYS_OCCLUDED,
    NEVER_OCCLUDED,
    NO_OBJ_LOGIT,
    apply_reconditioning,
    associate_and_update,
    fill_holes_in_mask_scores,
    init_track_state,
    plan_reconditioning,
    suppress_by_recent_occlusion,
)


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def _tiny_state(k=4, hw=32):
    return init_track_state(
        k, (hw, hw), num_maskmem=2, max_obj_ptrs=2, mem_dim=8,
        d_model=32, feat_hw=(4, 4),
    )


class TestFillHoles:
    def test_fills_small_background_hole(self):
        m = np.full((24, 24), -5.0, np.float32)
        m[4:20, 4:20] = 5.0
        m[10:12, 10:12] = -5.0  # 4-px hole inside foreground
        out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(m)[None], 16))[0]
        assert (out[10:12, 10:12] > 0).all()        # hole filled (+0.1)
        assert (out[0, 0] < 0)                      # big background untouched

    def test_removes_small_sprinkle(self):
        m = np.full((24, 24), -5.0, np.float32)
        m[4:16, 4:16] = 5.0                          # 144-px object
        m[20:22, 20:22] = 5.0                        # 4-px sprinkle
        out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(m)[None], 16))[0]
        assert (out[20:22, 20:22] < 0).all()         # sprinkle removed (-0.1)
        assert (out[4:16, 4:16] > 0).all()           # object kept

    def test_keeps_tiny_lone_object(self):
        # sprinkle threshold is min(max_area, fg_area // 2): a lone tiny
        # object is NOT deleted (sam3_tracker_utils.py:395-403)
        m = np.full((24, 24), -5.0, np.float32)
        m[10:13, 10:13] = 5.0                        # 9-px only object
        out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(m)[None], 16))[0]
        assert (out[10:13, 10:13] > 0).all()

    def test_disabled_when_max_area_zero(self):
        m = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16).astype(np.float32))
        out = fill_holes_in_mask_scores(m, 0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(m))


class TestOcclusionSuppression:
    def _overlapping_state(self, occ0, occ1):
        st = _tiny_state()
        blob = _blob(32, 32, 16, 16, 8) * 10 - 5      # logits
        masks = np.stack([blob, blob, np.zeros((32, 32)), np.zeros((32, 32))])
        st = st._replace(
            alive=jnp.array([True, True, False, False]),
            masks=jnp.asarray(masks, jnp.float32),
            last_occluded=jnp.array([occ0, occ1, -1, -1], jnp.int32),
            frame_idx=jnp.int32(7),
        )
        return st

    def test_more_recently_occluded_loses(self):
        st = self._overlapping_state(occ0=5, occ1=2)
        out = suppress_by_recent_occlusion(st, 0.5)
        assert (np.asarray(out.masks[0]) == NO_OBJ_LOGIT).all()
        assert (np.asarray(out.masks[1]) > 0).any()   # survivor intact
        # suppressed object's last_occluded updates to this frame
        assert int(out.last_occluded[0]) == 7
        assert int(out.last_occluded[1]) == 2

    def test_never_occluded_pair_untouched(self):
        # literal reference semantics: i can only be suppressed if the OTHER
        # object was previously occluded too (occ_j > -1)
        st = self._overlapping_state(occ0=5, occ1=NEVER_OCCLUDED)
        out = suppress_by_recent_occlusion(st, 0.5)
        assert (np.asarray(out.masks[0]) > 0).any()
        assert (np.asarray(out.masks[1]) > 0).any()

    def test_empty_mask_records_occlusion(self):
        st = _tiny_state()
        st = st._replace(
            alive=jnp.array([True, False, False, False]),
            frame_idx=jnp.int32(3),
        )  # alive slot with all-negative logits = occluded
        out = suppress_by_recent_occlusion(st, 0.5)
        assert int(out.last_occluded[0]) == 3

    def test_retired_slot_marked_always_occluded(self):
        st = _tiny_state()
        blob = jnp.asarray(_blob(32, 32, 16, 16, 6) * 10 - 5, jnp.float32)
        det_m = jnp.stack([blob, jnp.zeros((32, 32))])
        det_s = jnp.array([0.9, 0.0])
        det_v = jnp.array([True, False])
        st = associate_and_update(st, det_m, det_s, det_v)  # spawn
        empty = jnp.zeros((2, 32, 32), jnp.float32)
        for _ in range(12):  # miss long enough to retire
            st = associate_and_update(
                st, empty, jnp.zeros((2,)), jnp.zeros((2,), bool),
                max_missing_frames=3, hotstart_frames=1,
            )
        assert not bool(st.alive[0])
        assert int(st.last_occluded[0]) == ALWAYS_OCCLUDED


class TestReconditioning:
    def _setup(self):
        st = _tiny_state()
        trk = np.full((32, 32), -5.0, np.float32)
        trk[6:20, 6:20] = 5.0
        st = st._replace(
            alive=jnp.array([True, False, False, False]),
            masks=jnp.asarray(np.stack([trk] + [np.full((32, 32), -5.0, np.float32)] * 3), jnp.float32),
            scores=jnp.array([0.95, 0, 0, 0]),
            maskmem_age=st.maskmem_age.at[0, 0].set(3),
            frame_idx=jnp.int32(4),
        )
        det = np.full((32, 32), -5.0, np.float32)
        det[7:21, 6:20] = 5.0  # 1-px shift: mask/box IoU = 182/210 ~ 0.867
        det_masks = jnp.asarray(np.stack([det, np.full((32, 32), -5.0, np.float32)]), jnp.float32)
        det_scores = jnp.array([0.9, 0.0])
        new_det = jnp.array([False, False])
        from sam3_lora_tpu.ops.masks import mask_iou

        iou = mask_iou(det_masks > 0, st.masks > 0)
        return st, det_masks, det_scores, new_det, iou

    def test_periodic_trigger(self):
        st, dm, ds, nd, iou = self._setup()
        rec, det_for_slot = plan_reconditioning(
            st, dm, ds, nd, iou, recondition_every=2,
        )
        assert bool(rec[0]) and int(det_for_slot[0]) == 0
        out = apply_reconditioning(st, dm, rec, det_for_slot)
        # adopted the detection mask and reset the memory bank (fresh cond)
        np.testing.assert_array_equal(np.asarray(out.masks[0]), np.asarray(dm[0]))
        assert int(out.maskmem_age[0, 0]) == -1

    def test_periodic_respects_cadence(self):
        st, dm, ds, nd, iou = self._setup()
        st = st._replace(frame_idx=jnp.int32(5))       # 5 % 2 != 0
        rec, _ = plan_reconditioning(st, dm, ds, nd, iou, recondition_every=2)
        assert not bool(rec[0])

    def test_bbox_iou_mismatch_trigger(self):
        st, dm, ds, nd, iou = self._setup()
        st = st._replace(frame_idx=jnp.int32(5))       # periodic off
        # boxes overlap heavily -> no mismatch -> no reconditioning
        rec, _ = plan_reconditioning(
            st, dm, ds, nd, iou, bbox_iou_thresh=0.3, det_score_thresh=0.5,
        )
        assert not bool(rec[0])
        # demand near-perfect box agreement -> mismatch fires
        rec2, _ = plan_reconditioning(
            st, dm, ds, nd, iou, bbox_iou_thresh=0.999, det_score_thresh=0.5,
        )
        assert bool(rec2[0])

    def test_low_conf_detection_never_reconditions(self):
        st, dm, ds, nd, iou = self._setup()
        rec, _ = plan_reconditioning(
            st, dm, ds * 0.5, nd, iou, recondition_every=2,
        )  # det score 0.45 < HIGH_CONF 0.8
        assert not bool(rec[0])

    def test_low_track_score_never_reconditions(self):
        st, dm, ds, nd, iou = self._setup()
        st = st._replace(scores=jnp.array([0.5, 0, 0, 0]))  # <= 0.8 gate
        rec, _ = plan_reconditioning(st, dm, ds, nd, iou, recondition_every=2)
        assert not bool(rec[0])


class TestSlotSharding:
    """Objects are a batch dim: the whole per-frame update runs with the K
    slots sharded over the 8-device mesh (SURVEY §2.8 'object sharding')."""

    def test_associate_and_update_with_sharded_slots(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devs, ("objects",))
        k = 16
        st = init_track_state(
            k, (32, 32), num_maskmem=2, max_obj_ptrs=2, mem_dim=8,
            d_model=32, feat_hw=(4, 4),
        )
        slot_sharded = NamedSharding(mesh, P("objects"))
        rep = NamedSharding(mesh, P())

        def shard_leaf(x):
            x = jnp.asarray(x)
            if x.ndim >= 1 and x.shape[0] == k:
                return jax.device_put(x, slot_sharded)
            return jax.device_put(x, rep)

        st = jax.tree_util.tree_map(shard_leaf, st)

        det = np.zeros((4, 32, 32), np.float32)
        det[0] = _blob(32, 32, 8, 8, 5) * 10 - 5
        det[1] = _blob(32, 32, 24, 24, 5) * 10 - 5
        det_masks = jax.device_put(jnp.asarray(det), rep)
        det_scores = jax.device_put(jnp.array([0.9, 0.8, 0, 0]), rep)
        det_valid = jax.device_put(jnp.array([True, True, False, False]), rep)

        step = jax.jit(associate_and_update)
        with mesh:
            st1 = step(st, det_masks, det_scores, det_valid)
            st2 = suppress_by_recent_occlusion(st1, 0.5)
        # two objects spawned; state stays sharded over the objects axis
        assert int(st1.alive.sum()) == 2
        assert int(st2.alive.sum()) == 2
        sh = st1.masks.sharding
        assert isinstance(sh, NamedSharding) and sh.spec == P("objects")

        # numerically identical to the unsharded update
        st_ref = init_track_state(
            k, (32, 32), num_maskmem=2, max_obj_ptrs=2, mem_dim=8,
            d_model=32, feat_hw=(4, 4),
        )
        ref = associate_and_update(
            st_ref, jnp.asarray(det), jnp.array([0.9, 0.8, 0, 0]),
            jnp.array([True, True, False, False]),
        )
        np.testing.assert_array_equal(np.asarray(st1.alive), np.asarray(ref.alive))
        np.testing.assert_allclose(
            np.asarray(st1.masks), np.asarray(ref.masks), atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(st1.obj_ids), np.asarray(ref.obj_ids)
        )
