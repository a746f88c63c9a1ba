"""Video track-state machine tests (association/spawn/retire, static slots)."""

import numpy as np

import jax.numpy as jnp

from sam3_lora_tpu.video import associate_and_update, init_track_state


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def _dets(*blobs, scores, n_pad=6, hw=32):
    masks = np.zeros((n_pad, hw, hw), np.float32)
    s = np.zeros((n_pad,), np.float32)
    v = np.zeros((n_pad,), bool)
    for i, (b, sc) in enumerate(zip(blobs, scores)):
        masks[i] = b
        s[i] = sc
        v[i] = True
    return jnp.asarray(masks), jnp.asarray(s), jnp.asarray(v)


class TestTrackStateMachine:
    def test_spawn_track_retire_lifecycle(self):
        st = init_track_state(4, (32, 32), num_maskmem=2, max_obj_ptrs=2, mem_dim=8, d_model=32, feat_hw=(4, 4))
        a = _blob(32, 32, 8, 8, 5)
        b = _blob(32, 32, 24, 24, 5)

        # frame 1: two new objects spawn
        m, s, v = _dets(a, b, scores=[0.9, 0.8])
        st = associate_and_update(st, m, s, v)
        assert int(st.alive.sum()) == 2
        ids0 = set(np.asarray(st.obj_ids)[np.asarray(st.alive)].tolist())
        assert ids0 == {0, 1}

        # frame 2: object a persists (moved slightly), b vanishes
        a2 = _blob(32, 32, 9, 9, 5)
        m, s, v = _dets(a2, scores=[0.85])
        st = associate_and_update(st, m, s, v, max_missing_frames=1)
        assert int(st.alive.sum()) == 2  # b inside keep-alive window

        # frames 3-5: b still missing -> retired after max_missing_frames
        for _ in range(3):
            m, s, v = _dets(a2, scores=[0.85])
            st = associate_and_update(st, m, s, v, max_missing_frames=1)
        alive_ids = set(np.asarray(st.obj_ids)[np.asarray(st.alive)].tolist())
        assert alive_ids == {0}

        # new object later gets a FRESH id (no reuse)
        c = _blob(32, 32, 16, 28, 3)
        m, s, v = _dets(a2, c, scores=[0.85, 0.7])
        st = associate_and_update(st, m, s, v)
        alive_ids = set(np.asarray(st.obj_ids)[np.asarray(st.alive)].tolist())
        assert 0 in alive_ids and len(alive_ids) == 2
        assert max(alive_ids) >= 2  # id 1 not recycled

    def test_slot_exhaustion(self):
        st = init_track_state(2, (32, 32), num_maskmem=2, max_obj_ptrs=2, mem_dim=8, d_model=32, feat_hw=(4, 4))
        blobs = [_blob(32, 32, 5 + 9 * i, 5 + 9 * i, 3) for i in range(3)]
        m, s, v = _dets(*blobs, scores=[0.9, 0.8, 0.7])
        st = associate_and_update(st, m, s, v)
        assert int(st.alive.sum()) == 2  # capped at slot count


class TestAgentLoop:
    def test_rule_based_refiner_protocol(self):
        """Agent loop against a fake processor: refine until a phrase hits."""
        from sam3_lora_tpu.agent import agent_inference
        import numpy as np

        class FakeProc:
            def set_image(self, img):
                return self

            def set_text_prompt(self, phrase, threshold=0.5):
                hit = phrase == "crack"  # only the refined phrase works
                return {
                    "num_detections": 2 if hit else 0,
                    "scores": np.array([0.8, 0.6]) if hit else np.zeros((0,)),
                    "presence": 0.9 if hit else 0.1,
                    "boxes": None,
                    "masks_lowres": None,
                    "prompt": phrase,
                }

        res = agent_inference(FakeProc(), None, "a cracks", max_rounds=4)
        assert res.detections["num_detections"] == 2
        assert res.phrase == "crack"  # article stripped then plural flipped
        assert res.rounds <= 4


class TestTrackerPropagation:
    """VideoGrounder with full TrackerCore memory propagation (tiny cfg)."""

    def test_streaming_with_propagation(self):
        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.processor import Sam3Processor
        from sam3_lora_tpu.video import VideoGrounder

        cfg = tiny_model_config()
        proc = Sam3Processor(model_cfg=cfg, threshold=0.0)
        vg = VideoGrounder(
            proc, num_slots=3, prob_threshold=0.0, propagate=True,
            num_maskmem=3, max_obj_ptrs=4,
        )
        rng = np.random.RandomState(0)
        frame = (rng.rand(cfg.img_size, cfg.img_size, 3) * 255).astype(np.uint8)
        for t in range(3):
            out = vg.step(frame, "object")
            assert set(out) == {"obj_ids", "scores", "masks_lowres"}
        # memory banks must have been written for live slots
        alive = np.asarray(vg.state.alive)
        if alive.any():
            age = np.asarray(vg.state.maskmem_age)[alive]
            assert (age >= 0).any(), "no memory written for live tracks"
            pa = np.asarray(vg.state.obj_ptr_age)[alive]
            assert (pa >= 0).any(), "no object pointers written"
        assert int(vg.state.frame_idx) == 3
        assert np.isfinite(np.asarray(vg.state.masks)).all()

    def test_memory_ring_eviction(self):
        """After more frames than mem slots, ring ages stay within window and
        the cond slot (0) survives."""
        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.processor import Sam3Processor
        from sam3_lora_tpu.video import VideoGrounder

        cfg = tiny_model_config()
        proc = Sam3Processor(model_cfg=cfg, threshold=0.0)
        vg = VideoGrounder(
            proc, num_slots=2, prob_threshold=0.0, propagate=True,
            num_maskmem=3, max_obj_ptrs=2,
        )
        rng = np.random.RandomState(1)
        frame = (rng.rand(cfg.img_size, cfg.img_size, 3) * 255).astype(np.uint8)
        for _ in range(6):
            vg.step(frame, "object")
        alive = np.asarray(vg.state.alive)
        if alive.any():
            age = np.asarray(vg.state.maskmem_age)[alive]
            # cond slot written exactly once at spawn, still present
            assert (age[:, 0] >= 0).all()
            # ring slots cycle: youngest ring entry is fresh
            assert (age[:, 1:].min(axis=1) <= 1).all()
