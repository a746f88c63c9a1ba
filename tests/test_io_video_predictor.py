"""io_utils frame sources + async loader + video predictor sessions."""

import os

import numpy as np
import pytest

from sam3_lora_tpu.io_utils import (
    AsyncVideoFrameLoader,
    VideoFrameSource,
    load_video_frames,
)


def make_frames(n=5, h=24, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n)]


def test_source_from_list():
    frames = make_frames()
    vs = VideoFrameSource(frames)
    assert len(vs) == 5
    np.testing.assert_array_equal(vs.get(3), frames[3])


def test_source_from_frame_dir(tmp_path):
    from PIL import Image

    frames = make_frames(4)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(tmp_path / f"{i:04d}.png")
    vs = VideoFrameSource(str(tmp_path))
    assert len(vs) == 4
    np.testing.assert_array_equal(vs.get(2), frames[2])


def test_source_from_mp4(tmp_path):
    import cv2

    # constant-color frames survive the lossy codec recognizably
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    frames = [
        np.full((32, 32, 3), c, np.uint8) for c in colors for _ in range(2)
    ]
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32)
    )
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    got = load_video_frames(path)
    assert len(got) == 6
    assert got[0].shape == (32, 32, 3)
    for g, f in zip(got, frames):
        # dominant channel preserved through compression
        assert g.mean(axis=(0, 1)).argmax() == f.mean(axis=(0, 1)).argmax()


def test_async_loader_order_and_len():
    frames = make_frames(7)
    loader = AsyncVideoFrameLoader(frames, prefetch=2)
    got = list(loader)
    assert len(got) == len(loader) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_async_loader_max_frames():
    loader = AsyncVideoFrameLoader(make_frames(7), max_frames=3)
    assert len(list(loader)) == 3


class TestVideoPredictorSessions:
    @pytest.fixture(scope="class")
    def predictor(self):
        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.processor import Sam3Processor
        from sam3_lora_tpu.video_predictor import Sam3VideoPredictor

        proc = Sam3Processor(model_cfg=tiny_model_config(), threshold=0.0)
        return Sam3VideoPredictor(proc, prob_threshold=0.0, num_slots=3)

    def test_session_lifecycle(self, predictor):
        cfg_size = predictor.proc.cfg.img_size
        frames = make_frames(3, h=cfg_size, w=cfg_size)
        sid = predictor.start_session(frames)
        predictor.add_prompt(sid, "object")
        outs = list(predictor.propagate_in_video(sid))
        assert [o["frame_idx"] for o in outs] == [0, 1, 2]
        assert predictor.get_output(sid, 1)["frame_idx"] == 1
        predictor.close_session(sid)
        with pytest.raises(KeyError):
            predictor.get_output(sid, 0)

    def test_interleaved_sessions_independent(self, predictor):
        cfg_size = predictor.proc.cfg.img_size
        s1 = predictor.start_session(make_frames(2, h=cfg_size, w=cfg_size, seed=1))
        s2 = predictor.start_session(make_frames(2, h=cfg_size, w=cfg_size, seed=2))
        predictor.add_prompt(s1, "object")
        predictor.add_prompt(s2, "object")
        it1 = predictor.propagate_in_video(s1)
        it2 = predictor.propagate_in_video(s2)
        o1 = next(it1); o2 = next(it2)
        assert o1["frame_idx"] == 0 and o2["frame_idx"] == 0
        next(it1); next(it2)
        predictor.close()

    def test_prompt_required(self, predictor):
        cfg_size = predictor.proc.cfg.img_size
        sid = predictor.start_session(make_frames(1, h=cfg_size, w=cfg_size))
        with pytest.raises(RuntimeError, match="add_prompt"):
            list(predictor.propagate_in_video(sid))
        predictor.close_session(sid)
