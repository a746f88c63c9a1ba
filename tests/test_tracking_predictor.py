"""Interactive video tracking predictor tests (tiny config, CPU)."""

import numpy as np
import pytest

from sam3_lora_tpu.config import tiny_model_config
from sam3_lora_tpu.processor import Sam3Processor
from sam3_lora_tpu.tracking_predictor import Sam3TrackerPredictor


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_model_config()
    proc = Sam3Processor(model_cfg=cfg)
    return Sam3TrackerPredictor(proc, num_slots=3, num_maskmem=3,
                                max_obj_ptrs=4)


def frames(n=4, size=56, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.rand(size, size, 3) * 255).astype(np.uint8) for _ in range(n)]


def test_click_then_propagate(predictor):
    predictor.init_state(frames())
    oid, mask = predictor.add_new_points_or_box(
        frame_idx=0, obj_id=7,
        points=np.array([[28.0, 28.0]]), labels=np.array([1]),
    )
    assert oid == 7
    assert np.isfinite(mask).all()
    outs = list(predictor.propagate_in_video())
    assert [o[0] for o in outs] == [0, 1, 2, 3]
    fi, ids, masks = outs[-1]
    assert 7 in ids
    assert np.isfinite(masks).all()


def test_box_prompt_and_two_objects(predictor):
    predictor.init_state(frames(3, seed=1))
    predictor.add_new_points_or_box(0, obj_id=1, box=np.array([5, 5, 25, 25]))
    predictor.add_new_points_or_box(0, obj_id=2,
                                    points=np.array([[45.0, 45.0]]),
                                    labels=np.array([1]))
    outs = list(predictor.propagate_in_video(max_frame_num_to_track=2))
    assert len(outs) == 2
    _, ids, masks = outs[0]
    assert set(ids) == {1, 2}
    assert masks.shape[0] == 2


def test_mask_prompt(predictor):
    predictor.init_state(frames(2, seed=2))
    m = np.zeros((56, 56), np.uint8)
    m[10:30, 10:30] = 1
    oid, logits = predictor.add_new_mask(0, obj_id=3, mask=m)
    assert oid == 3
    # mask-as-output convention: inside positive, outside strongly negative
    assert logits.max() > 0 and logits.min() < -5
    outs = list(predictor.propagate_in_video())
    assert len(outs) == 2


def test_memory_written_after_propagation(predictor):
    predictor.init_state(frames(3, seed=3))
    predictor.add_new_points_or_box(0, obj_id=5,
                                    points=np.array([[20.0, 20.0]]),
                                    labels=np.array([1]))
    st = predictor._state.track
    slot = predictor._state.obj_slot[5]
    assert int(st.maskmem_age[slot, 0]) == 0  # cond memory written
    list(predictor.propagate_in_video())
    st = predictor._state.track
    # ring slots got entries during propagation
    assert (np.asarray(st.maskmem_age[slot, 1:]) >= 0).any()


def test_errors_without_state(predictor):
    predictor._state = None
    with pytest.raises(RuntimeError, match="init_state"):
        predictor.add_new_points_or_box(0, 1, points=np.zeros((1, 2)),
                                        labels=np.ones(1, np.int32))
    predictor.init_state(frames(1))
    with pytest.raises(RuntimeError, match="add objects"):
        list(predictor.propagate_in_video())
