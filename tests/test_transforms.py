"""Tests for the host-side transform pipeline (sam3_lora_tpu/train/transforms.py).

Geometry invariants are checked the way the reference verifies them visually
(verify_gt_transforms.py): boxes always tightly contain their masks after any
transform, flips are involutions, crops never produce degenerate boxes.
"""

import numpy as np
import pytest

from sam3_lora_tpu.train.transforms import (
    ColorJitter,
    Compose,
    Datapoint,
    FilterCrowds,
    FilterEmptyTargets,
    FilterQueriesWithTooManyOut,
    KeepMaxNumQueries,
    NormalizeToTensor,
    PadToSize,
    Query,
    RandomGrayscale,
    RandomHorizontalFlip,
    RandomMosaic,
    RandomResize,
    RandomSizeCrop,
    RandomizeInputBoxes,
    SamplePointsFromMasks,
    TextQueryToVisual,
    crop_datapoint,
    hflip_datapoint,
    noise_box,
    resize_datapoint,
    train_transforms,
)


def make_dp(h=60, w=80, n_obj=3, seed=0, with_masks=True):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    boxes = []
    masks = []
    for _ in range(n_obj):
        bw = rng.randint(8, w // 2)
        bh = rng.randint(8, h // 2)
        x = rng.randint(0, w - bw)
        y = rng.randint(0, h - bh)
        boxes.append([x, y, x + bw, y + bh])
        m = np.zeros((h, w), np.uint8)
        m[y : y + bh, x : x + bw] = 1
        masks.append(m)
    q = Query(
        text="crack",
        boxes=np.array(boxes, np.float32),
        masks=np.stack(masks) if with_masks else None,
        is_crowd=np.zeros((n_obj,), bool),
    )
    return Datapoint(image=img, queries=[q], coco_image_id=7, original_size=(h, w))


def boxes_from_masks(masks):
    out = []
    for m in masks:
        ys, xs = np.nonzero(m)
        out.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    return np.array(out, np.float32)


def assert_boxes_match_masks(dp, tol=2.0):
    for q in dp.queries:
        if q.masks is None or q.num_objects == 0:
            continue
        mb = boxes_from_masks(q.masks)
        assert np.abs(mb - q.boxes).max() <= tol, (mb, q.boxes)


def test_resize_square_geometry():
    dp = make_dp()
    out = resize_datapoint(dp, 100, square=True)
    assert out.image.shape == (100, 100, 3)
    assert out.queries[0].masks.shape[1:] == (100, 100)
    assert_boxes_match_masks(out, tol=2.5)


def test_resize_aspect_preserving_max_size():
    dp = make_dp(h=60, w=120)
    out = resize_datapoint(dp, 100, max_size=150)
    h, w = out.size
    assert w == 150 and abs(h - 75) <= 1  # long side capped


def test_hflip_involution():
    dp = make_dp()
    out = hflip_datapoint(hflip_datapoint(dp))
    np.testing.assert_array_equal(out.image, dp.image)
    np.testing.assert_allclose(out.queries[0].boxes, dp.queries[0].boxes)
    np.testing.assert_array_equal(out.queries[0].masks, dp.queries[0].masks)


def test_hflip_boxes_match_masks():
    dp = make_dp()
    out = hflip_datapoint(dp)
    assert_boxes_match_masks(out, tol=1.0)


def test_crop_drops_outside_objects():
    dp = make_dp(h=100, w=100, n_obj=1)
    q = dp.queries[0]
    # object occupies its box; crop a region guaranteed disjoint from it
    x0, y0, x1, y1 = q.boxes[0]
    if x0 >= 30:  # crop left strip
        out = crop_datapoint(dp, 0, 0, 100, int(x0) - 1)
    else:  # crop right strip
        out = crop_datapoint(dp, 0, int(x1) + 1, 100, 100 - int(x1) - 1)
    assert out.queries[0].num_objects == 0


def test_crop_clips_boxes_to_window():
    dp = make_dp(h=100, w=100)
    out = crop_datapoint(dp, 10, 10, 50, 50)
    for q in out.queries:
        if q.num_objects:
            assert q.boxes.min() >= 0
            assert q.boxes[:, 0::2].max() <= 50
            assert q.boxes[:, 1::2].max() <= 50
    assert_boxes_match_masks(out, tol=1.0)


def test_random_size_crop_respects_boxes():
    rng = np.random.RandomState(0)
    t = RandomSizeCrop(20, 40, respect_boxes=True)
    for seed in range(5):
        dp = make_dp(h=100, w=100, seed=seed)
        out = t(dp, rng)
        assert sum(q.num_objects for q in out.queries) > 0


def test_pad_to_size():
    dp = make_dp(h=60, w=80)
    out = PadToSize(100)(dp, np.random.RandomState(0))
    assert out.image.shape == (100, 100, 3)
    assert out.queries[0].masks.shape[1:] == (100, 100)
    # boxes unchanged (pad is bottom-right)
    np.testing.assert_allclose(out.queries[0].boxes, dp.queries[0].boxes)


def test_color_jitter_image_only():
    dp = make_dp()
    out = ColorJitter()(dp, np.random.RandomState(0))
    assert out.image.shape == dp.image.shape
    assert out.image.dtype == np.uint8
    np.testing.assert_allclose(out.queries[0].boxes, dp.queries[0].boxes)


def test_grayscale_channels_equal():
    dp = make_dp()
    out = RandomGrayscale(p=1.0)(dp, np.random.RandomState(0))
    assert np.abs(out.image[..., 0].astype(int) - out.image[..., 1].astype(int)).max() <= 1


def test_mosaic_merges_same_text():
    rng = np.random.RandomState(3)
    partners = [make_dp(seed=s) for s in (1, 2, 3)]
    it = iter(partners)
    t = RandomMosaic(lambda r: next(it), size=128, p=1.0)
    dp = make_dp(seed=0)
    out = t(dp, rng)
    assert out.image.shape == (128, 128, 3)
    # all four cells share text "crack" -> one merged query with 4x objects
    assert len(out.queries) == 1
    assert out.queries[0].num_objects == 12
    assert out.queries[0].masks.shape[1:] == (128, 128)
    assert_boxes_match_masks(out, tol=3.0)


def test_normalize_to_tensor():
    dp = make_dp()
    out = NormalizeToTensor()(dp)
    assert out.image.shape == (3, 60, 80)
    assert out.image.min() >= -1.001 and out.image.max() <= 1.001


def test_noise_box_bounds():
    rng = np.random.RandomState(0)
    box = np.array([10, 10, 50, 40], np.float32)
    for _ in range(20):
        nb = noise_box(box, (60, 80), std=0.2, max_shift=20, rng=rng)
        assert nb[0::2].min() >= 0 and nb[0::2].max() <= 80
        assert nb[1::2].min() >= 0 and nb[1::2].max() <= 60
        assert np.abs(nb - box).max() <= 20.0


def test_randomize_input_boxes():
    dp = make_dp()
    q = dp.queries[0]
    dp.queries[0] = Query(
        text=q.text, boxes=q.boxes, masks=q.masks,
        input_boxes=q.boxes[:1].copy(),
    )
    out = RandomizeInputBoxes(std=0.3)(dp, np.random.RandomState(1))
    assert out.queries[0].input_boxes.shape == (1, 4)


def test_sample_points_inside_mask():
    dp = make_dp()
    out = SamplePointsFromMasks(n_points=2, mode="uniform")(
        dp, np.random.RandomState(0)
    )
    q = out.queries[0]
    assert q.input_points.shape == (2 * q.num_objects, 2)
    # every sampled point lies on some object's mask
    union = q.masks.any(axis=0)
    for x, y in q.input_points.astype(int):
        assert union[y, x]


def test_sample_points_center_mode():
    dp = make_dp(n_obj=1)
    out = SamplePointsFromMasks(n_points=1, mode="center")(
        dp, np.random.RandomState(0)
    )
    (x, y), = out.queries[0].input_points.astype(int)
    assert dp.queries[0].masks[0][y, x]


def test_filter_crowds():
    dp = make_dp(n_obj=3)
    dp.queries[0].is_crowd[1] = True
    out = FilterCrowds()(dp)
    assert out.queries[0].num_objects == 2
    assert not out.queries[0].is_crowd.any()


def test_filter_empty_targets():
    dp = make_dp()
    empty_pos = Query(text="dog", boxes=np.zeros((0, 4), np.float32),
                      is_exhaustive=False)
    empty_neg = Query(text="cat", boxes=np.zeros((0, 4), np.float32),
                      is_exhaustive=True)
    dp.queries += [empty_pos, empty_neg]
    out = FilterEmptyTargets(keep_negatives=True)(dp)
    assert [q.text for q in out.queries] == ["crack", "cat"]
    out = FilterEmptyTargets(keep_negatives=False)(dp)
    assert [q.text for q in out.queries] == ["crack"]


def test_filter_too_many_out():
    dp = make_dp(n_obj=3)
    out = FilterQueriesWithTooManyOut(max_objects=2)(dp)
    assert len(out.queries) == 0
    out = FilterQueriesWithTooManyOut(max_objects=3)(dp)
    assert len(out.queries) == 1


def test_keep_max_num_queries():
    dp = make_dp()
    dp.queries = dp.queries * 5
    out = KeepMaxNumQueries(2)(dp, np.random.RandomState(0))
    assert len(out.queries) == 2


def test_text_query_to_visual():
    dp = make_dp()
    out = TextQueryToVisual(p=1.0)(dp, np.random.RandomState(0))
    q = out.queries[0]
    assert q.text == ""
    assert q.input_boxes.shape == (1, 4)
    # the input box is one of the target boxes
    assert any(np.allclose(q.input_boxes[0], b) for b in q.boxes)


def test_train_pipeline_end_to_end():
    rng = np.random.RandomState(0)
    t = train_transforms(img_size=112, hflip=True, color_jitter=True,
                         scale_jitter=[1.0, 1.25, 1.5])
    for seed in range(3):
        dp = make_dp(h=90, w=130, seed=seed)
        out = t(dp, rng)
        assert out.image.shape == (3, 112, 112)
        for q in out.queries:
            if q.num_objects:
                assert q.boxes[:, 0::2].max() <= 112
                assert q.boxes[:, 1::2].max() <= 112


def test_compose_deterministic_given_rng():
    t = train_transforms(img_size=64)
    dp = make_dp()
    a = t(dp, np.random.RandomState(42))
    b = t(dp, np.random.RandomState(42))
    np.testing.assert_array_equal(a.image, b.image)
