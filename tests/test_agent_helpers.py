"""Agent-tier helpers (reference sam3/agent/helpers/): box modes, pairwise
box ops, IoM mask dedup, exact rotated IoU, keypoint<->heatmap."""

import numpy as np
import pytest

from sam3_lora_tpu import agent_helpers as H

pytestmark = pytest.mark.fast
rng = np.random.RandomState(0)


# ------------------------------------------------------------------ #
# BoxMode
# ------------------------------------------------------------------ #
def test_box_mode_roundtrip():
    b = np.array([[10.0, 20.0, 30.0, 60.0]])  # xyxy
    xywh = H.convert_box_mode(b, H.BoxMode.XYXY_ABS, H.BoxMode.XYWH_ABS)
    np.testing.assert_allclose(xywh, [[10, 20, 20, 40]])
    back = H.convert_box_mode(xywh, H.BoxMode.XYWH_ABS, H.BoxMode.XYXY_ABS)
    np.testing.assert_allclose(back, b)
    rel = H.convert_box_mode(
        b, H.BoxMode.XYXY_ABS, H.BoxMode.XYXY_REL, image_size=(100, 200)
    )
    np.testing.assert_allclose(rel, [[0.05, 0.2, 0.15, 0.6]])
    a = H.convert_box_mode(b, H.BoxMode.XYXY_ABS, H.BoxMode.XYWHA_ABS)
    np.testing.assert_allclose(a, [[20, 40, 20, 40, 0]])
    np.testing.assert_allclose(
        H.convert_box_mode(a, H.BoxMode.XYWHA_ABS, H.BoxMode.XYXY_ABS), b
    )


def test_box_mode_rel_requires_size():
    with pytest.raises(ValueError):
        H.convert_box_mode(
            np.zeros((1, 4)), H.BoxMode.XYXY_ABS, H.BoxMode.XYXY_REL
        )


# ------------------------------------------------------------------ #
# pairwise box ops
# ------------------------------------------------------------------ #
def test_pairwise_iou_and_ioa():
    b1 = np.array([[0, 0, 10, 10]], np.float32)
    b2 = np.array([[5, 5, 15, 15], [20, 20, 30, 30], [0, 0, 5, 5]], np.float32)
    iou = H.pairwise_iou(b1, b2)
    np.testing.assert_allclose(iou[0], [25 / 175, 0.0, 25 / 100], atol=1e-6)
    ioa = H.pairwise_ioa(b1, b2)  # inter / area(boxes2)
    np.testing.assert_allclose(ioa[0], [0.25, 0.0, 1.0], atol=1e-6)


def test_matched_pairwise_iou():
    b1 = np.array([[0, 0, 10, 10], [0, 0, 4, 4]], np.float32)
    b2 = np.array([[0, 0, 10, 10], [2, 0, 6, 4]], np.float32)
    got = H.matched_pairwise_iou(b1, b2)
    np.testing.assert_allclose(got, [1.0, 8 / 24], atol=1e-6)


def test_point_box_distance_sign():
    pts = np.array([[5, 5], [20, 5]], np.float32)
    boxes = np.array([[0, 0, 10, 10]], np.float32)
    d = H.pairwise_point_box_distance(pts, boxes)
    assert (d[0, 0] > 0).all()  # inside: all four distances positive
    assert (d[1, 0] <= 0).any()  # outside


# ------------------------------------------------------------------ #
# mask IoM dedup
# ------------------------------------------------------------------ #
def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def test_mask_intersection_matches_bruteforce():
    m1 = rng.rand(4, 37, 53) > 0.5
    m2 = rng.rand(3, 37, 53) > 0.5
    got = H.mask_intersection(m1, m2)
    want = (m1[:, None] & m2[None, :]).reshape(4, 3, -1).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_mask_iom_contained():
    big = _disk(64, 64, 32, 32, 20)
    small = _disk(64, 64, 32, 32, 8)  # fully inside big
    iom = H.mask_iom(np.stack([big]), np.stack([small]))
    np.testing.assert_allclose(iom, [[1.0]], atol=1e-6)


def test_remove_overlapping_masks():
    h = w = 64
    a = _disk(h, w, 20, 20, 12)
    b = _disk(h, w, 22, 22, 12)  # heavy overlap with a
    c = _disk(h, w, 50, 50, 8)  # disjoint
    sample = {
        "orig_img_h": h,
        "orig_img_w": w,
        "pred_masks": [m.astype(np.uint8).tolist() for m in (a, b, c)],
        "pred_scores": [0.9, 0.8, 0.7],
        "pred_boxes": [[8, 8, 32, 32], [10, 10, 34, 34], [42, 42, 58, 58]],
    }
    out = H.remove_overlapping_masks(sample, iom_thresh=0.3)
    assert out["kept_indices"] == [0, 2]  # b suppressed by higher-scored a
    assert out["removed_indices"] == [1]
    assert len(out["pred_masks"]) == 2 and len(out["pred_boxes"]) == 2
    # 0/1-mask samples pass through untouched (no extra keys)
    single = {
        "orig_img_h": h,
        "orig_img_w": w,
        "pred_masks": [a.astype(np.uint8).tolist()],
        "pred_scores": [0.5],
    }
    assert H.remove_overlapping_masks(single) is single


# ------------------------------------------------------------------ #
# rotated boxes
# ------------------------------------------------------------------ #
def test_rotated_iou_axis_aligned_matches_plain():
    b1 = np.array([[10, 10, 8, 6, 0], [5, 5, 4, 4, 0]], np.float64)
    b2 = np.array([[12, 11, 8, 6, 0], [30, 30, 2, 2, 0]], np.float64)
    xy1 = H.convert_box_mode(b1, H.BoxMode.XYWHA_ABS, H.BoxMode.XYXY_ABS)
    xy2 = H.convert_box_mode(b2, H.BoxMode.XYWHA_ABS, H.BoxMode.XYXY_ABS)
    np.testing.assert_allclose(
        H.pairwise_iou_rotated(b1, b2), H.pairwise_iou(xy1, xy2), atol=1e-5
    )


def test_rotated_iou_90_deg_invariance():
    sq = np.array([[0, 0, 4, 4, 0]], np.float64)
    sq90 = np.array([[0, 0, 4, 4, 90]], np.float64)
    np.testing.assert_allclose(H.pairwise_iou_rotated(sq, sq90), [[1.0]], atol=1e-5)


def test_rotated_iou_45_deg_analytic():
    # unit square vs itself rotated 45 deg about the same center:
    # intersection is a regular octagon, area 8*(sqrt(2)-1), union 2-that
    sq = np.array([[0, 0, 2, 2, 0]], np.float64)
    sq45 = np.array([[0, 0, 2, 2, 45]], np.float64)
    inter = 8 * (np.sqrt(2) - 1)  # for side 2: scaled by area 4 -> 4*0.8284
    area = 4.0
    inter_area = area * (2 * (np.sqrt(2) - 1))
    want = inter_area / (2 * area - inter_area)
    got = H.pairwise_iou_rotated(sq, sq45)[0, 0]
    np.testing.assert_allclose(got, want, atol=1e-5)
    del inter


def test_rotated_iou_disjoint():
    b1 = np.array([[0, 0, 2, 2, 30]], np.float64)
    b2 = np.array([[10, 10, 2, 2, 60]], np.float64)
    np.testing.assert_allclose(H.pairwise_iou_rotated(b1, b2), [[0.0]])


def test_rotated_corners_shape_and_center():
    b = np.array([[3, 4, 2, 6, 33]], np.float64)
    c = H.rotated_box_corners(b)
    assert c.shape == (1, 4, 2)
    np.testing.assert_allclose(c[0].mean(axis=0), [3, 4], atol=1e-9)
    # side lengths preserved under rotation
    d01 = np.linalg.norm(c[0, 0] - c[0, 1])
    d12 = np.linalg.norm(c[0, 1] - c[0, 2])
    np.testing.assert_allclose(sorted([d01, d12]), [2, 6], atol=1e-9)


# ------------------------------------------------------------------ #
# keypoints
# ------------------------------------------------------------------ #
def test_keypoints_to_heatmap_bins():
    rois = np.array([[0, 0, 8, 8]], np.float64)
    kps = np.array(
        [[[0.5, 0.5, 1], [7.9, 7.9, 1], [8.0, 8.0, 1], [9.0, 1.0, 1], [1.0, 1.0, 0]]]
    )
    lin, valid = H.keypoints_to_heatmap(kps, rois, heatmap_size=4)
    assert valid.tolist() == [[1, 1, 1, 0, 0]]  # outside-roi and vis=0 invalid
    assert lin[0, 0] == 0  # (0.5, 0.5) -> bin (0, 0)
    assert lin[0, 1] == 15  # (7.9, 7.9) -> last bin
    assert lin[0, 2] == 15  # exact right/bottom edge -> last bin


def test_heatmaps_to_keypoints_roundtrip():
    s = 8
    maps = np.full((1, 2, s, s), -5.0)
    maps[0, 0, 2, 5] = 3.0
    maps[0, 1, 7, 0] = 1.0
    rois = np.array([[10, 20, 26, 36]], np.float64)  # 16x16 roi, bin=2px
    out = H.heatmaps_to_keypoints(maps, rois)
    assert out.shape == (1, 2, 4)
    np.testing.assert_allclose(out[0, 0, :2], [10 + 5.5 * 2, 20 + 2.5 * 2])
    np.testing.assert_allclose(out[0, 1, :2], [10 + 0.5 * 2, 20 + 7.5 * 2])
    assert out[0, 0, 2] == pytest.approx(3.0)
    assert 0 < out[0, 0, 3] <= 1
