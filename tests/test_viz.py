"""Visualization helper tests (overlays, SoM, zoom)."""

import numpy as np

from sam3_lora_tpu.viz import (
    draw_boxes,
    draw_set_of_marks,
    instance_color,
    overlay_masks,
    side_by_side,
    zoom_to_box,
)


def base_image(h=40, w=60):
    return np.full((h, w, 3), 128, np.uint8)


def square_mask(h=40, w=60, y0=10, x0=20, s=12):
    m = np.zeros((h, w), bool)
    m[y0 : y0 + s, x0 : x0 + s] = True
    return m


def test_instance_colors_deterministic_and_distinct():
    assert instance_color(0) == instance_color(0)
    assert instance_color(0) != instance_color(1)
    assert instance_color(16) == instance_color(0)  # cycles


def test_overlay_masks_blends_inside_only():
    img = base_image()
    m = square_mask()
    out = overlay_masks(img, [m], alpha=0.5, contour=False)
    assert out.shape == img.shape and out.dtype == np.uint8
    changed = (out != img).any(axis=-1)
    np.testing.assert_array_equal(changed, m)


def test_overlay_masks_resizes_lowres_mask():
    img = base_image()
    m = square_mask(h=20, w=30, y0=5, x0=10, s=6)  # half-res mask
    out = overlay_masks(img, [m])
    assert (out != img).any()


def test_draw_boxes_and_labels():
    img = base_image()
    out = draw_boxes(img, [[5, 5, 30, 25]], labels=["crack"], scores=[0.87])
    assert (out != img).any()
    # box edge pixels took the instance color
    assert tuple(out[5, 10]) == instance_color(0)


def test_set_of_marks_centers():
    img = base_image()
    m1 = square_mask(x0=5)
    m2 = square_mask(x0=40)
    out = draw_set_of_marks(img, [m1, m2])
    # the numeral discs darken the mask centers
    ys, xs = np.nonzero(m1)
    cy, cx = int(ys.mean()), int(xs.mean())
    assert out[cy, cx].sum() < img[cy, cx].sum()


def test_zoom_to_box_window():
    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    crop, win = zoom_to_box(img, [10, 10, 30, 20], context=0.0)
    assert win == (10, 10, 30, 20)
    np.testing.assert_array_equal(crop, img[10:20, 10:30])
    crop2, _ = zoom_to_box(img, [10, 10, 30, 20], context=0.5, out_size=32)
    assert crop2.shape == (32, 32, 3)


def test_side_by_side_layout():
    a = np.zeros((10, 20, 3), np.uint8)
    b = np.zeros((14, 8, 3), np.uint8)
    out = side_by_side([a, b], pad=4)
    assert out.shape == (14, 20 + 4 + 8, 3)
