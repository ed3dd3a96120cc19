import numpy as np

from pytorchocr_ray.functions.geometry import (
    get_mini_boxes,
    get_part_img,
    maybe_rot90,
    min_area_rect,
    order_points_clockwise,
    polygon_area_perimeter,
    sort_boxes,
    unclip,
)


def test_order_points_clockwise():
    pts = np.array([[10, 0], [0, 0], [10, 5], [0, 5]], dtype=float)
    rect = order_points_clockwise(pts)
    np.testing.assert_array_equal(rect, [[0, 0], [10, 0], [10, 5], [0, 5]])


def test_min_area_rect_axis_aligned():
    pts = np.array([[0, 0], [9, 0], [9, 4], [0, 4], [5, 2]], dtype=float)
    corners, sside = min_area_rect(pts)
    assert abs(sside - 4.0) < 1e-9
    xs = sorted(corners[:, 0])
    ys = sorted(corners[:, 1])
    assert abs(xs[0]) < 1e-9 and abs(xs[-1] - 9) < 1e-9
    assert abs(ys[0]) < 1e-9 and abs(ys[-1] - 4) < 1e-9


def test_min_area_rect_rotated():
    # 45-degree square of diagonal 10
    pts = np.array([[5, 0], [10, 5], [5, 10], [0, 5]], dtype=float)
    corners, sside = min_area_rect(pts)
    area, _ = polygon_area_perimeter(corners)
    assert abs(area - 50.0) < 1e-6
    assert abs(sside - np.hypot(5, 5)) < 1e-6


def test_get_mini_boxes_order():
    pts = np.array([[2, 1], [12, 1], [12, 6], [2, 6]], dtype=float)
    box, sside = get_mini_boxes(pts)
    np.testing.assert_allclose(box, [[2, 1], [12, 1], [12, 6], [2, 6]])
    assert abs(sside - 5) < 1e-9


def test_unclip_rectangle():
    # rect 20x10 -> d = area*1.5/perimeter = 200*1.5/60 = 5
    rect = np.array([[0, 0], [20, 0], [20, 10], [0, 10]], dtype=float)
    out = unclip(rect, 1.5)
    box, _ = get_mini_boxes(out)
    np.testing.assert_allclose(box, [[-5, -5], [25, -5], [25, 15], [-5, 15]], atol=1e-6)


def test_sort_boxes_single_pass_quirk():
    """3 boxes on one visual line in reverse x order: a full two-key sort
    would give [A, B, C]; the reference's ONE adjacent-swap pass cannot."""

    def mk(x, y):
        return np.array([[x, y], [x + 10, y], [x + 10, y + 5], [x, y + 5]])

    boxes = np.array([mk(30, 0), mk(20, 3), mk(10, 6)])
    out = sort_boxes(boxes)
    xs = [b[0][0] for b in out]
    # initial sort by (y, x): [(30,0), (20,3), (10,6)]; pass swaps (30,20)
    # then (30,10) -> [20, 10, 30]; NOT fully sorted — quirk preserved.
    assert xs == [20, 10, 30]


def test_sort_boxes_two_on_line():
    def mk(x, y):
        return np.array([[x, y], [x + 10, y], [x + 10, y + 5], [x, y + 5]])

    boxes = np.array([mk(50, 2), mk(5, 0)])
    out = sort_boxes(boxes)
    assert [b[0][0] for b in out] == [5, 50]


def test_sort_boxes_empty():
    out = sort_boxes(np.zeros((0, 4, 2)))
    assert out.shape == (0, 4, 2)


def test_get_part_img_axis_aligned_is_exact_copy():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (50, 80), dtype=np.uint8)
    box = np.array([[10, 5], [40, 5], [40, 25], [10, 25]], dtype=float)
    crop = get_part_img(img, box)
    np.testing.assert_array_equal(crop, img[5:25, 10:40])


def test_maybe_rot90_boundary():
    flat = np.zeros((29, 20), dtype=np.uint8)
    assert maybe_rot90(flat).shape == (29, 20)  # 29 < 30 -> no rotation
    tall = np.zeros((30, 20), dtype=np.uint8)
    assert maybe_rot90(tall).shape == (20, 30)  # h == 1.5w -> rotates
