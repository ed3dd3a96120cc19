import numpy as np

from pytorchocr_ray.functions.metrics import (
    combine_det_counters,
    combine_rec_counters,
    det_counters,
    levenshtein,
    polygon_iou,
    rec_counters,
)


def sq(x, y, s):
    return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]], float)


def test_polygon_iou_identical():
    assert abs(polygon_iou(sq(0, 0, 10), sq(0, 0, 10)) - 1.0) < 1e-9


def test_polygon_iou_half_overlap():
    # two 10x10 squares overlapping in a 5x10 strip: inter 50, union 150
    got = polygon_iou(sq(0, 0, 10), sq(5, 0, 10))
    assert abs(got - 50 / 150) < 1e-9


def test_polygon_iou_disjoint():
    assert polygon_iou(sq(0, 0, 5), sq(20, 20, 5)) == 0.0


def test_polygon_iou_clockwise_screen_coords():
    # [tl,tr,br,bl] screen order (y down) must work unmodified
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    b = np.array([[0, 5], [10, 5], [10, 15], [0, 15]], float)
    assert abs(polygon_iou(a, b) - 50 / 150) < 1e-9


def test_det_counters_greedy_matching():
    gts = [sq(0, 0, 10), sq(100, 0, 10)]
    dets = [sq(1, 1, 10), sq(200, 200, 10)]  # one match, one false positive
    g, d, m = det_counters(gts, [False, False], dets)
    assert (g, d, m) == (2, 2, 1)


def test_det_counters_ignores_dont_care():
    gts = [sq(0, 0, 10), sq(100, 0, 10)]
    dets = [sq(100, 0, 10)]  # overlaps the ignored gt -> becomes don't-care
    g, d, m = det_counters(gts, [False, True], dets)
    assert (g, d, m) == (1, 0, 0)


def test_combine_det_counters():
    out = combine_det_counters([(2, 2, 1), (3, 2, 2)])
    assert abs(out["precision"] - 3 / 4) < 1e-9
    assert abs(out["recall"] - 3 / 5) < 1e-9
    assert out["hmean"] > 0


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_rec_counters_strips_spaces():
    assert rec_counters("a b c", "abc") == (1, 1.0, 1)
    e, s, n = rec_counters("abcd", "abce")
    assert e == 0 and abs(s - 0.75) < 1e-9 and n == 1


def test_combine_rec_counters():
    out = combine_rec_counters([(1, 1.0, 1), (0, 0.5, 1)])
    assert abs(out["acc"] - 0.5) < 1e-9
    assert abs(out["norm_edit_sim"] - 0.75) < 1e-9
