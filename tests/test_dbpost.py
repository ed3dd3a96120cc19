import numpy as np

from pytorchocr_ray.functions.dbpost import (
    boxes_from_bitmap,
    connected_components,
    det_resize,
)


def test_connected_components_basic():
    m = np.zeros((10, 20), dtype=bool)
    m[2:5, 2:8] = True
    m[7:9, 12:18] = True
    comps = connected_components(m)
    assert len(comps) == 2
    # discovery order: topmost first
    assert comps[0][:, 1].min() == 2
    assert comps[1][:, 1].min() == 7


def test_connected_components_diagonal_touch_is_8conn():
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = True
    m[1, 1] = True
    assert len(connected_components(m)) == 1


def test_boxes_min_size_filter():
    prob = np.zeros((32, 32), dtype=np.float32)
    prob[5:7, 5:7] = 0.9  # 2x2 blob: sside < 3 -> dropped
    boxes, scores = boxes_from_bitmap(prob, 32, 32)
    assert len(boxes) == 0


def test_boxes_score_filter():
    prob = np.zeros((64, 64), dtype=np.float32)
    prob[10:20, 10:40] = 0.4  # above thresh 0.3, below box_thresh 0.5
    boxes, _ = boxes_from_bitmap(prob, 64, 64)
    assert len(boxes) == 0
    boxes, scores = boxes_from_bitmap(prob, 64, 64, box_thresh=0.35)
    assert len(boxes) == 1 and 0.35 < scores[0] < 0.45


def test_boxes_unclip_expansion_and_int16():
    prob = np.zeros((64, 64), dtype=np.float32)
    prob[20:30, 10:40] = 0.9
    boxes, scores = boxes_from_bitmap(prob, 64, 64)
    assert len(boxes) == 1
    box = boxes[0]
    assert box.dtype == np.int16
    # unclip: 30x10 blob -> d = 1.5*area/perim ~ 5.5; expanded beyond blob
    assert box[:, 0].min() < 10 and box[:, 0].max() > 39
    assert box[:, 1].min() < 20 and box[:, 1].max() > 29


def test_boxes_rescale_to_source_coords():
    prob = np.zeros((32, 32), dtype=np.float32)
    prob[8:16, 4:28] = 0.9
    boxes, _ = boxes_from_bitmap(prob, 64, 64)  # src twice the map size
    assert len(boxes) == 1
    assert boxes[0][:, 0].max() > 50  # scaled up ~2x


def test_max_candidates_cap():
    prob = np.zeros((40, 400), dtype=np.float32)
    for i in range(12):
        prob[10:20, i * 32 : i * 32 + 20] = 0.9
    boxes, _ = boxes_from_bitmap(prob, 40, 400, max_candidates=5)
    assert len(boxes) == 5


def test_det_resize_rounds_to_32():
    img = np.zeros((100, 200), dtype=np.uint8)
    out, (sh, sw, rh, rw) = det_resize(img)
    assert (sh, sw) == (100, 200)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    img2 = np.zeros((1000, 2000), dtype=np.uint8)
    out2, _ = det_resize(img2, limit_side_len=736, limit_type="max")
    assert max(out2.shape) <= 736 + 31


# ---------------------------------------------------- round-2 option parity

def test_dilate_mask_spreads_down_right():
    from pytorchocr_ray.functions.dbpost import dilate_mask

    m = np.zeros((4, 4), dtype=bool)
    m[1, 1] = True
    d = dilate_mask(m)
    assert d[1, 1] and d[1, 2] and d[2, 1] and d[2, 2]
    assert not d[0, 0] and not d[0, 1] and not d[1, 0]


def test_use_dilation_bridges_one_pixel_gap():
    from pytorchocr_ray.functions.dbpost import boxes_from_bitmap

    prob = np.zeros((20, 24), dtype=np.float64)
    # two 4x6 blobs separated by ONE empty column (8-conn keeps them apart)
    prob[8:12, 4:10] = 0.9
    prob[8:12, 11:17] = 0.9
    plain, _ = boxes_from_bitmap(prob, 20, 24, min_size=2)
    dil, _ = boxes_from_bitmap(prob, 20, 24, min_size=2, use_dilation=True)
    assert len(plain) == 2
    assert len(dil) == 1


def test_score_mode_poly_diverges_from_box_on_diagonal():
    from pytorchocr_ray.functions.dbpost import boxes_from_bitmap

    # a thick diagonal staircase: its (tilted) min-area rect fill includes
    # a large zero-probability margin, the pixel support does not
    prob = np.zeros((40, 40), dtype=np.float64)
    for i in range(8):
        prob[3 * i : 3 * i + 6, 3 * i : 3 * i + 6] = 0.95
    box_boxes, box_scores = boxes_from_bitmap(
        prob, 40, 40, box_thresh=0.8, score_mode="box"
    )
    poly_boxes, poly_scores = boxes_from_bitmap(
        prob, 40, 40, box_thresh=0.8, score_mode="poly"
    )
    assert len(box_boxes) == 0  # rect fill dilutes the score below 0.8
    assert len(poly_boxes) == 1  # exact pixel support keeps 0.95
    assert poly_scores[0] > 0.9


def test_score_mode_validation():
    import pytest as _pytest

    from pytorchocr_ray.functions.dbpost import boxes_from_bitmap

    with _pytest.raises(ValueError, match="score_mode"):
        boxes_from_bitmap(np.zeros((5, 5)), 5, 5, score_mode="contour")


def test_affine_transform_matches_closed_form():
    from pytorchocr_ray.functions.affine import get_affine_transform, transform_preds

    src_h, src_w, target = 300, 480, 736
    center = np.array([src_w / 2.0, src_h / 2.0])
    scale = target / max(src_h, src_w)
    # forward: source center -> square center; origin -> padded offset
    fwd = get_affine_transform(center, max(src_h, src_w), target)
    pt = fwd @ np.array([center[0], center[1], 1.0])
    assert np.allclose(pt, [target / 2, target / 2])
    # inverse restores source coordinates (closed form of centered pad)
    coords = np.array([[100.0, 200.0], [0.0, 0.0], [736.0, 736.0]])
    back = transform_preds(coords, center, max(src_h, src_w), target)
    expect_x = (coords[:, 0] - target / 2) / scale + center[0]
    expect_y = (coords[:, 1] - target / 2) / scale + center[1]
    assert np.allclose(back[:, 0], expect_x, atol=1e-9)
    assert np.allclose(back[:, 1], expect_y, atol=1e-9)


def test_padding_resize_detect_reads_same_text():
    from pytorchocr_ray.functions.ocr import OcrConfig, OcrEngine
    from pytorchocr_ray.functions.png import decode_gray
    from pytorchocr_ray.state.weights import build_weights
    from pytorchocr_ray.synth.generate import generate_docs

    _docs, media, gt, _exp = generate_docs(np.arange(8), seed=9)
    gtl = {r["media_ref"]: [x["text"] for x in r["regions"]] for r in gt.to_pylist()}
    w = build_weights()
    eng_ratio = OcrEngine(w, OcrConfig())
    eng_pad = OcrEngine(w, OcrConfig(limit_type="padding", limit_side_len=736))
    checked = 0
    for row in media.to_pylist():
        img = decode_gray(row["data"])
        texts_pad = [t for _b, t, _p in eng_pad.ocr_image(img)]
        assert texts_pad == gtl[row["media_ref"]]
        checked += 1
    assert checked >= 3
