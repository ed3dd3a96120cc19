import numpy as np

from pytorchocr_ray.functions.psepost import progressive_expand, pse_boxes_from_smooth


def test_progressive_expand_two_blobs():
    small = np.zeros((20, 40), dtype=bool)
    small[5:8, 5:12] = True
    small[14:17, 25:33] = True
    large = np.zeros_like(small)
    large[3:10, 3:14] = True
    large[12:19, 23:35] = True
    labels = progressive_expand([small, large])
    assert labels.max() == 2
    # every large-kernel pixel connected to a seed gets that seed's label
    assert (labels[3:10, 3:14] > 0).all()
    assert (labels[12:19, 23:35] > 0).all()
    # the two blobs keep distinct labels
    assert labels[5, 6] != labels[15, 28]


def test_progressive_expand_merged_large_kernel_splits_by_seed():
    # one large blob containing TWO small seeds -> pixels split between the
    # two labels (the whole point of PSE: adjacent lines stay separate)
    small = np.zeros((10, 60), dtype=bool)
    small[4:6, 5:15] = True
    small[4:6, 40:50] = True
    large = np.zeros_like(small)
    large[2:8, 2:55] = True  # bridges both
    labels = progressive_expand([small, large])
    assert labels.max() == 2
    assert labels[5, 6] != labels[5, 45]
    assert (labels[2:8, 2:55] > 0).all()


def test_pse_detects_rendered_lines():
    from pytorchocr_ray.functions.charset import build_glyphs
    from pytorchocr_ray.functions.models import DetModel
    from pytorchocr_ray.state.weights import build_weights
    from pytorchocr_ray.synth.generate import render_media

    w = build_weights()
    det = DetModel(w)
    rng = np.random.default_rng(21)
    glyphs = build_glyphs()
    ok = total = 0
    for _ in range(8):
        img, regions = render_media(rng, glyphs)
        smooth = det.smooth(img)
        t = det.smooth_threshold(0.3)
        boxes, scores = pse_boxes_from_smooth(
            smooth, det.activate, img.shape[0], img.shape[1],
            thresh_levels=(t + 0.04, t + 0.02, t),
        )
        total += 1
        ok += len(boxes) == len(regions)
    assert ok >= total - 1, f"{ok}/{total}"


def test_pse_full_ocr_path():
    """The PSE det post-process plugs into the same OcrEngine contract."""
    from pytorchocr_ray.functions.charset import build_glyphs
    from pytorchocr_ray.functions.ocr import OcrConfig, OcrEngine
    from pytorchocr_ray.state.weights import build_weights
    from pytorchocr_ray.synth.generate import render_media

    engine = OcrEngine(build_weights(), OcrConfig(det_postprocess="pse"))
    rng = np.random.default_rng(23)
    glyphs = build_glyphs()
    total = correct = 0
    for _ in range(10):
        img, regions = render_media(rng, glyphs)
        res = engine.ocr_image(img)
        for (_b, gt), (_pb, pred, _p) in zip(regions, res):
            total += 1
            correct += gt == pred
    assert total > 15
    assert correct / total >= 0.8, f"{correct}/{total}"
