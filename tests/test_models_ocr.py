import numpy as np

from pytorchocr_ray.functions.charset import CHARSET, build_glyphs
from pytorchocr_ray.functions.ocr import OcrEngine
from pytorchocr_ray.state.weights import build_weights
from pytorchocr_ray.synth.generate import render_media


def test_weights_deterministic():
    w1 = build_weights()
    w2 = build_weights()
    for k in w1:
        np.testing.assert_array_equal(w1[k], w2[k])


def test_glyphs_distinct():
    g = build_glyphs()
    flat = g.reshape(len(g), -1)
    # no two glyph patterns identical
    assert len({tuple(row) for row in flat.astype(int).tolist()}) == len(CHARSET)


def test_end_to_end_ocr_accuracy():
    """The seeded engine must read back >=97% of rendered GT transcripts —
    the analog of the reference's golden-label eval (tools/program.py:421-473)."""
    engine = OcrEngine(build_weights())
    glyphs = build_glyphs()
    rng = np.random.default_rng(11)
    total = correct = 0
    for _ in range(40):
        img, regions = render_media(rng, glyphs)
        res = engine.ocr_image(img)
        assert len(res) == len(regions), "detection count mismatch"
        for (_b, gt), (_pb, pred, _prob) in zip(regions, res):
            total += 1
            correct += gt == pred
    assert total > 60
    assert correct / total >= 0.97, f"{correct}/{total}"


def test_ocr_reading_order_left_right_top_bottom():
    engine = OcrEngine(build_weights())
    glyphs = build_glyphs()
    rng = np.random.default_rng(5)
    for _ in range(10):
        img, regions = render_media(rng, glyphs)
        res = engine.ocr_image(img)
        gts = [t for _, t in regions]
        preds = [t for _, t, _ in res]
        assert preds == gts  # GT list is in reading order by construction


def test_empty_image_no_boxes():
    engine = OcrEngine(build_weights())
    img = np.full((64, 64), 240, dtype=np.uint8)
    assert engine.ocr_image(img) == []
