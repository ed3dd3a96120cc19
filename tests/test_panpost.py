import numpy as np

from pytorchocr_ray.functions.panpost import aggregate_pixels


def test_aggregate_gate_blocks_dissimilar_pixels():
    kernel = np.zeros((10, 30), dtype=bool)
    kernel[4:6, 4:10] = True
    text = np.zeros_like(kernel)
    text[3:7, 2:28] = True
    emb = np.zeros((10, 30))
    emb[:, :15] = 0.5  # kernel side
    emb[:, 15:] = 0.9  # far side: outside the 0.2 gate of mean 0.5
    labels = aggregate_pixels(kernel, text, emb, margin=0.2)
    assert labels.max() == 1
    assert (labels[3:7, 2:15] > 0).all()  # similar side aggregated
    assert (labels[:, 15:] == 0).all()  # dissimilar side rejected


def test_aggregate_two_kernels_separate_labels():
    kernel = np.zeros((8, 40), dtype=bool)
    kernel[3:5, 4:8] = True
    kernel[3:5, 30:34] = True
    text = np.zeros_like(kernel)
    text[2:6, 2:38] = True
    emb = np.full((8, 40), 0.5)
    labels = aggregate_pixels(kernel, text, emb, margin=1.0)
    assert labels.max() == 2
    assert labels[4, 5] != labels[4, 31]
    assert (labels[2:6, 2:38] > 0).all()  # everything aggregated to one of them


def test_pan_full_ocr_path():
    from pytorchocr_ray.functions.charset import build_glyphs
    from pytorchocr_ray.functions.ocr import OcrConfig, OcrEngine
    from pytorchocr_ray.state.weights import build_weights
    from pytorchocr_ray.synth.generate import render_media

    engine = OcrEngine(build_weights(), OcrConfig(det_postprocess="pan"))
    rng = np.random.default_rng(31)
    glyphs = build_glyphs()
    total = correct = 0
    for _ in range(15):
        img, regions = render_media(rng, glyphs)
        res = engine.ocr_image(img)
        for (_b, gt), (_pb, pred, _p) in zip(regions, res):
            total += 1
            correct += gt == pred
    assert total > 25
    # PAN's kernel threshold drops very short words (same trait as the
    # reference family on small text) — coverage bar, not parity bar
    assert correct / total >= 0.8, f"{correct}/{total}"
