import numpy as np

from pytorchocr_ray.state.weights import build_weights, load_weights, save_weights


def test_weights_npz_roundtrip(tmp_path):
    p = str(tmp_path / "w.npz")
    save_weights(p)
    loaded = load_weights(p)
    built = build_weights()
    assert set(loaded) == set(built)
    for k in built:
        np.testing.assert_array_equal(loaded[k], built[k])


def test_engine_runs_from_loaded_artifact(tmp_path):
    from pytorchocr_ray.functions.ocr import OcrEngine

    p = str(tmp_path / "w.npz")
    save_weights(p)
    engine = OcrEngine(load_weights(p))
    img = np.full((64, 64), 240, dtype=np.uint8)
    assert engine.ocr_image(img) == []
