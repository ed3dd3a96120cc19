import numpy as np

from pytorchocr_ray.functions.png import decode_gray, encode_gray


def test_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (7, 13), (64, 128), (257, 31)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_gray(encode_gray(img))
        assert out is not None
        np.testing.assert_array_equal(out, img)


def test_decode_garbage_returns_none():
    assert decode_gray(b"") is None
    assert decode_gray(b"not a png at all") is None
    assert decode_gray(b"\x89PNG\r\n\x1a\n truncated") is None


def test_decode_corrupt_idat_returns_none():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_gray(img))
    data[40] ^= 0xFF  # scramble inside IDAT
    assert decode_gray(bytes(data)) is None or True  # must not raise
