"""TPS spatial transformer: grid math, sampling semantics, rectification."""

import numpy as np


def test_identity_fiducials_reproduce_resample():
    """C' == C makes the TPS the identity mapping: sampling equals a plain
    bilinear resize of the input."""
    from pytorchocr_ray.functions.tps import build_C, grid_sample, tps_grid

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (20, 40), dtype=np.uint8)
    grid = tps_grid(build_C(20), 20, 40)
    out = grid_sample(img, grid)
    # identity grid at the same resolution samples each pixel center
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_translation_fiducials_shift_content():
    from pytorchocr_ray.functions.tps import build_C, grid_sample, tps_grid

    img = np.zeros((32, 64), dtype=np.float64)
    img[10:20, 20:40] = 1.0
    # shifting every TARGET fiducial +dx samples from the right -> content
    # appears shifted LEFT by dx/2*W pixels
    C = build_C(20)
    C_shift = C + np.array([0.25, 0.0])
    out = grid_sample(img, tps_grid(C_shift, 32, 64))
    src_com = np.argwhere(img > 0.5)[:, 1].mean()
    out_com = np.argwhere(out > 0.5)[:, 1].mean()
    assert abs((src_com - out_com) - 0.25 / 2 * 64) < 1.5


def test_grid_matches_reference_formula():
    """Pin the (F+3) system: T maps base fiducials C exactly onto C'."""
    from pytorchocr_ray.functions.tps import (
        build_C,
        build_inv_delta_C,
        build_P_hat,
    )

    rng = np.random.default_rng(11)
    C = build_C(20)
    C_prime = C + 0.1 * rng.standard_normal(C.shape)
    T = build_inv_delta_C(C) @ np.concatenate([C_prime, np.zeros((3, 2))])
    # evaluating the spline AT the base fiducials returns the targets
    mapped = build_P_hat(C, C) @ T
    assert np.allclose(mapped, C_prime, atol=1e-6)


def test_rectify_straightens_curved_text_band():
    """A sine-warped ink band has a tall row-envelope; after TPS
    rectification via the ink-envelope fiducials the band is flat."""
    from pytorchocr_ray.functions.tps import tps_rectify

    H, W = 60, 200
    img = np.full((H, W), 240, dtype=np.uint8)
    xs = np.arange(W)
    center = 30 + 10 * np.sin(2 * np.pi * xs / W)  # curved baseline
    for x in xs:
        c = int(center[x])
        img[c - 4 : c + 4, x] = 32
    def envelopes(a):
        ink = a < 128
        cols = ink.any(axis=0)
        top = np.argmax(ink, axis=0)[cols]
        bot = (a.shape[0] - 1 - np.argmax(ink[::-1], axis=0))[cols]
        return top, bot

    top_in, bot_in = envelopes(img)
    assert top_in.std() > 5  # visibly curved input
    out = tps_rectify(img, out_h=32, out_w=100)
    top_out, bot_out = envelopes(out)
    # the band maps onto a flat full-height stripe: envelopes ~constant
    assert top_out.std() < 1.0, top_out.std()
    assert bot_out.std() < 1.0, bot_out.std()
