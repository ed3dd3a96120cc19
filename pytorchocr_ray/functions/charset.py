"""Character dictionary + deterministic glyph bank.

Mirrors the reference's dictionary scheme — an ordered char list with the CTC
``blank`` prepended at index 0 (reference pytocr/utils/char_dict_6623.txt,
blank prepend at pytocr/postprocess/rec_postprocess.py:91-93) — over a small
fixed charset (digits + ASCII letters).

Glyph bitmaps are seeded-random blocky patterns (coarse 5x7 grid upsampled
2x -> 10x14): the corpus generator renders them and the recognition model's
template bank IS the same array, which is exactly the reference's
architecture-vs-postprocess split (weights are a deterministic artifact, no
downloads; cf. SURVEY.md §7 "Guiding decisions").
"""

from __future__ import annotations

import numpy as np

CHARSET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
BLANK_INDEX = 0  # dict index 0 = CTC blank; char i is index i+1

GLYPH_W = 10
GLYPH_H = 14
_COARSE_W = 5
_COARSE_H = 7

GLYPH_SEED = 2022  # the reference's config seed (configs/det/det_r18_db.yml:5)


def build_glyphs(seed: int = GLYPH_SEED) -> np.ndarray:
    """(num_chars, GLYPH_H, GLYPH_W) float32 binary glyph bank, deterministic.

    Each char's pattern comes from a per-char seeded RNG; constraints: every
    coarse column has >=2 ink cells (keeps rendered lines horizontally dense
    for the detector's smoothing kernel) and total ink is 14-24 of 35 cells.
    """
    glyphs = np.zeros((len(CHARSET), GLYPH_H, GLYPH_W), dtype=np.float32)
    for i, ch in enumerate(CHARSET):
        rng = np.random.default_rng(seed * 100003 + ord(ch))
        while True:
            coarse = (rng.random((_COARSE_H, _COARSE_W)) < 0.55).astype(np.float32)
            col_ok = (coarse.sum(axis=0) >= 2).all()
            total = coarse.sum()
            if col_ok and 16 <= total <= 26:
                break
        glyphs[i] = np.repeat(np.repeat(coarse, 2, axis=0), 2, axis=1)
    return glyphs


def char_to_index(ch: str) -> int | None:
    """Char -> dict index (blank-offset); None for out-of-dict (skipped,
    mirroring the reference's silent unknown-char skip, label_ops.py:136-141)."""
    pos = CHARSET.find(ch)
    return None if pos < 0 else pos + 1
