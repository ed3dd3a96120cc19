import numpy as np

from pytorchocr_ray.functions.charset import CHARSET
from pytorchocr_ray.functions.ctc import ctc_greedy_decode


def mk_probs(indices, conf=0.9):
    c = len(CHARSET) + 1
    probs = np.full((len(indices), c), (1 - conf) / (c - 1), dtype=np.float32)
    for t, i in enumerate(indices):
        probs[t, i] = conf
    return probs


def A(ch):  # char -> dict index
    return CHARSET.index(ch) + 1


def test_all_blank():
    text, prob = ctc_greedy_decode(mk_probs([0, 0, 0]))
    assert text == "" and prob == 0.0


def test_leading_blank():
    text, _ = ctc_greedy_decode(mk_probs([0, A("a"), A("b")]))
    assert text == "ab"


def test_adjacent_repeat_collapsed():
    text, _ = ctc_greedy_decode(mk_probs([A("a"), A("a"), A("b")]))
    assert text == "ab"


def test_repeat_separated_by_blank_kept():
    text, _ = ctc_greedy_decode(mk_probs([A("a"), 0, A("a")]))
    assert text == "aa"


def test_no_dedupe_mode():
    text, _ = ctc_greedy_decode(mk_probs([A("a"), A("a"), 0, A("b")]), remove_duplicate=False)
    assert text == "aab"


def test_prob_is_mean_of_kept():
    probs = mk_probs([A("a"), 0, A("b")], conf=0.8)
    probs[2, A("b")] = 0.6
    text, p = ctc_greedy_decode(probs)
    assert text == "ab"
    assert abs(p - (0.8 + 0.6) / 2) < 1e-6
