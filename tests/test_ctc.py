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


def test_attn_label_encode_framing():
    from pytorchocr_ray.functions.charset import CHARSET, char_to_index
    from pytorchocr_ray.functions.ctc import attn_label_encode

    out = attn_label_encode("ab", max_text_len=10)
    assert out is not None
    arr, n = out
    assert n == 2
    assert arr[0] == 0  # sos
    assert arr[1] == char_to_index("a") + 1
    assert arr[2] == char_to_index("b") + 1
    assert arr[3] == len(CHARSET) + 1  # eos
    assert (arr[4:] == 0).all()
    assert attn_label_encode("", 10) is None
    assert attn_label_encode("x" * 10, 10) is None  # len >= max rejected


def test_table_label_encode_framing():
    from pytorchocr_ray.functions.ctc import table_label_encode
    from pytorchocr_ray.functions.table import TABLE_VOCAB

    toks = ["<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>"]
    out = table_label_encode(toks, TABLE_VOCAB, max_len=20)
    assert out is not None
    arr, n = out
    assert n == 6 and arr[0] == 0 and arr[7] == len(TABLE_VOCAB) + 1
    assert table_label_encode(["<nope>"], TABLE_VOCAB) is None
