"""Table branch v2: decode semantics, bbox denorm, metric, e2e pipeline."""

import json
import os

import numpy as np
import pytest


def _dec(**kw):
    from pytorchocr_ray.functions.table import TableLabelDecode

    return TableLabelDecode(**kw)


def test_decode_stops_at_eos_and_skips_sos():
    dec = _dec()
    toks = ["<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>"]
    probs = dec.encode(toks, len(toks) + 3)  # trailing eos steps
    structure, boxes, score = dec.decode(probs, np.zeros((len(probs), 4)), (10, 10, 1, 1, 10, 10))
    assert structure == toks
    assert len(boxes) == 1  # one <td>
    assert score == 1.0


def test_decode_collects_bbox_per_td_token_variant():
    from pytorchocr_ray.functions.table import TD_TOKENS

    dec = _dec()
    toks = ["<td", ' colspan="2"', ">", "</td>", "<td>", "</td>"]
    probs = dec.encode(toks, len(toks) + 1)
    structure, boxes, _ = dec.decode(probs, np.ones((len(probs), 4)), (10, 10, 1, 1, 10, 10))
    # "<td" and "<td>" are cell openers; ' colspan' / '>' / '</td>' are not
    assert len(boxes) == sum(t in TD_TOKENS for t in toks) == 2


def test_merge_no_span_structure_vocab():
    dec = _dec(merge_no_span_structure=True)
    assert "<td></td>" in dec.dict and "<td>" not in dec.dict


def test_bbox_denorm_restores_source_pixels():
    from pytorchocr_ray.functions.table import (
        resize_table_shape,
        table_bbox_encode,
    )

    dec = _dec()
    shape = resize_table_shape(300, 420)
    src = np.array([[10, 20, 200, 120], [14, 130, 380, 290]], dtype=np.float64)
    norm = table_bbox_encode(src, shape, width=4)
    restored = np.stack([dec._bbox_decode(n.copy(), shape) for n in norm])
    assert np.all(np.floor(restored + 0.5) == src)


def test_structure_metric_counters():
    from pytorchocr_ray.functions.table import (
        combine_table_counters,
        table_structure_counters,
    )

    a = ["<table>", "<thead>", "<tr>", "</tr>", "</thead>", "</table>"]
    b = ["<table>", "<tr>", "</tr>", "</table>"]
    assert table_structure_counters(a, a) == (1, 1)
    assert table_structure_counters(a, b) == (0, 1)
    # thead/tbody deletion makes them equal (ref del_thead_tbody)
    assert table_structure_counters(a, b, del_thead_tbody=True) == (1, 1)
    assert combine_table_counters([(1, 1), (0, 1)]) == {"acc": 0.5}


def test_pubtab_pipeline_matches_ground_truth(ray_session, tmp_path):
    from pytorchocr_ray.pipelines.table import table_structure_ds
    from pytorchocr_ray.synth.pubtab import synth_pubtab

    import pyarrow.parquet as pq

    d = synth_pubtab(str(tmp_path / "pubtab"), n=25, seed=5)
    out = (
        table_structure_ds(os.path.join(d, "table_labels.jsonl"), concurrency=2)
        .to_pandas()
        .sort_values("filename")
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(os.path.join(d, "expected.parquet"))
        .to_pandas()
        .sort_values("filename")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_pubtab_reader_drops_malformed(ray_session, tmp_path):
    from pytorchocr_ray.sources.label_files import read_pubtab_jsonl

    p = tmp_path / "bad.jsonl"
    rows = [
        json.dumps({"filename": "a.png", "imgh": 10, "imgw": 10,
                    "html": {"structure": {"tokens": ["<table>"]},
                             "cells": [{"tokens": ["x"], "bbox": [1, 2, 3, 4]}]}}),
        "not json at all",
        json.dumps({"filename": "c.png"}),  # missing html
    ]
    p.write_text("\n".join(rows) + "\n")
    df = read_pubtab_jsonl(str(p)).to_pandas()
    assert list(df["img_path"]) == ["a.png"]
    assert list(df["cell_bboxes"][0]) == [1, 2, 3, 4]


def test_detect_cell_rects_exact_and_colspan():
    """Rendered outlines come back as exact integer rects; colspan cells
    reconstruct the span token; corrupt payloads are dropped."""
    import numpy as np

    from pytorchocr_ray.functions.png import decode_gray
    from pytorchocr_ray.functions.table import (
        detect_cell_rects,
        structure_from_cell_rects,
    )
    from pytorchocr_ray.synth.pubtab import render_table_png

    # 2 rows: thead of 2 cells (pitch 50), tbody one colspan-2 cell
    rects = [[2, 2, 48, 38], [52, 2, 98, 38], [2, 42, 98, 78]]
    img = decode_gray(render_table_png(rects, 90, 110))
    det = detect_cell_rects(img)
    np.testing.assert_array_equal(det, np.asarray(rects))
    assert structure_from_cell_rects(det) == [
        "<html>", "<body>", "<table>",
        "<thead>", "<tr>", "<td>", "</td>", "<td>", "</td>", "</tr>", "</thead>",
        "<tbody>", "<tr>", "<td", ' colspan="2"', ">", "</td>", "</tr>",
        "</tbody>", "</table>", "</body>", "</html>",
    ]
    # zero cells -> empty table skeleton
    assert structure_from_cell_rects(np.zeros((0, 4), dtype=np.int64)) == [
        "<html>", "<body>", "<table>", "</table>", "</body>", "</html>",
    ]


def test_table_image_pipeline_matches_expected(ray_session, tmp_path):
    """End-to-end image branch: PNG -> detection -> reconstruction ->
    decode equals the generator's expected_image table; an undecodable
    payload is dropped (not crashed on)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pytorchocr_ray.pipelines.table import table_structure_from_images
    from pytorchocr_ray.synth.pubtab import synth_pubtab

    d = synth_pubtab(str(tmp_path / "pubtab"), n=25, seed=5)
    images = os.path.join(d, "table_images.parquet")
    # corrupt one payload in a copy
    t = pq.read_table(images).to_pandas()
    t.loc[0, "data"] = b"\x89PNG garbage"
    corrupted = str(tmp_path / "images_corrupt.parquet")
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), corrupted)

    out = (
        table_structure_from_images(corrupted, concurrency=2)
        .to_pandas()
        .sort_values("filename")
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(os.path.join(d, "expected_image.parquet"))
        .to_pandas()
        .sort_values("filename")
        .reset_index(drop=True)
    )
    dropped = t.loc[0, "filename"]
    assert dropped not in set(out["filename"])
    exp = exp[exp["filename"] != dropped].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
