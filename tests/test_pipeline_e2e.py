import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _golden(corpus_dir):
    from pytorchocr_ray.oracle.extract import oracle_extract

    docs = pq.read_table(os.path.join(corpus_dir, "documents.parquet"))
    media_t = pq.read_table(os.path.join(corpus_dir, "media.parquet"))
    media = dict(zip(media_t["media_ref"].to_pylist(), media_t["data"].to_pylist()))
    return oracle_extract(docs, media)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["doc_id", "order", "kind", "text", "media_ref"]]
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def golden(small_corpus):
    return _canon(_golden(small_corpus).to_pandas())


def test_reassemble_guard_detects_split_doc():
    """A block missing some of a doc's span rows (mid-document block split)
    must raise; tombstoned (dropped-media) spans must NOT trip the guard."""
    import pyarrow as pa
    import pytest as _pytest

    from pytorchocr_ray.stages.reassemble import reassemble_block

    def block(rows):
        cols = ["doc_id", "offset", "region_idx", "kind", "text", "media_ref",
                "span_idx", "n_spans"]
        return pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})

    complete = block([
        ("d1", 1, 0, "text", "a", "", 0, 2),
        ("d1", 2, -1, "media", "", "m0", 1, 2),  # dropped media tombstone
    ])
    out = reassemble_block(complete).to_pandas()
    assert list(out["text"]) == ["a"]  # tombstone filtered, order intact

    split = block([
        ("d1", 1, 0, "text", "a", "", 0, 2),  # span 1 of 2 landed elsewhere
    ])
    with _pytest.raises(RuntimeError, match="split"):
        reassemble_block(split)


def test_oracle_matches_generator_ground_truth(small_corpus, golden):
    """The engine-side oracle must equal the generator's GROUND-TRUTH span
    table (expected.parquet) — the independent truth the driver's SQL
    oracle reads.  Any engine misread (e.g. the 'ee' intra-glyph band-split
    regression) breaks this, not just the Ray-vs-oracle equality."""
    expected = _canon(
        pq.read_table(os.path.join(small_corpus, "expected.parquet")).to_pandas()
    )
    pd.testing.assert_frame_equal(expected, golden)


def test_fused_pipeline_matches_oracle(ray_session, small_corpus, golden):
    from pytorchocr_ray.pipelines.extract import extract_dataset

    ds = extract_dataset(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=2,
    )
    got = _canon(ds.to_pandas())
    pd.testing.assert_frame_equal(got, golden)


def test_split_pipeline_matches_oracle(ray_session, small_corpus, golden):
    from pytorchocr_ray.pipelines.extract import extract_dataset

    ds = extract_dataset(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        fused=False,
        concurrency=2,
    )
    got = _canon(ds.to_pandas())
    pd.testing.assert_frame_equal(got, golden)


def test_shuffle_reassembly_matches_oracle(ray_session, small_corpus, golden):
    """The general groupby(doc_id) path must agree with the zero-shuffle
    block-local path (which the other tests cover as the default)."""
    from pytorchocr_ray.pipelines.extract import extract_dataset

    ds = extract_dataset(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=2,
        reassemble="shuffle",
    )
    got = _canon(ds.to_pandas())
    pd.testing.assert_frame_equal(got, golden)


def test_regions_table(ray_session, small_corpus, golden):
    """extract_regions exposes the per-region intermediate (box + prob)."""
    import numpy as np

    from pytorchocr_ray.pipelines.extract import extract_regions

    df = extract_regions(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=2,
    ).to_pandas()
    media_golden = golden[golden["kind"] == "media"]
    assert len(df) == len(media_golden)
    # every region has an 8-value int16 box and a confidence in [0, 1]
    assert all(len(b) == 8 for b in df["box"])
    assert ((df["prob"] >= 0) & (df["prob"] <= 1)).all()
    # same texts as the reassembled output (as multisets)
    assert sorted(df["text"]) == sorted(media_golden["text"])


def test_nested_output_matches_flat(ray_session, small_corpus, golden):
    """extract_nested emits one row per doc with the EXTRACTED schema and
    the same span content as the flat plan."""
    from pytorchocr_ray.pipelines.extract import extract_nested

    ds = extract_nested(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=2,
    )
    rows = ds.to_pandas()
    flat = []
    for r in rows.itertuples():
        for s in r.spans:
            flat.append(
                {
                    "doc_id": r.doc_id,
                    "order": s["order"],
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                }
            )
    got = _canon(pd.DataFrame(flat))
    got["order"] = got["order"].astype("int32")
    pd.testing.assert_frame_equal(got, golden)
    # per-row spans sorted by order
    for r in rows.itertuples():
        assert [s["order"] for s in r.spans] == list(range(len(r.spans)))


def test_media_join_mode_matches_oracle(ray_session, small_corpus, golden):
    """media_mode='join' (hash-partitioned Dataset.join of span rows with
    the payload table) must produce the same result as the store mode."""
    from pytorchocr_ray.pipelines.extract import extract_dataset

    ds = extract_dataset(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=2,
        media_mode="join",
    )
    got = _canon(ds.to_pandas())
    pd.testing.assert_frame_equal(got, golden)


def test_pse_pipeline_matches_pse_oracle(ray_session, small_corpus):
    """Alternate det post-process keeps the same parity contract."""
    import pyarrow.parquet as pq

    from pytorchocr_ray.functions.ocr import OcrConfig
    from pytorchocr_ray.oracle.extract import oracle_extract
    from pytorchocr_ray.pipelines.extract import extract_dataset

    cfg = OcrConfig(det_postprocess="pse")
    docs = pq.read_table(os.path.join(small_corpus, "documents.parquet"))
    media_t = pq.read_table(os.path.join(small_corpus, "media.parquet"))
    media = dict(zip(media_t["media_ref"].to_pylist(), media_t["data"].to_pylist()))
    golden_pse = _canon(oracle_extract(docs, media, config=cfg).to_pandas())
    ds = extract_dataset(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=2,
        config=cfg,
    )
    pd.testing.assert_frame_equal(_canon(ds.to_pandas()), golden_pse)


def test_pipeline_deterministic_across_batch_sizes(ray_session, small_corpus, golden):
    from pytorchocr_ray.pipelines.extract import extract_dataset

    ds = extract_dataset(
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
        concurrency=3,
        batch_size=5,
    )
    got = _canon(ds.to_pandas())
    pd.testing.assert_frame_equal(got, golden)
