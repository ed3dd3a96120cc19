"""Error-row tolerance through the FULL Ray pipeline (not just the oracle):
corrupted payloads and dangling media_refs must drop those rows (DecodeImage
None -> drop contract) while everything else still matches the oracle run on
the same corrupted input."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corrupted_corpus(small_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("corrupt")
    docs = pq.read_table(os.path.join(small_corpus, "documents.parquet"))
    media = pq.read_table(os.path.join(small_corpus, "media.parquet"))
    df = media.to_pandas()
    # corrupt every 5th payload; drop every 7th media row entirely
    corrupted = set(df["media_ref"][::5])
    dangling = set(df["media_ref"][::7]) - corrupted
    df.loc[df["media_ref"].isin(corrupted), "data"] = b"\x89PNG garbage"
    df = df[~df["media_ref"].isin(dangling)]
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False, schema=media.schema),
        os.path.join(str(d), "media.parquet"),
    )
    return str(d), corrupted, dangling


def _canon(df):
    return (
        df[["doc_id", "order", "kind", "text", "media_ref"]]
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )


def test_pipeline_drops_bad_media_and_matches_oracle(ray_session, corrupted_corpus):
    from pytorchocr_ray.oracle.extract import oracle_extract
    from pytorchocr_ray.pipelines.extract import extract_dataset

    d, corrupted, dangling = corrupted_corpus
    docs = pq.read_table(os.path.join(d, "documents.parquet"))
    media_t = pq.read_table(os.path.join(d, "media.parquet"))
    media = dict(zip(media_t["media_ref"].to_pylist(), media_t["data"].to_pylist()))

    golden = _canon(oracle_extract(docs, media).to_pandas())
    got = _canon(
        extract_dataset(
            os.path.join(d, "documents.parquet"),
            os.path.join(d, "media.parquet"),
            concurrency=2,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, golden)
    # the bad refs produced no output rows
    bad = corrupted | dangling
    assert not set(got["media_ref"]) & bad
    # but valid media still did
    assert (got["kind"] == "media").sum() > 0
