import json
import os

import pandas as pd
import pytest


def _canon(df):
    return (
        df[["doc_id", "order", "kind", "text", "media_ref"]]
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def paths(small_corpus):
    return (
        os.path.join(small_corpus, "documents.parquet"),
        os.path.join(small_corpus, "media.parquet"),
    )


def test_plan_covers_all_docs(ray_session, paths):
    import pyarrow.parquet as pq

    from pytorchocr_ray.pipelines.runner import plan_partitions

    docs_path, _ = paths
    parts = plan_partitions(docs_path, n_buckets=4)
    n_docs = pq.read_table(docs_path).num_rows
    # every doc hashes into exactly one (bucket, sub); planned docs sum over
    # buckets (subs of one bucket share the same planned_docs count)
    seen = {(p.bucket) for p in parts}
    total = sum(
        {p.bucket: p.planned_docs for p in parts}[b] for b in seen
    )
    assert total == n_docs


def test_skew_split_triggers(ray_session, paths):
    from pytorchocr_ray.pipelines.runner import plan_partitions

    docs_path, _ = paths
    # absurdly low skew factor forces splits
    parts = plan_partitions(docs_path, n_buckets=2, skew_factor=0.5)
    assert any(p.n_subs > 1 for p in parts)


def test_partitioned_run_matches_single_run(ray_session, paths, tmp_path, small_corpus):
    from pytorchocr_ray.pipelines.extract import extract_dataset
    from pytorchocr_ray.pipelines.runner import read_extracted, run_partitioned

    docs_path, media_path = paths
    out = str(tmp_path / "out")
    summary = run_partitioned(
        docs_path, media_path, out, n_buckets=4, concurrency=2
    )
    assert summary["skipped"] == []
    assert len(summary["lineage"]) == len(summary["ran"])
    got = _canon(read_extracted(out))
    want = _canon(
        extract_dataset(docs_path, media_path, concurrency=2).to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)
    # lineage sanity
    for rec in summary["lineage"]:
        assert rec["output_rows"] >= rec["output_docs"] >= 0
        assert rec["checksum"].startswith("0x")


def test_output_invariant_to_bucket_count(ray_session, paths, tmp_path):
    """Partitioning is a physical choice: the union of all partitions must
    be identical for any n_buckets."""
    from pytorchocr_ray.pipelines.runner import read_extracted, run_partitioned

    docs_path, media_path = paths
    out2 = str(tmp_path / "b2")
    out5 = str(tmp_path / "b5")
    run_partitioned(docs_path, media_path, out2, n_buckets=2, concurrency=2)
    run_partitioned(docs_path, media_path, out5, n_buckets=5, concurrency=2)
    pd.testing.assert_frame_equal(
        _canon(read_extracted(out2)), _canon(read_extracted(out5))
    )


def test_resume_after_injected_failure(ray_session, paths, tmp_path):
    from pytorchocr_ray.pipelines.runner import read_extracted, run_partitioned

    docs_path, media_path = paths
    out = str(tmp_path / "out_resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned(
            docs_path, media_path, out, n_buckets=4, concurrency=2, fail_after=2
        )
    committed = [f for f in os.listdir(out) if f.startswith("_COMMITTED_")]
    assert len(committed) == 2
    partial = read_extracted(out)

    summary = run_partitioned(
        docs_path, media_path, out, n_buckets=4, concurrency=2
    )
    assert len(summary["skipped"]) == 2  # finished work not redone
    full = read_extracted(out)
    assert len(full) > len(partial)

    # byte-identical to a clean full run
    out2 = str(tmp_path / "out_clean")
    run_partitioned(docs_path, media_path, out2, n_buckets=4, concurrency=2)
    pd.testing.assert_frame_equal(_canon(full), _canon(read_extracted(out2)))
    # per-partition checksums identical between resumed and clean runs
    def marker_sums(d):
        sums = {}
        for f in sorted(os.listdir(d)):
            if f.startswith("_COMMITTED_"):
                with open(os.path.join(d, f)) as fh:
                    rec = json.load(fh)
                sums[rec["partition"]] = rec["checksum"]
        return sums

    assert marker_sums(out) == marker_sums(out2)
