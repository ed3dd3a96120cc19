"""Operator-quality tests for the dedup / simsearch family on crafted
corpora with KNOWN near-duplicates (the testdata has none)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crafted")
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, 60)))
    # near-dups: 40..44 are light edits of 0..4 (drop 2 words)
    for i in range(5):
        toks = texts[i].split()
        del toks[7]
        del toks[23]
        texts.append(" ".join(toks))
    # exact dups: 45..46 duplicate 10, 11
    texts.append(texts[10])
    texts.append(texts[11])
    doc_ids = list(range(len(texts)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    # embeddings: 30 random + 3 near-dup pairs
    dim = 16
    base = rng.standard_normal((30, dim))
    rows = [base]
    for i in range(3):
        rows.append(base[i : i + 1] + 0.01 * rng.standard_normal((1, dim)))
    emb = np.vstack(rows)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(emb)), pa.int64()),
                "embedding": pa.array([list(map(float, e)) for e in emb], pa.list_(pa.float32())),
                "label": pa.array(np.zeros(len(emb), dtype=np.int32)),
            }
        ),
        os.path.join(str(d), "embeddings.parquet"),
    )
    return str(d)


def test_dedup_exact_removes_duplicates(ray_session, crafted_dir):
    from pytorchocr_ray.ops.dedup import dedup_exact

    df = dedup_exact(crafted_dir).to_pandas()
    assert len(df) == 45  # 47 docs, 2 exact dups removed
    assert 45 not in df["doc_id"].values and 46 not in df["doc_id"].values
    assert 10 in df["doc_id"].values and 11 in df["doc_id"].values


def test_minhash_finds_neardups(ray_session, crafted_dir):
    from pytorchocr_ray.ops.dedup import minhash_pairs

    pairs = minhash_pairs(crafted_dir, threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    for i in range(5):
        assert (i, 40 + i) in found, f"missing near-dup pair {(i, 40+i)}"
    # exact dups are jaccard 1.0
    assert (10, 45) in found and (11, 46) in found
    # no massive false-positive blowup
    assert len(found) < 30


def test_simhash_finds_exact_dups(ray_session, crafted_dir):
    from pytorchocr_ray.ops.dedup import simhash_pairs

    pairs = simhash_pairs(crafted_dir, max_hamming=6).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (10, 45) in found and (11, 46) in found  # hamming 0


def test_embedding_neardup_finds_planted_pairs(ray_session, crafted_dir):
    from pytorchocr_ray.ops.dedup import embedding_neardup

    pairs = embedding_neardup(crafted_dir, threshold=0.98).to_pandas()
    found = set(zip(pairs["vec_a"], pairs["vec_b"]))
    for i in range(3):
        assert (i, 30 + i) in found


def test_ivf_recall_vs_bruteforce(ray_session, crafted_dir):
    from pytorchocr_ray.ops.simsearch import topk_bruteforce, topk_ivf

    exact = topk_bruteforce(crafted_dir, k=3, nq=4).to_pandas()
    approx = topk_ivf(crafted_dir, k=3, nq=4, n_centroids=4, nprobe=3).to_pandas()
    e = set(zip(exact["query_id"], exact["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.75, recall


def test_fingerprint_stable_and_distinct(ray_session, crafted_dir):
    from pytorchocr_ray.ops.textstats import fingerprint

    f1 = fingerprint(crafted_dir).to_pandas().sort_values("doc_id")
    f2 = fingerprint(crafted_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(f1.reset_index(drop=True), f2.reset_index(drop=True))
    fp = dict(zip(f1["doc_id"], f1["fp"]))
    assert fp[10] == fp[45] and fp[11] == fp[46]  # exact dups share fp
    assert fp[0] != fp[40]  # edits change fp
