"""Deduplication operators (exact, MinHash+LSH, SimHash, embedding cosine).

Scale shapes (ray_guide patterns, re-derived for this engine):
  * exact: vectorized content-hash per batch -> groupby(hash) -> keep the
    min-doc_id row per group (one shuffle over (hash, doc_id) pairs only).
  * MinHash+LSH: shingle->minhash signature per batch (vectorized, one
    matmul-free universal-hash pass) -> explode to (band, band_hash) rows ->
    groupby band bucket -> candidate pairs -> exact-Jaccard verify ->
    connected components -> representative per cluster.
  * SimHash: 64-bit signature per doc; near-dup candidates via 4x16-bit
    band blocking, verified by Hamming distance.
  * embedding cosine: random-hyperplane LSH buckets -> in-bucket cosine
    verify (the brute-force twin lives in ops/simsearch.py).

All hashes are process-stable (pandas hash_array / crc-style mixes), never
Python's salted hash().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import pool_size, read

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_hash(strings: pd.Series) -> np.ndarray:
    return pd.util.hash_array(strings.to_numpy(dtype=object))


def dedup_exact(sf_dir: str):
    """Keep the smallest doc_id per identical ``text`` -> (doc_id, n_chars).

    Shuffle carries only (hash, doc_id, n_chars); the text itself never
    moves. 64-bit collisions are accepted (documented; ~1e-13 at 1e6 docs).
    """
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_stage(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "h": pa.array(_stable_hash(df["text"]).astype(np.int64)),
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(df["text"].str.len().to_numpy(np.int64)),
            }
        )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, "doc_id")

    out = (
        ds.map_batches(hash_stage, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )
    return out.select_columns(["doc_id", "n_chars"])


DEDUP_EXACT_SQL = """
SELECT doc_id, length(text) AS n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


# ---------------------------------------------------------------- MinHash

def _token_ngrams(text: str, n: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


class MinHasher:
    """Stateful map_batches callable: seeded permutation params built once
    per actor (the compile-once pattern of reference ops chains)."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        # vectorize across the whole batch: hash every shingle once, then
        # segmented min per document (np.minimum.reduceat)
        all_sh: list[str] = []
        bounds = [0]
        for t in texts:
            all_sh.extend(_token_ngrams(t, self.ngram))
            bounds.append(len(all_sh))
        n_docs = len(texts)
        num_perm = len(self.a)
        if not all_sh:
            sigs = np.full(
                (n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
            )
        else:
            hs = pd.util.hash_array(np.asarray(all_sh, dtype=object)) % _MERSENNE
            perm = (self.a[:, None] * hs[None, :] + self.b[:, None]) % _MERSENNE
            sigs = np.full(
                (n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
            )
            nonempty = [i for i in range(n_docs) if bounds[i + 1] > bounds[i]]
            if nonempty:
                starts = np.array([bounds[i] for i in nonempty])
                mins = np.minimum.reduceat(perm, starts, axis=1)
                # reduceat segments end at the next start; the final segment
                # runs to the end, matching bounds since trailing empties
                # were excluded
                sigs[np.array(nonempty)] = mins.T
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array(
                    list(sigs.astype(np.int64)), pa.list_(pa.int64())
                ),
            }
        )


def minhash_signatures(sf_dir: str, num_perm: int = 64, ngram: int = 3):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        fn_constructor_kwargs={"num_perm": num_perm, "ngram": ngram},
        concurrency=pool_size(),
    )


def minhash_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.5,
):
    """Near-duplicate pairs via LSH banding, verified with TRUE Jaccard.

    band explode -> groupby(band, band_hash) -> in-bucket pairs -> verify.
    Verification recomputes shingle sets from a broadcast doc->text map
    (fine at sandbox scale; at 100 TB verify joins the two docs' shingle
    sets co-partitioned by pair key instead).
    Returns (doc_a, doc_b, jaccard_pct: int) with doc_a < doc_b.
    """
    import ray

    rows_per_band = num_perm // bands
    salt_bits = 6  # shuffle groups = bands * 2^salt_bits (sized so one
    # map_groups call covers MANY LSH buckets — per-group python-call
    # overhead on ~|docs|*bands tiny buckets was the dominant cost)
    sig_ds = minhash_signatures(sf_dir, num_perm, ngram)

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        sigs = batch["sig"].to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for d, s in zip(doc_ids, sigs):
            arr = np.asarray(s, dtype=np.uint64).reshape(bands, rows_per_band)
            bh = pd.util.hash_array(
                np.array([a.tobytes() for a in arr], dtype=object)
            ).astype(np.int64)
            out_doc.extend([d] * bands)
            out_band.extend(range(bands))
            out_hash.extend(bh.tolist())
        hashes = np.asarray(out_hash, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(hashes),
                "salt": pa.array(
                    (hashes & ((1 << salt_bits) - 1)).astype(np.int32)
                ),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """One (band, salt) group = many LSH buckets; enumerate pairs per
        band_hash vectorized (buckets with >=2 members are rare)."""
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        counts = group["band_hash"].value_counts()
        hot = counts[counts >= 2].index
        if len(hot):
            sub = group[group["band_hash"].isin(hot)]
            for _h, bucket in sub.groupby("band_hash", sort=False):
                ids = np.sort(bucket["doc_id"].to_numpy())
                ii, jj = np.triu_indices(len(ids), 1)
                a_out.append(ids[ii])
                b_out.append(ids[jj])
        if not a_out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame(
            {"doc_a": np.concatenate(a_out), "doc_b": np.concatenate(b_out)}
        )

    cands = (
        sig_ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "salt"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_df = cands.to_pandas().drop_duplicates()
    if cand_df.empty:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_pct": pa.array([], pa.int64()),
            }
        )

    # broadcast ONLY the candidate docs' texts (predicate-pushdown read) —
    # the candidate set is tiny relative to the corpus, so this stays
    # broadcastable at scale where a full-table driver read would not
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    cand_ids = sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"]))
    texts_t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=pads.field("doc_id").isin(cand_ids),
    )
    text_ref = ray.put(
        dict(zip(texts_t["doc_id"].to_pylist(), texts_t["text"].to_pylist()))
    )

    @ray.remote
    def verify(pairs: pd.DataFrame) -> pd.DataFrame:
        texts = ray.get(text_ref)
        rows = []
        for r in pairs.itertuples():
            sa = set(_token_ngrams(texts[r.doc_a], ngram))
            sb = set(_token_ngrams(texts[r.doc_b], ngram))
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                rows.append((r.doc_a, r.doc_b, int(round(j * 100))))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pct"])

    step = 500
    chunks = [cand_df.iloc[i : i + step] for i in range(0, len(cand_df), step)]
    parts = ray.get([verify.remote(c) for c in chunks if len(c)])
    out = (
        pd.concat(parts, ignore_index=True)
        if parts
        else pd.DataFrame(columns=["doc_a", "doc_b", "jaccard_pct"])
    )
    out = out.drop_duplicates().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out.astype({"doc_a": np.int64, "doc_b": np.int64, "jaccard_pct": np.int64}),
        preserve_index=False,
    )


# ---------------------------------------------------------------- SimHash

class SimHasher:
    def __init__(self, seed: int = 11):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = np.asarray(t.split(), dtype=object)
            if toks.size == 0:
                continue
            hs = pd.util.hash_array(toks)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            out[i] = (
                (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            ).sum(dtype=np.uint64)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out.astype(np.int64))}
        )


def simhash_signatures(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=pool_size())


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: 4x16-bit band blocking then Hamming verify.
    Two signatures within Hamming<=3 share at least one of 4 bands exactly."""
    sig = simhash_signatures(sf_dir).to_pandas()
    h = sig["simhash"].to_numpy(np.uint64)
    ids = sig["doc_id"].to_numpy(np.int64)
    pairs = set()
    for band in range(4):
        key = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": key, "i": np.arange(len(ids))})
        for _k, g in df.groupby("k"):
            idx = g["i"].to_numpy()
            if len(idx) < 2:
                continue
            for x in range(len(idx)):
                for y in range(x + 1, len(idx)):
                    i, j = idx[x], idx[y]
                    ham = bin(int(h[i]) ^ int(h[j])).count("1")
                    if ham <= max_hamming:
                        a, b = sorted((int(ids[i]), int(ids[j])))
                        pairs.add((a, b, ham))
    out = pd.DataFrame(sorted(pairs), columns=["doc_a", "doc_b", "hamming"])
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------- embedding near-dup (LSH)

def embedding_neardup(sf_dir: str, threshold: float = 0.92, planes: int = 12, seed: int = 5):
    """Cosine near-dup pairs over ``embeddings`` via random-hyperplane LSH
    buckets + in-bucket exact verify. Returns (vec_a, vec_b, cos_pct)."""
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def stage(batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        # seeded hyperplanes rebuilt per task — tiny (dim x planes) and
        # deterministic, cheaper than broadcasting
        h = np.random.default_rng(seed).standard_normal((emb.shape[1], planes))
        bits = (emb @ h) > 0
        key = bits @ (1 << np.arange(planes))
        norm = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(key.astype(np.int64)),
                "nvec": pa.array(list(norm), pa.list_(pa.float64())),
            }
        )

    def in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_pct": []})
        ids = group["vec_id"].to_numpy()
        vecs = np.asarray(group["nvec"].tolist(), dtype=np.float64)
        sims = vecs @ vecs.T
        ii, jj = np.triu_indices(len(ids), k=1)
        mask = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids[ii[mask]], ids[jj[mask]]),
                "vec_b": np.maximum(ids[ii[mask]], ids[jj[mask]]),
                "cos_pct": np.round(sims[ii, jj][mask] * 100).astype(np.int64),
            }
        )

    out = (
        ds.map_batches(stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "vec_a" not in out.columns:
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cos_pct": pa.array([], pa.int64()),
            }
        )
    out = out.drop_duplicates(["vec_a", "vec_b"]).sort_values(["vec_a", "vec_b"])
    return pa.Table.from_pandas(
        out.astype({"vec_a": np.int64, "vec_b": np.int64, "cos_pct": np.int64}),
        preserve_index=False,
    )
