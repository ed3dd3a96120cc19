"""Similarity search over the ``embeddings`` table (list<float> column).

* :func:`topk_bruteforce` — the exact baseline: the (tiny) query matrix is
  broadcast via ``ray.put``; every batch does ONE numpy matmul against it and
  emits only its local top-k per query (partial top-k), so the shuffle to the
  final per-query merge carries k rows per (query, batch) instead of the
  whole score matrix.
* :func:`topk_ivf` — the scale path: vectors are bucketed by nearest of C
  seeded centroids (an IVF coarse quantizer); queries probe the ``nprobe``
  nearest centroid buckets only. Recall vs the brute-force baseline is
  asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import read


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)


def _load_queries(sf_dir: str, nq: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    # predicate pushdown: only the nq query vectors leave storage
    # (vec_ids are dense 0..n-1 in this corpus; a sparse-id table would
    # need a two-pass min-k instead)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", nq)],
    )
    df = t.to_pandas().sort_values("vec_id").head(nq)
    q = _normalize(np.asarray(df["embedding"].tolist(), dtype=np.float64))
    return df["vec_id"].to_numpy(np.int64), q


def topk_bruteforce(sf_dir: str, k: int = 5, nq: int = 8):
    """Exact cosine top-k for the first ``nq`` vectors as queries.

    Returns (query_id, vec_id, rank) — integer-only for stable comparison;
    ordering ties broken by vec_id ascending (same rule in the SQL oracle).
    """
    import ray

    qids, qmat = _load_queries(sf_dir, nq)
    q_ref = ray.put((qids, qmat))
    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, q = ray.get(q_ref)
        emb = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = q @ emb.T  # (nq, B)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(ids)):
            s = sims[qi]
            idx = np.lexsort((vids, -s))[:kk]
            out_q.extend([ids[qi]] * len(idx))
            out_v.extend(vids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def topk_bruteforce_sql(k: int = 5, nq: int = 8) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {nq}
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (
            PARTITION BY query_id
            ORDER BY list_cosine_similarity(qe, e.embedding) DESC, vec_id ASC
       ) AS BIGINT) AS rank
FROM q CROSS JOIN embeddings e
QUALIFY rank <= {k}
"""


def topk_ivf(
    sf_dir: str, k: int = 5, nq: int = 8, n_centroids: int = 16, nprobe: int = 4, seed: int = 3
):
    """IVF-style ANN: coarse-quantize vectors to seeded random centroids,
    search only the query's ``nprobe`` nearest buckets."""
    import ray
    import pyarrow.parquet as pq

    qids, qmat = _load_queries(sf_dir, nq)
    # seeded centroids from a bounded HEAD SAMPLE of the table (first row
    # group), never a full-table driver read — at 100 TB the coarse
    # quantizer trains on a sample by definition
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    head = pf.read_row_group(0, columns=["embedding"])
    sample = _normalize(np.asarray(head["embedding"].to_pylist(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(sample), min(n_centroids, len(sample)), replace=False)
    cent = _normalize(sample[pick])
    state = ray.put((qids, qmat, cent))

    ds = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign_and_score(batch: pa.Table) -> pa.Table:
        ids, q, c = ray.get(state)
        emb = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        vb = (emb @ c.T).argmax(axis=1)  # vector -> bucket
        probe = np.argsort(-(q @ c.T), axis=1)[:, :nprobe]  # query -> buckets
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids)):
            mask = np.isin(vb, probe[qi])
            if not mask.any():
                continue
            s = q[qi] @ emb[mask].T
            sub_ids = vids[mask]
            idx = np.lexsort((sub_ids, -s))[: min(k, len(sub_ids))]
            out_q.extend([ids[qi]] * len(idx))
            out_v.extend(sub_ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return (
        ds.map_batches(assign_and_score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )
