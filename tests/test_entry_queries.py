"""Mirrors the driver's CORRECTNESS gate: run every queries() entry at
sf0.001 and compare SQL-oracled ones against DuckDB (row count + schema +
order-insensitive values)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df


def test_all_sql_oracled_queries_match(ray_session, con):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # sf_dir must match the queries' sf_dir (the oracle contract): the
    # fixture-backed twins — extraction ground truth, IVF centroid table,
    # LSH plane count — are derived from it
    sqls = entrymod.oracle_sql(SF_DIR)
    failures = []
    for name, sql in sqls.items():
        got = _canon(_to_df(qs[name](SF_DIR)))
        want = _canon(con.execute(sql).fetchdf())
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
        except AssertionError as e:
            failures.append((name, str(e).splitlines()[0], len(got), len(want)))
    assert not failures, failures


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = set(entrymod.oracle_sql())
    for name, fn in qs.items():
        if name in sqls or name.startswith("extract"):
            continue
        df = _to_df(fn(SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "order", "kind", "text", "media_ref"}
