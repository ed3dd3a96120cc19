import duckdb
import pyarrow as pa

from pytorchocr_ray.functions.text_norm import (
    NORMALIZE_SQL,
    normalize_column,
    normalize_text,
)

CASES = [
    ("  hello   world  ", "hello world"),
    ("full（width）： yes！ no？ semi；", "full(width): yes! no? semi;"),
    ("keep ⟪AD buy stuff⟫ none", "keep none"),
    ("⟪x⟫⟪y⟫ab", "ab"),
    ("tabs\t\tand\nnewlines", "tabs and newlines"),
    ("", ""),
    ("   ", ""),
]


def test_scalar_cases():
    for raw, want in CASES:
        assert normalize_text(raw) == want, raw


def test_vectorized_matches_scalar():
    col = pa.array([r for r, _ in CASES])
    out = normalize_column(col).to_pylist()
    assert out == [w for _, w in CASES]


def test_sql_oracle_matches():
    con = duckdb.connect()
    expr = NORMALIZE_SQL.format(col="t")
    for raw, want in CASES:
        got = con.execute(f"select {expr} from (select ? as t)", [raw]).fetchone()[0]
        assert got == want, raw
