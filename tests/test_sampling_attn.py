import numpy as np


def test_attn_decode_stops_at_eos():
    from pytorchocr_ray.functions.charset import CHARSET
    from pytorchocr_ray.functions.ctc import ATTN_EOS, ATTN_SOS, attn_greedy_decode

    C = len(CHARSET) + 2
    T = 6

    def probs(seq):
        p = np.full((len(seq), C), 0.01, dtype=np.float32)
        for t, i in enumerate(seq):
            p[t, i] = 0.9
        return p

    a = CHARSET.index("a") + 1
    b = CHARSET.index("b") + 1
    text, conf = attn_greedy_decode(probs([ATTN_SOS, a, b, ATTN_EOS, a]))
    assert text == "ab"  # sos skipped, stops at eos, trailing ignored
    assert abs(conf - 0.9) < 1e-6
    text2, conf2 = attn_greedy_decode(probs([ATTN_EOS]))
    assert text2 == "" and conf2 == 0.0
    # adjacent repeats are KEPT (no CTC dedupe in attention decode)
    text3, _ = attn_greedy_decode(probs([a, a, ATTN_EOS]))
    assert text3 == "aa"


def test_sampling_wrappers(ray_session):
    import ray.data as rd

    from pytorchocr_ray.ops.sampling import sample_ratio, seeded_shuffle, train_val_split

    ds = rd.range(1000)
    s = sample_ratio(ds, 0.2, seed=7)
    n = s.count()
    assert 100 < n < 320  # Bernoulli around 200
    # seeded -> reproducible
    assert sample_ratio(rd.range(1000), 0.2, seed=7).count() == n

    tr, va = train_val_split(rd.range(100), val_ratio=0.25, seed=3)
    assert tr.count() == 75 and va.count() == 25
    ids = sorted(tr.to_pandas()["id"]) + sorted(va.to_pandas()["id"])
    assert sorted(ids) == list(range(100))

    sh = seeded_shuffle(rd.range(50), seed=1).to_pandas()["id"].tolist()
    assert sorted(sh) == list(range(50)) and sh != list(range(50))


def test_weighted_sample_parity_and_bias(ray_session):
    """Priority-sample parity vs DuckDB on real testdata, plus the
    property that justifies the op: the weighted draw skews toward
    longer documents (sample mean n_chars > corpus mean)."""
    import duckdb
    import pandas as pd

    from pytorchocr_ray.ops.sampling import weighted_sample, weighted_sample_sql

    sf = "/root/testdata/sf0.001"
    c = duckdb.connect()
    c.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    e = weighted_sample(sf).to_pandas().sort_values("rank").reset_index(drop=True)
    o = c.sql(weighted_sample_sql()).df()
    pd.testing.assert_frame_equal(
        e, o[e.columns].sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )
    mean_all = c.sql("SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert e["n_chars"].mean() > mean_all
    # deterministic: a second run is identical
    e2 = weighted_sample(sf).to_pandas().sort_values("rank").reset_index(drop=True)
    assert e.equals(e2)
