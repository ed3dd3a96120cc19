"""Image perceptual-hash dedup: engine-vs-independent-oracle kernel
parity, SQL-twin parity on planted duplicates, and edge cases."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pytorchocr_ray.ops.imagededup import (
    DHASH_EMPTY,
    _oracle_dhash,
    dhash_gray,
    image_dhash_dups,
    image_dhash_dups_sql,
)


def test_dhash_kernel_matches_independent_oracle():
    """The vectorized reduceat kernel and the integral-image scalar
    oracle agree bit-for-bit across sizes, including non-divisible
    dimensions and flat / gradient / random content."""
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, (h, w), dtype=np.uint8)
        for h, w in [(8, 9), (96, 128), (97, 131), (288, 416), (10, 300)]
    ]
    cases.append(np.full((64, 64), 200, dtype=np.uint8))  # flat -> 0 bits
    cases.append(np.tile(np.arange(90, dtype=np.uint8), (40, 1)))  # gradient
    for img in cases:
        assert dhash_gray(img) == _oracle_dhash(img), img.shape
    assert dhash_gray(np.full((64, 64), 200, dtype=np.uint8)) == 0


def test_dhash_sub_grid_sentinel():
    tiny = np.zeros((4, 4), dtype=np.uint8)
    assert dhash_gray(tiny) == DHASH_EMPTY
    assert _oracle_dhash(tiny) == DHASH_EMPTY


def test_dhash_negative_int64_view():
    """An image bright on the left of every pair sets bit 63 -> the
    int64 two's-complement view must go negative identically on both
    sides (the parquet/SQL carrier type is int64)."""
    img = np.tile(np.repeat(np.arange(9, 0, -1, dtype=np.uint8) * 20, 16), (32, 1))
    e, o = dhash_gray(img), _oracle_dhash(img)
    assert e == o
    assert e < 0  # all-ones hash is -1 in int64


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    """Small media table with PLANTED byte-duplicates (the synthetic
    corpus has none): imgs 0 and 3 share a payload, 1/4/5 share another."""
    from pytorchocr_ray.functions.png import encode_gray

    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (48, 64), dtype=np.uint8) for _ in range(6)]
    imgs[3] = imgs[0].copy()
    imgs[4] = imgs[1].copy()
    imgs[5] = imgs[1].copy()
    pq.write_table(
        pa.table(
            {
                "media_ref": pa.array([f"img-{i:02d}" for i in range(6)]),
                "data": pa.array([encode_gray(im) for im in imgs], pa.binary()),
            }
        ),
        os.path.join(str(d), "part-0.parquet"),
    )
    return str(d)


def test_image_dhash_dups_parity_and_groups(ray_session, media_dir):
    e = (
        image_dhash_dups(media_dir, concurrency=2)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    o = (
        con.sql(image_dhash_dups_sql(media_dir))
        .df()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    for col in ("media_ref", "dhash", "group_n", "is_dup"):
        assert e[col].tolist() == o[col].tolist(), col
    r = e.set_index("media_ref")
    # keep-first rule on the planted groups
    assert r.loc["img-00", "is_dup"] == 0 and r.loc["img-03", "is_dup"] == 1
    assert r.loc["img-00", "group_n"] == 2
    assert r.loc["img-01", "is_dup"] == 0
    assert r.loc["img-04", "is_dup"] == 1 and r.loc["img-05", "is_dup"] == 1
    assert r.loc["img-01", "group_n"] == 3
    assert r.loc["img-02", "group_n"] == 1 and r.loc["img-02", "is_dup"] == 0
