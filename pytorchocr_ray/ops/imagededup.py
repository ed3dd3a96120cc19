"""Image near-duplicate detection via perceptual difference-hash (dHash).

The multimodal twin of the text dedup family (``ops/dedup.py``): every
media payload (grayscale PNG) is reduced to a 64-bit dHash — an 8x8 grid
of left-vs-right block-brightness comparisons over a 8-row x 9-column
block-mean downscale — then (a) exact-hash groups are flagged with the
keep-first rule (:func:`image_dhash_dups`, like ``dedup_exact``) and
(b) NEAR-duplicate pairs at Hamming 1..3 are found by 16-bit LSH banding
(:func:`image_dhash_near`, like ``simhash_pairs``).

Determinism / parity: the downscale uses integer block SUMS and the
brightness comparison is the cross-multiplied integer inequality
``sum_l * area_r > sum_r * area_l`` (no float division anywhere), so two
independent implementations agree bit-for-bit.  The SQL twin reads a
fixture parquet of per-image hashes computed by an INDEPENDENT
single-process oracle (integral-image corner arithmetic + Python-int
compares, :func:`_oracle_dhash`) — the same fixture pattern as the
extraction ground truth and the IVF centroid tables — and performs the
duplicate grouping in SQL; a hash-verified match therefore checks BOTH
the engine's decode+hash kernel against the oracle's and the distributed
grouping against SQL semantics.

Scale shape: decode+hash is an actor-pool ``map_batches`` over the
sharded media table (payload bytes never shuffle); the only exchange is
the groupby on the 8-byte hash.  The synthetic corpus has no planted
byte-duplicates, so on testdata the groups are singletons (the kernel
parity is the verified substance there); the grouping logic is exercised
by the planted-duplicate unit test.

No reference analog: the reference has no dedup at all (SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DHASH_ROWS = 8
DHASH_COLS = 9  # 8 comparisons per row -> 64 bits
_MIN_H, _MIN_W = DHASH_ROWS, DHASH_COLS
DHASH_EMPTY = -1  # sentinel for undecodable / sub-grid images (both sides)


def _bounds(n: int, parts: int) -> np.ndarray:
    """Integer block boundaries [floor(i*n/parts) for i in 0..parts]."""
    return (np.arange(parts + 1, dtype=np.int64) * n) // parts


def dhash_gray(img: np.ndarray) -> int:
    """Engine kernel: vectorized 64-bit dHash of a uint8 grayscale image.

    Two ``np.add.reduceat`` passes produce the 8x9 block-sum grid; the
    bit for (row i, cols j|j+1) is the exact integer cross-multiply
    ``sum_l * area_r > sum_r * area_l`` (area-weighted mean compare with
    no division).  Images smaller than the grid hash to DHASH_EMPTY.
    """
    h, w = img.shape
    if h < _MIN_H or w < _MIN_W:
        return DHASH_EMPTY
    rb = _bounds(h, DHASH_ROWS)
    cb = _bounds(w, DHASH_COLS)
    rs = np.add.reduceat(img.astype(np.int64), rb[:-1], axis=0)
    cs = np.add.reduceat(rs, cb[:-1], axis=1)  # (8, 9) block sums
    areas = np.outer(np.diff(rb), np.diff(cb))  # (8, 9) block pixel counts
    left = cs[:, :-1] * areas[:, 1:]
    right = cs[:, 1:] * areas[:, :-1]
    bits = (left > right).reshape(-1)
    val = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        dtype=np.uint64
    )
    return int(val.view(np.int64))  # two's-complement int64 view


def _oracle_dhash(img: np.ndarray) -> int:
    """Independent single-process twin of :func:`dhash_gray`: block sums
    from an INTEGRAL IMAGE (2-D prefix sum + four-corner arithmetic) and
    per-bit Python-int cross-multiplies — a different algorithm arriving
    at the same exact integers."""
    h, w = img.shape
    if h < _MIN_H or w < _MIN_W:
        return DHASH_EMPTY
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.int64), axis=0), axis=1)
    rb = [(i * h) // DHASH_ROWS for i in range(DHASH_ROWS + 1)]
    cb = [(j * w) // DHASH_COLS for j in range(DHASH_COLS + 1)]

    def cell(i: int, j: int) -> tuple[int, int]:
        r0, r1, c0, c1 = rb[i], rb[i + 1], cb[j], cb[j + 1]
        s = int(ii[r1, c1]) - int(ii[r0, c1]) - int(ii[r1, c0]) + int(ii[r0, c0])
        return s, (r1 - r0) * (c1 - c0)

    val = 0
    bit = 0
    for i in range(DHASH_ROWS):
        for j in range(DHASH_COLS - 1):
            sl, al = cell(i, j)
            sr, ar = cell(i, j + 1)
            if sl * ar > sr * al:
                val |= 1 << bit
            bit += 1
    if val >= 1 << 63:
        val -= 1 << 64  # int64 two's-complement view, matching the engine
    return val


def _media_files(media_dir: str) -> list[str]:
    import os

    if os.path.isfile(media_dir):
        return [media_dir]
    return [
        os.path.join(media_dir, f)
        for f in sorted(os.listdir(media_dir))
        if f.endswith(".parquet")
    ]


def oracle_dhash_fixture(media_dir: str) -> str:
    """Run the independent oracle over the media table -> fixture parquet
    (media_ref, dhash), cached under /tmp keyed by module source + a
    content signature of the media files (size+mtime — auto-busts on
    regeneration, per ADVICE r4 on the IVF cache)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    files = _media_files(media_dir)
    sig = "|".join(
        f"{os.path.basename(f)}:{os.path.getsize(f)}:{os.stat(f).st_mtime_ns}"
        for f in files
    )
    src = hashlib.sha256(open(os.path.abspath(__file__), "rb").read()).hexdigest()[:12]
    tag = hashlib.sha256(f"{os.path.abspath(media_dir)}|{sig}|{src}".encode()).hexdigest()[:16]
    out_dir = os.path.join("/tmp", "pytorchocr_dhash", tag)
    path = os.path.join(out_dir, "dhash.parquet")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return path

    from ..functions.png import decode_gray

    refs: list[str] = []
    hashes: list[int] = []
    for f in files:
        t = pq.read_table(f, columns=["media_ref", "data"])
        for ref, data in zip(t["media_ref"].to_pylist(), t["data"].to_pylist()):
            img = decode_gray(data)
            refs.append(ref)
            hashes.append(DHASH_EMPTY if img is None else _oracle_dhash(img))
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({"media_ref": pa.array(refs), "dhash": pa.array(hashes, pa.int64())}),
        tmp,
    )
    os.replace(tmp, path)
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    return path


class DHashStage:
    """Actor-pool decode+hash stage: PNG decoder state is trivial, but the
    actor form keeps the fat payload batches off the task-submission path
    and matches the OcrStage deployment shape (batch in -> per-image
    decode, vectorized hash kernel per image)."""

    def __init__(self) -> None:
        from ..functions.png import decode_gray

        self._decode = decode_gray

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        out = np.empty(len(refs), dtype=np.int64)
        for i, data in enumerate(batch["data"].to_pylist()):
            img = self._decode(data)
            out[i] = DHASH_EMPTY if img is None else dhash_gray(img)
        return pa.table(
            {"media_ref": pa.array(refs), "dhash": pa.array(out)}
        )


def image_dhash(
    media_dir: str, concurrency: int | None = None, batch_size: int = 64
):
    """(media_ref, dhash) over a media parquet table/dir — the hash pass
    alone (no shuffle).  Default pool size leaves CPUs for the read stage
    (a pool holding EVERY cpu starves the upstream tasks and stalls the
    streaming executor — observed as a livelock in a 4-cpu session)."""
    import ray.data as rd

    from . import pool_size

    ds = rd.read_parquet(_media_files(media_dir))
    return ds.map_batches(
        DHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_size(cap=32),
    )


def image_dhash_dups(media_dir: str, concurrency: int | None = None):
    """(media_ref, dhash, group_n, is_dup): exact-dHash duplicate groups
    with the keep-first rule (lowest media_ref is the retained
    representative).  One groupby exchange carrying 8-byte keys."""
    import pandas as pd

    def mark(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("media_ref").reset_index(drop=True)
        g["group_n"] = np.int64(len(g))
        g["is_dup"] = (np.arange(len(g)) > 0).astype(np.int64)
        return g[["media_ref", "dhash", "group_n", "is_dup"]]

    return (
        image_dhash(media_dir, concurrency=concurrency)
        .groupby("dhash")
        .map_groups(mark, batch_format="pandas")
    )


def image_dhash_dups_sql(media_dir: str) -> str:
    """DuckDB twin: the independent oracle's per-image hashes (fixture
    parquet) + SQL window grouping."""
    path = oracle_dhash_fixture(media_dir)
    return f"""
SELECT media_ref, dhash,
       CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS group_n,
       CAST(row_number() OVER (PARTITION BY dhash ORDER BY media_ref) > 1
            AS BIGINT) AS is_dup
FROM read_parquet('{path}')
"""


# ------------------------------------------------ near-dup (Hamming band)
#
# Perceptual NEAR-duplicate FLAGS: an image is a near-dup when another
# image with a SMALLER media_ref sits within Hamming 1..max_hamming on
# the 64-bit dHash (hamming 0 == perceptual-identical is
# image_dhash_dups' answer and is EXCLUDED here; the smallest ref of a
# near set is its retained representative — the keep-first rule used by
# every dedup op in this engine).  LSH banding: 4 bands of 16 bits — any
# pair within hamming <= 3 agrees exactly on >= 1 band (pigeonhole), so
# banding has full recall at the threshold.
#
# Output is ONE ROW PER IMAGE, not pairs: measured on the synthetic
# corpus, raw pair output is quadratic (1795 images -> 545k pairs at
# hamming <= 3 — glyph renders produce low-entropy hashes), which at
# 10^8 images is an output-mass explosion no matter how the enumeration
# is bounded.  Flags keep the result linear while the in-bucket work
# stays bounded by the guards below.
#
# dHash bands on structured images are HEAVILY skewed (75% of the
# synthetic corpus shares one band-3 key: near-uniform bottom image rows
# all compare equal), so in-bucket enumeration needs two guards, both
# SQL-mirrored exactly:
#   1. a (band, key) bucket over ``bucket_cap`` is split by the 16 bits
#      of the complementary band ((b+2) % 4) — same recall caveat as
#      simhash_pairs (a <= max_hamming pair survives unless its
#      differing bits hit the complement of every agreeing band);
#   2. a (band, key, key2) bucket STILL over the cap is dropped and
#      counted (the n-gram df-cap precedent): these are degenerate
#      perceptual pileups (near-flat images) whose quadratic pair mass
#      is spam you'd prune upstream at web scale; the skip is logged.

NEAR_BANDS = 4
NEAR_BAND_BITS = 16
NEAR_BUCKET_CAP = 4096


def image_dhash_near(
    media_dir: str,
    max_hamming: int = 3,
    bucket_cap: int = NEAR_BUCKET_CAP,
    concurrency: int | None = None,
):
    """(media_ref, dhash, near_dup): near_dup = 1 iff another image with
    a smaller media_ref sits within Hamming 1..max_hamming (see module
    note — flags, not pairs, keep the output linear).  Undecodable /
    sub-grid images (dhash == DHASH_EMPTY) are excluded.  One
    band-exploded groupby whose rows are <= ~40 bytes; payload bytes
    never shuffle; the per-image cross-band union is a second salted
    co-partition (int key) with a pandas C-level groupby inside."""
    import logging

    import pandas as pd
    import ray

    from .dedup import _auto_salts

    # materialize the (media_ref, dhash) table ONCE: it is consumed twice
    # (hot-bucket pre-pass + band explode) and re-deriving it would decode
    # every payload a second time — the decode dominates the op.  The
    # materialized table is ~40 bytes/row with NO payload bytes (4 GB at
    # 10^8 images, spread across the object store), so this is a bounded
    # materialize, not a corpus one.
    hashes = image_dhash(media_dir, concurrency=concurrency).materialize()
    mask16 = np.int64((1 << NEAR_BAND_BITS) - 1)
    n_salts = _auto_salts()

    def _keys(h: np.ndarray) -> np.ndarray:
        # arithmetic shift + mask extracts bits [16b, 16b+16) exactly as
        # DuckDB's (dhash >> lo) & 65535 (parity-checked on negatives)
        return np.stack(
            [(h >> np.int64(16 * b)) & mask16 for b in range(NEAR_BANDS)],
            axis=1,
        )

    # hot-bucket pre-pass: (band, key) histogram, bounded by the key
    # space (4 x 2^16 rows max) regardless of corpus size
    def key_counts(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["dhash"].to_pylist(), dtype=np.int64)
        h = h[h != DHASH_EMPTY]
        keys = _keys(h)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "band": np.tile(
                        np.arange(NEAR_BANDS, dtype=np.int64), len(h)
                    ),
                    "key": keys.reshape(-1),
                }
            )
            .groupby(["band", "key"], as_index=False)
            .size()
            .rename(columns={"size": "c"}),
            preserve_index=False,
        )

    cnt = (
        hashes.map_batches(key_counts, batch_format="pyarrow")
        .groupby(["band", "key"])
        .sum("c")
        .to_pandas()
    )
    over = cnt[cnt["sum(c)"] > bucket_cap]
    hot_by_band = {
        int(b): np.asarray(sorted(g["key"].astype(int)), dtype=np.int64)
        for b, g in over.groupby("band")
    }
    if hot_by_band:
        logging.getLogger(__name__).info(
            "image_dhash_near: splitting %d hot (band, key) buckets",
            sum(len(v) for v in hot_by_band.values()),
        )
    hot_ref = ray.put(hot_by_band)

    def explode(batch: pa.Table) -> pa.Table:
        refs = np.asarray(batch["media_ref"].to_pylist(), dtype=object)
        h = np.asarray(batch["dhash"].to_pylist(), dtype=np.int64)
        keep = h != DHASH_EMPTY
        refs, h = refs[keep], h[keep]
        n = len(h)
        keys = _keys(h)
        hot_ = ray.get(hot_ref)
        key2 = np.zeros((n, NEAR_BANDS), dtype=np.int64)
        for b in range(NEAR_BANDS):
            hk = hot_.get(b)
            if hk is None:
                continue
            sub = (h >> np.int64(16 * ((b + 2) % NEAR_BANDS))) & mask16
            is_hot = np.isin(keys[:, b], hk)
            key2[is_hot, b] = sub[is_hot]
        band = np.tile(np.arange(NEAR_BANDS, dtype=np.int64), n)
        key = keys.reshape(-1)
        k2 = key2.reshape(-1)
        # salt = deterministic mix of the bucket id; the exchange groups
        # on the SALT ONLY (a whole (band, key, key2) bucket maps to one
        # salt), so the shuffle produces ~2 groups per CPU instead of one
        # Ray group per bucket — per-bucket work happens vectorized
        # inside the salt group (the _verify_jaccard co-partition trick)
        salt = (
            (key.view(np.uint64) * np.uint64(0x9E3779B1))
            ^ (k2.view(np.uint64) * np.uint64(0x85EBCA77))
            ^ band.view(np.uint64)
        ) & np.uint64(n_salts - 1)
        return pa.table(
            {
                "salt": pa.array(salt.view(np.int64)),
                "band": pa.array(band),
                "key": pa.array(key),
                "key2": pa.array(k2),
                "media_ref": pa.array(np.repeat(refs, NEAR_BANDS).tolist()),
                "dhash": pa.array(np.repeat(h, NEAR_BANDS)),
            }
        )

    def salt_flags(group: pd.DataFrame) -> pd.DataFrame:
        """All buckets of one salt: sort by (bucket, media_ref), find
        segment boundaries, then per multi-member segment compute flags
        over the UNIQUE hash values only — a row is flagged iff some
        near (hamming 1..max) VALUE has an earlier min-ref, so identical
        hashes (the dominant mass in a perceptual-hash pileup: at sf0.1
        ~3 images share each hash) collapse before the quadratic
        XOR-popcount, turning n^2 per bucket into U^2 (semantics
        unchanged: hamming 0 is excluded either way).  This kernel cut
        the sf0.1 reading ~5x."""
        from .dedup import _popcount32

        g = group.sort_values(
            ["band", "key", "key2", "media_ref"], kind="stable"
        )
        band = g["band"].to_numpy(np.int64)
        key = g["key"].to_numpy(np.int64)
        key2 = g["key2"].to_numpy(np.int64)
        refs = g["media_ref"].to_numpy(object)
        h = g["dhash"].to_numpy(np.int64)
        n = len(g)
        flags = np.zeros(n, dtype=np.int64)
        if n:
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (
                (band[1:] != band[:-1])
                | (key[1:] != key[:-1])
                | (key2[1:] != key2[:-1])
            )
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                m = e - s
                if m <= 1:
                    continue
                if m > bucket_cap:  # guard 2: degenerate pileup
                    logging.getLogger(__name__).info(
                        "image_dhash_near: dropping degenerate bucket "
                        "of %d images",
                        m,
                    )
                    continue
                hs = h[s:e]
                # rows are ref-sorted, so np.unique's first-occurrence
                # index IS the min-ref position of each value
                uh, first_pos = np.unique(hs, return_index=True)
                u = len(uh)
                if u <= 1:
                    continue  # all identical: hamming 0 only, no flags
                inv = np.searchsorted(uh, hs)
                uu = uh.view(np.uint64)
                near_min = np.full(u, m, dtype=np.int64)
                for lo in range(0, u, 1024):
                    hi = min(lo + 1024, u)
                    x = uu[lo:hi, None] ^ uu[None, :]
                    ham = _popcount32(
                        (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                    ) + _popcount32((x >> np.uint64(32)).astype(np.uint32))
                    fp = np.where(
                        (ham >= 1) & (ham <= max_hamming),
                        first_pos[None, :],
                        m,
                    )
                    near_min[lo:hi] = fp.min(axis=1)
                # flagged iff a near value's min-ref row precedes this row
                flags[s:e] = np.maximum(
                    flags[s:e],
                    (np.arange(m, dtype=np.int64) > near_min[inv]).astype(
                        np.int64
                    ),
                )
        from .hashing import poly_hash_strings

        # route the cross-band union through an INT salt of media_ref:
        # Ray's sort aggregate on a string key measured 21 s of a 30 s
        # sf0.1 run; the salted co-partition + pandas C-level groupby
        # does the same union in ~1 s
        rsalt = (
            poly_hash_strings([str(r) for r in refs]).view(np.int64)
            & np.int64(n_salts - 1)
        )
        return pd.DataFrame(
            {"rsalt": rsalt, "media_ref": refs, "dhash": h,
             "near_dup": flags}
        )

    def union_flags(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.groupby("media_ref", as_index=False)
            .agg(dhash=("dhash", "min"), near_dup=("near_dup", "max"))
        )
        return g[["media_ref", "dhash", "near_dup"]]

    # union across bands: flagged anywhere -> flagged (dhash is constant
    # per ref, min keeps it verbatim)
    return (
        hashes.map_batches(explode, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(salt_flags, batch_format="pandas")
        .groupby("rsalt")
        .map_groups(union_flags, batch_format="pandas")
    )


def image_dhash_near_sql(
    media_dir: str,
    max_hamming: int = 3,
    bucket_cap: int = NEAR_BUCKET_CAP,
) -> str:
    """DuckDB twin over the independent-oracle fixture hashes, mirroring
    BOTH hot-bucket guards via window counts and the keep-first flag via
    a banded self-join EXISTS."""
    path = oracle_dhash_fixture(media_dir)
    band_rows = ", ".join(
        f"({b}, {16 * b}, {16 * ((b + 2) % NEAR_BANDS)})"
        for b in range(NEAR_BANDS)
    )
    return f"""
WITH h AS (SELECT media_ref, dhash FROM read_parquet('{path}')
           WHERE dhash != {DHASH_EMPTY}),
bands(band, lo, lo2) AS (VALUES {band_rows}),
b0 AS (SELECT media_ref, dhash, band, lo2,
              (dhash >> lo) & 65535 AS key
       FROM h CROSS JOIN bands),
b1 AS (SELECT media_ref, dhash, band, key,
              CASE WHEN count(*) OVER (PARTITION BY band, key)
                        > {bucket_cap}
                   THEN (dhash >> lo2) & 65535 ELSE 0 END AS key2
       FROM b0),
b AS (SELECT * FROM (
        SELECT media_ref, dhash, band, key, key2,
               count(*) OVER (PARTITION BY band, key, key2) AS bn
        FROM b1) WHERE bn <= {bucket_cap}),
flagged AS (
  SELECT DISTINCT x.media_ref
  FROM b x JOIN b y
    ON x.band = y.band AND x.key = y.key AND x.key2 = y.key2
   AND y.media_ref < x.media_ref
  WHERE bit_count(xor(x.dhash, y.dhash)) BETWEEN 1 AND {max_hamming})
SELECT h.media_ref, h.dhash,
       CAST(f.media_ref IS NOT NULL AS BIGINT) AS near_dup
FROM h LEFT JOIN flagged f USING (media_ref)
"""
