"""SQL-expressible stable hashing shared by the sketch operators.

Round-1 sketch ops (fingerprint / simhash / minhash) used pandas'
``hash_array``, which no SQL engine can reproduce — so the driver could
only run rows-only checks on them.  This module re-bases every sketch on a
31-bit polynomial rolling hash over code points:

    h(s)   = sum_i code(s[i]) * B_CHAR^(L-1-i)  mod M31          (per string)
    fp(xs) = sum_j x_j * B_TOK^(n-1-j)          mod M31          (per sequence)

which is exactly DuckDB's

    list_reduce(list_transform(string_split(s, ''), c -> unicode(c)),
                (a, c) -> (a * B_CHAR + c) % M31)

(Horner with the first element as the accumulator seed), giving every
sketch op a hash-verifiable DuckDB twin.  M31 = 2^31-1 is a Mersenne
prime; all numpy arithmetic stays exact in uint64 (term < 2^52, reduced
mod M31 before segment sums).

Engine side is fully vectorized: one utf-32 decode of the batch's joined
strings, one power-table gather, one ``np.add.reduceat`` per segment set —
no per-token Python loop (the round-1 Horner loop was a flagged hot spot).
"""

from __future__ import annotations

import numpy as np

M31 = 2147483647  # 2^31 - 1, Mersenne prime
B_CHAR = 131  # char-level polynomial base
B_TOK = 1000003  # token/value-level polynomial base

# RE2's \S (DuckDB regex) == this class; validated equal to str.split() on
# the corpus (ASCII-only).  Engine tokenization MUST use the same rule.
TOKEN_SPLIT_RE = "\\S+"

_pow_cache: dict[tuple[int, int], np.ndarray] = {}


def _pow_table(base: int, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod M31 as uint64 (grow-only cache)."""
    key = (base, 0)
    tab = _pow_cache.get(key)
    if tab is None or len(tab) < n:
        size = max(n, 256, 0 if tab is None else 2 * len(tab))
        tab = np.empty(size, dtype=np.uint64)
        tab[0] = 1
        b = np.uint64(base)
        m = np.uint64(M31)
        for i in range(1, size):
            tab[i] = (tab[i - 1] * b) % m
        _pow_cache[key] = tab
    return tab


def segment_bounds(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lengths = np.asarray(lengths, dtype=np.int64)
    ends = np.cumsum(lengths)
    return ends - lengths, ends


def poly_hash_strings(strings: list[str], base: int = B_CHAR) -> np.ndarray:
    """Vectorized char-level polynomial hash; empty string -> 0.

    One pass: join -> utf-32 decode -> per-position weight gather ->
    per-string reduceat.  Exact for any string length (terms reduced mod
    M31 before the segment sum).  ``base`` selects an independent hash
    family member (the widened SimHash runs 4 bases over one decode).
    """
    n = len(strings)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    total = int(lens.sum())
    out = np.zeros(n, dtype=np.uint64)
    if total == 0:
        return out
    codes = np.frombuffer(
        "".join(strings).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    starts, ends = segment_bounds(lens)
    exp = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
    pows = _pow_table(base, int(lens.max()))
    prod = (codes * pows[exp]) % np.uint64(M31)  # term < 2^52 pre-mod
    nz = lens > 0
    out[nz] = np.add.reduceat(prod, starts[nz]) % np.uint64(M31)
    return out


def poly_hash_segments(
    values: np.ndarray, lengths: np.ndarray, base: int = B_TOK
) -> np.ndarray:
    """Polynomial hash of each segment of ``values`` (values already < M31).

    fp(seg) = sum_j v_j * base^(L-1-j) mod M31; empty segment -> 0.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    out = np.zeros(len(lengths), dtype=np.uint64)
    total = int(lengths.sum())
    if total == 0:
        return out
    values = np.asarray(values, dtype=np.uint64)
    starts, ends = segment_bounds(lengths)
    exp = np.repeat(ends, lengths) - 1 - np.arange(total, dtype=np.int64)
    pows = _pow_table(base, int(lengths.max()))
    prod = (values * pows[exp]) % np.uint64(M31)  # < 2^62 pre-mod
    nz = lengths > 0
    out[nz] = np.add.reduceat(prod, starts[nz]) % np.uint64(M31)
    return out


def tokenize_batch(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Whitespace tokens for a batch -> (flat token list, tokens-per-doc)."""
    toks_per_doc = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts))
    flat: list[str] = []
    for toks in toks_per_doc:
        flat.extend(toks)
    return flat, lens


# ----------------------------------------------------------------- SQL twins

def sql_char_hash(expr: str, base: int = B_CHAR) -> str:
    """DuckDB twin of :func:`poly_hash_strings` for a non-empty string expr."""
    return (
        f"list_reduce(list_transform(string_split({expr}, ''), "
        f"c -> CAST(unicode(c) AS BIGINT)), "
        f"(a, c) -> (a * {base} + c) % {M31})"
    )


def sql_tokens(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{TOKEN_SPLIT_RE}')"
