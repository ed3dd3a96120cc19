"""Minimal deterministic PNG codec (8-bit grayscale) on numpy + zlib.

The sandbox has no cv2/PIL, so the media sidecar's ``data: binary`` column
holds PNGs produced by this encoder; the decode stage mirrors the reference's
``DecodeImage`` contract (bytes -> uint8 image, ``None`` on failure -> row is
dropped and counted; cf. reference pytocr/data/imaug/operators.py:9-38).

Encoder always writes filter type 0; the decoder honors all five standard
filters so externally produced grayscale PNGs also decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray) -> bytes:
    """uint8 HxW grayscale -> PNG bytes (colortype 0, bit depth 8, filter 0)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects uint8 HxW array")
    h, w = img.shape
    # Prepend the per-row filter byte (0) as an extra column, vectorized.
    raw = np.hstack([np.zeros((h, 1), np.uint8), img]).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG row filters for bpp=1 (grayscale)."""
    stride = w + 1
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w, np.int32)
        if ftype == 0:
            out[y] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype == 1:  # Sub (sequential in-row)
            acc = 0
            cur = np.empty(w, np.uint8)
            for x in range(w):
                acc = (line[x] + acc) & 0xFF
                cur[x] = acc
            out[y] = cur
        elif ftype == 3:  # Average
            cur = np.empty(w, np.uint8)
            left = 0
            for x in range(w):
                left_v = left if x > 0 else 0
                cur[x] = (line[x] + ((left_v + prev[x]) >> 1)) & 0xFF
                left = cur[x]
            out[y] = cur
        elif ftype == 4:  # Paeth
            cur = np.empty(w, np.uint8)
            for x in range(w):
                a = int(cur[x - 1]) if x > 0 else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if (x > 0 and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad filter {ftype}")
    return out


def decode_gray(data: bytes) -> np.ndarray | None:
    """PNG bytes -> uint8 HxW grayscale, or None on any failure (drop row)."""
    try:
        if not data or data[:8] != _SIG:
            return None
        pos = 8
        w = h = None
        idat = []
        while pos + 8 <= len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
                if depth != 8 or ctype != 0 or interlace != 0:
                    return None
            elif tag == b"IDAT":
                idat.append(payload)
            elif tag == b"IEND":
                break
        if w is None or not idat:
            return None
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
        if raw.size != h * (w + 1):
            return None
        return _unfilter(raw, h, w)
    except Exception:
        return None
