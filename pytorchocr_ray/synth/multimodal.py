"""Deterministic synthetic audio/video tables (opaque binary + metadata).

Payload bytes are seeded random blobs — they exist to exercise the binary
column plumbing; the stage decoders are stubs (see stages/multimodal.py).
Each row also stores ``seed`` = the value the fake decoder derives from
the payload's first 8 bytes, so the driver's SQL oracle can regenerate
the decoder's stream without byte surgery (the engine itself always
derives it from the bytes; equality is asserted at synthesis).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

AUDIO_SCHEMA = pa.schema(
    [
        ("sample_ref", pa.string()),
        ("data", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
        ("seed", pa.int64()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("frame_ref", pa.string()),
        ("data", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
        ("seed", pa.int64()),
    ]
)


def synth_audio_table(n_rows: int, seed: int = 42) -> pa.Table:
    from ..stages.multimodal import payload_seed

    refs, datas, rates, lens, seeds = [], [], [], [], []
    for i in range(n_rows):
        rng = np.random.default_rng((seed << 16) + i)
        refs.append(f"aud-{i:06d}")
        data = rng.bytes(64)
        datas.append(data)
        rates.append(16000)
        lens.append(int(rng.integers(2048, 8192)))
        seeds.append(payload_seed(data))
    return pa.table(
        {
            "sample_ref": refs,
            "data": datas,
            "sample_rate": rates,
            "n_samples": lens,
            "seed": seeds,
        },
        schema=AUDIO_SCHEMA,
    )


def synth_video_table(n_rows: int, seed: int = 42) -> pa.Table:
    from ..stages.multimodal import payload_seed

    refs, datas, ws, hs, nf, fps, seeds = [], [], [], [], [], [], []
    for i in range(n_rows):
        rng = np.random.default_rng((seed << 17) + i)
        refs.append(f"vid-{i:06d}")
        data = rng.bytes(64)
        datas.append(data)
        ws.append(64)
        hs.append(48)
        nf.append(int(rng.integers(10, 40)))
        fps.append(24.0)
        seeds.append(payload_seed(data))
    return pa.table(
        {
            "frame_ref": refs,
            "data": datas,
            "width": ws,
            "height": hs,
            "n_frames": nf,
            "fps": fps,
            "seed": seeds,
        },
        schema=VIDEO_SCHEMA,
    )


def _versioned_path(kind: str, n: int, seed: int) -> str:
    import hashlib
    import sys

    from ..stages import multimodal as _mm

    h = hashlib.sha256()
    for mod in (sys.modules[__name__], _mm):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return (
        f"/tmp/pytorchocr_ray_mm/{kind}_n{n}_s{seed}_v{h.hexdigest()[:10]}.parquet"
    )


def synth_audio_parquet(n_rows: int, seed: int = 42) -> str:
    """Write (cached) the audio synth table; shared input for the Ray query
    and its DuckDB oracle."""
    path = _versioned_path("audio", n_rows, seed)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(synth_audio_table(n_rows, seed), path)
    return path


def synth_video_parquet(n_rows: int, seed: int = 42) -> str:
    path = _versioned_path("video", n_rows, seed)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(synth_video_table(n_rows, seed), path)
    return path
