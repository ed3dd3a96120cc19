"""Deterministic synthetic audio/video tables (opaque binary + metadata).

Payload bytes are seeded random blobs — they exist to exercise the binary
column plumbing; the stage decoders are stubs (see stages/multimodal.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("sample_ref", pa.string()),
        ("data", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
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
    ]
)


def synth_audio_table(n_rows: int, seed: int = 42) -> pa.Table:
    refs, datas, rates, lens = [], [], [], []
    for i in range(n_rows):
        rng = np.random.default_rng((seed << 16) + i)
        refs.append(f"aud-{i:06d}")
        datas.append(rng.bytes(64))
        rates.append(16000)
        lens.append(int(rng.integers(2048, 8192)))
    return pa.table(
        {"sample_ref": refs, "data": datas, "sample_rate": rates, "n_samples": lens},
        schema=AUDIO_SCHEMA,
    )


def synth_video_table(n_rows: int, seed: int = 42) -> pa.Table:
    refs, datas, ws, hs, nf, fps = [], [], [], [], [], []
    for i in range(n_rows):
        rng = np.random.default_rng((seed << 17) + i)
        refs.append(f"vid-{i:06d}")
        datas.append(rng.bytes(64))
        ws.append(64)
        hs.append(48)
        nf.append(int(rng.integers(10, 40)))
        fps.append(24.0)
    return pa.table(
        {
            "frame_ref": refs,
            "data": datas,
            "width": ws,
            "height": hs,
            "n_frames": nf,
            "fps": fps,
        },
        schema=VIDEO_SCHEMA,
    )
