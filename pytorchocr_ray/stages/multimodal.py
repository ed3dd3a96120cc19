"""Multimodal columns: opaque binary payloads + typed metadata as actor-pool
map_batches stages.

Images are first-class in this engine (PNG codec + OCR). Audio and video
have no decoders in this container, so the DECODE step of each stage is
stubbed — either a clearly-marked ``NotImplementedError`` (strict mode) or a
deterministic fake decoder — while all the Ray-side plumbing (schemas,
batch sizes, actor signature, output layout) is real and tested, per the
engine contract for payload types we cannot decode natively.

Schemas:
  audio(sample_ref: string, data: binary, sample_rate: int32, n_samples: int32)
  video(frame_ref: string, data: binary, width: int32, height: int32,
        n_frames: int32, fps: float32)

Stages:
  * :class:`AudioFeatureStage` — decode -> frame into windows -> per-window
    log-energy + zero-crossing features (list<float32>)
  * :class:`VideoFrameSampleStage` — decode -> sample every k-th frame ->
    one output row per sampled frame with a per-frame mean-luma feature
Both follow the same actor-pool shape as OcrStage: weights/config once in
__init__, vectorized numpy per batch, small batch sizes for fat binary rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def fake_audio_decode(data: bytes, n_samples: int, sample_rate: int) -> np.ndarray:
    """STUB decoder (no audio libs in this container): deterministic PCM
    derived from the payload bytes — replace with soundfile/ffmpeg when
    available. Output contract: float32 mono in [-1, 1], length n_samples."""
    if not data:
        raise NotImplementedError(
            "real audio decoding requires an audio library not present in "
            "this container; empty payloads cannot be faked"
        )
    seed = np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0).astype(np.float32)


def fake_video_decode(
    data: bytes, n_frames: int, height: int, width: int
) -> np.ndarray:
    """STUB decoder: deterministic uint8 (n_frames, H, W) luma planes derived
    from the payload bytes — replace with PyAV/ffmpeg when available."""
    if not data:
        raise NotImplementedError(
            "real video decoding requires a video library not present in "
            "this container; empty payloads cannot be faked"
        )
    seed = np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n_frames, height, width), dtype=np.uint8)


class AudioFeatureStage:
    """audio rows -> (sample_ref, window_idx, features list<float32>[2]).

    features = [log energy, zero-crossing rate] per window — the shape a
    real fbank/MFCC front end would have.
    """

    def __init__(self, window: int = 1024, hop: int = 512, decoder=fake_audio_decode):
        self.window = window
        self.hop = hop
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, widx, feats = [], [], []
        for ref, data, sr, n in zip(
            batch["sample_ref"].to_pylist(),
            batch["data"].to_pylist(),
            batch["sample_rate"].to_pylist(),
            batch["n_samples"].to_pylist(),
        ):
            pcm = self.decoder(data, n, sr)
            if len(pcm) < self.window:
                continue
            n_win = 1 + (len(pcm) - self.window) // self.hop
            idx = (
                np.arange(self.window)[None, :]
                + self.hop * np.arange(n_win)[:, None]
            )
            wins = pcm[idx]  # (n_win, window), vectorized framing
            energy = np.log1p((wins**2).sum(axis=1))
            zc = (np.abs(np.diff(np.signbit(wins), axis=1)).sum(axis=1)) / self.window
            for i in range(n_win):
                refs.append(ref)
                widx.append(i)
                feats.append([float(energy[i]), float(zc[i])])
        return pa.table(
            {
                "sample_ref": pa.array(refs, pa.string()),
                "window_idx": pa.array(widx, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleStage:
    """video rows -> (frame_ref, frame_idx, mean_luma) for every k-th frame."""

    def __init__(self, every_k: int = 5, decoder=fake_video_decode):
        self.every_k = every_k
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, fidx, luma = [], [], []
        for ref, data, w, h, n in zip(
            batch["frame_ref"].to_pylist(),
            batch["data"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            frames = self.decoder(data, n, h, w)
            sel = np.arange(0, n, self.every_k)
            means = frames[sel].mean(axis=(1, 2))
            for i, m in zip(sel.tolist(), means.tolist()):
                refs.append(ref)
                fidx.append(i)
                luma.append(float(m))
        return pa.table(
            {
                "frame_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "mean_luma": pa.array(luma, pa.float32()),
            }
        )


def audio_features(ds, concurrency: int = 4, batch_size: int = 8, **params):
    """Binary payload stage: small batch_size on purpose (fat rows)."""
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=params,
    )


def video_frame_samples(ds, concurrency: int = 4, batch_size: int = 4, **params):
    return ds.map_batches(
        VideoFrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=params,
    )
