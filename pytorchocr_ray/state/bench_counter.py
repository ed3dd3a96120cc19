"""Opt-in per-image OCR CPU-time counter (bench self-diagnosis).

VERDICT r3 #1: the driver's wall-clock headline reading diverged 1.31x
from the builder's same-code runs — a host-noise-vs-regression ambiguity
the wall clock alone cannot resolve.  This counter surfaces the
host-load-insensitive signal: per-image OCR **process-CPU** milliseconds.
A noisy host inflates wall time but leaves CPU ms/image stable (~8-10 ms
on this engine); a real code regression moves CPU ms/image itself.

Mechanics: one named zero-CPU actor accumulates (cpu_seconds, n_images)
messages from every OCR actor.  Enabled only when ``BENCH_OCR_CPU=1`` is
set in the driver environment BEFORE ``ray.init`` (local-mode workers
inherit the driver env); production pipelines never pay the lookup.
"""

from __future__ import annotations

import os

NAME = "ocr_cpu_counter"
NAMESPACE = "pytorchocr_bench"


def counter_enabled() -> bool:
    return os.environ.get("BENCH_OCR_CPU") == "1"


def _counter_cls():
    import ray

    @ray.remote(num_cpus=0)
    class _OcrCpuCounter:
        def __init__(self):
            self.cpu_s = 0.0
            self.n_images = 0

        def add(self, cpu_s: float, n_images: int) -> None:
            self.cpu_s += cpu_s
            self.n_images += n_images

        def read_and_reset(self) -> tuple[float, int]:
            out = (self.cpu_s, self.n_images)
            self.cpu_s = 0.0
            self.n_images = 0
            return out

    return _OcrCpuCounter


def get_or_create():
    """Driver side: create (or fetch) the named counter actor."""
    import ray

    try:
        return ray.get_actor(NAME, namespace=NAMESPACE)
    except ValueError:
        return (
            _counter_cls()
            .options(name=NAME, namespace=NAMESPACE, lifetime="detached")
            .remote()
        )


def try_get():
    """Actor side: handle if the counter exists, else None (never raises)."""
    import ray

    try:
        return ray.get_actor(NAME, namespace=NAMESPACE)
    except Exception:
        return None
