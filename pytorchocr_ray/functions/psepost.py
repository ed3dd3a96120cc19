"""PSE-style detection post-processing (progressive scale expansion).

Alternate det post-process with the same stage contract as
:mod:`dbpost` — modeled on the reference's ``PSEPostProcess`` + Cython
``pse`` kernel (pytocr/postprocess/pse_postprocess.py:10-105,
pse_postprocess_fast/pse.pyx:11-69): label the SMALLEST kernel's connected
components, then grow each label outward through progressively larger
kernels with a BFS (4-connectivity, deterministic FIFO order seeded from
component pixels in row-major order); finally emit per-label min-area boxes
filtered by area and mean score.

The reference's model emits S kernel maps; our deterministic det net emits
one pre-activation map, so the kernel pyramid is derived by thresholding at
S increasing levels (the largest kernel = the binarization threshold, the
smallest = the most eroded view) — same expansion semantics.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .dbpost import connected_components
from .geometry import get_mini_boxes


def progressive_expand(kernels: list[np.ndarray]) -> np.ndarray:
    """kernels: masks from SMALLEST to LARGEST. -> int32 label map."""
    h, w = kernels[0].shape
    labels = np.zeros((h, w), dtype=np.int32)
    comps = connected_components(kernels[0])
    seeds: deque[tuple[int, int, int]] = deque()
    for li, pts in enumerate(comps, start=1):
        # run endpoints only; flood the full component via BFS inside k0
        for x, y in pts.astype(int):
            if labels[y, x] == 0:
                labels[y, x] = li
                seeds.append((y, x, li))
    # first, complete labels within the smallest kernel
    _grow(labels, kernels[0], seeds)
    # then expand through each larger kernel
    for k in kernels[1:]:
        frontier: deque[tuple[int, int, int]] = deque()
        ys, xs = np.nonzero(labels)
        order = np.lexsort((xs, ys))  # row-major determinism
        for i in order:
            frontier.append((int(ys[i]), int(xs[i]), int(labels[ys[i], xs[i]])))
        _grow(labels, k, frontier)
    return labels


def _grow(labels: np.ndarray, mask: np.ndarray, frontier: deque) -> None:
    h, w = labels.shape
    while frontier:
        y, x, li = frontier.popleft()
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and labels[ny, nx] == 0:
                labels[ny, nx] = li
                frontier.append((ny, nx, li))


def pse_boxes_from_smooth(
    smooth: np.ndarray,
    activate,
    src_h: int,
    src_w: int,
    thresh_levels: tuple[float, ...] = (0.26, 0.24, 0.22),
    min_area: int = 16,
    score_thresh: float = 0.5,
) -> tuple[np.ndarray, list[float]]:
    """Pre-activation map -> (boxes int16 in src coords, scores).

    thresh_levels: smooth-domain thresholds from SMALLEST kernel (highest)
    to LARGEST (lowest = the binarization level).
    """
    height, width = smooth.shape
    kernels = [smooth > t for t in sorted(thresh_levels, reverse=True)]
    labels = progressive_expand(kernels)
    boxes: list[np.ndarray] = []
    scores: list[float] = []
    prob = None
    for li in range(1, labels.max() + 1):
        ys, xs = np.nonzero(labels == li)
        if ys.size < min_area:
            continue
        if prob is None:
            prob = activate(smooth)
        score = float(prob[ys, xs].mean())
        if score < score_thresh:
            continue
        pts = np.stack([xs, ys], axis=1).astype(np.float64)
        box, sside = get_mini_boxes(pts)
        if sside < 3:
            continue
        # same axis-snap as the DB path (see dbpost.boxes_from_bitmap)
        edge = box[1] - box[0]
        angle = abs(np.degrees(np.arctan2(edge[1], edge[0])))
        tilt = min(angle % 90.0, 90.0 - (angle % 90.0))
        if tilt < 15.0:
            box = np.array(
                [
                    [xs.min(), ys.min()],
                    [xs.max(), ys.min()],
                    [xs.max(), ys.max()],
                    [xs.min(), ys.max()],
                ],
                dtype=np.float64,
            )
        out = box.copy()
        out[:, 0] = np.clip(np.round(out[:, 0] / width * src_w), 0, src_w)
        out[:, 1] = np.clip(np.round(out[:, 1] / height * src_h), 0, src_h)
        boxes.append(out.astype(np.int16))
        scores.append(score)
    if not boxes:
        return np.zeros((0, 4, 2), dtype=np.int16), []
    return np.array(boxes, dtype=np.int16), scores
