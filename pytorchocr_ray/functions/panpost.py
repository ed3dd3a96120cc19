"""PAN-style detection post-processing (pixel aggregation).

Modeled on the reference's ``PANPostProcess`` + Cython ``pa`` kernel
(pytocr/postprocess/pan_postprocess.py:10-113, pan_postprocess_fast/
pa.pyx:12-104): label kernel components, then aggregate surrounding text
pixels into a kernel's label only when the pixel's embedding is close to
the kernel's mean embedding. The reference's model emits a 4-d embedding
map; our deterministic net has none, so the 1-d pre-activation (smooth)
value serves as the embedding — the aggregation ALGORITHM (seeded BFS with
a per-label similarity gate) is what this implements, with the gate margin
in smooth-value units.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .dbpost import connected_components
from .psepost import _grow  # deterministic FIFO BFS (no gate)
from .geometry import get_mini_boxes


def aggregate_pixels(
    kernel_mask: np.ndarray,
    text_mask: np.ndarray,
    embedding: np.ndarray,
    margin: float,
) -> np.ndarray:
    """Kernel components -> labels grown over text_mask, gated by
    |embedding(p) - mean_kernel_embedding| <= margin. -> int32 label map."""
    h, w = kernel_mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    comps = connected_components(kernel_mask)
    seeds: deque[tuple[int, int, int]] = deque()
    for li, pts in enumerate(comps, start=1):
        for x, y in pts.astype(int):
            if labels[y, x] == 0:
                labels[y, x] = li
                seeds.append((y, x, li))
    # complete kernels (ungated growth inside the kernel mask)
    _grow(labels, kernel_mask, seeds)
    n = labels.max()
    if n == 0:
        return labels
    # per-label mean embedding over kernel pixels
    means = np.zeros(n + 1, dtype=np.float64)
    for li in range(1, n + 1):
        ys, xs = np.nonzero(labels == li)
        means[li] = embedding[ys, xs].mean()
    # gated aggregation outward over the text mask, row-major seed order
    frontier: deque[tuple[int, int, int]] = deque()
    ys, xs = np.nonzero(labels)
    order = np.lexsort((xs, ys))
    for i in order:
        frontier.append((int(ys[i]), int(xs[i]), int(labels[ys[i], xs[i]])))
    while frontier:
        y, x, li = frontier.popleft()
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if (
                0 <= ny < h
                and 0 <= nx < w
                and text_mask[ny, nx]
                and labels[ny, nx] == 0
                and abs(embedding[ny, nx] - means[li]) <= margin
            ):
                labels[ny, nx] = li
                frontier.append((ny, nx, li))
    return labels


def pan_boxes_from_smooth(
    smooth: np.ndarray,
    activate,
    src_h: int,
    src_w: int,
    kernel_thresh: float,
    text_thresh: float,
    margin: float = 0.2,
    min_area: int = 16,
    score_thresh: float = 0.5,
) -> tuple[np.ndarray, list[float]]:
    """Pre-activation map -> (boxes int16 in src coords, scores), same stage
    contract as the DB and PSE post-processes."""
    height, width = smooth.shape
    labels = aggregate_pixels(
        smooth > kernel_thresh, smooth > text_thresh, smooth, margin
    )
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
