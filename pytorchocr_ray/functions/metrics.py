"""Evaluation metrics — partial+final accumulator patterns (SURVEY.md §2.8).

Pure kernels mirroring the reference's metric semantics, shapely/Levenshtein
-free:

* :func:`polygon_iou` — convex-quad IoU via Sutherland–Hodgman clipping
  (the reference uses shapely, pytocr/metrics/eval_det_iou.py:60-71).
* :func:`det_counters` — per-image detection matching: don't-care filtering
  by area-precision > 0.5, greedy 1-1 matching at IoU > 0.5, returning the
  ``(gt_care, det_care, matched)`` counter triple whose SUM over images
  yields precision/recall/hmean — the reference's ``combine_results``
  partial+final aggregate (pytocr/metrics/det_metric.py:41-55).
* :func:`levenshtein` / :func:`rec_counters` — exact-match + 1-normalized
  edit distance counters (pytocr/metrics/rec_metric.py:5-55).
"""

from __future__ import annotations

import numpy as np


def _clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip convex ``subject`` by convex ``clip``.

    Both CCW or both CW works; screen-clockwise quads are handled by
    orienting the clip polygon consistently first.
    """
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    # orient clip positively (shoelace >= 0) so `inside` is consistent
    x, y = clip[:, 0], clip[:, 1]
    if float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) < 0:
        clip = clip[::-1]

    output = [tuple(p) for p in subject]
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_pts, output = output, []
        if not input_pts:
            break
        s = input_pts[-1]
        for e in input_pts:
            if inside(e, a, b):
                if not inside(s, a, b):
                    output.append(_intersect(s, e, a, b))
                output.append(e)
            elif inside(s, a, b):
                output.append(_intersect(s, e, a, b))
            s = e
    return np.array(output) if output else np.zeros((0, 2))


def _intersect(s, e, a, b):
    dx1, dy1 = e[0] - s[0], e[1] - s[1]
    dx2, dy2 = b[0] - a[0], b[1] - a[1]
    denom = dx1 * dy2 - dy1 * dx2
    if abs(denom) < 1e-12:
        return e
    t = ((a[0] - s[0]) * dy2 - (a[1] - s[1]) * dx2) / denom
    return (s[0] + t * dx1, s[1] + t * dy1)


def _area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return abs(float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))) / 2.0


def polygon_intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    return _area(_clip_polygon(np.asarray(a, float), np.asarray(b, float)))


def polygon_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = polygon_intersection_area(a, b)
    union = _area(np.asarray(a, float)) + _area(np.asarray(b, float)) - inter
    return inter / union if union > 0 else 0.0


def det_counters(
    gt_polys: list[np.ndarray],
    gt_ignore: list[bool],
    det_polys: list[np.ndarray],
    iou_thresh: float = 0.5,
    area_precision_thresh: float = 0.5,
) -> tuple[int, int, int]:
    """One image -> (gt_care, det_care, matched) counters.

    Detections overlapping an ignored GT with area-precision > 0.5 become
    don't-care; remaining pairs greedily matched at IoU > threshold.
    """
    care_gt = [p for p, ig in zip(gt_polys, gt_ignore) if not ig]
    ignore_gt = [p for p, ig in zip(gt_polys, gt_ignore) if ig]
    care_det = []
    for d in det_polys:
        d_area = _area(np.asarray(d, float))
        is_ignored = False
        for ig in ignore_gt:
            inter = polygon_intersection_area(d, ig)
            if d_area > 0 and inter / d_area > area_precision_thresh:
                is_ignored = True
                break
        if not is_ignored:
            care_det.append(d)
    matched = 0
    used = set()
    for gi, g in enumerate(care_gt):
        for di, d in enumerate(care_det):
            if di in used:
                continue
            if polygon_iou(g, d) > iou_thresh:
                matched += 1
                used.add(di)
                break
    return len(care_gt), len(care_det), matched


def det_match_pairs(
    gt_polys: list[np.ndarray],
    det_polys: list[np.ndarray],
    iou_thresh: float = 0.5,
) -> list[tuple[int, int]]:
    """Greedy 1-1 (gt_idx, det_idx) matching at IoU > threshold — the same
    pairing rule det_counters applies, exposed so rec accuracy can score
    PREDICTION-TO-GT pairs by geometry instead of list position (a missed
    or reordered detection must not misalign every later pair)."""
    pairs: list[tuple[int, int]] = []
    used: set[int] = set()
    for gi, g in enumerate(gt_polys):
        for di, d in enumerate(det_polys):
            if di in used:
                continue
            if polygon_iou(g, d) > iou_thresh:
                pairs.append((gi, di))
                used.add(di)
                break
    return pairs


def combine_det_counters(counters) -> dict[str, float]:
    """Final aggregate: sum the triples, compute precision/recall/hmean."""
    gt = sum(c[0] for c in counters)
    det = sum(c[1] for c in counters)
    m = sum(c[2] for c in counters)
    precision = m / det if det else 0.0
    recall = m / gt if gt else 0.0
    hmean = (
        2 * precision * recall / (precision + recall) if precision + recall else 0.0
    )
    return {"precision": precision, "recall": recall, "hmean": hmean}


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def rec_counters(pred: str, target: str) -> tuple[int, float, int]:
    """(exact_match, 1 - normalized_edit_distance, 1) — spaces stripped like
    the reference (rec_metric.py:23-30)."""
    p = pred.replace(" ", "")
    t = target.replace(" ", "")
    denom = max(len(p), len(t), 1)
    return (int(p == t), 1.0 - levenshtein(p, t) / denom, 1)


def cls_counters(pred: str, label: str) -> tuple[int, int]:
    """(correct, total) — ClsMetric's accuracy counters
    (pytocr/metrics/cls_metric.py:1-30)."""
    return (int(pred == label), 1)


def combine_cls_counters(counters) -> dict[str, float]:
    n = sum(c[1] for c in counters)
    return {"acc": (sum(c[0] for c in counters) / n) if n else 0.0}


def combine_rec_counters(counters) -> dict[str, float]:
    n = sum(c[2] for c in counters)
    if n == 0:
        return {"acc": 0.0, "norm_edit_sim": 0.0}
    return {
        "acc": sum(c[0] for c in counters) / n,
        "norm_edit_sim": sum(c[1] for c in counters) / n,
    }
