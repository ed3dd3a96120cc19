"""TPS spatial transformer (reference pytocr/modeling/transforms/tps.py:
12-207, itself after RARE / clovaai) in pure numpy.

Pieces and their reference twins:
  * :func:`build_C`            — GridGenerator._build_C (tps.py:148-157)
  * :func:`build_inv_delta_C`  — _build_inv_delta_C (tps.py:170-189)
  * :func:`build_P`            — _build_P (tps.py:159-168)
  * :func:`build_P_hat`        — _build_P_hat (tps.py:191-200)
  * :func:`tps_grid`           — GridGenerator.forward (tps.py:104-145);
    the reference pads C' with a LEARNED 3x2 "expand" row block
    (get_expand, zero-initialized fc) — this engine uses the canonical
    TPS zeros those weights start at (documented deviation: no trained
    localization stack exists here).
  * :func:`grid_sample`        — F.grid_sample(padding_mode="border",
    align_corners=False) bilinear semantics.
  * :func:`estimate_fiducials` — a deterministic ink-envelope localization
    analog: fiducials follow the text band's top/bottom contour, so a
    curved line is straightened; on straight text it is ~identity.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6


def build_C(num_fiducial: int = 20) -> np.ndarray:
    """Base fiducials: F/2 on the top edge (y=-1), F/2 on the bottom."""
    half = num_fiducial // 2
    x = np.linspace(-1.0, 1.0, half)
    top = np.stack([x, -np.ones(half)], axis=1)
    bottom = np.stack([x, np.ones(half)], axis=1)
    return np.concatenate([top, bottom], axis=0)


def build_inv_delta_C(C: np.ndarray) -> np.ndarray:
    F = len(C)
    d = np.linalg.norm(C[:, None, :] - C[None, :, :], axis=2)
    np.fill_diagonal(d, 1.0)
    hat_C = (d**2) * np.log(d)
    delta_C = np.concatenate(
        [
            np.concatenate([np.ones((F, 1)), C, hat_C], axis=1),
            np.concatenate([np.zeros((2, 3)), C.T], axis=1),
            np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
        ],
        axis=0,
    )
    return np.linalg.inv(delta_C)


def build_P(h: int, w: int) -> np.ndarray:
    """Normalized output-grid coordinates in [-1, 1], row-major (n, 2)."""
    gx = (np.arange(-w, w, 2) + 1.0) / w
    gy = (np.arange(-h, h, 2) + 1.0) / h
    P = np.stack(np.meshgrid(gx, gy), axis=2)
    return P.reshape(-1, 2)


def build_P_hat(C: np.ndarray, P: np.ndarray) -> np.ndarray:
    diff = P[:, None, :] - C[None, :, :]
    r = np.linalg.norm(diff, axis=2)
    rbf = (r**2) * np.log(r + EPS)
    return np.concatenate([np.ones((len(P), 1)), P, rbf], axis=1)


def tps_grid(C_prime: np.ndarray, h: int, w: int, num_fiducial: int = 20) -> np.ndarray:
    """Fiducial targets (F, 2) -> sampling grid (h, w, 2) in [-1, 1]."""
    C = build_C(num_fiducial)
    inv_delta = build_inv_delta_C(C)
    P_hat = build_P_hat(C, build_P(h, w))
    rhs = np.concatenate([C_prime, np.zeros((3, 2))], axis=0)
    T = inv_delta @ rhs  # (F+3, 2)
    return (P_hat @ T).reshape(h, w, 2)


def grid_sample(
    img: np.ndarray, grid: np.ndarray, mode: str = "bilinear"
) -> np.ndarray:
    """Sample ``img`` (H, W) at normalized ``grid`` (h, w, 2), border
    padding, align_corners=False (F.grid_sample defaults).  ``mode``
    "nearest" keeps binary ink crisp — used by the rec-path rectifier,
    where the warp is a near-pure vertical shift and bilinear smearing
    measurably degrades template-correlation recognition."""
    H, W = img.shape
    x = ((grid[..., 0] + 1.0) * W - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * H - 1.0) / 2.0
    x = np.clip(x, 0, W - 1)
    y = np.clip(y, 0, H - 1)
    if mode == "nearest":
        return img[np.round(y).astype(np.int64), np.round(x).astype(np.int64)]
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    f = img.astype(np.float64)
    out = (
        f[y0, x0] * (1 - fy) * (1 - fx)
        + f[y0, x1] * (1 - fy) * fx
        + f[y1, x0] * fy * (1 - fx)
        + f[y1, x1] * fy * fx
    )
    if img.dtype == np.uint8:
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def estimate_fiducials(
    gray: np.ndarray, num_fiducial: int = 20, ink_thresh: int = 128
) -> np.ndarray:
    """Deterministic localization analog: place the top/bottom fiducials on
    the ink band's upper/lower envelope at F/2 evenly spaced columns
    (normalized to [-1, 1]).  Columns without ink inherit the nearest
    inked column's envelope."""
    H, W = gray.shape
    ink = gray < ink_thresh
    has = ink.any(axis=0)
    cols = np.flatnonzero(has)
    half = num_fiducial // 2
    xs = np.linspace(-1.0, 1.0, half)
    if cols.size == 0:
        return build_C(num_fiducial)
    top_env = np.argmax(ink, axis=0).astype(np.float64)  # first ink row
    bot_env = (H - 1 - np.argmax(ink[::-1], axis=0)).astype(np.float64)
    px = np.clip(((xs + 1.0) * W - 1.0) / 2.0, 0, W - 1)
    # snap each fiducial column to the nearest inked column
    snap = cols[np.argmin(np.abs(cols[None, :] - px[:, None]), axis=1)]
    top_y = (2.0 * top_env[snap] + 1.0) / H - 1.0
    bot_y = (2.0 * bot_env[snap] + 1.0) / H - 1.0
    top = np.stack([xs, top_y], axis=1)
    bottom = np.stack([xs, bot_y], axis=1)
    return np.concatenate([top, bottom], axis=0)


def tps_rectify(
    gray: np.ndarray, out_h: int = 32, out_w: int = 100, num_fiducial: int = 20
) -> np.ndarray:
    """Full TPS transform: estimate fiducials from the ink envelope, build
    the grid, sample — the numpy analog of TPS.forward (tps.py:26-34)."""
    C_prime = estimate_fiducials(gray, num_fiducial)
    grid = tps_grid(C_prime, out_h, out_w, num_fiducial)
    return grid_sample(gray, grid)


def fit_centerline(
    gray: np.ndarray, ink_thresh: int = 128, deg: int = 2
) -> tuple[np.ndarray | None, float, float, int]:
    """Fit a degree-``deg`` polynomial through the per-column ink-band
    centers -> (coeffs, max curve deviation px, median band half-height px,
    inked column span px).

    The deviation is max(fit) - min(fit) over the inked column span — the
    gate :func:`tps_rectify_curved` uses to decide identity vs warp."""
    ink = gray < ink_thresh
    cols = np.flatnonzero(ink.any(axis=0))
    if cols.size < deg + 2:
        return None, 0.0, 0.0, 0
    H = gray.shape[0]
    top = np.argmax(ink[:, cols], axis=0).astype(np.float64)
    bot = (H - 1 - np.argmax(ink[::-1, cols], axis=0)).astype(np.float64)
    centers = (top + bot) / 2.0
    # ink-mass weights: columns crossing full-height strokes give reliable
    # centers; sparse columns (glyph edges, thin bowls) wobble with shape
    wgt = ink[:, cols].sum(axis=0).astype(np.float64)
    coeffs = np.polyfit(cols.astype(np.float64), centers, deg, w=wgt)
    fit = np.polyval(coeffs, cols.astype(np.float64))
    dev = float(fit.max() - fit.min())
    half = float(np.median(bot - top) + 1.0) / 2.0
    return coeffs, dev, half, int(cols[-1] - cols[0] + 1)


def tps_rectify_curved(
    gray: np.ndarray,
    num_fiducial: int = 20,
    flat_tol: float = 3.0,
    min_span: int = 48,
    margin: int = 2,
) -> np.ndarray:
    """Curvature-gated rectification — the engine's ``use_tps`` rec hook.

    Straight text (fitted centerline deviates <= ``flat_tol`` px, or an
    inked span narrower than ``min_span`` px — a quadratic fit through two
    or three glyphs tracks glyph-shape wobble, not baseline curvature, and
    any real curvature over so short a span is sub-pixel) returns the crop
    UNCHANGED: a learned TPS is ~identity there, and skipping the resample
    keeps the recognition path bit-exact on the (overwhelmingly common)
    straight case.  Curved text gets the full TPS: fiducials ride the
    fitted centerline at constant half-height, so the band is straightened
    to its native thickness and ``rec_prepare`` sees an ordinary horizontal
    line.  Reference twin: TPS.forward
    (pytocr/modeling/transforms/tps.py:26-34) ahead of the CRNN backbone
    (configs/rec/rec_vgg_tps_bilstm_ctc.yml:27-30)."""
    coeffs, dev, half, span = fit_centerline(gray)
    if coeffs is None or dev <= flat_tol or span < min_span:
        return gray
    H, W = gray.shape
    hh = half + margin
    halfF = num_fiducial // 2
    xs = np.linspace(-1.0, 1.0, halfF)
    px = np.clip(((xs + 1.0) * W - 1.0) / 2.0, 0, W - 1)
    cy = np.polyval(coeffs, px)
    top_y = (2.0 * (cy - hh) + 1.0) / H - 1.0
    bot_y = (2.0 * (cy + hh) + 1.0) / H - 1.0
    C_prime = np.concatenate(
        [np.stack([xs, top_y], axis=1), np.stack([xs, bot_y], axis=1)], axis=0
    )
    out_h = max(4, int(round(2.0 * hh)))
    grid = tps_grid(C_prime, out_h, W, num_fiducial)
    return grid_sample(gray, grid, mode="nearest")
