"""Projection-profile deskew.

Reimplements the capability of the dropped ``ocrd-anybaseocr-deskew``
processor (reference: CHANGELOG.md:18; north_star) as a shear search:
candidate shears come from a fixed discrete grid (config.DeskewParams);
for each candidate the column ink-projection is computed under that shear
and scored by sum-of-squares (sharp vertical structure — page frame lines,
column edges — maximizes it). The argmax candidate is removed by exact
integer row shifts, the inverse of the generator's shear model.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_PARAMS, DeskewParams


def _grid(params: DeskewParams) -> np.ndarray:
    return np.linspace(-params.max_skew, params.max_skew, params.steps)


def estimate_shear(ink: np.ndarray, params: DeskewParams = DEFAULT_PARAMS.deskew) -> float:
    """Estimate shear (dx per row index y) from a boolean ink mask.

    For each candidate c: P_c[x] = sum_y ink[y, x - round(c*y)]; score =
    sum(P_c^2). Rows are grouped by shift value so each candidate costs one
    pass over the image. First argmax in grid order (deterministic).
    """
    h, w = ink.shape
    inkf = ink.astype(np.float32)
    ys = np.arange(h)
    best_score, best_shear = -1.0, 0.0
    for c in _grid(params):
        shifts = np.round(c * ys).astype(np.int64)
        proj = np.zeros(w + 2 * int(abs(np.round(c * (h - 1)))) + 2, dtype=np.float64)
        off = int(abs(np.round(c * (h - 1)))) + 1
        for s in np.unique(shifts):
            rowsum = inkf[shifts == s].sum(axis=0)
            proj[off - s : off - s + w] += rowsum
        score = float(np.sum(proj * proj))
        if score > best_score:
            best_score, best_shear = score, float(c)
    return best_shear


def unshear(img: np.ndarray, shear: float, fill: int = 235) -> np.ndarray:
    """Remove shear by integer row shifts x -> x - round(shear*y)."""
    if shear == 0.0:
        return img
    h, w = img.shape
    shifts = np.round(shear * np.arange(h)).astype(np.int64)
    out = np.full_like(img, fill)
    for s in np.unique(shifts):
        rows = shifts == s
        if s >= 0:
            if s == 0:
                out[rows] = img[rows]
            else:
                out[rows, : w - s] = img[rows, s:]
        else:
            out[rows, -s:] = img[rows, :s]
    return out
