"""Page-frame detection ("cropping").

Reimplements the semantics of ``ocrd-anybaseocr-crop``
(reference: cli/ocrd_anybaseocr_cropping.py:72-204) numpy-first:

- ruler detection via component gates — aspect ratio in [rulerRatioMin,
  rulerRatioMax], near-margin position, width < rulerWidthMax*W, top-1 by
  foreground pixel count, then mask suppression
  (reference: cli/ocrd_anybaseocr_cropping.py:206-263, W1/P6/P8/K8);
- border-line candidates as long horizontal/vertical ink runs belonging to a
  frame-like component (large bbox, low fill), replacing the LSD detector +
  line-clustering chain (reference: cli/ocrd_anybaseocr_cropping.py:286-440,
  K6/A1-A4) — same contract, numpy physical plan;
- per-side top-1 scoring with the reference's positional attenuation
  3x*e^(-3x) (reference: cli/ocrd_anybaseocr_cropping.py:565-608, W2/F10);
- textbox fallback when a side is missing: component text boxes filtered by
  fill/size gates, x-overlap merge, column coalescing, margin filter
  (reference: cli/ocrd_anybaseocr_cropping.py:627-809,
  P4/P5/J1/J2/W6/W7), ``perfect=False``
  (reference: cli/ocrd_anybaseocr_cropping.py:526,577).
"""

from __future__ import annotations

import numpy as np

from ..config import CropParams, DEFAULT_PARAMS
from .components import component_stats


def attenuate_pos(x: np.ndarray | float) -> np.ndarray | float:
    """Reference scoring attenuation 3x*e^(-3x), peak at x=1/3
    (reference: cli/ocrd_anybaseocr_cropping.py:566-568)."""
    return 3.0 * x * np.exp(-3.0 * x)


def _shape_of(ink_or_shape) -> tuple[int, int]:
    """Accept a boolean ink mask or a bare (h, w) tuple — the runs-based
    pipeline never materializes a mask."""
    if isinstance(ink_or_shape, tuple):
        return ink_or_shape
    return ink_or_shape.shape


def detect_ruler(ink_or_shape, params: CropParams = DEFAULT_PARAMS.crop,
                 stats: np.ndarray | None = None):
    """Find the top-1 ruler candidate bbox [x1,y1,x2,y2] or None.

    ``stats`` lets callers reuse one component_stats pass per page (CC is the
    dominant per-page cost; ruler/border/classify all share it)."""
    h, w = _shape_of(ink_or_shape)
    if stats is None:
        stats = component_stats(ink_or_shape)
    if len(stats) == 0:
        return None
    x1, y1, x2, y2, npx = (stats[:, i] for i in range(5))
    bw = x2 - x1 + 1
    bh = y2 - y1 + 1
    aspect = np.maximum(bw, bh) / np.maximum(1, np.minimum(bw, bh))
    fill = npx / np.maximum(1, bw * bh)
    near_margin = (
        (y2 < params.margin_top * h)
        | (y1 > params.margin_bottom * h)
        | (x2 < params.margin_left * w)
        | (x1 > params.margin_right * w)
    )
    ok = (
        (aspect >= params.ruler_ratio_min)
        & (aspect <= params.ruler_ratio_max)
        & (npx >= 300)
        & (fill >= 0.8)
        & (bw < params.ruler_width_max * w)
        & near_margin
    )
    if not ok.any():
        return None
    idx = np.nonzero(ok)[0]
    best = idx[np.argmax(npx[idx])]  # W1: top-1 by foreground pixel count
    return [int(x1[best]), int(y1[best]), int(x2[best]), int(y2[best])]


def _side_candidates(profile_rows, band_lo, band_hi, outer_is_min):
    """Group consecutive candidate indices into bands; return list of
    (outer_coord, mean_strength, length) per band within [band_lo, band_hi)."""
    cands = [i for i, v in profile_rows if band_lo <= i < band_hi]
    vals = {i: v for i, v in profile_rows}
    bands = []
    cur = []
    for i in cands:
        if cur and i == cur[-1] + 1:
            cur.append(i)
        else:
            if cur:
                bands.append(cur)
            cur = [i]
    if cur:
        bands.append(cur)
    out = []
    for b in bands:
        outer = b[0] if outer_is_min else b[-1]
        strength = float(np.mean([vals[i] for i in b]))
        out.append((outer, strength))
    return out


def detect_border(
    ink_or_shape,
    ruler_bbox=None,
    params: CropParams = DEFAULT_PARAMS.crop,
    cc=None,
):
    """Detect the page frame. Returns (border [x1,y1,x2,y2], perfect: bool).

    perfect=True iff all four border lines were found by line detection
    (reference semantics: cli/ocrd_anybaseocr_cropping.py:526,577).

    Ruler suppression (K8, ref cropping.py:262-263) is component-wise: the
    ruler is its own connected component, so excluding its stats row is
    equivalent to masking its pixels for the frame-line path. The row/col
    ink profiles of the frame candidates are computed from the CC RUNS
    (sparse interval sums), never from a full-image mask.
    """
    from .components import labeled_runs

    h, w = _shape_of(ink_or_shape)
    if cc is None:
        cc = labeled_runs(ink_or_shape)
    stats, run_labels, (r_rows, r_starts, r_ends) = cc

    # frame-like components: large bbox, low fill (rectangle outline)
    frame_ids = np.zeros(len(stats), dtype=bool)
    for i, (x1, y1, x2, y2, npx, _) in enumerate(stats):
        if ruler_bbox is not None and [x1, y1, x2, y2] == list(ruler_bbox):
            continue
        bw, bh = x2 - x1 + 1, y2 - y1 + 1
        if bw * bh >= 0.25 * w * h and npx <= 0.2 * bw * bh:
            frame_ids[i] = True

    if frame_ids.any():
        sel = frame_ids[run_labels]
        rr, ss, ee = r_rows[sel], r_starts[sel], r_ends[sel]
        row_counts = np.bincount(rr, weights=(ee - ss).astype(np.float64), minlength=h)
        col_diff = np.zeros(w + 1, dtype=np.int64)
        np.add.at(col_diff, ss, 1)
        np.add.at(col_diff, ee, -1)
        col_counts = np.cumsum(col_diff[:w])
    else:
        row_counts = np.zeros(h)
        col_counts = np.zeros(w)
    row_frac = row_counts / float(w)
    col_frac = col_counts / float(h)
    rows = [(i, v) for i, v in enumerate(row_frac) if v >= params.min_line_length * 0.8]
    cols = [(i, v) for i, v in enumerate(col_frac) if v >= params.min_line_length * 0.8]

    def pick(cands, band_len, from_low):
        """W2: top-1 by wgt^2 * attenuate(pos_ratio); fallback None."""
        if not cands:
            return None
        best, best_score = None, -1.0
        for outer, strength in cands:
            depth = outer if from_low else (band_len - 1 - outer)
            ratio = depth / max(1.0, band_len * 0.25)
            score = strength * strength * float(attenuate_pos(min(ratio, 2.0)))
            if score > best_score:
                best_score, best = score, outer
        return best

    top_c = _side_candidates(rows, 0, int(params.margin_top * h), True)
    bot_c = _side_candidates(rows, int(params.margin_bottom * h), h, False)
    left_c = _side_candidates(cols, 0, int(params.margin_left * w), True)
    right_c = _side_candidates(cols, int(params.margin_right * w), w, False)

    ty = pick(top_c, h, True)
    by = pick(bot_c, h, False)
    lx = pick(left_c, w, True)
    rx = pick(right_c, w, False)
    perfect = all(v is not None for v in (ty, by, lx, rx))

    if not perfect:
        # textbox fallback (ref cropping.py:170-184): merged text bbox or
        # edge — works from the component stats (ruler's component excluded,
        # the run-based equivalent of masking its pixels)
        tb = _textbox_bbox_from_stats(stats, (h, w), params, ruler_bbox)
        if ty is None:
            ty = tb[1] if tb is not None else 0
        if by is None:
            by = tb[3] if tb is not None else h - 1
        if lx is None:
            lx = tb[0] if tb is not None else 0
        if rx is None:
            rx = tb[2] if tb is not None else w - 1
    return [int(lx), int(ty), int(rx), int(by)], bool(perfect)


def merge_x_overlaps(boxes: np.ndarray) -> np.ndarray:
    """J2: transitive merge of boxes whose x-ranges overlap
    (reference: cli/ocrd_anybaseocr_cropping.py:755-773). Sort-sweep form."""
    if len(boxes) == 0:
        return boxes
    order = np.lexsort((boxes[:, 2], boxes[:, 0]))
    b = boxes[order]
    merged = [b[0].copy()]
    for box in b[1:]:
        cur = merged[-1]
        if box[0] <= cur[2]:  # x-overlap → union bbox
            cur[1] = min(cur[1], box[1])
            cur[3] = max(cur[3], box[3])
            cur[2] = max(cur[2], box[2])
        else:
            merged.append(box.copy())
    return np.array(merged)


def coalesce_columns(boxes: np.ndarray, col_sep: float) -> np.ndarray:
    """W7 gaps-and-islands: merge x-sorted neighbors with gap <= col_sep
    (reference: cli/ocrd_anybaseocr_cropping.py:729-740)."""
    if len(boxes) == 0:
        return boxes
    b = boxes[np.argsort(boxes[:, 0], kind="stable")]
    out = [b[0].copy()]
    for box in b[1:]:
        cur = out[-1]
        if box[0] - cur[2] <= col_sep:
            cur[1] = min(cur[1], box[1])
            cur[3] = max(cur[3], box[3])
            cur[2] = max(cur[2], box[2])
        else:
            out.append(box.copy())
    return np.array(out)


def _textbox_bbox(work: np.ndarray, params: CropParams):
    """Fallback from a pixel mask (test/compat path)."""
    return _textbox_bbox_from_stats(component_stats(work), work.shape, params, None)


def _textbox_bbox_from_stats(stats: np.ndarray, shape, params: CropParams, ruler_bbox):
    """Fallback: bbox of merged text boxes (P4 gates → J2 merge → W7 coalesce)."""
    h, w = shape
    if ruler_bbox is not None and len(stats):
        keep = ~(
            (stats[:, 0] == ruler_bbox[0]) & (stats[:, 1] == ruler_bbox[1])
            & (stats[:, 2] == ruler_bbox[2]) & (stats[:, 3] == ruler_bbox[3])
        )
        stats = stats[keep]
    if len(stats) == 0:
        return None
    x1, y1, x2, y2, npx = (stats[:, i] for i in range(5))
    bw, bh = x2 - x1 + 1, y2 - y1 + 1
    fill = npx / np.maximum(1, bw * bh)
    # P4 contour→textbox gates (ref cropping.py:706-708)
    ok = (
        (fill > params.textbox_fill_min)
        & (bw > params.textbox_wh_min)
        & (bw < params.textbox_w_max * w)
        & (bh >= 4)
        & (bh < params.textbox_h_max * h)
    )
    if not ok.any():
        return None
    boxes = np.stack([x1[ok], y1[ok], x2[ok], y2[ok]], axis=1)
    boxes = merge_x_overlaps(boxes)
    boxes = coalesce_columns(boxes, params.column_sep_width_max * w)
    return [int(boxes[:, 0].min()), int(boxes[:, 1].min()), int(boxes[:, 2].max()), int(boxes[:, 3].max())]
