"""Line-segment detection from ink runs (K6) + border-line selection (W2).

The reference detects border lines with pylsd.lsd over the page image,
gates them by direction/length/margin position (P3), clusters them by
endpoint distance and regression agreement (A1/A2), then picks each side's
winner by wgt^2 * length * attenuate(pos) (reference:
cli/ocrd_anybaseocr_cropping.py:286-310 detect_lines, :343-440
aggregate_lines, :524-608 select_borderLine). This module reproduces that
chain from the binarized RUN representation instead of pixels — the
engine's kernels never materialize full-image masks (memory-bus
constraint, CLAUDE.md) — and with one exactness-preserving deviation:

- LSD emits stroke-boundary segments, so the reference's border line lands
  on the fitted mid-line of the stroke. Here a segment carries its full
  row/column band, and the selected side reports its OUTER edge (min row
  for top, max row for bottom, ...). On a clean rectangular frame this
  recovers the drawn border exactly (pytest invariant); on broken frames
  the A2 collinear merge bridges the gaps exactly like the reference.

Stroke-vs-bar discrimination: LSD's line-support regions never aggregate a
solid text bar into one long line (only its thin boundary edges). The run
analogue is a thickness cap — a run stack thicker than MAX_STROKE px is a
bar/blob (text row >= 7 px, title block >= 20 px at working resolution),
not a border stroke (frame <= 4 px).
"""

from __future__ import annotations

import numpy as np

from ..config import CropParams, DEFAULT_PARAMS
from .crop import attenuate_pos
from .lines import LineGroup, aggregate_lines, merge_collinear

MIN_SEG_LEN = 15  # reference detect_lines: dx > 15 / dy > 15 (cropping.py:305-309)
MAX_STROKE = 6  # stroke-vs-bar thickness cap (see module doc)


def _chain_spans(rr, ss, ee):
    """Vectorized run chaining: runs sorted by (start, row) form a chain
    while the start stays identical, the row advances by exactly 1, and the
    end drifts by <= 1. Ragged real-world strokes split into several exact
    chains here — joining those is A1/A2's job (endpoint distance +
    regression), the same division of labor as the reference's LSD →
    aggregate_lines. Returns (first_idx, last_idx, rr, ss, ee) with the
    index arrays delimiting chains in the sorted runs."""
    order = np.lexsort((rr, ss))
    rr, ss, ee = rr[order], ss[order], ee[order]
    if len(rr) == 0:
        e = np.array([], dtype=np.int64)
        return e, e, rr, ss, ee
    brk = (np.diff(ss) != 0) | (np.diff(rr) != 1) | (np.abs(np.diff(ee)) > 1)
    first = np.concatenate([[0], np.flatnonzero(brk) + 1])
    last = np.concatenate([np.flatnonzero(brk), [len(rr) - 1]])
    return first, last, rr, ss, ee


def _h_segments(r_rows, r_starts, r_ends, y1max, y2min):
    """Horizontal segments: long runs stacked across adjacent rows with
    identical extents (vectorized, see _chain_spans). The margin gate (P3,
    ref cropping.py:305-306) applies to the EMITTED segment, not the input
    runs — gating runs first would truncate a text bar straddling the
    margin boundary into a fake thin stroke. Returns (n, 6)
    [x1, x2, y_lo, y_hi, y_mid, w]; stacks thicker than MAX_STROKE are
    bars, not strokes — discarded."""
    keep = r_ends - r_starts >= MIN_SEG_LEN
    first, last, rr, ss, ee = _chain_spans(r_rows[keep], r_starts[keep], r_ends[keep])
    if len(first) == 0:
        return np.zeros((0, 6), dtype=np.float64)
    ylo, yhi = rr[first].astype(np.float64), rr[last].astype(np.float64)
    thick = yhi - ylo + 1
    ymid = (ylo + yhi) / 2.0
    x1 = ss[first].astype(np.float64)
    x2 = np.maximum.reduceat(ee, first).astype(np.float64) - 1
    keep2 = (thick <= MAX_STROKE) & ((ymid < y1max) | (ymid > y2min))
    return np.stack([x1, x2, ylo, yhi, ymid, thick], axis=1)[keep2]


def _v_segments(r_rows, r_starts, r_ends, x1max, x2min, h):
    """Vertical segments from NARROW runs chained down adjacent rows at a
    constant column (vectorized, see _chain_spans). Returns (n, 6)
    [y1, y2, x_lo, x_hi, x_mid, w]; chains shorter than MIN_SEG_LEN or
    whose center is outside the left/right margin bands drop."""
    width = r_ends - r_starts
    keep = (width >= 1) & (width <= MAX_STROKE)
    first, last, rr, ss, ee = _chain_spans(r_rows[keep], r_starts[keep], r_ends[keep])
    if len(first) == 0:
        return np.zeros((0, 6), dtype=np.float64)
    ylo, yhi = rr[first].astype(np.float64), rr[last].astype(np.float64)
    length = yhi - ylo + 1
    xlo = ss[first].astype(np.float64)
    xhi = np.maximum.reduceat(ee, first).astype(np.float64) - 1
    xmid = (xlo + xhi) / 2.0
    wsum = np.add.reduceat((ee - ss).astype(np.float64), first)
    wavg = wsum / (last - first + 1)
    keep2 = (length >= MIN_SEG_LEN) & ((xmid < x1max) | (xmid > x2min))
    return np.stack([ylo, yhi, xlo, xhi, xmid, wavg], axis=1)[keep2]

def _groups_for_side(segs, axis_len, perp_len, min_end, max_start, min_pos, max_pos):
    """A1 + A2 + the reference's group filters (aggregate_lines tail,
    cropping.py:465-515): total length, extent range, perpendicular
    position. ``segs`` columns: [a1, a2, p_lo, p_hi, p_mid, w] where a is
    the straight axis and p the perpendicular one. Returns list of dicts
    {start, end, pos, outer_lo, outer_hi, length, wgt}."""
    if len(segs) == 0:
        return []
    quads = np.stack(
        [segs[:, 0], segs[:, 4], segs[:, 1], segs[:, 4]], axis=1
    )  # endpoints on the fitted mid-line
    groups = aggregate_lines(quads, widths=segs[:, 5])
    groups = merge_collinear(groups, axis_len)
    out = []
    for g in groups:
        # P3 direction gate (ref detect_lines dy/dx < 0.15, cropping.py:
        # 305-309): raw run-chains are axis-aligned, so the slant of a
        # candidate only materializes in the GROUP's fitted slope — a
        # staircase of chained steps steeper than 0.15 is not a border line
        slope, _, _ = g.fit()
        if abs(slope) >= 0.15:
            continue
        st = group_side_stats(g, segs)
        if st["length"] < 0.2 * axis_len:  # ref select_borderLine min_length
            continue
        if st["start"] > max_start or st["end"] < min_end:
            continue  # entirely inside a margin corner
        if min_pos < st["pos"] < max_pos:
            continue  # not in any margin band
        out.append(st)
    return out


def group_side_stats(g: LineGroup, segs: np.ndarray) -> dict:
    """A3/A4 per-group stats + the outer band edges of the member segments."""
    ind = np.array(sorted(g.ind))
    total_len = float(sum(g.lengths))
    wgt = float(sum(l * w for l, w in zip(g.lengths, g.widths)) / max(total_len, 1e-9))
    return {
        "start": float(g.pts[:, 0].min()),
        "end": float(g.pts[:, 0].max()),
        "pos": float(g.pts[:, 1].mean()),
        "outer_lo": float(segs[ind, 2].min()),
        "outer_hi": float(segs[ind, 3].max()),
        "length": total_len,
        "wgt": wgt,
    }


def side_score(wgt: float, length: float, pos_ratio: float) -> float:
    """W2 (reference select_borderLine sort key, cropping.py:565-608):
    wgt^2 * length * attenuate(pos / margin_band)."""
    return wgt * wgt * length * float(attenuate_pos(pos_ratio))


def _pick_side(groups, pos_max_band, invert_from):
    """Top-1 group by side_score; pos_ratio = pos/band for near-origin
    sides, (L-pos)/(L-band_edge) for far sides (ref :571,582,592,602)."""
    best, best_score = None, -1.0
    for g in groups:
        ratio = (
            g["pos"] / pos_max_band
            if invert_from is None
            else (invert_from - g["pos"]) / max(invert_from - pos_max_band, 1e-9)
        )
        sc = side_score(g["wgt"], g["length"], ratio)
        if sc > best_score:
            best_score, best = sc, g
    return best


def detect_border_segments(
    cc, shape, ruler_bbox=None, params: CropParams = DEFAULT_PARAMS.crop
):
    """K6→A1/A2→W2 border detection from the CC runs.

    Returns ([x1, y1, x2, y2] or None per side as a 4-list with None holes,
    perfect flag): the caller fills missing sides from the textbox fallback
    exactly like the reference (select_borderLine fallback lines,
    cropping.py:575-607)."""
    h, w = shape
    stats, run_labels, (r_rows, r_starts, r_ends) = cc
    if ruler_bbox is not None and len(stats):
        # K8 ruler suppression, component-wise (== masking its pixels)
        drop = (
            (stats[:, 0] == ruler_bbox[0]) & (stats[:, 1] == ruler_bbox[1])
            & (stats[:, 2] == ruler_bbox[2]) & (stats[:, 3] == ruler_bbox[3])
        )
        keep_runs = ~drop[run_labels]
        r_rows, r_starts, r_ends = r_rows[keep_runs], r_starts[keep_runs], r_ends[keep_runs]

    y1max = params.margin_top * h
    y2min = params.margin_bottom * h
    x1max = params.margin_left * w
    x2min = params.margin_right * w

    hsegs = _h_segments(r_rows, r_starts, r_ends, y1max, y2min)
    vsegs = _v_segments(r_rows, r_starts, r_ends, x1max, x2min, h)

    hgroups = _groups_for_side(hsegs, w, h, x1max, x2min, y1max, y2min)
    vgroups = _groups_for_side(vsegs, h, w, y1max, y2min, x1max, x2min)

    top = _pick_side([g for g in hgroups if g["pos"] < y1max], y1max, None)
    bot = _pick_side([g for g in hgroups if g["pos"] > y2min], y2min, h)
    lft = _pick_side([g for g in vgroups if g["pos"] < x1max], x1max, None)
    rgt = _pick_side([g for g in vgroups if g["pos"] > x2min], x2min, w)

    ty = int(top["outer_lo"]) if top else None
    by = int(bot["outer_hi"]) if bot else None
    lx = int(lft["outer_lo"]) if lft else None
    rx = int(rgt["outer_hi"]) if rgt else None
    return [lx, ty, rx, by], all(v is not None for v in (lx, ty, rx, by))
