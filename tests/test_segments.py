"""K6 segment-detector border path: equality with the run-profile detector
on clean frames, recovery of broken frames the profile path misses, and the
W6 noise trim in the textbox fallback."""

from __future__ import annotations

import numpy as np

from ocrd_anybaseocr_spark.kernels.binarize import otsu_threshold
from ocrd_anybaseocr_spark.kernels.components import labeled_runs, runs_from_image
from ocrd_anybaseocr_spark.kernels.crop import (
    detect_border,
    detect_border_profile,
    detect_ruler,
    filter_noisebox,
)
from ocrd_anybaseocr_spark.png import decode_gray
from ocrd_anybaseocr_spark.synth import generate_doc


def _cc_of(img):
    t = otsu_threshold(img)
    runs = runs_from_image(img, t)
    return labeled_runs(runs=runs, h=img.shape[0])


def test_segment_path_equals_profile_path_on_clean_frames():
    """On the synthetic corpus (closed rectangular frames) the faithful
    K6→A1/A2→W2 path and the run-profile path must return identical
    borders whenever both paths find all four sides themselves."""
    compared = 0
    for i in range(60):
        _, blobs = generate_doc(42, i)
        for b in blobs:
            if b["truth_skew"] != 0.0 or b["dpi"] != 300:
                # deskew and the 300-DPI zoom happen upstream of border
                # detection in process_page; the kernel-level equality holds
                # at working resolution
                continue
            img, _ = decode_gray(bytes(b["image"]))
            cc = _cc_of(img)
            ruler = detect_ruler(img.shape, stats=cc[0])
            seg_border, seg_perfect = detect_border(img.shape, ruler, cc=cc)
            prof_border, prof_perfect = detect_border_profile(img.shape, ruler, cc=cc)
            if seg_perfect and prof_perfect:
                assert seg_border == prof_border, b["media_ref"]
                compared += 1
    assert compared >= 40, compared


def _frame_page(h=900, w=700, t=3, border=(80, 90, 620, 810)):
    img = np.full((h, w), 235, dtype=np.uint8)
    x1, y1, x2, y2 = border
    img[y1 : y1 + t, x1 : x2 + 1] = 10
    img[y2 - t + 1 : y2 + 1, x1 : x2 + 1] = 10
    img[y1 : y2 + 1, x1 : x1 + t] = 10
    img[y1 : y2 + 1, x2 - t + 1 : x2 + 1] = 10
    # some text so the fallback has something to chew on
    for y in range(140, 760, 22):
        img[y : y + 10, 110 : 580] = 20
    return img


def test_broken_frame_recovered_by_segment_path():
    """A dashed top border line (two gaps) breaks the frame into components
    the run-profile heuristic rejects, but A2 collinear merge bridges the
    gaps (ref cropping.py:393-440) and the segment path still recovers the
    exact drawn border."""
    border = (80, 90, 620, 810)
    img = _frame_page(border=border)
    # cut two gaps into the top line AND disconnect it from the verticals,
    # so no single frame-like low-fill component exists for the profile path
    img[88:95, 230:280] = 235
    img[88:95, 430:480] = 235
    img[88:95, 80:95] = 235
    img[88:95, 605:621] = 235
    cc = _cc_of(img)
    seg_border, seg_perfect = detect_border(img.shape, None, cc=cc)
    assert seg_perfect
    assert seg_border == list(border)
    # the profile path misses the top side on this fixture (that's the point)
    prof_border, prof_perfect = detect_border_profile(img.shape, None, cc=cc)
    assert not prof_perfect or prof_border[1] != border[1]


def test_p3_direction_gate_rejects_slanted_groups():
    """P3 (ref detect_lines dy/dx < 0.15): a staircase whose fitted slope
    exceeds 0.15 is not a border-line candidate; a flat one is."""
    from ocrd_anybaseocr_spark.kernels.segments import _groups_for_side
    import numpy as np

    def stair(slope):
        # 8 collinear-ish steps, each 40 px long, drifting in p by slope*a
        return np.array(
            [
                [a, a + 39, 20 + slope * a, 22 + slope * a, 21 + slope * a, 3.0]
                for a in range(40, 360, 40)
            ]
        )

    flat = _groups_for_side(stair(0.0), 700, 900, 210, 490, 175, 525)
    steep = _groups_for_side(stair(0.4), 700, 900, 210, 490, 175, 525)
    assert len(flat) == 1
    assert steep == []


def test_filter_noisebox_strips_edge_speck():
    """W6 (ref cropping.py:627-656): an isolated small box far above the
    text block is stripped to fixpoint; the surviving bbox ignores it."""
    boxes = np.array(
        [
            [300, 5, 320, 25],  # speck near the top edge, area < 0.001*H*W
            [100, 200, 600, 240],
            [100, 260, 600, 300],
            [100, 320, 600, 360],
        ]
    )
    out = filter_noisebox(boxes, 900, 700)
    assert [300, 5, 320, 25] not in out.tolist()
    assert len(out) == 3
    # two specks (top and bottom) strip in successive passes
    boxes2 = np.vstack([boxes, [[320, 850, 340, 870]]])
    out2 = filter_noisebox(boxes2, 900, 700)
    assert len(out2) == 3


def test_fallback_border_ignores_edge_speck():
    """End to end: frameless page with an edge speck — the fallback border
    must hug the text block, not the speck (the round-1 kernel path
    inflated it)."""
    img = np.full((900, 700), 235, dtype=np.uint8)
    for y in range(200, 700, 22):
        img[y : y + 10, 100 : 600] = 20
    img[5:26, 300:331] = 20  # isolated speck near the top edge
    cc = _cc_of(img)
    border, perfect = detect_border(img.shape, None, cc=cc)
    assert not perfect
    assert border[1] >= 200, border  # top edge from text, not the speck
