"""F3 true inward polygon buffer + K9 polygon crop with background fill."""

from __future__ import annotations

import numpy as np

from ocrd_anybaseocr_spark.kernels.geometry import (
    buffer_inward,
    point_in_convex,
    polygon_from_bbox,
)
from ocrd_anybaseocr_spark.kernels.transform import crop_to_border, crop_to_polygon


def test_buffer_inward_rectangle_equals_padding():
    """On an axis-aligned rectangle the inward buffer is exactly the
    padding shrink (shapely Polygon.buffer(-p) for convex rect input)."""
    ring = polygon_from_bbox([10, 20, 110, 220]).astype(float)
    out = buffer_inward(ring, 4)
    want = {(14.0, 24.0), (106.0, 24.0), (106.0, 216.0), (14.0, 216.0)}
    assert {tuple(np.round(p, 6)) for p in out} == want
    # orientation-independent
    out2 = buffer_inward(ring[::-1], 4)
    assert {tuple(np.round(p, 6)) for p in out2} == want


def test_buffer_inward_rotated_quad():
    """A rotated square buffers to a concentric smaller rotated square:
    every buffered vertex is inside the original, at distance padding from
    the nearest original edge."""
    c, r = np.array([100.0, 100.0]), 50.0
    ring = np.array([c + r * np.array([np.cos(t), np.sin(t)])
                     for t in np.radians([45, 135, 225, 315])])
    out = buffer_inward(ring, 5)
    for p in out:
        assert point_in_convex(ring, *p)
        # distance from center shrinks by padding * sqrt(2) for a diamond^Wsquare
        assert np.hypot(*(p - c)) < np.hypot(*(ring[0] - c))
    # buffered ring is the same square shrunk: edge-to-center distance -5
    d0 = r * np.cos(np.radians(45))  # apothem of the rotated square
    d1 = np.mean([np.hypot(*(p - c)) for p in out]) * np.cos(np.radians(45))
    assert abs((d0 - d1) - 5) < 1e-6


def test_crop_to_polygon_rect_equals_crop_to_border():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(200, 150), dtype=np.uint8)
    border = [20, 30, 120, 180]
    a = crop_to_border(img, border, padding=4)
    b = crop_to_polygon(img, polygon_from_bbox(border), padding=4)
    assert np.array_equal(a, b)


def test_crop_to_polygon_never_mutates_input():
    """A FULL-WIDTH crop slice is C-contiguous, so the old
    ascontiguousarray returned a view and the background fill silently
    corrupted the caller's page (ADVICE round 2, item 3)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 200, size=(120, 80), dtype=np.uint8)
    before = img.copy()
    # full-width quad: bbox spans columns 0..79 → contiguous slice
    quad = np.array([[40.0, 10.0], [79.0, 60.0], [40.0, 110.0], [0.0, 60.0]])
    out = crop_to_polygon(img, quad, padding=0, fill=235)
    assert (out == 235).any()  # fill actually happened
    assert np.array_equal(img, before), "input image was mutated"
    b2 = img.copy()
    crop_to_border(img, [0, 10, 79, 110], padding=0)
    assert np.array_equal(img, b2)


def test_crop_to_polygon_fills_outside_quad():
    """Non-rectangular border: pixels inside the bbox but outside the
    polygon are background-filled; pixels inside the polygon survive."""
    img = np.full((200, 200), 7, dtype=np.uint8)  # distinctive content
    quad = np.array([[100.0, 20.0], [180.0, 100.0], [100.0, 180.0], [20.0, 100.0]])
    out = crop_to_polygon(img, quad, padding=0, fill=235)
    h, w = out.shape
    assert (h, w) == (161, 161)
    assert out[h // 2, w // 2] == 7  # center kept
    assert out[0, 0] == 235 and out[0, -1] == 235  # bbox corners filled
    assert out[-1, 0] == 235 and out[-1, -1] == 235
    # fill fraction ≈ 1 - area(diamond)/area(bbox) = 0.5
    frac = float((out == 235).mean())
    assert 0.45 < frac < 0.55
