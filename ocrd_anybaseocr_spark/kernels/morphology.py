"""Binary morphology kernels (K4/K5).

The reference uses OpenCV morphology: a 3x3 ellipse MORPH_GRADIENT before
line detection (reference: cli/ocrd_anybaseocr_cropping.py:663-664) and a
10x1 rect MORPH_CLOSE to fuse text lines of historical documents
(reference: cli/ocrd_anybaseocr_cropping.py:687-689). Numpy-only
implementations via shift-OR/AND — separable rectangular structuring
elements, exact for the kernel sizes used.
"""

from __future__ import annotations

import numpy as np


def _shift_or(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Dilation along one axis with a centered length-k window (k odd or even;
    even kernels bias left/up like OpenCV's anchor-at-center convention)."""
    out = mask.copy()
    half_lo = (k - 1) // 2
    half_hi = k // 2
    for s in range(1, half_lo + 1):
        shifted = np.zeros_like(mask)
        if axis == 1:
            shifted[:, s:] = mask[:, :-s]
        else:
            shifted[s:, :] = mask[:-s, :]
        out |= shifted
    for s in range(1, half_hi + 1):
        shifted = np.zeros_like(mask)
        if axis == 1:
            shifted[:, :-s] = mask[:, s:]
        else:
            shifted[:-s, :] = mask[s:, :]
        out |= shifted
    return out


def binary_dilate(mask: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """Dilation with a kh x kw rectangular structuring element (separable)."""
    out = mask
    if kw > 1:
        out = _shift_or(out, kw, axis=1)
    if kh > 1:
        out = _shift_or(out, kh, axis=0)
    return out


def binary_erode(mask: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """Erosion = complement-dilate-complement."""
    return ~binary_dilate(~mask, kh, kw)


def morph_close(mask: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """K5 close: dilate then erode — fuses gaps narrower than the kernel
    (the reference's 10x1 horizontal text-line fusing)."""
    return binary_erode(binary_dilate(mask, kh, kw), kh, kw)


def morph_gradient(mask: np.ndarray, kh: int = 3, kw: int = 3) -> np.ndarray:
    """K4 gradient: dilate minus erode — region boundaries (the reference
    applies it before LSD line detection)."""
    return binary_dilate(mask, kh, kw) & ~binary_erode(mask, kh, kw)
