"""Minimal, dependency-free PNG codec for 8-bit grayscale page images.

The reference decodes page images with PIL (reference:
src/ocrd_anybaseocr/utils.py:4-24, ``pil2array``). This container has no
PIL/OpenCV, so media blobs are real PNG bytes produced/consumed by this
zlib+numpy codec. Encode always uses filter type 0 (None); decode supports
all five standard filters so externally produced grayscale PNGs also work.

Images travel through Spark as BinaryType columns and are decoded only
inside Arrow-batched pandas UDFs (SURVEY.md §1.3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray, dpi: int | None = None) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG.

    ``dpi`` is embedded as a pHYs chunk (meters-based), matching the
    reference's use of embedded resolution metadata to derive the 300-DPI
    zoom factor (reference: cli/ocrd_anybaseocr_cropping.py:129-151).
    """
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gray expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 per row
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    out = [_PNG_SIG, _chunk(b"IHDR", ihdr)]
    if dpi is not None:
        ppm = int(round(dpi / 0.0254))  # pixels per meter
        out.append(_chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1)))
    out.append(_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_gray(data: bytes) -> tuple[np.ndarray, int | None]:
    """Decode an 8-bit grayscale PNG into (uint8 HxW array, dpi or None)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    dpi: int | None = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale PNGs supported")
        elif tag == b"pHYs":
            ppx, _ppy, unit = struct.unpack(">IIB", body)
            if unit == 1:
                dpi = int(round(ppx * 0.0254))
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w + 1)
    filters = raw[:, 0]
    img = np.ascontiguousarray(raw[:, 1:])  # single copy out of the zlib buffer
    if np.any(filters):
        img = _unfilter(img, filters)
    return img, dpi


def _unfilter(img: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Reverse PNG row filters 1-4 (bpp=1). Row-sequential by necessity."""
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        f = filters[y]
        row = img[y].astype(np.int32)
        up = out[y - 1] if y > 0 else np.zeros(w, dtype=np.int32)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            acc = 0
            r = np.empty(w, dtype=np.int32)
            for x in range(w):
                acc = (row[x] + acc) & 0xFF
                r[x] = acc
            out[y] = r
        elif f == 2:  # Up
            out[y] = (row + up) & 0xFF
        elif f == 3:  # Average
            r = np.empty(w, dtype=np.int32)
            left = 0
            for x in range(w):
                left = (row[x] + ((left + up[x]) >> 1)) & 0xFF
                r[x] = left
            out[y] = r
        elif f == 4:  # Paeth
            r = np.empty(w, dtype=np.int32)
            left = 0
            for x in range(w):
                ul = up[x - 1] if x > 0 else 0
                p = left + up[x] - ul
                pa, pb, pc = abs(p - left), abs(p - up[x]), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up[x] if pb <= pc else ul)
                left = (row[x] + pred) & 0xFF
                r[x] = left
            out[y] = r
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8)
