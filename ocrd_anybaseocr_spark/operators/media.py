"""Multimodal binary-column operators.

Media travel as opaque BinaryType columns with typed metadata (the
multimodal-columns contract). Two tiers:

- metadata extraction that never leaves the JVM: PNG IHDR width/height/bit
  depth live at fixed byte offsets, so they are pure column expressions
  (hex/conv/substring) — at 100 TB this runs at scan speed with no Python;
- decode / feature-extraction in Arrow-batched pandas UDFs
  (operators/pipeline.py process_pages — the real decode path via the
  in-repo PNG codec, since PIL/OpenCV are absent here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def png_width(image: Column) -> Column:
    """IHDR width: bytes 17-20 big-endian (after 8-byte signature + length + 'IHDR')."""
    return F.conv(F.hex(F.substring(image, 17, 4)), 16, 10).cast("int")


def png_height(image: Column) -> Column:
    return F.conv(F.hex(F.substring(image, 21, 4)), 16, 10).cast("int")


def png_bit_depth(image: Column) -> Column:
    return F.conv(F.hex(F.substring(image, 25, 1)), 16, 10).cast("int")


def png_is_valid(image: Column) -> Column:
    """Signature check — cheap row-level media validation before decode."""
    return F.hex(F.substring(image, 1, 8)) == F.lit("89504E470D0A1A0A")


def media_metadata(blobs: DataFrame) -> DataFrame:
    """page_blobs(media_ref, image, ...) → typed metadata, JVM-side only."""
    return blobs.select(
        "media_ref",
        png_is_valid(F.col("image")).alias("is_png"),
        png_width(F.col("image")).alias("png_width"),
        png_height(F.col("image")).alias("png_height"),
        png_bit_depth(F.col("image")).alias("png_bit_depth"),
        F.length("image").cast("bigint").alias("byte_size"),
        (png_width(F.col("image")).cast("bigint") * png_height(F.col("image"))).alias("pixels"),
    )
