"""Derived-image emission + feature-string selection.

The reference's stage outputs are AlternativeImages tagged with a
comma-separated feature string ('binarized', 'deskewed', 'cropped', ...)
written to the output fileGrp with a suffixed file id
(reference: cli/ocrd_anybaseocr_cropping.py:199-203, S4/K9), and downstream
stages pick inputs by feature_filter / feature_selector
(reference: cli/ocrd_anybaseocr_cropping.py:118-120, P1).

Spark form: derived images are a BinaryType column with deterministic
media_ref naming (doc_id + '.IMG-CROP' convention), and the feature
filter/selector are plain column predicates — Catalyst pushes them to the
scan when the derived table is read back.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..config import DEFAULT_PARAMS

DERIVED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("image", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("features", T.StringType(), False),
    ]
)


def feature_selector(features: Column, required: str) -> Column:
    """P1 selector: every comma-item of ``required`` must be present."""
    conds = [
        F.array_contains(F.split(features, ","), feat.strip())
        for feat in required.split(",")
        if feat.strip()
    ]
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def feature_filter(features: Column, excluded: str) -> Column:
    """P1 filter: reject a row whose feature string contains ANY comma-item
    of ``excluded`` (OCR-D ``image_from_page`` feature_filter semantics —
    the reference passes 'cropped,binarized,grayscale_normalized' at
    cli/ocrd_anybaseocr_cropping.py:118-120 and an image carrying any one of
    those is excluded, not only one carrying all of them)."""
    conds = [
        F.array_contains(F.split(features, ","), feat.strip())
        for feat in excluded.split(",")
        if feat.strip()
    ]
    if not conds:
        return F.lit(True)
    any_present = conds[0]
    for c in conds[1:]:
        any_present = any_present | c
    return ~any_present


def crop_images(pages_with_blobs: DataFrame, params=DEFAULT_PARAMS) -> DataFrame:
    """K9/S4: run the detection chain and EMIT the derived cropped page as
    PNG bytes with media_ref '<orig>.IMG-CROP' and the accumulated feature
    string — one fused mapInPandas hop, like the main stage."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.transform import crop_to_border
        from ..oracle import process_page
        from ..png import decode_gray, encode_gray

        for pdf in batches:
            out = []
            for doc_id, media_ref, png in zip(pdf["doc_id"], pdf["media_ref"], pdf["image"]):
                r = process_page(bytes(png), params)
                img, dpi = decode_gray(bytes(png))
                if r["skew"] != 0.0:
                    from ..kernels.deskew import unshear

                    img = unshear(img, r["skew"])
                cropped = crop_to_border(img, r["border"], params.crop.padding)
                out.append(
                    {
                        "doc_id": doc_id,
                        "media_ref": f"{media_ref}.IMG-CROP",
                        "image": encode_gray(cropped, dpi=dpi),
                        "width": int(cropped.shape[1]),
                        "height": int(cropped.shape[0]),
                        "features": r["features"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DERIVED_SCHEMA.fields])

    return pages_with_blobs.mapInPandas(stage, schema=DERIVED_SCHEMA)
