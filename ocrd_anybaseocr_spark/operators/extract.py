"""Flagship extraction operator (W5): reading-order-sorted span sequences.

The reference's output ordering comes from PAGE region order consumed in
document order (reference: cli/ocrd_anybaseocr_layout_analysis.py:156);
here the stored span array is in arbitrary order and ``offset`` carries
reading order, so extraction is a pure NARROW transformation — array_sort +
transform inside each row, zero shuffle, fully whole-stage-codegen'd.
At 100 TB this runs scan-speed: no exchange appears in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extract_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans[kind,text,media_ref,offset]) →
    extracted(doc_id, spans[kind,text,media_ref,order]) sorted by offset.

    Strict span-sequence equality contract: (kind, text, media_ref, order).
    """
    # array_sort on structs orders by fields left-to-right → offset first.
    return documents.select(
        "doc_id",
        F.expr(
            "transform("
            " array_sort(transform(spans, s -> struct(s.offset as offset, s.kind as kind,"
            "   s.text as text, s.media_ref as media_ref))),"
            " (s, i) -> struct(s.kind as kind, s.text as text, s.media_ref as media_ref,"
            "   cast(i as int) as order))"
        ).alias("spans"),
    )


def page_index(documents: DataFrame) -> DataFrame:
    """Per-document page table: (doc_id, media_ref, page_no) where page_no is
    the rank of the page_image span in reading order. Narrow until the
    explode; no shuffle."""
    pages = F.expr(
        "filter(array_sort(transform(spans, s -> struct(s.offset as offset,"
        " s.kind as kind, s.media_ref as media_ref))), s -> s.kind = 'page_image')"
    )
    return (
        documents.select("doc_id", F.posexplode(pages).alias("page_no", "p"))
        .select("doc_id", F.col("p.media_ref").alias("media_ref"), F.col("page_no").cast("int"))
    )
