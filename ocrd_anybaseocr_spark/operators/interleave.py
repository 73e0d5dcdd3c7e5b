"""Deterministic interleaved-corpus derivation from the driver's flat
``documents(doc_id, text, ...)`` table (TESTDATA.md).

Turns each document's text into the BASELINE.json input_hint shape — an
interleaved span sequence where every 6th chunk is a page_image span with a
``media_ref`` and the rest are text/heading spans — so the flagship
extraction operator runs against driver-provided data with a DuckDB-checkable
oracle. The stored span array is deterministically shuffled (md5 key) so
extraction genuinely has to sort by offset.

Fully declarative: split/sequence/transform/array_sort column expressions,
zero UDFs, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHUNK = 8  # words per span
PAGE_EVERY = 6  # every 6th chunk is a page_image span
HEAD_EVERY = 7  # chunks with i % 7 == 3 are headings


def interleaved_documents(flat_docs: DataFrame) -> DataFrame:
    """documents(doc_id: long, text: string) →
    (doc_id: long, spans: array<struct<kind,text,media_ref,offset>>),
    spans stored in deterministic-shuffled order.

    ``words`` is materialized as its own column first: referencing
    ``split(text)`` inside the per-element lambda would re-split the whole
    document for every chunk — O(words^2) per row.
    """
    spans = F.expr(
        f"""
        transform(sequence(0, greatest(cast(ceil(size(_words) / {float(CHUNK)}) as int), 1) - 1),
          i -> struct(
          CASE WHEN i % {PAGE_EVERY} = 0 THEN 'page_image'
               WHEN i % {HEAD_EVERY} = 3 THEN 'heading'
               ELSE 'text' END as kind,
          CASE WHEN i % {PAGE_EVERY} <> 0
               THEN array_join(slice(_words, i * {CHUNK} + 1, {CHUNK}), ' ')
               END as text,
          CASE WHEN i % {PAGE_EVERY} = 0
               THEN concat(cast(doc_id as string), '_p',
                           cast(cast(i / {PAGE_EVERY} as int) as string))
               END as media_ref,
          cast(i as int) as offset))
        """
    )
    shuffled = F.expr(
        "transform(array_sort(transform(_spans, s -> struct("
        " md5(concat(cast(doc_id as string), '-', cast(s.offset as string))) as k,"
        " s as s))), p -> p.s)"
    )
    return (
        flat_docs.select("doc_id", "text")
        .withColumn("_words", F.split(F.col("text"), " "))
        .withColumn("_spans", spans)
        .withColumn("spans", shuffled)
        .select("doc_id", "spans")
    )
