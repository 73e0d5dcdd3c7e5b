"""Structured Streaming surface (SURVEY.md §2.9).

The reference is strictly batch (finite workspaces, reference:
cli/ocrd_anybaseocr_layout_analysis.py:72-86); its restart semantics map to
either the checkpoint-table batch design (operators/pipeline.py, the
default) or this equivalent streaming form: ``readStream`` over the corpus
table with ``Trigger.AvailableNow`` + Spark's own streaming checkpoint, so
an interrupted ingest resumes from the last committed micro-batch. New
corpus partitions dropped into the input directory are picked up
incrementally — the continuous-ingest mode of a 100 TB pipeline.

No watermarks/stateful operators are needed: extraction is per-document
(stateless per row), and the document fold is bounded per doc_id, so each
micro-batch is complete per document by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .. import schema as S
from ..operators.extract import extract_spans


def stream_extract(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Incremental reading-order extraction: corpus parquet → extracted
    spans parquet, exactly-once via the streaming checkpoint. Blocks until
    all currently-available input is processed (Trigger.AvailableNow)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    # FileStreamSource wants a directory: stream the corpus dir, filtered to
    # the documents table (page_blobs live alongside)
    docs = (
        spark.readStream.schema(S.DOCUMENTS)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(corpus_dir)
    )
    extracted = extract_spans(docs)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "extracted_spans_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
