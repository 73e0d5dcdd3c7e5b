"""Streaming extraction: AvailableNow micro-batch output equals the batch
operator, and a second invocation is a no-op (exactly-once checkpoint)."""

from __future__ import annotations

import os

from ocrd_anybaseocr_spark.operators.extract import extract_spans
from ocrd_anybaseocr_spark.sources.tables import load_corpus
from ocrd_anybaseocr_spark.streaming import stream_extract


def _canon(df):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        for r in df.collect()
    }


def test_stream_matches_batch_and_is_exactly_once(spark, corpus_dir, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    stream_extract(spark, corpus_dir, out_dir)
    got = _canon(spark.read.parquet(os.path.join(out_dir, "extracted_spans_stream")))
    docs, _ = load_corpus(spark, corpus_dir)
    want = _canon(extract_spans(docs))
    assert got == want
    # re-run: checkpoint marks input committed → no duplicates
    stream_extract(spark, corpus_dir, out_dir)
    again = _canon(spark.read.parquet(os.path.join(out_dir, "extracted_spans_stream")))
    assert again == want
