"""Binarization-method variant: the Sauvola path (north_star: Otsu/Sauvola)
must flow through the whole pipeline, with Spark == oracle under the same
params — the parameterized-processor contract of the reference
(ocrd-tool.json method params)."""

from __future__ import annotations

import dataclasses

import pyarrow.parquet as pq
import pytest

from ocrd_anybaseocr_spark.config import DEFAULT_PARAMS
from ocrd_anybaseocr_spark.operators.pipeline import build_page_results
from ocrd_anybaseocr_spark.oracle import process_page
from ocrd_anybaseocr_spark.sources.tables import load_corpus
from ocrd_anybaseocr_spark.synth import generate_doc

SAUVOLA = dataclasses.replace(
    DEFAULT_PARAMS, binarize=dataclasses.replace(DEFAULT_PARAMS.binarize, method="sauvola")
)


def test_sauvola_border_still_exact():
    doc, blobs = generate_doc(42, 5)
    for b in blobs[:3]:
        r = process_page(b["image"], SAUVOLA)
        assert r["border"] == list(b["truth_border"])
        assert r["perfect"]


def test_pipeline_param_threading(spark, corpus_dir):
    """Spark stage under sauvola params equals the oracle under the same
    params, page for page."""
    import os

    docs, blobs = load_corpus(spark, corpus_dir)
    small = docs.limit(4)
    pr = build_page_results(small, blobs, n_parts=4, params=SAUVOLA).collect()
    assert pr
    blob_map = {
        b["media_ref"]: b["image"]
        for b in pq.read_table(os.path.join(corpus_dir, "page_blobs.parquet")).to_pylist()
    }
    for row in pr:
        want = process_page(blob_map[row.media_ref], SAUVOLA)
        assert list(row.border) == want["border"]
        assert row.skew == pytest.approx(want["skew"])
        assert list(row.labels) == want["labels"]
