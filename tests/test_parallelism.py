"""Parallelism-invariance: the engine's output must be identical at every
parallelism level — the Spark analogue of the reference's serial ≡
pageparallel test matrix (reference: tests/conftest.py:68-99), and the
correctness half of the north_rule's N vs 4N criterion.
"""

from __future__ import annotations

import os

from ocrd_anybaseocr_spark.operators.pipeline import run_pipeline
from ocrd_anybaseocr_spark.sources.tables import spark_session


def _canonical(spark, out_dir):
    ext = spark.read.parquet(os.path.join(out_dir, "extracted_spans"))
    rows = ext.collect()
    spans = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans] for r in rows
    }
    st = spark.read.parquet(os.path.join(out_dir, "doc_structure")).collect()
    structs = {
        r.doc_id: (
            [(d.log_id, d.label, d.parent_id) for d in r.divs],
            [(l.log_id, l.media_ref) for l in r.links],
        )
        for r in st
    }
    pr = spark.read.parquet(os.path.join(out_dir, "page_results")).collect()
    pages = {
        (r.doc_id, r.media_ref): (list(r.border), r.perfect, r.skew, r.features, list(r.labels))
        for r in pr
    }
    return spans, structs, pages


def test_output_invariant_across_parallelism(corpus_dir, tmp_path_factory):
    results = []
    for cores, parts in ((2, 3), (8, 16)):
        spark = spark_session(cores=cores, shuffle_partitions=parts, app=f"inv{cores}")
        out_dir = str(tmp_path_factory.mktemp(f"inv{cores}"))
        run_pipeline(spark, corpus_dir, out_dir, n_parts=parts, resume=False)
        results.append(_canonical(spark, out_dir))
        spark.stop()
    assert results[0][0] == results[1][0], "extracted_spans differ across parallelism"
    assert results[0][1] == results[1][1], "doc_structure differs across parallelism"
    assert results[0][2] == results[1][2], "page_results differ across parallelism"
