"""Parallelism-invariance: the engine's output must be identical at every
parallelism level — the Spark analogue of the reference's serial ≡
pageparallel test matrix (reference: tests/conftest.py:68-99), and the
correctness half of the north_rule's N vs 4N criterion.

Each config runs in its own subprocess (own JVM): local-mode getOrCreate
would otherwise return whatever session already exists and ignore the
requested master.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_RUNNER = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from ocrd_anybaseocr_spark.sources.tables import spark_session
from ocrd_anybaseocr_spark.operators.pipeline import run_pipeline

corpus, out_dir, cores, parts = sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
spark = spark_session(cores=cores, shuffle_partitions=parts, app=f"inv{cores}")
run_pipeline(spark, corpus, out_dir, n_parts=parts, resume=False)

ext = spark.read.parquet(out_dir + "/extracted_spans").collect()
spans = {r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans] for r in ext}
st = spark.read.parquet(out_dir + "/doc_structure").collect()
structs = {r.doc_id: ([(d.log_id, d.label, d.parent_id) for d in r.divs],
                      [(l.log_id, l.media_ref) for l in r.links]) for r in st}
pr = spark.read.parquet(out_dir + "/page_results").collect()
pages = {f"{r.doc_id}|{r.media_ref}": [list(r.border), bool(r.perfect), r.skew,
                                        r.features, list(r.labels)] for r in pr}
print(json.dumps({"spans": spans, "structs": structs, "pages": pages},
                 sort_keys=True, default=list))
spark.stop()
"""


def _run_config(repo, corpus_dir, out_dir, cores, parts):
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, repo, corpus_dir, out_dir, str(cores), str(parts)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_output_invariant_across_parallelism(corpus_dir, tmp_path_factory):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = [
        _run_config(repo, corpus_dir, str(tmp_path_factory.mktemp(f"inv{cores}")), cores, parts)
        for cores, parts in ((2, 3), (8, 16))
    ]
    assert results[0]["spans"] == results[1]["spans"], "extracted_spans differ across parallelism"
    assert results[0]["structs"] == results[1]["structs"], "doc_structure differs across parallelism"
    assert results[0]["pages"] == results[1]["pages"], "page_results differ across parallelism"
