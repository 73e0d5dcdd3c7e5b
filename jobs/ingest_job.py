"""Cluster entry point: spark-submit job for the INCREMENTAL INGEST pass —
the production shape that keeps an already-deduped corpus deduped as new
batches land.

    spark-submit --py-files engine.zip jobs/ingest_job.py \
        --corpus <dir containing documents.parquet>  (the existing corpus) \
        --batch  <dir containing documents.parquet>  (the new batch) \
        --output <output root>

Stage order (each committed before the next consumes it — decide once):

1. Bloom pre-filter + exact verify (operators/dedup.dedup_bloom_ingest):
   one membership probe per batch doc against the corpus filter, every
   probe exact-verified, so the audit carries the measured false-positive
   mass. Exact duplicates drop here.
2. MinHash incremental near-dup (operators/dedup.dedup_incremental): the
   exact-surviving batch docs' band keys join the CORPUS side's bands
   only — no batch x batch or corpus x corpus pairs; verified matches at
   >= VERIFY_JACCARD_MIN drop the batch doc (the corpus copy is the
   canonical by arrival order).
3. The accepted remainder is written as ``documents_accepted`` — the
   rows an append-to-corpus commit would take.

Writes under --output:

- ``ingest_audit``: one row per batch doc — (doc_id, bloom_hit,
  exact_dup, near_dup, accepted); dropped docs stay auditable and
  bloom_hit AND NOT exact_dup is the filter's live FP rate.
- ``documents_accepted``: the accepted subset of the batch table.

At scale the corpus-side artifacts (the Bloom word relation, the corpus
band index) are PERSISTED and appended per batch rather than recomputed —
operators/dedup.py documents both shapes; this job computes them from the
corpus frame, which is plan-identical either way.
"""

from __future__ import annotations

import argparse
import json


def run(spark, corpus_dir: str, batch_dir: str, out_dir: str) -> dict:
    """One ingest pass; returns summary counts. Separated from main() so
    tests drive it in-process (the clean_job convention)."""
    import os

    from pyspark.sql import functions as F

    from ocrd_anybaseocr_spark.operators.dedup import (
        dedup_bloom_ingest,
        dedup_incremental,
    )

    corpus = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    batch = spark.read.parquet(os.path.join(batch_dir, "documents.parquet"))

    flags = dedup_bloom_ingest(batch, corpus)
    # commit the membership verdicts, then re-read: the filter-build
    # lineage (corpus agg + probe join) must not re-run for the near-dup
    # stage's survivor filter AND the audit write (decide-once — the
    # clean_job committed-decisions rationale)
    tmp_flags = os.path.join(out_dir, "_bloom_flags")
    flags.write.mode("overwrite").parquet(tmp_flags)
    flags = spark.read.parquet(tmp_flags)

    exact_survivor_ids = flags.filter(~F.col("exact_dup")).select("doc_id")
    survivors = batch.join(exact_survivor_ids, "doc_id", "leftsemi")
    near = (
        dedup_incremental(survivors, corpus)
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    audit = (
        flags.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            "exact_dup",
            F.coalesce(F.col("near_dup"), F.lit(False)).alias("near_dup"),
        )
        .withColumn("accepted", F.expr("NOT exact_dup AND NOT near_dup"))
    )
    audit.write.mode("overwrite").parquet(os.path.join(out_dir, "ingest_audit"))
    committed = spark.read.parquet(os.path.join(out_dir, "ingest_audit"))
    accepted_ids = committed.filter("accepted").select("doc_id")
    batch.join(accepted_ids, "doc_id", "leftsemi").write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents_accepted")
    )

    agg = committed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("int(exact_dup)")).alias("n_exact"),
        F.sum(F.expr("int(near_dup)")).alias("n_near"),
        F.sum(F.expr("int(bloom_hit AND NOT exact_dup)")).alias("n_bloom_fp"),
        F.sum(F.expr("int(accepted)")).alias("n_accepted"),
    ).collect()[0]
    return {
        "batch_in": int(agg.n),
        "dropped_exact": int(agg.n_exact),
        "dropped_near_dup": int(agg.n_near),
        "bloom_false_positives": int(agg.n_bloom_fp),
        "accepted": int(agg.n_accepted),
    }


def main() -> None:
    from ocrd_anybaseocr_spark.sources.tables import spark_session

    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--batch", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--cores", default="*")
    args = ap.parse_args()
    spark = spark_session(cores=args.cores)
    print(json.dumps(run(spark, args.corpus, args.batch, args.output)))


if __name__ == "__main__":
    main()
