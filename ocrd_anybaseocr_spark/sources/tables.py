"""Sources/sinks (SURVEY.md §2.1).

Parquet at sandbox scale with an Iceberg-compatible layout: explicit schemas,
partition-bucket columns, append-only outputs + a checkpoint table — the
table layout maps 1:1 onto `spark.read.format('iceberg')` on a real cluster
(S1). The reference's workspace resolve/download (reference:
tests/conftest.py:30-46) becomes a plain table scan; media blobs are a side
table joined by media_ref.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema as S


def spark_session(cores: int | str = "*", app: str = "ocrd_anybaseocr_spark",
                  shuffle_partitions: int = 32, arrow_batch: int = 256) -> SparkSession:
    """Session tuned for heavy image rows: AQE on (skew-join + coalesce).

    Arrow batch size trades Python/JVM round-trips against executor memory:
    a batch holds ENCODED page bytes (~35 KB each here → ~9 MB at 256) and
    pages decode one at a time inside the UDF, so the decoded footprint
    stays one page. Raising 32→256 measured +30-40%% stage throughput at 32
    cores. For corpora with much larger scans, size by byte budget
    (SURVEY.md §4.3), not row count."""
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        # count(*) over parquet resolves from row-group metadata — the
        # pipeline's bucket-derivation counts become footer reads
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def scan_fanout(
    df: DataFrame, spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """ADAPTIVE round-robin repartition of a freshly-scanned table for
    heavy downstream per-row work (explode chains, hash kernels): a
    parquet scan can never split below one ROW GROUP, and the driver's
    testdata writes each table as a single-row-group single file — so
    without this, every md5/shingle pass ran in ONE task regardless of
    cores (measured: the whole text-dedup family scan-stage-bound on one
    core at sf1.0). The repartition fires only when the scan's splittable
    unit count is below the session's shuffle parallelism; at production
    scale (many files / many row groups per file) — or when the layout
    cannot be probed (non-local paths, monkeypatched loaders in tests) —
    it is a no-op, so no corpus-sized shuffle is ever added (guide §2:
    derive partitioning from the input, don't hard-code either
    deployment)."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        import glob as _glob

        import pyarrow.parquet as _pq

        path = os.path.join(sf_dir, f"{name}.parquet")
        files = _glob.glob(os.path.join(path, "*.parquet")) if os.path.isdir(path) else [path]
        row_groups = sum(_pq.ParquetFile(p).num_row_groups for p in files)
    except Exception:
        # non-local or unreadable layout: assume the scan splits fine
        return df
    if row_groups >= max(2, n // 2):
        return df
    return df.repartition(n)


def load_corpus(spark: SparkSession, corpus_dir: str) -> tuple[DataFrame, DataFrame]:
    """Load the interleaved corpus (documents, page_blobs) with explicit schemas."""
    docs = spark.read.schema(S.DOCUMENTS).parquet(os.path.join(corpus_dir, "documents.parquet"))
    blobs = spark.read.schema(S.PAGE_BLOBS).parquet(os.path.join(corpus_dir, "page_blobs.parquet"))
    return docs, blobs


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32
) -> None:
    """Persist ``df`` as a catalog table BUCKETED (and sorted) on ``key``
    — the co-located-join layout: two relations bucketed the same way
    join with ZERO exchange on either side (plan-asserted in
    test_plans.py), because each task pairs bucket i with bucket i.

    When it pays at 100 TB: a fact relation joined on the same key by
    MANY downstream jobs (dedup decisions x corpus, claims x docs,
    index x serving) amortizes ONE bucketed write against every later
    shuffle it removes; n_buckets should be sized so a bucket of the
    BIGGER relation fits an executor core's working set (buckets are the
    join parallelism — they are not AQE-coalescible). Skewed keys stay
    skewed inside their bucket: salt the key column BEFORE bucketing
    when one key dominates."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def load_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """documents from newline-delimited JSON with the EXPLICIT table
    schema (never inferSchema on a 100 TB drop: inference is a full
    extra pass and a schema-drift hazard; a malformed line lands in
    _corrupt_record instead of poisoning types). Column order and types
    match load_table(..., 'documents') so every downstream operator is
    source-agnostic."""
    jschema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long, _corrupt_record string"
    )
    df = spark.read.schema(jschema).option("mode", "PERMISSIVE").json(path)
    return df.where(F.col("_corrupt_record").isNull()).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
