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

from pyspark.sql import DataFrame, SparkSession

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


def load_corpus(spark: SparkSession, corpus_dir: str) -> tuple[DataFrame, DataFrame]:
    """Load the interleaved corpus (documents, page_blobs) with explicit schemas."""
    docs = spark.read.schema(S.DOCUMENTS).parquet(os.path.join(corpus_dir, "documents.parquet"))
    blobs = spark.read.schema(S.PAGE_BLOBS).parquet(os.path.join(corpus_dir, "page_blobs.parquet"))
    return docs, blobs
