"""Deduplication suite over the documents table — the training-data-pipeline
operators a 100 TB corpus engine needs (exact, MinHash+LSH, SimHash,
n-gram Jaccard). All computations are engine-portable by construction:
hashes are md5 hex strings (identical in Spark and DuckDB), integers exact.

Scale notes (100 TB):
- exact dedup: one shuffle on content hash with map-side partial agg;
- MinHash: narrow shingle explode → partial min-agg per (doc, seed) →
  band self-join on band key (shuffle joins on high-entropy hashes, no skew);
- SimHash: narrow explode → 16 conditional sums per doc (single agg);
- Jaccard verification joins only LSH candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = 2

# ---------------------------------------------------------------------------
# shared shingle/word fragments
# ---------------------------------------------------------------------------

# NB: Spark's sequence(0, -1) yields a DESCENDING sequence, not empty —
# short texts must be guarded explicitly.
_SHINGLES_SPARK = (
    "CASE WHEN size(split(text, ' ')) >= 3 THEN"
    " transform(sequence(0, size(split(text, ' ')) - 3),"
    "   i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
    " ELSE array() END"
)

_SHINGLES_DUCK = """
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingle
      FROM documents
"""


def shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — word 3-grams, narrow explode."""
    return docs.select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("shingle"))


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h7): per-seed min over md5(shingle || '#' || seed).

    min over hex strings is total-order deterministic and identical across
    engines — the MinHash estimator over the md5 hash family.
    """
    sh = shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")).cast("binary"))).alias(f"h{j}")
        for j in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_pairs(sig: DataFrame) -> DataFrame:
    """Band the signature (2 rows/band), bucket-join on band key, emit
    candidate pairs (doc_a < doc_b) with the number of colliding bands."""
    bands = F.array(
        *[
            F.md5(F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}")).cast("binary"))
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.posexplode(bands).alias("band_no", "band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_pairs(minhash_signatures(docs))


ORACLE_MINHASH = f"""
    WITH sh AS ({_SHINGLES_DUCK}),
    sig AS (
      SELECT doc_id,
             {', '.join(f"MIN(md5(shingle || '#{j}')) AS h{j}" for j in range(N_MINHASH))}
      FROM sh GROUP BY doc_id
    ),
    banded AS (
      {' UNION ALL '.join(
        f"SELECT doc_id, {b} AS band_no, md5(h{2*b} || h{2*b+1}) AS band_key FROM sig"
        for b in range(N_BANDS)
      )}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
    FROM banded a JOIN banded b
      ON a.band_key = b.band_key AND a.band_no = b.band_no AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""

# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-derived word hashes — portable nibble arithmetic)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _hex4_to_int_spark(col_expr: str) -> str:
    """First 4 hex chars of an md5 → int, via strpos arithmetic (portable)."""
    parts = [
        f"(instr('{_HEX}', substring({col_expr}, {k + 1}, 1)) - 1) * {16 ** (3 - k)}"
        for k in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


def _hex4_to_int_duck(col_expr: str) -> str:
    parts = [
        f"(strpos('{_HEX}', substring({col_expr}, {k + 1}, 1)) - 1) * {16 ** (3 - k)}"
        for k in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-bit majority vote over word hashes, assembled into
    one bigint. Narrow explode + single groupBy(doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    wordhash = _hex4_to_int_spark("md5(cast(word as binary))")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).withColumn("h", F.expr(wordhash))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(16)
    ]
    agg = w.groupBy("doc_id").agg(*bit_sums)
    simhash = sum(
        [F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0)) for j in range(16)],
        F.lit(0),
    )
    return agg.select("doc_id", simhash.cast("bigint").alias("simhash"))


ORACLE_SIMHASH = f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
      SELECT doc_id, {_hex4_to_int_duck("md5(word)")} AS h FROM w
    ), s AS (
      SELECT doc_id,
             {', '.join(
               f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
               for j in range(16)
             )}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({' + '.join(f"CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(16))}
             AS BIGINT) AS simhash
    FROM s
"""

# ---------------------------------------------------------------------------
# n-gram Jaccard verification over LSH candidates
# ---------------------------------------------------------------------------

def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard for all doc pairs sharing at least one shingle within
    the same source partition (bounded candidate set), jaccard >= 0.05.
    Exact integer set sizes → one deterministic double division."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", "source", F.explode(F.expr(_SHINGLES_SPARK)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= 0.05)
    )
    return j.select("doc_a", "doc_b", "inter", "jaccard")


ORACLE_JACCARD = f"""
    WITH sh0 AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingle
      FROM documents
    ), shs AS (
      SELECT DISTINCT d.doc_id, d.source, s.shingle
      FROM documents d JOIN sh0 s ON d.doc_id = s.doc_id
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM shs GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM shs a JOIN shs b
        ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, inter,
           round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.05
"""
