"""Similarity search over the embeddings table (array<float>, 64-dim).

Two paths, as a 100 TB engine needs both:
- brute-force cosine top-k (the exact baseline): query-set × corpus join,
  dot products via zip_with/aggregate column expressions (JVM-side, no UDF);
- sign-LSH bucketed top-k (the scale path): 4-bit hyperplane-sign bucket
  (here: sign of the first 4 components — a crude but deterministic and
  engine-portable LSH), candidates restricted to the query's bucket, so the
  join is an equi-join on bucket instead of a cross join. At 10^12 rows the
  bucket count scales with corpus size and the per-bucket join broadcasts
  the query side.

Determinism: ordering by double-precision cosine with vec_id tie-break;
only ranks and ids are returned (cross-engine float error ~1e-7 vs typical
cosine margins ~1e-2 — ordering is stable; values themselves are not
compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table

N_QUERIES = 10
TOP_K = 5

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.expr("sqrt(" + _DOT.format(a="embedding", b="embedding") + ")"))


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the first N_QUERIES vectors. The query side is
    tiny → broadcast; corpus side streams (no shuffle of the big side)."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="q_emb", b="c_emb")) / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


ORACLE_ANN_BRUTE = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_dot_product(embedding, embedding)) AS norm
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.embedding, c.embedding) / (q.norm * c.norm) AS cos
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
"""


def _bucket_expr_spark() -> str:
    bits = [
        f"CASE WHEN element_at(embedding, {i + 1}) >= 0 THEN {2 ** i} ELSE 0 END"
        for i in range(4)
    ]
    return "(" + " + ".join(bits) + ")"


def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: equi-join on the 4-bit bucket, cosine top-3
    within bucket. The plan is a hash join on bucket — shuffle bounded by
    bucket cardinality, never a cross join."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "bucket", F.expr(_bucket_expr_spark())
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "bucket",
    )
    scored = (
        F.broadcast(q)
        .join(c, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="q_emb", b="c_emb")) / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


_BUCKET_DUCK = "(" + " + ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END" for i in range(4)
) + ")"

ORACLE_ANN_LSH = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_dot_product(embedding, embedding)) AS norm,
             {_BUCKET_DUCK} AS bucket
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.embedding, c.embedding) / (q.norm * c.norm) AS cos
      FROM n q JOIN n c ON q.bucket = c.bucket
       AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 3
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-free stats: count + mean scaled-int norm (exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # exact: norms scaled to 1e4-int before summing (order-independent)
    norm_scaled = F.expr(
        "cast(floor(sqrt(" + _DOT.format(a="embedding", b="embedding") + ") * 10000 + 0.5) as bigint)"
    )
    return (
        emb.withColumn("ns", norm_scaled)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("ns").alias("sum_norm_e4"))
    )


ORACLE_EMB_STATS = """
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(floor(sqrt(list_dot_product(embedding, embedding)) * 10000 + 0.5)
                    AS BIGINT)) AS BIGINT) AS sum_norm_e4
    FROM embeddings GROUP BY label
"""


NEAR_DUP_DOT_E8 = 35_000_000  # ~cosine 0.35 on unit-ish vectors, in 1e8-scaled integer space

_DOT_E8 = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " cast(floor(cast(x as double) * 10000 + 0.5) as bigint)"
    " * cast(floor(cast(y as double) * 10000 + 0.5) as bigint)),"
    " 0L, (acc, v) -> acc + v)"
)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection, LSH-bucketed: candidate pairs share a
    sign-LSH bucket (equi-join, never a cross join); survivors pass a
    similarity threshold computed as an EXACT 1e4-scaled integer dot
    product — order-independent and bit-identical across engines (float
    dot products differ in the last ulps between engines)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(_bucket_expr_spark())
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"), "bucket")
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot_e8", F.expr(_DOT_E8.format(a="e_a", b="e_b")))
        .filter(F.col("dot_e8") >= NEAR_DUP_DOT_E8)
        .select("vec_a", "vec_b", "dot_e8")
    )


ORACLE_DEDUP_EMB = f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 10000 + 0.5)) AS se,
             {_BUCKET_DUCK} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(list_dot_product(a.se, b.se) AS BIGINT) AS dot_e8
    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.se, b.se) >= {NEAR_DUP_DOT_E8}
"""
