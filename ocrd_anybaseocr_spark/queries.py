"""Driver-facing query surface: every SQL-expressible operator from
SURVEY.md §2 plus the training-data-pipeline suite (dedup, similarity
search, text analysis), each as an idiomatic DataFrame plan over the
driver testdata tables with a DuckDB ANSI-SQL oracle.

Cross-engine determinism rules used throughout:
- money aggregated as scaled bigints (cents) — exact, order-independent;
- doubles only where cross-engine error is ~1 ulp, rounded to 6 dp;
- hashes via md5 hex strings (identical in Spark and DuckDB);
- every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.extract import extract_spans
from .operators.interleave import interleaved_documents
from .sources.tables import load_table, scan_fanout

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _set_utc(spark: SparkSession) -> None:
    """Timestamp columns are TIMESTAMP_NTZ; epoch extraction goes through a
    cast whose result depends on the session timezone — pin UTC so results
    are identical under any driver session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: reading-order span extraction over the interleaved corpus
# (W5; BASELINE.json north_rule span-sequence contract)
# ---------------------------------------------------------------------------
@register(
    "extract_reading_order",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), e AS (
      SELECT doc_id, words,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(words) / 8.0) AS BIGINT), 1) - 1)) AS i
      FROM w
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS ord,
           CASE WHEN i % 6 = 0 THEN 'page_image'
                WHEN i % 7 = 3 THEN 'heading'
                ELSE 'text' END AS kind,
           CASE WHEN i % 6 <> 0
                THEN array_to_string(words[(i*8+1):(i*8+8)], ' ') END AS text,
           CASE WHEN i % 6 = 0
                THEN CAST(doc_id AS VARCHAR) || '_p' || CAST(i // 6 AS VARCHAR)
                END AS media_ref
    FROM e
    """,
)
def q_extract_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleave (shuffled storage order) → extract (sort by offset) →
    flatten, materialized by ONE narrow mapInArrow pass emitting the
    identical flat rows: sorting a deterministic shuffle back by offset
    and flattening is definitionally the in-order span enumeration, so
    the kernel enumerates spans directly (kind by the interleave
    constants, text = the CHUNK-word slice, media_ref for page spans)
    instead of building + md5-shuffling + re-sorting 63-struct arrays
    per document through interpreted HOF lambdas (~3.5x at sf1.0). The
    array-valued operators (interleaved_documents / extract_spans) stay
    the pipeline and caption surfaces and keep their own plan tests; the
    oracle is unchanged and hash-checks this query's rows."""
    from .operators.interleave import CHUNK, HEAD_EVERY, PAGE_EVERY

    docs = scan_fanout(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, "documents"
    ).select("doc_id", "text")

    def _spans(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            out_doc, out_ord, out_kind, out_text, out_ref = [], [], [], [], []
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                ws = t.split(" ")
                n = max((len(ws) + CHUNK - 1) // CHUNK, 1)
                for i in range(n):
                    page = i % PAGE_EVERY == 0
                    out_doc.append(d)
                    out_ord.append(i)
                    out_kind.append(
                        "page_image"
                        if page
                        else ("heading" if i % HEAD_EVERY == 3 else "text")
                    )
                    out_text.append(
                        None if page else " ".join(ws[i * CHUNK : i * CHUNK + CHUNK])
                    )
                    out_ref.append(f"{d}_p{i // PAGE_EVERY}" if page else None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_doc, type=pa.int64()),
                    pa.array(out_ord, type=pa.int64()),
                    pa.array(out_kind, type=pa.string()),
                    pa.array(out_text, type=pa.string()),
                    pa.array(out_ref, type=pa.string()),
                ],
                names=["doc_id", "ord", "kind", "text", "media_ref"],
            )

    return docs.mapInArrow(
        _spans, "doc_id bigint, ord bigint, kind string, text string, media_ref string"
    )


# ---------------------------------------------------------------------------
# Multimodal caption mining over the interleaved corpus: (image, caption)
# pair extraction — the training-pair prep step for image-text models
# ---------------------------------------------------------------------------
@register(
    "caption_pairs",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), e AS (
      SELECT doc_id, words,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(words) / 8.0) AS BIGINT), 1) - 1)) AS i
      FROM w
    ), sp AS (
      SELECT doc_id, CAST(i AS BIGINT) AS ord,
             CASE WHEN i % 6 = 0 THEN 'page_image'
                  WHEN i % 7 = 3 THEN 'heading'
                  ELSE 'text' END AS kind,
             CASE WHEN i % 6 <> 0
                  THEN array_to_string(words[(i*8+1):(i*8+8)], ' ') END AS text,
             CASE WHEN i % 6 = 0
                  THEN CAST(doc_id AS VARCHAR) || '_p' || CAST(i // 6 AS VARCHAR)
                  END AS media_ref
      FROM e
    ), cap AS (
      SELECT doc_id, ord, kind, media_ref,
             first_value(CASE WHEN kind <> 'page_image' THEN text END IGNORE NULLS)
               OVER (PARTITION BY doc_id ORDER BY ord
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt,
             last_value(CASE WHEN kind <> 'page_image' THEN text END IGNORE NULLS)
               OVER (PARTITION BY doc_id ORDER BY ord
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prv
      FROM sp
    )
    SELECT doc_id, media_ref, coalesce(nxt, prv) AS caption,
           CASE WHEN nxt IS NOT NULL THEN 'following'
                WHEN prv IS NOT NULL THEN 'preceding' END AS cap_src
    FROM cap WHERE kind = 'page_image'
    """,
)
def q_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media_ref, caption, cap_src): for every image span in the
    interleaved corpus, the nearest non-image span's text in reading order
    — following preferred (the figure-caption convention), preceding as
    the fallback, NULL when the document has no text span at all. This is
    the image-text pair mining step that turns an interleaved crawl into
    contrastive/captioning training pairs.

    Spark plan is NARROW end-to-end (zero exchanges at any corpus size):
    the spans array is already reading-order-sorted per document, so the
    neighbor search is array slicing inside one projection — no window
    function, no per-doc shuffle. The DuckDB oracle states the same
    semantics relationally (IGNORE NULLS window frames)."""
    docs = interleaved_documents(
        scan_fanout(load_table(spark, sf_dir, "documents"), spark, sf_dir, "documents")
    )
    ex = extract_spans(docs)
    pairs = F.expr(
        """
        filter(transform(spans, (s, i) ->
          CASE WHEN s.kind = 'page_image' THEN struct(
            s.media_ref AS media_ref,
            coalesce(
              try_element_at(transform(filter(slice(spans, i + 2, size(spans)),
                t -> t.kind <> 'page_image'), t -> t.text), 1),
              try_element_at(transform(filter(slice(spans, 1, i),
                t -> t.kind <> 'page_image'), t -> t.text), -1)
            ) AS caption,
            CASE WHEN exists(slice(spans, i + 2, size(spans)),
                             t -> t.kind <> 'page_image') THEN 'following'
                 WHEN exists(slice(spans, 1, i),
                             t -> t.kind <> 'page_image') THEN 'preceding'
            END AS cap_src)
          END), p -> p IS NOT NULL)
        """
    )
    return ex.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.media_ref", "p.caption", "p.cap_src"
    )


# ---------------------------------------------------------------------------
# A3/A4: grouped aggregation with weighted averages (TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           round(avg(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side partial agg → single shuffle on (returnflag, linestatus);
    money summed as exact cents (scale-safe determinism)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("sum_base_cents"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# W1/W2: top-1 per group (ruler top-1 / border-line top-1 analogue)
# ---------------------------------------------------------------------------
@register(
    "top1_per_group",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 pattern (reference: cli/ocrd_anybaseocr_cropping.py:565-608):
    top-1 per group with deterministic tie-break — as a max_by partial
    agg, not a row_number window: the agg combines map-side so only one
    row per group reaches the exchange, and nothing sorts the full table
    (guide §2.3; A/B-measured 4.6→1.0 s first-exec at sf0.1). Identical
    rows to the window form: the ordering key (price, -linenumber) is
    UNIQUE within a group (linenumber is), so max_by picks exactly the
    window's rn=1 row — max price, ties to the smallest linenumber."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.expr(
                "max_by(named_struct('ln', l_linenumber, 'p', l_extendedprice),"
                " named_struct('p', l_extendedprice, 'nl', -l_linenumber))"
            ).alias("t")
        )
        .select(
            "l_orderkey",
            F.col("t.ln").alias("l_linenumber"),
            F.round(F.col("t.p") * 100).cast("bigint").alias("price_cents"),
        )
    )


# ---------------------------------------------------------------------------
# W7: gaps-and-islands (column coalescing analogue) — event sessionization
# ---------------------------------------------------------------------------
@register(
    "gaps_islands_sessions",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             event_id
      FROM events
    ), f AS (
      SELECT user_id, event_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                        OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
           CAST(MAX(cnt) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, session_id, COUNT(*) AS cnt
          FROM f GROUP BY user_id, session_id)
    GROUP BY user_id
    """,
)
def q_gaps_islands_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 pattern (reference: cli/ocrd_anybaseocr_cropping.py:729-740):
    lag → cumulative island id → per-island agg. One shuffle on user_id,
    reused by both windows and the groupBy (same partitioning)."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | ((F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(F.col("prev_ts").cast("timestamp"))) > 1_800_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("cnt"))
    # per_sess has exactly one row per (user, session), so count(*) ==
    # countDistinct(session_id) — and skips the distinct-agg Expand
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("cnt").cast("bigint").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
# J1: containment theta self-join (anti) — nested-rect removal analogue
# ---------------------------------------------------------------------------
@register(
    "containment_antijoin",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber
    FROM lineitem a
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem b
      WHERE b.l_orderkey = a.l_orderkey
        AND b.l_quantity > a.l_quantity
        AND b.l_extendedprice > a.l_extendedprice
    )
    """,
)
def q_containment_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (reference: cli/ocrd_anybaseocr_cropping.py:223-233): drop rows
    strictly dominated by a sibling — left_anti theta self-join, equi part
    (l_orderkey) keeps it a hash join with theta residual, no cartesian."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    a, b = li.alias("a"), li.alias("b")
    cond = (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_quantity") > F.col("a.l_quantity"))
        & (F.col("b.l_extendedprice") > F.col("a.l_extendedprice"))
    )
    return a.join(b, cond, "left_anti").select("a.l_orderkey", "a.l_linenumber")


# ---------------------------------------------------------------------------
# SO1: exact dedup (np.unique analogue) over documents by content hash
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 (reference: cli/ocrd_anybaseocr_cropping.py:751,782): exact dedup
    = hash-groupBy; min-id representative. Partial agg makes the shuffle
    carry one row per distinct hash."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").cast("bigint").alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ---------------------------------------------------------------------------
# J4/W4 relational analogue: last-seen-div carry-forward over an ordered log
# ---------------------------------------------------------------------------
@register(
    "last_seen_carry_forward",
    oracle="""
    SELECT event_id,
           user_id,
           last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_signup_event
    FROM events
    """,
)
def q_last_seen_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4's F.last(ignorenulls) building block (SURVEY.md §2.5): running
    last-seen id per ordered partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("event_id")), ignorenulls=True
        ).over(w).alias("last_signup_event"),
    )


# ---------------------------------------------------------------------------
# J2: interval self-overlap transitive merge (x-overlap merge analogue)
# ---------------------------------------------------------------------------
@register(
    "interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 1800000 AS e, event_id
      FROM events
    ), o AS (
      SELECT user_id, s, e, event_id,
             max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      FROM iv
    ), f AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    )
    SELECT user_id, CAST(COUNT(DISTINCT island) AS BIGINT) AS n_merged,
           CAST(SUM(span) AS BIGINT) AS coverage_ms
    FROM (SELECT user_id, island, MAX(e) - MIN(s) AS span
          FROM f GROUP BY user_id, island)
    GROUP BY user_id
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 transitive x-overlap merge (reference:
    cli/ocrd_anybaseocr_cropping.py:755-773) as the classic sweep: running
    max(end) over start order, island = cumsum(start > prev running max).
    Confluent with the reference's fixpoint loop (tested in
    test_kernels.py::test_merge_x_overlaps_transitive)."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_millis(F.col("ts").cast("timestamp")) + 1_800_000).alias("e"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    o = iv.withColumn(
        "prev_max_e", F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    ).withColumn(
        "island",
        F.sum(
            F.when(F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = o.groupBy("user_id", "island").agg((F.max("e") - F.min("s")).alias("span"))
    # one row per (user, island) by construction: count(*) ==
    # countDistinct(island), without the distinct-agg Expand
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        F.sum("span").cast("bigint").alias("coverage_ms"),
    )


# ---------------------------------------------------------------------------
# As-of join: latest prior click per purchase (time-series point lookup)
# ---------------------------------------------------------------------------
@register(
    "asof_join_events",
    oracle="""
    WITH u AS (
      SELECT user_id, epoch_ms(ts) AS ms, event_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ms, event_id, tag,
             last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
               OVER aw AS asof_click_id,
             last_value(CASE WHEN tag = 0 THEN ms END IGNORE NULLS)
               OVER aw AS click_ms
      FROM u
      WINDOW aw AS (PARTITION BY user_id ORDER BY ms, tag, event_id
                      ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, asof_click_id,
           CAST(ms - click_ms AS BIGINT) AS ms_since_click
    FROM w WHERE tag = 1
    """,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — each purchase matched to the latest click by the same
    user at or before its timestamp (ties: a same-millisecond click
    counts; among equal-ms clicks the max event_id wins — fully
    deterministic). Purchases with no prior click emit NULLs.

    Scale shape: the union-tag formulation — tag both streams, ONE
    shuffle on the join key, one ordered carry-forward pass per key
    (F.last ignorenulls over rows-unbounded-preceding). This is the
    as-of plan that survives two 100 TB streams: a range/theta join
    explodes candidate pairs per key, while this is strictly linear in
    rows per key after a single co-partitioning; per-key skew is bounded
    by a user's own event count and AQE handles the residue."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    u = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "event_id",
        "user_id",
        "tag",
        "ms",
        F.last(F.when(F.col("tag") == 0, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("asof_click_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ms")), ignorenulls=True)
        .over(w)
        .alias("click_ms"),
    )
    return carried.where(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "asof_click_id",
        (F.col("ms") - F.col("click_ms")).alias("ms_since_click"),
    )


# ---------------------------------------------------------------------------
# Range join via range-frame window: trailing 30-min click stats/purchase
# ---------------------------------------------------------------------------
@register(
    "range_join_window",
    oracle="""
    WITH u AS (
      SELECT user_id, epoch_ms(ts) AS ms, event_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ms, event_id, tag,
             SUM(CASE WHEN tag = 0 THEN 1 ELSE 0 END) OVER rw AS n_clicks_30m,
             SUM(CASE WHEN tag = 0 THEN cents ELSE 0 END) OVER rw
               AS click_cents_30m
      FROM u
      WINDOW rw AS (PARTITION BY user_id ORDER BY ms
                    RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, CAST(n_clicks_30m AS BIGINT) AS n_clicks_30m,
           CAST(click_cents_30m AS BIGINT) AS click_cents_30m
    FROM w WHERE tag = 1
    """,
)
def q_range_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join expressed as a range-frame window: per purchase, the
    count and cent-sum of the same user's clicks in the trailing 30
    minutes (inclusive at both ends; a range frame covers ALL peer rows
    at equal ms, so same-millisecond ties are deterministic without a
    tiebreaker column).

    Scale shape: like asof_join_events, the union-tag plan — ONE shuffle
    on user_id and a linear frame scan per key. The interval-bucketed
    equi-join alternative (explode each probe into floor(ms/30min) and
    its predecessor bucket, join on (key, bucket), exact range filter)
    pays 2x probe fan-out plus a join; it only wins when the two streams
    cannot share a key partitioning — here they can, so the window IS
    the right 100 TB plan."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    u = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    rw = (
        Window.partitionBy("user_id")
        .orderBy("ms")
        .rangeBetween(-1_800_000, Window.currentRow)
    )
    return (
        u.select(
            "event_id",
            "user_id",
            "tag",
            F.sum(F.when(F.col("tag") == 0, 1).otherwise(0))
            .over(rw)
            .alias("n_clicks_30m"),
            F.sum(F.when(F.col("tag") == 0, F.col("cents")).otherwise(0))
            .over(rw)
            .alias("click_cents_30m"),
        )
        .where(F.col("tag") == 1)
        .select("event_id", "user_id", "n_clicks_30m", "click_cents_30m")
    )


# ---------------------------------------------------------------------------
# Ordered conversion funnel: view -> click -> purchase
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN ms END)
               OVER (PARTITION BY user_id) AS v
      FROM e
    ), s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ms >= v THEN ms END)
               OVER (PARTITION BY user_id) AS c
      FROM s1
    ), s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ms >= c THEN ms END)
               OVER (PARTITION BY user_id) AS p
      FROM s2
    ), u AS (
      SELECT user_id, MAX(v) AS v, MAX(c) AS c, MAX(p) AS p
      FROM s3 GROUP BY user_id
    )
    SELECT COUNT(v) AS n_view, COUNT(c) AS n_click, COUNT(p) AS n_purchase,
           CAST(COUNT(c) * 1000000 // GREATEST(COUNT(v), 1) AS BIGINT)
             AS click_ppm,
           CAST(COUNT(p) * 1000000 // GREATEST(COUNT(c), 1) AS BIGINT)
             AS purchase_ppm
    FROM u
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED conversion funnel: users whose first view precedes (<=)
    a click which precedes a purchase — the sequence-matching analytics
    primitive (out-of-order events do NOT count, which is what separates
    a funnel from three independent counts). Stage anchors chain through
    three window passes over ONE user_id partitioning: v = first view,
    c = first click at-or-after v, p = first purchase at-or-after c.

    Scale shape: a single user_id shuffle feeds all three Window nodes
    (same partitioning, no re-exchange), then one per-user agg and a
    1-row global rollup. No joins, no second scan of the event stream."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    e = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    wu = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "v", F.min(F.when(F.col("event_type") == "view", F.col("ms"))).over(wu)
    )
    s2 = s1.withColumn(
        "c",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ms") >= F.col("v")),
                F.col("ms"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "p",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ms") >= F.col("c")),
                F.col("ms"),
            )
        ).over(wu),
    )
    u = s3.groupBy("user_id").agg(
        F.max("v").alias("v"), F.max("c").alias("c"), F.max("p").alias("p")
    )
    return u.agg(
        F.count("v").alias("n_view"),
        F.count("c").alias("n_click"),
        F.count("p").alias("n_purchase"),
        F.expr("count(c) * 1000000 div greatest(count(v), 1)").alias("click_ppm"),
        F.expr("count(p) * 1000000 div greatest(count(c), 1)").alias(
            "purchase_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Retention cohorts: weekly activity after first signup
# ---------------------------------------------------------------------------
_WEEK_MS = 7 * 86_400_000


@register(
    "retention_cohorts",
    oracle=f"""
    WITH su AS (
      SELECT user_id, MIN(epoch_ms(ts)) // {_WEEK_MS} AS cohort_wk
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // {_WEEK_MS} AS wk FROM events
    ), sized AS (
      SELECT cohort_wk, COUNT(*) AS cohort_n FROM su GROUP BY cohort_wk
    ), hits AS (
      SELECT s.cohort_wk, a.wk - s.cohort_wk AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM act a JOIN su s ON s.user_id = a.user_id
      WHERE a.wk >= s.cohort_wk
      GROUP BY s.cohort_wk, a.wk - s.cohort_wk
    )
    SELECT CAST(h.cohort_wk AS BIGINT) AS cohort_wk,
           CAST(h.week_offset AS BIGINT) AS week_offset,
           h.n_active, z.cohort_n,
           CAST(h.n_active * 1000000 // z.cohort_n AS BIGINT) AS retention_ppm
    FROM hits h JOIN sized z ON z.cohort_wk = h.cohort_wk
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly RETENTION COHORTS: users grouped by first-signup week;
    for each week offset >= 0, how many of the cohort were active (any
    event) that week — the classic companion readout to the funnel.
    Weeks are exact integer epoch-week indexes (ms div week — no
    calendar/timezone arithmetic to disagree on), retention as exact
    ppm of the cohort.

    Scale shape: ONE per-user partial agg carries both the signup anchor
    (min commutes with the week div) and the distinct active-week set —
    the former two event-scale passes (signup agg + (user, week)
    distinct) and their user_id equi-join collapse into it; the rollups
    are cohort_wk x offset cells, calendar-bounded regardless of corpus
    size, and count == countDistinct(user) there because each user's
    week set is distinct by construction."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    ms = "unix_millis(cast(ts as timestamp))"
    users = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                f"min(CASE WHEN event_type = 'signup' THEN {ms} END)"
                f" div {_WEEK_MS}"
            ).alias("cohort_wk"),
            F.collect_set(F.expr(f"{ms} div {_WEEK_MS}")).alias("wks"),
        )
        .where(F.col("cohort_wk").isNotNull())
    )
    sized = users.groupBy("cohort_wk").agg(F.count(F.lit(1)).alias("cohort_n"))
    hits = (
        users.select("cohort_wk", F.explode("wks").alias("wk"))
        .where(F.col("wk") >= F.col("cohort_wk"))
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return hits.join(sized, "cohort_wk").select(
        "cohort_wk",
        "week_offset",
        "n_active",
        "cohort_n",
        F.expr("n_active * 1000000 div cohort_n").alias("retention_ppm"),
    )


# ---------------------------------------------------------------------------
# Rolling active users: DAU / trailing-7-day WAU / stickiness
# ---------------------------------------------------------------------------
_DAY_MS = 86_400_000


@register(
    "rolling_active_users",
    oracle=f"""
    WITH ad AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // {_DAY_MS} AS day FROM events
    ), dau AS (
      SELECT day, COUNT(*) AS dau FROM ad GROUP BY day
    ), cover AS (
      SELECT DISTINCT user_id, unnest(generate_series(day, day + 6)) AS day
      FROM ad
    ), wau AS (
      SELECT day, COUNT(*) AS wau FROM cover GROUP BY day
    )
    SELECT CAST(d.day AS BIGINT) AS day, d.dau, w.wau,
           CAST(d.dau * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per epoch-day, with DAU/WAU stickiness
    — exact distinct counts, no sketches. The trailing window is the
    COVER-EXPLODE trick: each (user, active-day) row covers the 7 days
    it keeps the user "weekly active" for, then one distinct collapses
    multi-day users — a bounded 7x fan-out into partial aggs instead of
    a per-day range self-join (which re-scans the activity relation once
    per window position). Days are exact integer epoch-day indexes; WAU
    rows are emitted only for days with any same-day activity (inner
    join to DAU).

    Scale shape: two distinct partial aggs + a day-keyed equi-join; the
    fan-out factor is the window length, independent of corpus size."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    # ONE per-user agg builds the distinct day set; both the per-day
    # distinct (DAU) and the 7-day cover distinct (WAU) are then
    # per-USER-local, so the cover fan-out and its dedup run as row-local
    # array ops instead of shuffling a 7x cover stream for a second
    # corpus-wide distinct (A/B at the 10x scale-up: 4.6 -> 2.3 s
    # first-exec, identical rows)
    days = (
        ev.select(
            "user_id",
            F.expr(f"unix_millis(cast(ts as timestamp)) div {_DAY_MS}").alias("day"),
        )
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("ds"))
    )
    dau = (
        days.select(F.explode("ds").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    cover = days.select(
        F.explode(
            F.expr("array_distinct(flatten(transform(ds, d -> sequence(d, d + 6))))")
        ).alias("day")
    )
    wau = cover.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.expr("dau * 1000000 div wau").alias("stickiness_ppm"),
    )


# ---------------------------------------------------------------------------
# Day-over-day revenue momentum (lag window over a daily rollup)
# ---------------------------------------------------------------------------
@register(
    "revenue_momentum",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT d, rev_cents, n_orders,
           CAST(rev_cents - lag(rev_cents) OVER (ORDER BY d) AS BIGINT)
             AS delta_cents
    FROM daily
    """,
)
def q_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue rollup with day-over-day delta (lag). The lag
    window runs over the AGGREGATED daily relation — bounded by the
    calendar, not the order count — so the global single-partition
    window is free by construction (same bounded-relation discipline as
    the sketch merges). NOTE (VERDICT r7): this is the registry's ONE
    unpartitioned window and it is safe ONLY at this granularity — a
    copy at (source, day) or finer must partition the window by the
    grouping key or it inherits a corpus-wide single-partition sort.
    First day's delta is NULL (nothing to compare), money as exact
    cents."""
    _set_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("d")
        )
        .agg(
            F.expr("sum(cast(round(o_totalprice * 100) as bigint))").alias(
                "rev_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("d")
    return daily.select(
        "d",
        "rev_cents",
        "n_orders",
        (F.col("rev_cents") - F.lag("rev_cents").over(w)).alias("delta_cents"),
    )


# ---------------------------------------------------------------------------
# Broadcast star join: revenue per nation (small dims broadcast)
# ---------------------------------------------------------------------------
@register(
    "star_join_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the small dims (customer,
    nation) — the fact table never shuffles for them; revenue as exact
    cents. Filter on orders pushes below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).alias("revenue_cents"), F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# P6/P8/F2: computed-gate filters (ruler area/aspect gates analogue)
# ---------------------------------------------------------------------------
@register(
    "gate_filters",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_quantity * l_extendedprice) AS BIGINT) AS area_proxy
    FROM lineitem
    WHERE l_quantity * l_extendedprice BETWEEN 50000 AND 500000
      AND l_extendedprice / greatest(l_quantity, 1) BETWEEN 900 AND 2000
      AND l_discount < 0.05
    """,
)
def q_gate_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P8 computed gates (reference: cli/ocrd_anybaseocr_cropping.py:214-250):
    area-band + aspect-ratio-band predicates as pure column expressions —
    pushed into the scan where possible, codegen'd otherwise."""
    li = load_table(spark, sf_dir, "lineitem")
    area = F.col("l_quantity") * F.col("l_extendedprice")
    aspect = F.col("l_extendedprice") / F.greatest(F.col("l_quantity"), F.lit(1.0))
    return (
        li.filter(area.between(50000, 500000) & aspect.between(900, 2000) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber", F.round(area).cast("bigint").alias("area_proxy"))
    )


# ---------------------------------------------------------------------------
# SO2: set subtraction (candidate-removal analogue)
# ---------------------------------------------------------------------------
@register(
    "set_subtract_customers",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    EXCEPT
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def q_set_subtract_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO2 subtraction (reference: cli/ocrd_anybaseocr_cropping.py:233,633-634):
    customers with orders but no 'F' orders — exceptAll/anti-join form."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    with_f = c.join(
        o.filter(F.col("o_orderstatus") == "F"), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey")
    return with_orders.exceptAll(with_f).distinct()


# ---------------------------------------------------------------------------
# W3: global ordered top-k with deterministic tie-break
# ---------------------------------------------------------------------------
@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 area-descending ordering (reference:
    cli/ocrd_anybaseocr_cropping.py:219,808-809) as TakeOrderedAndProject —
    Spark plans orderBy+limit as a per-partition top-k + merge, never a full
    sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"))
    )


# ---------------------------------------------------------------------------
# W2+F10: attenuation-scored top-1 per group (border-line scoring analogue)
# ---------------------------------------------------------------------------
@register(
    "attenuated_top1",
    oracle="""
    SELECT user_id, event_id,
           round(score, 6) AS score
    FROM (
      SELECT user_id, event_id,
             3 * (value / 200.0) * exp(-3 * (value / 200.0)) AS score,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY 3 * (value / 200.0) * exp(-3 * (value / 200.0)) DESC,
                                         event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_attenuated_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 attenuation 3x*e^(-3x) (reference:
    cli/ocrd_anybaseocr_cropping.py:566-568) + W2 top-1 per side (reference:
    cli/ocrd_anybaseocr_cropping.py:565-608): score column expr, window
    top-1 with id tie-break."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value") / 200.0
    score = 3 * x * F.exp(-3 * x)
    # top-1 as a max_by partial agg (the top1_per_group shape): ordering
    # key (score, -event_id) is unique per group (event_id is), so this
    # picks exactly the window's rn=1 row — max score, ties to the
    # smallest event_id — with map-side combine instead of a full sort
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(F.col("event_id").alias("eid"), score.alias("s")),
                F.struct(score.alias("s"), (-F.col("event_id")).alias("neid")),
            ).alias("t")
        )
        .select(
            "user_id",
            F.col("t.eid").alias("event_id"),
            F.round(F.col("t.s"), 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# register the dedup / similarity / textstats suites
# ---------------------------------------------------------------------------
from .operators import dedup as _dd  # noqa: E402
from .operators import similarity as _sim  # noqa: E402
from .operators import textstats as _ts  # noqa: E402

register("dedup_minhash_lsh", _dd.ORACLE_MINHASH)(_dd.q_dedup_minhash_lsh)
register("dedup_minhash_verified", _dd.ORACLE_MINHASH_VERIFIED)(_dd.q_dedup_minhash_verified)
register("dedup_clusters", _dd.ORACLE_DEDUP_CLUSTERS)(_dd.q_dedup_clusters)
register("dedup_cluster_stats", _dd.ORACLE_DEDUP_CLUSTER_STATS)(
    _dd.q_dedup_cluster_stats
)
register("pagerank_neardup", _dd.ORACLE_PAGERANK)(_dd.q_pagerank_neardup)
register("dedup_source_matrix", _dd.ORACLE_DEDUP_SOURCE_MATRIX)(_dd.q_dedup_source_matrix)
register("novelty_score", _dd.ORACLE_NOVELTY)(_dd.q_novelty_score)
register("graph_clustering_coeff", _dd.ORACLE_CLUSTERING_COEFF)(_dd.q_graph_clustering_coeff)
register("source_dup_report", _dd.ORACLE_SOURCE_DUP_REPORT)(_dd.q_source_dup_report)
register("dedup_simhash", _dd.ORACLE_SIMHASH)(_dd.q_dedup_simhash)
register("dedup_simhash_pairs", _dd.ORACLE_SIMHASH_PAIRS)(_dd.q_dedup_simhash_pairs)
register("dedup_simhash_dropped_bands", _dd.ORACLE_SIMHASH_DROPPED_BANDS)(
    _dd.q_dedup_simhash_dropped_bands
)
register("dedup_incremental", _dd.ORACLE_DEDUP_INCREMENTAL)(_dd.q_dedup_incremental)
register("dedup_bloom_ingest", _dd.ORACLE_DEDUP_BLOOM)(_dd.q_dedup_bloom_ingest)
register("dedup_jaccard_ngram", _dd.ORACLE_JACCARD)(_dd.q_dedup_jaccard)
register("dedup_jaccard_histogram", _dd.ORACLE_JACCARD_HISTOGRAM)(
    _dd.q_dedup_jaccard_histogram
)
register("lsh_recall_curve", _dd.ORACLE_LSH_RECALL_CURVE)(_dd.q_lsh_recall_curve)
register("dedup_cdc_chunks", _dd.ORACLE_DEDUP_CDC)(_dd.q_dedup_cdc_chunks)
register("dedup_cdc_pairs", _dd.ORACLE_CDC_PAIRS)(_dd.q_dedup_cdc_pairs)
register("decontaminate_overlap", _dd.ORACLE_DECON)(_dd.q_decontaminate_overlap)
register("dedup_exact_substring", _dd.ORACLE_SUBSTR)(_dd.q_dedup_exact_substring)
register("repetition_ratio", _dd.ORACLE_REPETITION)(_dd.q_repetition_ratio)
register("dedup_paragraph", _dd.ORACLE_DEDUP_PARAGRAPH)(_dd.q_dedup_paragraph)
register("ann_brute_force", _sim.ORACLE_ANN_BRUTE)(_sim.q_ann_brute_force)
register("ann_lsh_bucketed", _sim.ORACLE_ANN_LSH)(_sim.q_ann_lsh_bucketed)
register("ann_recall_audit", _sim.ORACLE_ANN_RECALL)(_sim.q_ann_recall_audit)
register("ann_ivf_flat", _sim.ORACLE_ANN_IVF)(_sim.q_ann_ivf_flat)
register("ann_pq_adc", _sim.ORACLE_ANN_PQ)(_sim.q_ann_pq_adc)
register("kmeans_clusters", _sim.ORACLE_KMEANS)(_sim.q_kmeans_clusters)
register("dedup_semantic", _sim.ORACLE_SEMDEDUP)(_sim.q_dedup_semantic)
register("embedding_pca_top1", _sim.ORACLE_PCA_TOP1)(_sim.q_embedding_pca_top1)
register("embedding_quantize_int8", _sim.ORACLE_QUANT_INT8)(
    _sim.q_embedding_quantize_int8
)
register("embedding_stats", _sim.ORACLE_EMB_STATS)(_sim.q_embedding_stats)
register("embedding_outliers", _sim.ORACLE_EMB_OUTLIERS)(_sim.q_embedding_outliers)
register("lang_id", _ts.ORACLE_LANG_ID)(_ts.q_lang_id)
register("corpus_clean_filter", _ts.ORACLE_CLEAN_FILTER)(_ts.q_corpus_clean_filter)
register("quality_score", _ts.ORACLE_QUALITY)(_ts.q_quality_score)
register("token_count", _ts.ORACLE_TOKEN_COUNT)(_ts.q_token_count)
register("fingerprint", _ts.ORACLE_FINGERPRINT)(_ts.q_fingerprint)
register("fingerprint_winnow", _ts.ORACLE_FINGERPRINT_WINNOW)(_ts.q_fingerprint_winnow)
register("dedup_containment", _ts.ORACLE_DEDUP_CONTAINMENT)(_ts.q_dedup_containment)
register("boilerplate_ratio", _ts.ORACLE_BOILERPLATE)(_ts.q_boilerplate_ratio)
register("lm_cross_entropy", _ts.ORACLE_LM_CE)(_ts.q_lm_cross_entropy)
register("unigram_entropy", _ts.ORACLE_UNIGRAM_ENTROPY)(_ts.q_unigram_entropy)
register("clean_filter_report", _ts.ORACLE_CLEAN_REPORT)(_ts.q_clean_filter_report)
register("zipf_topk", _ts.ORACLE_ZIPF_TOPK)(_ts.q_zipf_topk)
register("cms_heavy_hitters", _ts.ORACLE_CMS_HEAVY_HITTERS)(_ts.q_cms_heavy_hitters)
register("distinct_kmv_audit", _ts.ORACLE_DISTINCT_KMV)(_ts.q_distinct_kmv_audit)
register("histogram_quantile_audit", _ts.ORACLE_HIST_QUANTILES)(_ts.q_histogram_quantile_audit)
register("lm_bigram_cross_entropy", _ts.ORACLE_LM_BIGRAM_CE)(_ts.q_lm_bigram_cross_entropy)
register("token_budget_select", _ts.ORACLE_TOKEN_BUDGET)(_ts.q_token_budget_select)
register("collocations_pmi", _ts.ORACLE_COLLOCATIONS)(_ts.q_collocations_pmi)
register("pii_scrub", _ts.ORACLE_PII)(_ts.q_pii_scrub)
register("stratified_sample", _ts.ORACLE_STRATIFIED)(_ts.q_stratified_sample)
register("dedup_exact_normalized", _ts.ORACLE_DEDUP_NORM)(_ts.q_dedup_exact_normalized)
register("token_windows", _ts.ORACLE_TOKEN_WINDOWS)(_ts.q_token_windows)
register("bm25_topk", _ts.ORACLE_BM25)(_ts.q_bm25_topk)
register("tfidf_topk", _ts.ORACLE_TFIDF_TOPK)(_ts.q_tfidf_topk)
register("source_mix_weights", _ts.ORACLE_SOURCE_MIX)(_ts.q_source_mix_weights)
register("source_mix_sample", _ts.ORACLE_SOURCE_MIX_SAMPLE)(_ts.q_source_mix_sample)
register("corpus_summary", _ts.ORACLE_CORPUS_SUMMARY)(_ts.q_corpus_summary)
register("train_eval_split", _ts.ORACLE_TRAIN_EVAL_SPLIT)(_ts.q_train_eval_split)
register("decontaminate_splits", _ts.ORACLE_DECONTAMINATE_SPLITS)(
    _ts.q_decontaminate_splits
)
register("source_mix_temperature", _ts.ORACLE_SOURCE_MIX_TEMPERATURE)(
    _ts.q_source_mix_temperature
)
register("pack_sequences", _ts.ORACLE_PACK_SEQUENCES)(_ts.q_pack_sequences)
register("pack_efficiency", _ts.ORACLE_PACK_EFFICIENCY)(_ts.q_pack_efficiency)
register("dsir_weights", _ts.ORACLE_DSIR)(_ts.q_dsir_weights)
register("dsir_resample", _ts.ORACLE_DSIR_RESAMPLE)(_ts.q_dsir_resample)


# ---------------------------------------------------------------------------
# Pipeline-backed queries (rows-only checks: the oracle is the in-repo
# single-process Python implementation, asserted by pytest — numpy kernels
# are not expressible in DuckDB SQL; the driver records the weaker check)
# ---------------------------------------------------------------------------
import os as _os
import tempfile as _tempfile

_PIPE_DOCS = 16


def _pipeline_corpus() -> str:
    """Deterministic tiny corpus for pipeline-backed queries, cached per
    process user (seed 42 — same corpus every run, any machine). The path
    keys on SYNTH_VERSION so a generator change can never serve stale
    bytes, and is knowable at import time so DuckDB oracles can embed
    read_parquet() literals over it."""
    from .synth import SYNTH_VERSION, generate_corpus

    d = _os.path.join(
        _tempfile.gettempdir(), f"oas_qcorpus_{_PIPE_DOCS}_42_v{SYNTH_VERSION}"
    )
    marker = _os.path.join(d, ".complete")
    if not _os.path.exists(marker):
        # generate into a private tmp dir and PUBLISH with one rename:
        # every process importing this module (driver gate, bench, pytest)
        # runs this path, and two concurrent imports writing the same final
        # files could tear them. Publish protocol (round-4 review closed a
        # TOCTOU here — never check-then-delete d, which can destroy a
        # corpus a racing process just completed):
        #   1. try rename(tmp, d); success = published;
        #   2. on failure, if the marker exists a complete corpus won the
        #      race — discard our byte-identical copy;
        #   3. else a stale markerless dir blocks the target: atomically
        #      CLAIM it aside by rename (worst case we move a corpus that
        #      completed inside the race window — then step 1 publishes our
        #      identical one, still complete) and retry.
        import shutil as _shutil

        from .oracle import materialize_expected

        tmp = f"{d}.tmp.{_os.getpid()}"
        generate_corpus(tmp, _PIPE_DOCS, seed=42, workers=1)
        # expectations are part of the published unit: any dir reachable
        # under the final name is COMPLETE (corpus + oracle parquet), so
        # no reader can ever observe a corpus whose expected files are
        # still being written (round-4 review)
        materialize_expected(tmp, _PIPE_DOCS, seed=42)
        open(_os.path.join(tmp, ".complete"), "w").write("ok")
        for attempt in range(4):
            try:
                _os.rename(tmp, d)
                break
            except OSError:
                if _os.path.exists(marker):
                    _shutil.rmtree(tmp, ignore_errors=True)
                    break
                aside = f"{d}.stale.{_os.getpid()}.{attempt}"
                # re-check the marker at the last instant (ADVICE r4: the
                # window between the check above and the claim is where a
                # racing publisher can complete) ...
                if _os.path.exists(marker):
                    _shutil.rmtree(tmp, ignore_errors=True)
                    break
                try:
                    _os.rename(d, aside)
                except OSError:
                    pass  # another process claimed/moved it; just retry
                else:
                    # ... and again AFTER the claim: if the dir we moved
                    # aside turns out complete, we displaced a published
                    # corpus inside the race window — put it straight back
                    # so no reader ever observes it absent
                    if _os.path.exists(_os.path.join(aside, ".complete")):
                        try:
                            _os.rename(aside, d)
                        except OSError:
                            # another publisher took d meanwhile; the aside
                            # copy is a redundant byte-identical duplicate
                            _shutil.rmtree(aside, ignore_errors=True)
                        _shutil.rmtree(tmp, ignore_errors=True)
                        break
                    _shutil.rmtree(aside, ignore_errors=True)
        else:
            _shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"could not publish query corpus at {d}: target neither "
                "accepts the rename nor carries a completion marker"
            )
    # upgrade path for corpora published before the current
    # EXPECTED_VERSION (or before expectations were part of the publish
    # unit): the marker is version-stamped and written after every data
    # file, so a kernel/shaping/zoom change that bumps EXPECTED_VERSION
    # re-materializes stale expectations instead of serving them
    from .oracle import expected_marker_name, materialize_expected

    if not _os.path.exists(_os.path.join(d, expected_marker_name())):
        materialize_expected(d, _PIPE_DOCS, seed=42)
    return d


@register(
    "pipeline_page_results",
    oracle=f"""
    SELECT doc_id, media_ref, page_no, bx1, by1, bx2, by2, perfect, skew,
           features, labels, n_text_regions, n_image_regions
    FROM read_parquet('{_os.path.join("%QC%", "expected_page_results.parquet")}')
    """,
)
def q_pipeline_page_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused image stage end-to-end (decode→binarize→deskew→crop→tiseg→
    classify) over the deterministic synthetic corpus; flat result rows.

    Oracle: the single-process Python kernels' expected rows, materialized
    as SYNTH_VERSION-keyed parquet at corpus generation
    (oracle.materialize_expected) and read back by DuckDB — a full
    rows+schema+hash gate (the Spark analogue of the reference's e2e
    postcondition tests, reference: tests/test_ocrd.py:24-25,32)."""
    from .operators.pipeline import build_page_results
    from .sources.tables import load_corpus

    docs, blobs = load_corpus(spark, _pipeline_corpus())
    # error IS NULL: the quarantine channel never fires on the clean query
    # corpus, but the gated output must stay exact on any input
    pr = build_page_results(docs, blobs, n_parts=8).filter(F.col("error").isNull())
    return pr.select(
        "doc_id", "media_ref", "page_no",
        F.col("border")[0].alias("bx1"), F.col("border")[1].alias("by1"),
        F.col("border")[2].alias("bx2"), F.col("border")[3].alias("by2"),
        "perfect", F.round("skew", 6).alias("skew"), "features",
        F.array_join("labels", ",").alias("labels"),
        "n_text_regions", "n_image_regions",
    ).orderBy("doc_id", "page_no")


@register(
    "pipeline_doc_structure",
    oracle=f"""
    SELECT doc_id, log_id, log_ref, label, parent_id
    FROM read_parquet('{_os.path.join("%QC%", "expected_doc_structure.parquet")}')
    """,
)
def q_pipeline_doc_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 document fold over classified pages (reference:
    cli/ocrd_anybaseocr_layout_analysis.py:140-220), flattened div rows.

    Oracle: expected divs from the single-process fold, materialized as
    parquet beside the corpus (oracle.materialize_expected) — full
    rows+schema+hash gate (reference: tests/test_ocrd.py:44)."""
    from .operators.fold import fold_structure
    from .operators.pipeline import build_page_results
    from .sources.tables import load_corpus

    docs, blobs = load_corpus(spark, _pipeline_corpus())
    st = fold_structure(build_page_results(docs, blobs, n_parts=8))
    return st.select("doc_id", F.explode("divs").alias("d")).select(
        "doc_id", F.col("d.log_id").alias("log_id"),
        # F6: the reference's mets:div id format (layout_analysis.py:206)
        F.format_string("LOG_%04d", F.col("d.log_id")).alias("log_ref"),
        F.col("d.label").alias("label"),
        F.col("d.parent_id").alias("parent_id"),
    ).orderBy("doc_id", "log_id")


_QCORPUS_DIR = _pipeline_corpus()  # generated at import so the DuckDB
# oracles below can read the same parquet the Spark queries scan


def _hexn_to_int_duck_local(col_expr: str, n_hex: int) -> str:
    from .operators.dedup import _hexn_to_int_duck

    return _hexn_to_int_duck(col_expr, n_hex)


@register(
    "pipeline_extracted_spans",
    oracle=f"""
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s."offset") - 1
                AS BIGINT) AS ord,
           s.kind AS kind, s.text AS text, s.media_ref AS media_ref
    FROM (
      SELECT doc_id, unnest(spans) AS s
      FROM read_parquet('{_os.path.join("%QC%", "documents.parquet")}')
    )
    """,
)
def q_pipeline_extracted_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict span-sequence extraction over the synthetic interleaved corpus
    (stored shuffled; offset carries reading order). DuckDB oracle re-sorts
    the same parquet by offset — full value-level cross-check."""
    from .sources.tables import load_corpus

    docs, _ = load_corpus(spark, _pipeline_corpus())
    return extract_spans(docs).select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", F.col("s.order").cast("bigint").alias("ord"), F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref"),
    )


@register(
    "media_metadata",
    oracle=f"""
    WITH hx AS (
      SELECT media_ref, lower(hex(image)) AS hx, octet_length(image) AS byte_size
      FROM read_parquet('{_os.path.join("%QC%", "page_blobs.parquet")}')
    )
    SELECT media_ref,
           substring(hx, 1, 16) = '89504e470d0a1a0a' AS is_png,
           CAST(%W% AS INTEGER) AS png_width,
           CAST(%H% AS INTEGER) AS png_height,
           CAST(%D% AS INTEGER) AS png_bit_depth,
           CAST(byte_size AS BIGINT) AS byte_size,
           CAST(%W% AS BIGINT) * CAST(%H% AS BIGINT) AS pixels
    FROM hx
    """,
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column metadata, JVM-side only: PNG IHDR
    width/height/bit-depth parsed with hex/conv column expressions — no
    Python touches the bytes (operators/media.py). DuckDB oracle parses the
    same IHDR bytes from the blob parquet (hex + positional arithmetic)."""
    from .operators.media import media_metadata
    from .sources.tables import load_corpus

    _, blobs = load_corpus(spark, _pipeline_corpus())
    return media_metadata(blobs).orderBy("media_ref")


@register(
    "media_audio_energy",
    oracle=f"""
    WITH hx AS (
      SELECT media_ref, lower(hex(image)) AS hx, octet_length(image) AS nb
      FROM read_parquet('{_os.path.join("%QC%", "page_blobs.parquet")}')
    ), lim AS (
      SELECT media_ref, hx, nb // 2 AS n_samp,
             least(%MAXW%, ((nb // 2) + %W% - 1) // %W%) AS n_win
      FROM hx
    ), samp AS (
      SELECT media_ref, t.k // %W% AS win_no,
             CASE WHEN %B1% >= 128 THEN (%B0% + 256 * %B1%) - 65536
                  ELSE %B0% + 256 * %B1% END AS s
      FROM lim, LATERAL unnest(generate_series(0, n_win * %W% - 1)) AS t(k)
      WHERE t.k < n_samp
    )
    SELECT media_ref, CAST(win_no AS INTEGER) AS win_no,
           CAST(COUNT(*) AS INTEGER) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS energy
    FROM samp GROUP BY media_ref, win_no
    """,
)
def q_media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio tier of the multimodal contract: windowed int16-PCM
    sum-of-squares energies via Arrow-batched mapInPandas (np.frombuffer
    decode — the blobs stand in as deterministic PCM; see
    operators/media.py audio_energy_windows). DuckDB oracle re-derives
    every sample from the blob hex (little-endian pairs, two's
    complement) — full rows+schema+hash gate on exact int64 energies."""
    from .operators.media import audio_energy_windows
    from .sources.tables import load_corpus

    _, blobs = load_corpus(spark, _pipeline_corpus())
    return audio_energy_windows(blobs)


@register(
    "media_frame_sample",
    oracle=f"""
    WITH hx AS (
      SELECT media_ref, lower(hex(image)) AS hx, octet_length(image) AS nb
      FROM read_parquet('{_os.path.join("%QC%", "page_blobs.parquet")}')
    ), fr AS (
      SELECT media_ref, hx, nb // %FB% AS n_frames FROM hx
    ), sel AS (
      SELECT media_ref, hx, t.i * %STRIDE% AS frame_no
      FROM fr, LATERAL unnest(generate_series(0, %FMAX% - 1)) AS t(i)
      WHERE t.i * %STRIDE% < n_frames
    ), byv AS (
      SELECT media_ref, frame_no, %BYTE% AS bv
      FROM sel, LATERAL unnest(generate_series(0, %FB% - 1)) AS u(j)
    )
    SELECT media_ref, CAST(frame_no AS INTEGER) AS frame_no,
           CAST(COUNT(*) AS INTEGER) AS n_bytes,
           CAST(SUM(bv) AS BIGINT) AS byte_sum
    FROM byv GROUP BY media_ref, frame_no
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video tier: every stride-th fixed-size raw frame with its exact
    byte sum, via mapInPandas over the binary column (container codecs
    raise NotImplementedError — operators/media.py decode_video_frames;
    the blobs stand in as raw fixed-size-frame video). DuckDB oracle
    re-sums each sampled frame's bytes from the blob hex."""
    from .operators.media import frame_sample
    from .sources.tables import load_corpus

    _, blobs = load_corpus(spark, _pipeline_corpus())
    return frame_sample(blobs)


@register(
    "media_resize",
    oracle=f"""
    SELECT media_ref, width, height, img_md5
    FROM read_parquet('{_os.path.join("%QC%", "expected_resize.parquet")}')
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize tier as a hash-gated query: decode → nearest resample at the
    fixed gate zoom → canonical re-encode, reported as dims + output-PNG
    md5 (operators/media.resize_images). Oracle: the single-process twin's
    expected rows (oracle._expected_resize_row), materialized as
    SYNTH_VERSION-keyed parquet at corpus generation — byte-determinism of
    the whole decode→kernel→encode chain is what the hash pins."""
    from .operators.media import resize_images
    from .oracle import MEDIA_RESIZE_ZOOM
    from .sources.tables import load_corpus

    _, blobs = load_corpus(spark, _pipeline_corpus())
    return resize_images(blobs, MEDIA_RESIZE_ZOOM).select(
        "media_ref", "width", "height", F.md5("image").alias("img_md5")
    )




# shared pigeonhole-banding SQL over the materialized dhash parquet — the
# SAME constants the Spark side reads from dedup.py (spliced, not
# hard-coded: a band-geometry or cap change must move BOTH engines
# together or the driver gate fails on correct code). Ends in
# pairs(media_ref_a, media_ref_b, hamming).
from .operators.dedup import (  # noqa: E402
    SIMHASH_BAND_BITS as _DH_BAND_BITS,
    SIMHASH_BAND_CAP as _DH_BAND_CAP,
    SIMHASH_BAND_MASK as _DH_BAND_MASK,
    SIMHASH_BANDS as _DH_BANDS,
)

_DHASH_MAX_HAMMING = _DH_BANDS - 1  # the pigeonhole bound

_DHASH_PAIRS_CTE = f"""sig AS (
      SELECT media_ref, dhash
      FROM read_parquet('{_os.path.join("%QC%", "expected_dhash.parquet")}')
    ), bands AS (
      SELECT media_ref, dhash, t.b AS band_no,
             CAST((dhash >> ({_DH_BAND_BITS} * t.b)) & {_DH_BAND_MASK}
                  AS INTEGER) AS band_val
      FROM sig CROSS JOIN generate_series(0, {_DH_BANDS - 1}) AS t(b)
    ), ok AS (
      SELECT band_no, band_val FROM bands
      GROUP BY band_no, band_val HAVING COUNT(*) <= {_DH_BAND_CAP}
    ), bc AS (
      SELECT bands.* FROM bands JOIN ok USING (band_no, band_val)
    ), cand AS (
      SELECT DISTINCT a.media_ref AS media_ref_a, b.media_ref AS media_ref_b,
             a.dhash AS sig_a, b.dhash AS sig_b
      FROM bc a JOIN bc b
        ON a.band_no = b.band_no AND a.band_val = b.band_val
       AND a.media_ref < b.media_ref
    ), pairs AS (
      SELECT media_ref_a, media_ref_b,
             CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {_DHASH_MAX_HAMMING}
    )"""



@register(
    "media_dhash",
    oracle=f"""
    SELECT media_ref, dhash
    FROM read_parquet('{_os.path.join("%QC%", "expected_dhash.parquet")}')
    """,
)
def q_media_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash per page image (operators/media.dhash_bytes —
    decode → exact integer block-mean 8x9 grid → gradient bits), the
    pixel-side near-dup fingerprint. Oracle: the single-process twin's
    hashes materialized as versioned parquet beside the query corpus
    (oracle.materialize_expected) — a full rows+schema+hash gate over the
    decode→hash chain."""
    from .operators.media import media_dhash_cached
    from .sources.tables import load_corpus

    qc = _pipeline_corpus()
    _, blobs = load_corpus(spark, qc)
    return media_dhash_cached(blobs, qc)


@register(
    "media_dhash_pairs",
    oracle=f"""
    WITH {_DHASH_PAIRS_CTE}
    SELECT media_ref_a, media_ref_b, hamming FROM pairs
    """,
)
def q_media_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-duplicate page pairs: dHash signatures through the
    SAME pigeonhole 16-bit-band machinery as text SimHash
    (dedup.hamming_pairs — one generic banding for both modalities), exact
    bit_count verify at hamming <= 3 (the 4-band pigeonhole bound). The
    oracle reruns the banding in SQL over the materialized hash parquet —
    the pair ALGEBRA is oracle-checked end to end, not just the hashes."""
    from .operators.dedup import hamming_pairs
    from .operators.media import media_dhash_cached
    from .sources.tables import load_corpus

    qc = _pipeline_corpus()
    _, blobs = load_corpus(spark, qc)
    return hamming_pairs(
        media_dhash_cached(blobs, qc), "media_ref", "dhash",
        max_hamming=_DHASH_MAX_HAMMING,
    )




@register(
    "media_dhash_clusters",
    oracle=f"""
    WITH RECURSIVE {_DHASH_PAIRS_CTE},
    edges AS (
      SELECT media_ref_a AS a, media_ref_b AS b FROM pairs
      UNION ALL
      SELECT media_ref_b AS a, media_ref_a AS b FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT media_ref, media_ref FROM sig
      UNION
      SELECT e.a, r.lbl FROM reach r JOIN edges e ON e.b = r.node
      WHERE r.lbl < e.a
    )
    SELECT node AS media_ref, MIN(lbl) AS cluster_id FROM reach GROUP BY node
    """,
)
def q_media_dhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual dedup clusters: connected components over the page-level
    dHash near-dup pairs — completes the cluster-family symmetry (text
    MinHash clusters, embedding cosine clusters, now pixel clusters).
    cluster_id = lexicographic MIN media_ref of the component (the
    hash-min CC works unchanged on string keys in both engines); every
    page appears, singletons cluster alone. Same pointer-jumping CC as
    the text side — O(log diameter) rounds over the bounded pair set."""
    from .operators.dedup import connected_components_labels, hamming_pairs
    from .operators.media import media_dhash_cached
    from .sources.tables import load_corpus

    qc = _pipeline_corpus()
    _, blobs = load_corpus(spark, qc)
    sig = media_dhash_cached(blobs, qc)
    pairs = hamming_pairs(
        sig, "media_ref", "dhash", max_hamming=_DHASH_MAX_HAMMING
    ).select(F.col("media_ref_a").alias("doc_a"), F.col("media_ref_b").alias("doc_b"))
    lab = connected_components_labels(
        sig.select(F.col("media_ref").alias("doc_id")), pairs
    )
    return lab.select(
        F.col("doc_id").alias("media_ref"), F.col("cluster_id")
    )


@register(
    "visual_doc_pairs",
    oracle=f"""
    WITH {_DHASH_PAIRS_CTE}, pp AS (
      SELECT regexp_replace(media_ref_a, '_p[0-9]*$', '') AS da,
             regexp_replace(media_ref_b, '_p[0-9]*$', '') AS db,
             hamming
      FROM pairs
    )
    SELECT least(da, db) AS doc_a, greatest(da, db) AS doc_b,
           COUNT(*) AS n_page_pairs, CAST(MIN(hamming) AS BIGINT) AS min_hamming
    FROM pp WHERE da <> db GROUP BY 1, 2
    """,
)
def q_visual_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal composition: page-level visual near-dup pairs
    (media_dhash → hamming_pairs) lifted to DOCUMENT pairs — how many of
    two documents' pages look alike, and how close the closest pair is.
    This is the multimodal member of the doc-dedup evidence family (text
    MinHash/SimHash pairs say the words match; this says the SCANS match
    — e.g. the same book digitized twice with different OCR text). Doc id
    recovery from media_ref uses the corpus's '<doc>_pNNN' naming; the
    aggregation is one partial-agg shuffle over the bounded pair set."""
    from .operators.dedup import hamming_pairs
    from .operators.media import media_dhash_cached
    from .sources.tables import load_corpus

    qc = _pipeline_corpus()
    _, blobs = load_corpus(spark, qc)
    pairs = hamming_pairs(
        media_dhash_cached(blobs, qc), "media_ref", "dhash",
        max_hamming=_DHASH_MAX_HAMMING,
    )
    da = F.regexp_replace("media_ref_a", "_p[0-9]*$", "")
    db = F.regexp_replace("media_ref_b", "_p[0-9]*$", "")
    return (
        pairs.withColumn("da", da)
        .withColumn("db", db)
        .filter(F.col("da") != F.col("db"))
        .groupBy(
            F.least("da", "db").alias("doc_a"), F.greatest("da", "db").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_page_pairs"),
            F.min("hamming").alias("min_hamming"),
        )
    )


@register(
    "bpe_train",
    oracle=f"""
    SELECT CAST(merge_rank AS BIGINT) AS merge_rank, pair_left, pair_right, merged,
           CAST(fit_coverage_ppm AS BIGINT) AS fit_coverage_ppm
    FROM read_parquet('{_os.path.join("%QC%", "expected_bpe_merges.parquet")}')
    """,
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer FIT over the interleaved corpus (kernels/bpe.py,
    Sennrich et al. 2016): distributed word count → bounded top-V fetch →
    driver merge loop over the word-frequency dict (the standard BPE
    formulation — corpus size only touches the one partial-agg pass).
    Oracle: the single-process twin's merge table materialized beside the
    corpus (oracle.materialize_expected) — a full rows+schema+hash gate
    over the count→fit chain."""
    from .operators.tokenize import bpe_train_df

    return bpe_train_df(spark, _pipeline_corpus())


@register(
    "bpe_tokenize",
    oracle=f"""
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_tokens AS BIGINT) AS n_tokens, tokens_md5
    FROM read_parquet('{_os.path.join("%QC%", "expected_bpe_tokens.parquet")}')
    """,
)
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tokenization under the corpus-learned BPE vocabulary:
    reading-order flat text → GPT-2-style lowest-rank-first encode
    (Arrow-batched mapInPandas, zero exchanges — plan-asserted). The md5
    digest pins the exact token SEQUENCE, not just counts."""
    from .operators.tokenize import bpe_tokenize_df

    return bpe_tokenize_df(spark, _pipeline_corpus())


# splice the corpus path and the hex→int arithmetic into the two oracles
# (IHDR byte k (1-based) sits at hex chars [2k-1, 2k]: width @17-20,
# height @21-24, bit depth @25)
for _qname in (
    "pipeline_extracted_spans",
    "media_metadata",
    "pipeline_page_results",
    "pipeline_doc_structure",
    "media_audio_energy",
    "media_frame_sample",
    "media_resize",
    "media_dhash",
    "media_dhash_pairs",
    "media_dhash_clusters",
    "visual_doc_pairs",
    "bpe_train",
    "bpe_tokenize",
):
    ORACLE[_qname] = ORACLE[_qname].replace("%QC%", _QCORPUS_DIR)

from .operators import media as _media  # noqa: E402

# audio: little-endian int16 at sample k = byte(2k) + 256*byte(2k+1);
# 0-based byte j sits at hex chars [2j+1, 2j+2]
ORACLE["media_audio_energy"] = (
    ORACLE["media_audio_energy"]
    .replace("%B0%", _hexn_to_int_duck_local("substring(hx, 4 * t.k + 1, 2)", 2))
    .replace("%B1%", _hexn_to_int_duck_local("substring(hx, 4 * t.k + 3, 2)", 2))
    .replace("%W%", str(_media.AUDIO_WINDOW))
    .replace("%MAXW%", str(_media.AUDIO_MAX_WINDOWS))
)
# video: byte j of sampled frame f sits at global byte f*FB + j
ORACLE["media_frame_sample"] = (
    ORACLE["media_frame_sample"]
    .replace(
        "%BYTE%",
        _hexn_to_int_duck_local("substring(hx, 2 * (frame_no * %FB% + u.j) + 1, 2)", 2),
    )
    .replace("%FB%", str(_media.FRAME_BYTES))
    .replace("%STRIDE%", str(_media.FRAME_STRIDE))
    .replace("%FMAX%", str(_media.FRAME_MAX))
)
ORACLE["media_metadata"] = (
    ORACLE["media_metadata"]
    .replace("%W%", _hexn_to_int_duck_local("substring(hx, 33, 8)", 8))
    .replace("%H%", _hexn_to_int_duck_local("substring(hx, 41, 8)", 8))
    .replace("%D%", _hexn_to_int_duck_local("substring(hx, 49, 2)", 2))
)


# ---------------------------------------------------------------------------
# W6: ordered edge-trim via lead/lag (y-sorted noise trimming analogue)
# ---------------------------------------------------------------------------
@register(
    "edge_trim",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_prev,
             epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_ms(ts) AS gap_next
      FROM events
    )
    SELECT user_id, event_id
    FROM o
    WHERE NOT ((rn = 1 AND gap_next > 3600000 AND value < 50)
            OR (rn = n AND gap_prev > 3600000 AND value < 50))
    """,
)
def q_edge_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 (reference: cli/ocrd_anybaseocr_cropping.py:627-656): strip
    first/last element of an ordered group when isolated (gap > threshold)
    and small (area < limit) — lead/lag + row_number, one shuffle."""
    _set_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.unix_millis(F.lag("ts").over(w).cast("timestamp"))
    next_ms = F.unix_millis(F.lead("ts").over(w).cast("timestamp"))
    o = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("gap_prev", ms - prev_ms)
        .withColumn("gap_next", next_ms - ms)
    )
    trim = (
        ((F.col("rn") == 1) & (F.col("gap_next") > 3_600_000) & (F.col("value") < 50))
        | ((F.col("rn") == F.col("n")) & (F.col("gap_prev") > 3_600_000) & (F.col("value") < 50))
    )
    return o.filter(~trim).select("user_id", "event_id")


# ---------------------------------------------------------------------------
# J3: exclusion against a per-group broadcast scalar (ruler-side analogue)
# ---------------------------------------------------------------------------
@register(
    "scalar_exclusion",
    oracle="""
    WITH top1 AS (
      SELECT user_id, event_type AS top_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT e.user_id, e.event_id
    FROM events e JOIN top1 t ON e.user_id = t.user_id
    WHERE e.event_type <> t.top_type
    """,
)
def q_scalar_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (reference: cli/ocrd_anybaseocr_cropping.py:545-564): drop
    candidates on the ruler's side — exclusion against a per-group top-1
    scalar, realized as a broadcast join of the tiny aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    top1 = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    return (
        ev.join(F.broadcast(top1), "user_id")
        .filter(F.col("event_type") != F.col("top_type"))
        .select("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# A6: multi-label threshold + argmax fallback (classifier output shape)
# ---------------------------------------------------------------------------
@register(
    "multilabel_threshold",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(' ' || text || ' ', ' (the|and|of|to) ')) AS BIGINT) AS s_en,
             CAST(len(regexp_extract_all(' ' || text || ' ', ' (data|table|row) ')) AS BIGINT) AS s_db,
             CAST(len(regexp_extract_all(' ' || text || ' ', ' (query|join|sort) ')) AS BIGINT) AS s_sql
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN s_en < 3 AND s_db < 3 AND s_sql < 3 THEN
             CASE WHEN s_en >= s_db AND s_en >= s_sql THEN 'en'
                  WHEN s_db >= s_sql THEN 'db' ELSE 'sql' END
           ELSE concat_ws(',',
             CASE WHEN s_en >= 3 THEN 'en' END,
             CASE WHEN s_db >= 3 THEN 'db' END,
             CASE WHEN s_sql >= 3 THEN 'sql' END)
           END AS labels
    FROM h
    """,
)
def q_multilabel_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (reference: cli/ocrd_anybaseocr_layout_analysis.py:114-133):
    labels = scores >= threshold; empty → argmax singleton. Pure column
    expressions over marker-hit scores."""
    docs = load_table(spark, sf_dir, "documents")
    def hits(pat):
        return F.expr(f"regexp_count(concat(' ', text, ' '), ' ({pat}) ')").cast("bigint")
    h = docs.select(
        "doc_id",
        hits("the|and|of|to").alias("s_en"),
        hits("data|table|row").alias("s_db"),
        hits("query|join|sort").alias("s_sql"),
    )
    argmax = (
        F.when((F.col("s_en") >= F.col("s_db")) & (F.col("s_en") >= F.col("s_sql")), "en")
        .when(F.col("s_db") >= F.col("s_sql"), "db")
        .otherwise("sql")
    )
    multi = F.concat_ws(
        ",",
        F.when(F.col("s_en") >= 3, "en"),
        F.when(F.col("s_db") >= 3, "db"),
        F.when(F.col("s_sql") >= 3, "sql"),
    )
    none_pass = (F.col("s_en") < 3) & (F.col("s_db") < 3) & (F.col("s_sql") < 3)
    return h.select("doc_id", F.when(none_pass, argmax).otherwise(multi).alias("labels"))


# ---------------------------------------------------------------------------
# SO3: array union / distinct set ops per group
# ---------------------------------------------------------------------------
@register(
    "array_set_union",
    oracle="""
    WITH halves AS (
      SELECT user_id,
             list_sort(list_distinct(list(event_type)
               FILTER (WHERE event_id % 2 = 0))) AS types_even,
             list_sort(list_distinct(list(event_type)
               FILTER (WHERE event_id % 2 = 1))) AS types_odd
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list_cat(types_even, types_odd))), ',')
             AS all_types,
           CAST(len(list_distinct(list_cat(types_even, types_odd))) AS BIGINT) AS n_types
    FROM halves
    """,
)
def q_array_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO3 (reference: cli/ocrd_anybaseocr_cropping.py:373,419): index-set
    union during clustering — array_union/array_distinct column ops."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.array_sort(F.array_distinct(F.collect_list(
            F.when(F.col("event_id") % 2 == 0, F.col("event_type"))))).alias("types_even"),
        F.array_sort(F.array_distinct(F.collect_list(
            F.when(F.col("event_id") % 2 == 1, F.col("event_type"))))).alias("types_odd"),
    )
    u = F.array_sort(F.array_distinct(F.concat("types_even", "types_odd")))
    return g.select(
        "user_id",
        F.array_join(u, ",").alias("all_types"),
        F.size(u).cast("bigint").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# W8: deterministic sample (seeded 4-page fixture analogue, hash-based)
# ---------------------------------------------------------------------------
@register(
    "deterministic_sample",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#12') AS sort_key
    FROM documents
    ORDER BY sort_key
    LIMIT 4
    """,
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 (reference: tests/conftest.py:36-39, seed 12): deterministic
    sample — engine-portable via md5 ordering instead of rand(seed)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#12")).cast("binary"))
    return docs.select("doc_id", key.alias("sort_key")).orderBy("sort_key").limit(4)


# ---------------------------------------------------------------------------
# Rollup: multi-level metrics aggregation (checkpoint metrics at scale)
# ---------------------------------------------------------------------------
@register(
    "rollup_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical metrics rollup — single pass, grouping-sets expansion."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "total_cents",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# A4: length-weighted average (merged-group weight analogue)
# ---------------------------------------------------------------------------
@register(
    "weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(SUM(l_quantity * l_discount) / SUM(l_quantity), 6) AS wavg_disc,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (reference: cli/ocrd_anybaseocr_cropping.py:385-389): weighted
    mean as sum(w*x)/sum(w) — partial-aggregable, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_quantity") * F.col("l_discount")) / F.sum("l_quantity"), 6
        ).alias("wavg_disc"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )

register("contrastive_hard_negatives", _sim.ORACLE_HARD_NEGATIVES)(
    _sim.q_contrastive_hard_negatives
)
register("dedup_embedding_cosine", _sim.ORACLE_DEDUP_EMB)(_sim.q_dedup_embedding_cosine)
register("decontaminate_embeddings", _sim.ORACLE_DECON_EMB)(_sim.q_decontaminate_embeddings)
register("dedup_embedding_clusters", _sim.ORACLE_DEDUP_EMB_CLUSTERS)(
    _sim.q_dedup_embedding_clusters
)


# ---------------------------------------------------------------------------
# Exact interpolated quantiles (latency-metrics shape for checkpoint tables)
# ---------------------------------------------------------------------------
@register(
    "value_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group — the metrics-table
    rollup shape (p50/p95/p99 latency) a checkpointed 100 TB run reports.

    SORT-BASED rank interpolation, not Spark's `percentile` aggregate: the
    aggregate buffers every value of a group in executor memory, which with
    a handful of event_type groups at 100x scale is an OOM, not a slowdown
    (VERDICT round 2, 'What's wrong' #2). Here the group is SORTED
    (external, spillable) once — row_number and the per-group count share
    the same exchange, the final groupBy reuses that partitioning (single
    shuffle, plan-asserted in test_plans), and per-row state is O(1). The
    interpolation replicates percentile/quantile_cont exactly: pos =
    q*(n-1) in doubles, v_lo + (v_hi - v_lo)*frac on the two bracketing
    ranks. (If a single group outgrew one reducer's sort throughput, the
    next step would be range-partitioning by (event_type, value) with a
    two-pass global rank — same arithmetic, more exchanges; not needed at
    this group cardinality.)"""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), "event_id"
    )
    wn = Window.partitionBy("event_type")
    # NULL semantics (round-3 review finding; latent — testdata has no
    # NULLs): percentile/quantile_cont ignore NULL values but COUNT(*)
    # counts them. NULLs sort LAST so ranks 1..count(value) are exactly
    # the non-null rows; quantile positions use the non-null count `n`,
    # the reported row count `n_all` stays COUNT(*) like the oracle's.
    r = ev.select("event_type", "value", "event_id").withColumn(
        "rn", F.row_number().over(wo)
    ).withColumn("n", F.count("value").over(wn)).withColumn(
        "n_all", F.count(F.lit(1)).over(wn)
    )
    aggs = [F.max("n").alias("n"), F.max("n_all").alias("n_all")]
    for name, q in (("p50", "0.5"), ("p95", "0.95"), ("p99", "0.99")):
        pos = f"cast({q} as double) * (n - 1)"
        lo = f"cast(floor({pos}) as bigint) + 1"
        hi = f"cast(ceil({pos}) as bigint) + 1"
        aggs.append(F.max(F.when(F.expr(f"rn = {lo}"), F.col("value"))).alias(f"_vlo_{name}"))
        aggs.append(
            F.max(
                F.when(F.expr(f"rn = least({hi}, n)"), F.col("value"))
            ).alias(f"_vhi_{name}")
        )
    g = r.groupBy("event_type").agg(*aggs)
    cols = [F.col("event_type")]
    for name, q in (("p50", "0.5"), ("p95", "0.95"), ("p99", "0.99")):
        pos = f"cast({q} as double) * (n - 1)"
        cols.append(
            F.round(
                F.expr(
                    f"_vlo_{name} + (_vhi_{name} - _vlo_{name}) * ({pos} - floor({pos}))"
                ),
                6,
            ).alias(name)
        )
    return g.select(*cols, F.col("n_all").alias("n"))


# ---------------------------------------------------------------------------
# Audio perceptual fingerprint + near-dup pairs: the third modality through
# the shared pigeonhole hamming banding (text SimHash / image dHash / audio
# envelope gradient)
# ---------------------------------------------------------------------------

# signed-int64 band weight: bit 63 is the sign bit (DuckDB raises on <<63,
# so it is spelled as the int64-min literal — the SimHash-widening lesson)
_AFP_W = (
    "CASE WHEN win_no = 63 THEN (-9223372036854775807 - 1)"
    " ELSE (1::BIGINT << CAST(win_no AS INT)) END"
)

_AFP_CTE = f"""hx AS (
      SELECT media_ref, lower(hex(image)) AS hx, octet_length(image) AS nb
      FROM read_parquet('{_os.path.join(_QCORPUS_DIR, "page_blobs.parquet")}')
    ), lim AS (
      SELECT media_ref, hx, nb // 2 AS n_samp,
             least({_media.AFP_NWIN},
                   ((nb // 2) + {_media.AFP_WINDOW} - 1) // {_media.AFP_WINDOW})
               AS n_win
      FROM hx WHERE nb >= 2
    ), samp AS (
      SELECT media_ref, t.k // {_media.AFP_WINDOW} AS win_no,
             CASE WHEN {_hexn_to_int_duck_local("substring(hx, 4 * t.k + 3, 2)", 2)} >= 128
                  THEN ({_hexn_to_int_duck_local("substring(hx, 4 * t.k + 1, 2)", 2)}
                        + 256 * {_hexn_to_int_duck_local("substring(hx, 4 * t.k + 3, 2)", 2)}) - 65536
                  ELSE {_hexn_to_int_duck_local("substring(hx, 4 * t.k + 1, 2)", 2)}
                        + 256 * {_hexn_to_int_duck_local("substring(hx, 4 * t.k + 3, 2)", 2)} END AS s
      FROM lim, LATERAL unnest(generate_series(0, n_win * {_media.AFP_WINDOW} - 1)) AS t(k)
      WHERE t.k < n_samp
    ), env AS (
      SELECT media_ref, win_no, SUM(s * s) AS energy
      FROM samp GROUP BY media_ref, win_no
    ), grad AS (
      SELECT media_ref, win_no, energy,
             lead(energy) OVER (PARTITION BY media_ref ORDER BY win_no) AS nxt
      FROM env
    ), afp AS (
      SELECT media_ref, CAST(COUNT(*) AS INTEGER) AS n_windows,
             CAST(COALESCE(SUM(CASE WHEN nxt > energy THEN {_AFP_W} END), 0)
                  AS BIGINT) AS afp
      FROM grad GROUP BY media_ref
    )"""


@register(
    "media_audio_fp",
    oracle=f"""
    WITH {_AFP_CTE}
    SELECT media_ref, n_windows, afp FROM afp
    """,
)
def q_media_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio perceptual fingerprint per blob (operators/media.py
    audio_fp_bytes): 65 leading 64-sample PCM energy windows folded into
    64 envelope-gradient bits — the dHash idea transposed to audio. The
    DuckDB oracle re-derives every sample from the blob hex and rebuilds
    the signed fingerprint with window weights (bit 63 = int64-min)."""
    from .operators.media import audio_fingerprint
    from .sources.tables import load_corpus

    _, blobs = load_corpus(spark, _pipeline_corpus())
    return audio_fingerprint(blobs)


@register(
    "media_audio_fp_pairs",
    oracle=f"""
    WITH {_AFP_CTE}, bands AS (
      SELECT media_ref, afp, t.b AS band_no,
             CAST((afp >> ({_DH_BAND_BITS} * t.b)) & {_DH_BAND_MASK}
                  AS INTEGER) AS band_val
      FROM afp CROSS JOIN generate_series(0, {_DH_BANDS - 1}) AS t(b)
    ), ok AS (
      SELECT band_no, band_val FROM bands
      GROUP BY band_no, band_val HAVING COUNT(*) <= {_DH_BAND_CAP}
    ), bc AS (
      SELECT bands.* FROM bands JOIN ok USING (band_no, band_val)
    ), cand AS (
      SELECT DISTINCT a.media_ref AS media_ref_a, b.media_ref AS media_ref_b,
             a.afp AS sig_a, b.afp AS sig_b
      FROM bc a JOIN bc b
        ON a.band_no = b.band_no AND a.band_val = b.band_val
       AND a.media_ref < b.media_ref
    )
    SELECT media_ref_a, media_ref_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {_DHASH_MAX_HAMMING}
    """,
)
def q_media_audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs: the envelope-gradient fingerprints
    through dedup.hamming_pairs — the ONE banding/cap/verify machinery
    shared by text SimHash and image dHash now covers all three
    modalities. Oracle reruns the banding algebra in SQL over the
    hex-rederived fingerprints (band geometry spliced from dedup.py, the
    _DHASH_PAIRS_CTE convention)."""
    from .operators.dedup import hamming_pairs
    from .operators.media import audio_fingerprint
    from .sources.tables import load_corpus

    _, blobs = load_corpus(spark, _pipeline_corpus())
    return hamming_pairs(
        audio_fingerprint(blobs), "media_ref", "afp",
        max_hamming=_DHASH_MAX_HAMMING,
    )
