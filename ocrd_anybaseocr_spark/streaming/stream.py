"""Structured Streaming surface (SURVEY.md §2.9).

The reference is strictly batch (finite workspaces, reference:
cli/ocrd_anybaseocr_layout_analysis.py:72-86); its restart semantics map to
either the checkpoint-table batch design (operators/pipeline.py, the
default) or these streaming forms:

- ``stream_extract``: stateless incremental extraction — ``readStream``
  over the corpus table with ``Trigger.AvailableNow`` + Spark's streaming
  checkpoint, exactly-once per micro-batch;
- ``stream_fold_structure``: STATEFUL document assembly via
  ``applyInPandasWithState`` — page results for one document may arrive
  across micro-batches (even across restarts); per-doc state accumulates
  pages in the state store and the W4 fold emits exactly once, when the
  document's page count completes. State survives restarts through the
  same streaming checkpoint, which is the whole point: a continuous 100 TB
  ingest never sees a document atomically.
- ``stream_windowed_event_counts``: WATERMARKED tumbling-window rollup of
  the ingest-metrics event stream (the A7 checkpoint-metrics shape, fed
  continuously): windows finalize and append exactly once when the
  watermark passes their end; events later than the watermark are dropped,
  bounding state. Watermark + open windows ride the checkpoint across
  restarts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, types as T

from .. import schema as S
from ..operators.extract import extract_spans


def stream_extract(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Incremental reading-order extraction: corpus parquet → extracted
    spans parquet, exactly-once via the streaming checkpoint. Blocks until
    all currently-available input is processed (Trigger.AvailableNow)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    # FileStreamSource wants a directory: stream the corpus dir, filtered to
    # the documents table (page_blobs live alongside)
    docs = (
        spark.readStream.schema(S.DOCUMENTS)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(corpus_dir)
    )
    extracted = extract_spans(docs)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "extracted_spans_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


# event rows the windowed-metrics stream consumes
EVENTS_STREAM = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window count/sum per event_type with a late-data watermark.

    In append mode a window row is emitted exactly once, when the
    watermark (max event time seen minus ``watermark``) passes the
    window's end; events arriving later than the watermark are DROPPED —
    that bound is what keeps the state store finite on an unbounded
    stream. The shuffle keys on (window, event_type); partial aggregation
    applies per micro-batch as in the batch rollups."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> None:
    """Incremental watermarked rollup: a growing directory of event parquet
    drops → finalized window rows, append-exactly-once per window.
    Trigger.AvailableNow; rerun after new drops land — the watermark and
    open windows resume from the checkpoint."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_window_checkpoint")
    ev = (
        spark.readStream.schema(EVENTS_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    q = (
        windowed_event_counts(ev, window, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "event_windows_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


SESSION_STREAM = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """SESSION-window rollup per user (the streaming twin of the batch
    gaps-and-islands query): consecutive events closer than ``gap`` merge
    into one session [first_ts, last_ts + gap); a session row is emitted
    exactly once, when the watermark passes its end (no later event can
    extend it). State per (user, open session) only — the watermark
    closes and evicts sessions, which is what bounds the store on an
    unbounded stream. Money as exact cents (the cross-engine/batch-parity
    convention); the shuffle keys on user_id with session merge handled
    by the state store."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("sum(cast(round(value * 100) as bigint))").alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_cents",
        )
    )


def stream_sessionized_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> dict:
    """Incremental session rollup over a growing directory of event
    parquet drops (SESSION_STREAM schema) → finalized session rows,
    append exactly-once; open sessions and the watermark ride the
    checkpoint across runs. Returns {"state_rows": N} so tests can pin
    the bounded-state contract (N = open sessions still in the store)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_session_checkpoint")
    ev = (
        spark.readStream.schema(SESSION_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    q = (
        sessionized_event_counts(ev, gap, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "event_sessions_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or []
    return {"state_rows": ops[0].get("numRowsTotal") if ops else None}


def click_purchase_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """STREAM-STREAM inner join with an event-time range — the streaming
    twin of the batch range_join_window: each purchase pairs with every
    click by the same user in the trailing ``horizon``. Both sides carry
    watermarks and the join condition bounds click retention to
    [p_ts - horizon, p_ts], so the state store holds only the horizon's
    worth of clicks per user — THE condition that keeps a stream-stream
    join finite on unbounded inputs (an unconstrained key-equality join
    would buffer both streams forever). Emits one row per (purchase,
    click) pair, append exactly-once."""
    from pyspark.sql import functions as F

    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return p.join(
        c,
        F.expr(
            f"c_user = user_id AND c_ts BETWEEN p_ts - INTERVAL {horizon}"
            " AND p_ts"
        ),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "p_ts", "c_ts")


def stream_click_purchase_join(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
) -> dict:
    """Incremental stream-stream join over two growing parquet drop
    directories (SESSION_STREAM schema each); joined pairs append
    exactly-once, buffered-side state and watermarks ride the checkpoint
    across runs. Returns {"state_rows": N} (rows currently buffered in
    the join state) for the bounded-state asserts."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_ssjoin_checkpoint")

    def rd(d):
        return (
            spark.readStream.schema(SESSION_STREAM)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )

    q = (
        click_purchase_join_stream(rd(clicks_dir), rd(purchases_dir), horizon, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "click_purchase_join_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or []
    return {"state_rows": ops[0].get("numRowsTotal") if ops else None}


def stream_merge_documents(
    spark: SparkSession,
    docs_dir: str,
    target_dir: str,
    checkpoint_dir: str | None = None,
) -> dict:
    """foreachBatch IDEMPOTENT MERGE sink — the production pattern for
    "append only what the target doesn't have": each micro-batch (1)
    dedups within itself on doc_id (min-ts row wins, deterministically),
    (2) LEFT-ANTI joins the current target on doc_id, (3) appends only
    the novel remainder. Because foreachBatch can REPLAY a batch after a
    crash between the append and the checkpoint commit, blind append
    would duplicate — the anti-join is what makes the replay a no-op and
    the sink effectively exactly-once on a key. On a real lakehouse the
    same closure body becomes MERGE INTO; parquet-dir anti-join is the
    catalog-free equivalent.

    Returns {"appended": N, "batches": K} accumulated across this run."""
    from pyspark.sql import Window, functions as F

    checkpoint_dir = checkpoint_dir or os.path.join(target_dir, "_merge_checkpoint")
    data_dir = os.path.join(target_dir, "documents_merged")
    stats = {"appended": 0, "batches": 0}

    def _target_exists() -> bool:
        # Hadoop FileSystem resolution, not os.path.isdir: target_dir may
        # be hdfs:// or s3a://, where a local-only check is always False
        # and the left-anti dedup would silently skip — a replayed batch
        # would then duplicate rows, defeating the exactly-once-on-key
        # contract (ADVICE r7 item 1; the _PathIO.exists pattern).
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(data_dir)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(path))

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        first = (
            batch.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("ts", "value")
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        if _target_exists():
            existing = spark.read.parquet(data_dir).select("doc_id")
            first = first.join(existing, "doc_id", "left_anti")
        novel = first.count()
        if novel:
            first.write.mode("append").parquet(data_dir)
        stats["appended"] += novel
        stats["batches"] += 1

    docs = (
        spark.readStream.schema(SESSION_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
        .withColumnRenamed("event_id", "doc_id")
    )
    q = (
        docs.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


# page-result rows a fold stream consumes: identity + ordering + labels +
# the document's total page count (carried per row so completion is
# decidable without a side lookup)
FOLD_INPUT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("n_pages", T.IntegerType(), False),
    ]
)

# state: accumulated pages as a JSON blob (schema-stable across versions)
_FOLD_STATE = T.StructType([T.StructField("pages_json", T.StringType())])


def fold_structure_stateful(pages: DataFrame) -> DataFrame:
    """Stateful streaming W4 fold: group the page-result stream by doc_id,
    accumulate (page_no, media_ref, labels) in the state store, emit the
    folded DOC_STRUCTURE row exactly once when all n_pages arrived.

    Incomplete documents stay in state across micro-batches AND restarts
    (the state store rides the streaming checkpoint). Duplicate page
    deliveries (at-least-once upstream) are absorbed: pages dedupe on
    page_no inside the state.
    """
    import pandas as pd

    def fold_fn(key, pdfs, state):
        from ..kernels.fold import fold_document

        pages_acc: dict[int, tuple[str, list[str]]] = {}
        n_total = None
        if state.exists:
            (blob,) = state.get
            for pno, ref, labels, tot in json.loads(blob):
                pages_acc[pno] = (ref, labels)
                n_total = tot
        for pdf in pdfs:
            for pno, ref, labels, tot in zip(
                pdf["page_no"], pdf["media_ref"], pdf["labels"], pdf["n_pages"]
            ):
                pages_acc[int(pno)] = (str(ref), [str(x) for x in labels])
                n_total = int(tot)
        if n_total is not None and len(pages_acc) >= n_total:
            ordered = [pages_acc[p] for p in sorted(pages_acc)]
            divs, links = fold_document(ordered)
            state.remove()
            yield pd.DataFrame(
                {
                    "doc_id": [key[0]],
                    "divs": [
                        [
                            {"log_id": d[0], "label": d[1], "parent_id": d[2]}
                            for d in divs
                        ]
                    ],
                    "links": [
                        [{"log_id": l[0], "media_ref": l[1]} for l in links]
                    ],
                }
            )
        else:
            state.update(
                (
                    json.dumps(
                        [
                            [p, r, ls, n_total]
                            for p, (r, ls) in sorted(pages_acc.items())
                        ]
                    ),
                )
            )
            # incomplete document: emit nothing this batch

    return (
        pages.groupBy("doc_id")
        .applyInPandasWithState(
            fold_fn,
            outputStructType=S.DOC_STRUCTURE,
            stateStructType=_FOLD_STATE,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def stream_fold_structure(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Incremental stateful fold: a directory of page-result parquet files
    (FOLD_INPUT schema) → DOC_STRUCTURE parquet, one row per document,
    emitted when the document completes — possibly several ingest runs
    later. Trigger.AvailableNow; rerun after new files land to continue."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_fold_checkpoint")
    pages = (
        spark.readStream.schema(FOLD_INPUT)
        # ingest drops may be directories (a Spark write per batch)
        .option("recursiveFileLookup", "true")
        .parquet(pages_dir)
    )
    q = (
        fold_structure_stateful(pages)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "doc_structure_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


# rows the streaming dedup consumes: arrival time + content
DEDUP_STREAM = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def dedup_exact_stream(docs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming form of exact dedup (SO1): ONE representative of each
    content hash passes through; re-arrivals within ``watermark`` of the
    original are dropped. Within a single micro-batch the representative
    choice among simultaneous duplicates is ARBITRARY (Spark keeps one
    row per key, partition-order dependent) — the contract is one-per-
    hash, not which doc_id carries it; across batches the survivor is
    the earlier batch's row (its state entry drops later arrivals). ``dropDuplicatesWithinWatermark`` holds ONE
    state entry per hash and EVICTS it once the watermark passes the
    entry's event time — the bounded-state contract of §2.9 (a plain
    ``dropDuplicates`` on an unbounded ingest grows state forever). A
    duplicate arriving after eviction re-emits; downstream batch dedup
    (hash-groupBy) remains the exactness backstop — the streaming pass is
    the cheap high-recall filter at ingest. Hash = md5 of the text bytes,
    identical to the batch dedup_exact key."""
    from pyspark.sql import functions as F

    return (
        docs.withColumn("content_hash", F.md5(F.col("text").cast("binary")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def minhash_bands_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, ts, band_no, band_key): STATELESS per-row MinHash banding,
    value-identical to the batch ``lsh_pairs`` banding (same shingles, same
    wrapping affine family, same md5 band keys — pytest-asserted parity).

    The batch path computes signatures with explode + groupBy(doc_id); a
    stream cannot afford a pre-aggregation before its stateful dedup, so
    here the whole signature is ONE row-local expression: the shingle
    array and its 24-bit hashes materialize as array columns (non-cheap
    aliases — CollapseProject keeps them, the md5 runs once per shingle),
    and each of the 16 minima is an array_min over integer ops. No
    shuffle, no state — the scan parallelism is the throughput.

    Docs with fewer than 3 words have no shingles and emit no band rows,
    exactly like the batch signature aggregation."""
    from pyspark.sql import functions as F

    from ..operators.dedup import (
        _MH_A,
        _MH_B,
        _MH_HEX,
        _MH_P,
        _SHINGLES_FROM_WORDS,
        N_BANDS,
        N_MINHASH,
        ROWS_PER_BAND,
    )

    d = (
        docs.withColumn("_words", F.split("text", " "))
        .filter(F.size("_words") >= 3)
        .withColumn("_sh", F.expr(_SHINGLES_FROM_WORDS))
        .withColumn(
            "_h",
            F.expr(
                "transform(_sh, s -> cast(conv(substring(md5(cast(s as binary)),"
                f" 1, {_MH_HEX}), 16, 10) as bigint))"
            ),
        )
    )
    for j in range(N_MINHASH):
        d = d.withColumn(
            f"h{j}",
            F.expr(
                f"array_min(transform(_h, x -> ({_MH_A[j]}L * x + {_MH_B[j]}L)"
                f" % {_MH_P}L))"
            ),
        )
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "#",
                    *[
                        F.col(f"h{ROWS_PER_BAND * b + k}").cast("string")
                        for k in range(ROWS_PER_BAND)
                    ],
                ).cast("binary")
            )
            for b in range(N_BANDS)
        ]
    )
    return d.select("doc_id", "ts", F.posexplode(bands).alias("band_no", "band_key"))


def dedup_near_stream(docs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming near-dup CANDIDATE pass (VERDICT r4 item 7) — the MinHash
    twin of ``dedup_exact_stream``, completing batch↔streaming parity for
    the dedup family: band the stream statelessly (minhash_bands_stream),
    then ``dropDuplicatesWithinWatermark`` on (band_no, band_key) holds ONE
    state entry per live band value and EVICTS it when the watermark
    passes — bounded state on an unbounded ingest.

    Output rows are FIRST-SEEN BAND CLAIMS: a novel document owns all
    N_BANDS of its bands; a document that collides with an earlier one
    (within the watermark) on >=1 band emits fewer — `near_dup_candidates`
    derives the candidate set from the claims table. Matching the batch
    contract, band collision is CANDIDATE evidence only; exact Jaccard
    verification (operators/dedup.verified_pairs) remains the batch
    backstop, same division of labor as exact streaming dedup."""
    bands = minhash_bands_stream(docs)
    return bands.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["band_no", "band_key"]
    )


def near_dup_candidates(claims: DataFrame, docs: DataFrame) -> DataFrame:
    """Batch post-pass over the streamed band-claims table: (doc_id,
    n_owned) for documents owning fewer than N_BANDS first-seen bands —
    each lost a band to an earlier (or same-batch) document and is a
    near-dup candidate for exact verification. ``docs`` (the ingested
    documents, DEDUP_STREAM shape) anchors the join: an EXACT duplicate
    loses all its bands and appears in no claim row at all, so candidates
    cannot be derived from the claims table alone. Docs too short to
    shingle (<3 words) emit no bands by construction and are excluded —
    they carry no near-dup evidence either way."""
    from pyspark.sql import functions as F

    from ..operators.dedup import N_BANDS

    owned = claims.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    eligible = (
        docs.filter(F.size(F.split("text", " ")) >= 3).select("doc_id").distinct()
    )
    return (
        eligible.join(owned, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("_n"), F.lit(0)).alias("n_owned"))
        .filter(F.col("n_owned") < N_BANDS)
    )


def stream_dedup_near(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    watermark: str = "30 minutes",
) -> dict:
    """Incremental near-dup band-claim pass over a growing directory of
    document parquet drops (DEDUP_STREAM schema) → first-seen band claims,
    append exactly-once; state and watermark ride the checkpoint across
    runs. Returns the final state-operator metrics ({"state_rows": N}) so
    callers/tests can assert the bounded-state contract directly."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_near_checkpoint")
    docs = (
        spark.readStream.schema(DEDUP_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    q = (
        dedup_near_stream(docs, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "band_claims_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or []
    return {"state_rows": ops[0].get("numRowsTotal") if ops else None}


def passage_claims_stream(docs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming CCNet passage dedup — the chunk-level twin of
    ``dedup_exact_stream``: explode each incoming document into the batch
    paragraph_dedup's EXACT chunk relation (operators/dedup.chunk_relation
    — one shared definition, so boundaries and hashes are value-identical
    to the batch pass, pytest-asserted), then
    ``dropDuplicatesWithinWatermark`` on the chunk hash holds ONE state
    entry per live passage and EVICTS it when the watermark passes.

    Output rows are FIRST-SEEN PASSAGE CLAIMS (doc_id, ts, chunk_no, h):
    the stream-side retained set. Within a micro-batch the claimant among
    simultaneous copies is partition-order-arbitrary (the
    dedup_exact_stream contract: one-per-hash, not which row); the batch
    paragraph_dedup (min-(doc_id,chunk_no) canonical) remains the exact
    backstop — the same cheap-filter/exact-backstop division of labor as
    the exact and near streaming passes."""
    from ..operators.dedup import chunk_relation

    chunks = chunk_relation(docs, extra_cols=("ts",)).select(
        "doc_id", "ts", "chunk_no", "h"
    )
    return chunks.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["h"])


def stream_dedup_passages(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    watermark: str = "30 minutes",
) -> dict:
    """Incremental passage-claim pass over a growing directory of document
    parquet drops (DEDUP_STREAM schema) → first-seen passage claims,
    append exactly-once; state and watermark ride the checkpoint across
    runs. Returns {"state_rows": N} from the final state-operator metrics
    so tests can assert the bounded-state contract."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_passage_checkpoint")
    docs = (
        spark.readStream.schema(DEDUP_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    q = (
        passage_claims_stream(docs, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "passage_claims_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or []
    return {"state_rows": ops[0].get("numRowsTotal") if ops else None}


MEDIA_STREAM = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("image", T.BinaryType(), False),
    ]
)


def media_sig_bands_stream(blobs: DataFrame, sig_fn, sig_col: str) -> DataFrame:
    """(media_ref, ts, band_no, band_val): per-row 64-bit-signature banding
    over a MEDIA_STREAM — the ONE streaming banding for every perceptual
    signature kernel (image dHash, audio envelope fingerprint). ``sig_fn``
    is the batch operator's own bytes→int kernel, run in one Arrow-batched
    mapInPandas hop (the decode is the only Python stage); the banding is
    the SHARED ``_signature_bands`` definition the batch pair join and the
    over-cap audit use, so stream and batch band values are identical by
    construction (pytest-asserted parity per kernel). A kernel returning
    None for a blob (e.g. sub-sample audio) emits no rows, matching the
    batch operator. Stateless: no shuffle, no state — the scan parallelism
    is the throughput."""
    import pandas as pd

    from ..operators.dedup import _signature_bands

    sig_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField(sig_col, T.LongType(), False),
        ]
    )

    def stage(batches):
        for pdf in batches:
            refs, tss, sigs = [], [], []
            for ref, ts, blob in zip(pdf["media_ref"], pdf["ts"], pdf["image"]):
                s = sig_fn(bytes(blob))
                if s is None:
                    continue
                refs.append(ref)
                tss.append(ts)
                sigs.append(s)
            yield pd.DataFrame({"media_ref": refs, "ts": tss, sig_col: sigs})

    sig = blobs.mapInPandas(stage, sig_schema)
    return _signature_bands(sig, "media_ref", sig_col, extra_cols=("ts",)).select(
        "media_ref", "ts", "band_no", "band_val"
    )


def dhash_bands_stream(blobs: DataFrame) -> DataFrame:
    """Image banding (VERDICT r5 item 6): media.dhash_bytes through the
    shared media_sig_bands_stream machinery."""
    from ..operators.media import dhash_bytes

    return media_sig_bands_stream(blobs, dhash_bytes, "dhash")


def afp_bands_stream(blobs: DataFrame) -> DataFrame:
    """Audio banding: media.audio_fp_bytes (envelope-gradient fingerprint)
    through the shared media_sig_bands_stream machinery; the fingerprint
    component of the (n_windows, afp) kernel result is the signature."""
    from ..operators.media import audio_fp_bytes

    def sig(blob: bytes):
        r = audio_fp_bytes(blob)
        return None if r is None else r[1]

    return media_sig_bands_stream(blobs, sig, "afp")


def dedup_visual_stream(blobs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming visual near-dup CANDIDATE pass: band the image stream
    statelessly (dhash_bands_stream), then ``dropDuplicatesWithinWatermark``
    on (band_no, band_val) — ONE state entry per live band value, evicted
    when the watermark passes (bounded state on an unbounded ingest).
    Output rows are first-seen band claims, same contract as
    ``dedup_near_stream``: an exact visual duplicate owns zero claims; a
    near-duplicate (hamming <= SIMHASH_BANDS-1 by pigeonhole) loses >=1
    band to the earlier arrival. Exact hamming verification
    (dedup.hamming_pairs over media_dhash) remains the batch backstop."""
    bands = dhash_bands_stream(blobs)
    return bands.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["band_no", "band_val"]
    )


def dedup_audio_stream(blobs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming AUDIO near-dup candidate pass: the envelope-fingerprint
    twin of ``dedup_visual_stream`` — afp_bands_stream +
    ``dropDuplicatesWithinWatermark`` on (band_no, band_val), one state
    entry per live band value. Same first-seen-claim contract: an exact
    (or exactly gain-scaled) audio duplicate owns zero claims; exact
    hamming verify (dedup.hamming_pairs over media.audio_fingerprint) is
    the batch backstop."""
    bands = afp_bands_stream(blobs)
    return bands.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["band_no", "band_val"]
    )


def visual_dup_candidates(claims: DataFrame, blobs: DataFrame) -> DataFrame:
    """Batch post-pass over the streamed visual band-claims table:
    (media_ref, n_owned) for pages owning fewer than SIMHASH_BANDS
    first-seen bands. ``blobs`` anchors the join because an exact visual
    duplicate appears in NO claim row (same reason as the text twin
    near_dup_candidates); every page is eligible — dHash has no
    min-shingle gate."""
    from pyspark.sql import functions as F

    from ..operators.dedup import SIMHASH_BANDS

    owned = claims.groupBy("media_ref").agg(F.count(F.lit(1)).alias("_n"))
    return (
        blobs.select("media_ref")
        .distinct()
        .join(owned, "media_ref", "left")
        .select("media_ref", F.coalesce(F.col("_n"), F.lit(0)).alias("n_owned"))
        .filter(F.col("n_owned") < SIMHASH_BANDS)
    )


def stream_dedup_visual(
    spark: SparkSession,
    blobs_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    watermark: str = "30 minutes",
) -> dict:
    """Incremental visual near-dup band-claim pass over a growing directory
    of page-image parquet drops (MEDIA_STREAM schema) → first-seen band
    claims, append exactly-once; state and watermark ride the checkpoint
    across runs. Returns the final state-operator metrics like
    stream_dedup_near so tests assert the bounded-state contract."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_visual_checkpoint")
    blobs = (
        spark.readStream.schema(MEDIA_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(blobs_dir)
    )
    q = (
        dedup_visual_stream(blobs, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "visual_band_claims_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or []
    return {"state_rows": ops[0].get("numRowsTotal") if ops else None}


def stream_dedup_exact(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    watermark: str = "30 minutes",
) -> None:
    """Incremental exact dedup over a growing directory of document
    parquet drops (DEDUP_STREAM schema) → first-seen docs, append
    exactly-once. Trigger.AvailableNow; dedup state and the watermark
    ride the checkpoint across runs, so a duplicate landing in a LATER
    ingest run (within the watermark) is still dropped."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_dedup_checkpoint")
    docs = (
        spark.readStream.schema(DEDUP_STREAM)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    q = (
        dedup_exact_stream(docs, watermark)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "deduped_stream"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
