"""Streaming extraction: AvailableNow micro-batch output equals the batch
operator, and a second invocation is a no-op (exactly-once checkpoint)."""

from __future__ import annotations

import os

from ocrd_anybaseocr_spark.operators.extract import extract_spans
from ocrd_anybaseocr_spark.sources.tables import load_corpus
from ocrd_anybaseocr_spark.streaming import stream_extract


def _canon(df):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        for r in df.collect()
    }


def test_stream_matches_batch_and_is_exactly_once(spark, corpus_dir, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    stream_extract(spark, corpus_dir, out_dir)
    got = _canon(spark.read.parquet(os.path.join(out_dir, "extracted_spans_stream")))
    docs, _ = load_corpus(spark, corpus_dir)
    want = _canon(extract_spans(docs))
    assert got == want
    # re-run: checkpoint marks input committed → no duplicates
    stream_extract(spark, corpus_dir, out_dir)
    again = _canon(spark.read.parquet(os.path.join(out_dir, "extracted_spans_stream")))
    assert again == want


def test_stateful_fold_across_microbatches_and_restart(
    spark, corpus_dir, tmp_path_factory
):
    """Pages of one document arrive in TWO ingest runs (separate query
    restarts): the stateful fold holds the partial document in the state
    store across the restart and emits exactly one DOC_STRUCTURE row when
    the page count completes — equal to the batch oracle fold."""
    import pyarrow.parquet as pq

    from ocrd_anybaseocr_spark.oracle import process_document
    from ocrd_anybaseocr_spark.streaming.stream import stream_fold_structure

    docs = pq.read_table(os.path.join(corpus_dir, "documents.parquet")).to_pylist()[:8]
    blobs = pq.read_table(os.path.join(corpus_dir, "page_blobs.parquet")).to_pylist()
    bmap = {b["media_ref"]: b["image"] for b in blobs}

    want = {}
    rows = []
    for d in docs:
        _, prs, struct = process_document(d, bmap)
        want[d["doc_id"]] = (
            [(v["log_id"], v["label"], v["parent_id"]) for v in struct["divs"]],
            [(l["log_id"], l["media_ref"]) for l in struct["links"]],
        )
        for r in prs:
            rows.append(
                (r["doc_id"], r["media_ref"], r["page_no"], r["labels"], len(prs))
            )

    multi = {r[0] for r in rows if r[4] > 1}
    first = [r for r in rows if not (r[0] in multi and r[2] == r[4] - 1)]
    second = [r for r in rows if r[0] in multi and r[2] == r[4] - 1]
    assert second, "fixture needs multi-page docs"

    from ocrd_anybaseocr_spark.streaming.stream import FOLD_INPUT

    in_dir = str(tmp_path_factory.mktemp("fold_in"))
    out_dir = str(tmp_path_factory.mktemp("fold_out"))
    spark.createDataFrame(first, FOLD_INPUT).write.parquet(
        os.path.join(in_dir, "batch1.parquet")
    )
    stream_fold_structure(spark, in_dir, out_dir)
    out_path = os.path.join(out_dir, "doc_structure_stream")
    import ocrd_anybaseocr_spark.schema as S

    def read_out():
        return spark.read.schema(S.DOC_STRUCTURE).parquet(out_path)

    got1 = {r.doc_id for r in read_out().collect()}
    assert got1 == {r[0] for r in rows if r[0] not in multi}  # only complete docs

    # run 2 (a fresh query against the same checkpoint): last pages land
    spark.createDataFrame(second, FOLD_INPUT).write.parquet(
        os.path.join(in_dir, "batch2.parquet")
    )
    stream_fold_structure(spark, in_dir, out_dir)
    final = read_out().collect()
    assert len(final) == len(docs)  # exactly once per document
    for r in final:
        wd, wl = want[r.doc_id]
        assert [(v.log_id, v.label, v.parent_id) for v in r.divs] == wd, r.doc_id
        assert [(l.log_id, l.media_ref) for l in r.links] == wl, r.doc_id


def test_watermarked_window_finalize_and_late_drop(spark, tmp_path_factory):
    """Watermarked tumbling windows across TWO ingest runs: a window
    appends exactly once when the watermark passes its end; an event
    arriving later than the watermark is dropped, never mutating an
    already-finalized window (the state-bounding contract of §2.9)."""
    import datetime as dt

    from ocrd_anybaseocr_spark.streaming.stream import (
        EVENTS_STREAM,
        stream_windowed_event_counts,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(eid, minutes, etype="scan", value=1.0):
        return (eid, T0 + dt.timedelta(minutes=minutes), etype, value)

    in_dir = str(tmp_path_factory.mktemp("ev_in"))
    out_dir = str(tmp_path_factory.mktemp("ev_out"))

    # drop 1: two full windows [10:00,10:10) and [10:10,10:20), plus one
    # event at 10:40 that advances the watermark to 10:30 — both early
    # windows finalize; [10:40,10:50) stays open in state
    drop1 = [ev(1, 1), ev(2, 5), ev(3, 12), ev(4, 40)]
    spark.createDataFrame(drop1, EVENTS_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet")
    )
    stream_windowed_event_counts(spark, in_dir, out_dir)
    out_path = os.path.join(out_dir, "event_windows_stream")

    def read_out():
        return {
            (r.win_start.minute, r.event_type): r.n_events
            for r in spark.read.parquet(out_path).collect()
        }

    got1 = read_out()
    assert got1 == {(0, "scan"): 2, (10, "scan"): 1}

    # drop 2: a LATE event at 10:05 (beyond the persisted 10:30 watermark
    # -> dropped) and one at 11:00 (advances watermark to 10:50 -> the
    # [10:40,10:50) window finalizes with exactly its on-time event)
    drop2 = [ev(5, 5), ev(6, 60)]
    spark.createDataFrame(drop2, EVENTS_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet")
    )
    stream_windowed_event_counts(spark, in_dir, out_dir)
    got2 = read_out()
    assert got2[(40, "scan")] == 1  # late 10:05 event did not resurrect anything
    assert got2[(0, "scan")] == 2  # finalized window unchanged
    assert (5, "scan") not in got2


def test_streaming_dedup_across_ingest_runs(spark, tmp_path_factory):
    """Streaming exact dedup across TWO ingest runs: within-batch and
    cross-RESTART duplicates (inside the watermark) are dropped — the
    dedup state rides the checkpoint — while distinct content always
    passes. First-seen rows append exactly once."""
    import datetime as dt

    from ocrd_anybaseocr_spark.streaming.stream import (
        DEDUP_STREAM,
        stream_dedup_exact,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def doc(did, minutes, text):
        return (did, T0 + dt.timedelta(minutes=minutes), text)

    in_dir = str(tmp_path_factory.mktemp("dd_in"))
    out_dir = str(tmp_path_factory.mktemp("dd_out"))
    out_path = os.path.join(out_dir, "deduped_stream")

    # run 1: A, an in-batch duplicate of A (different doc_id, same text), B.
    # Which of a1/a2 represents the hash is ARBITRARY within one batch
    # (partition-order dependent) — the contract is ONE row per hash.
    drop1 = [doc("a1", 0, "alpha beta"), doc("a2", 1, "alpha beta"),
             doc("b1", 5, "gamma delta")]
    spark.createDataFrame(drop1, DEDUP_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet")
    )
    stream_dedup_exact(spark, in_dir, out_dir)
    got1 = {r.doc_id: r.text for r in spark.read.parquet(out_path).collect()}
    assert sorted(got1.values()) == ["alpha beta", "gamma delta"]
    assert set(got1) <= {"a1", "a2", "b1"} and "b1" in got1

    # run 2 (query restart): another duplicate of A at 10:20 — the hash's
    # state entry is still live (watermark 30 min) and must drop a3 even
    # across the restart — plus genuinely new content C
    drop2 = [doc("a3", 20, "alpha beta"), doc("c1", 25, "epsilon zeta")]
    spark.createDataFrame(drop2, DEDUP_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet")
    )
    stream_dedup_exact(spark, in_dir, out_dir)
    got2 = {r.doc_id: r.text for r in spark.read.parquet(out_path).collect()}
    assert sorted(got2.values()) == ["alpha beta", "epsilon zeta", "gamma delta"]
    assert "a3" not in got2 and "c1" in got2
    assert set(got1) <= set(got2)
