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


def test_streaming_near_dedup_bands_across_runs(spark, tmp_path_factory):
    """VERDICT r4 item 7 — streaming MinHash-band near-dup candidates:
    (1) the stateless per-row banding is value-identical to the batch
    minhash signature banding; (2) near-dups planted across micro-batches
    AND across a query restart lose bands to the earlier arrival (state
    rides the checkpoint); (3) state is bounded at one row per live band
    value (asserted from the state-operator metrics)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ocrd_anybaseocr_spark.operators.dedup import (
        N_BANDS,
        ROWS_PER_BAND,
        minhash_signatures,
    )
    from ocrd_anybaseocr_spark.streaming.stream import (
        DEDUP_STREAM,
        minhash_bands_stream,
        near_dup_candidates,
        stream_dedup_near,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def doc(did, minutes, text):
        return (did, T0 + dt.timedelta(minutes=minutes), text)

    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " CHANGED"  # near-dup of `other`
    rows1 = [doc("a1", 0, base), doc("b1", 1, other)]
    rows2 = [doc("a2", 20, base), doc("c1", 22, near),
             doc("d1", 24, "fresh unrelated content here entirely new")]
    all_rows = rows1 + rows2

    # (1) parity: stream banding == bands recomputed from batch signatures
    docs_df = spark.createDataFrame(all_rows, DEDUP_STREAM)
    got_bands = {
        (r.doc_id, r.band_no): r.band_key
        for r in minhash_bands_stream(docs_df).collect()
    }
    sig = minhash_signatures(docs_df.select("doc_id", "text"))
    band_cols = [
        F.md5(F.concat_ws("#", *[
            F.col(f"h{ROWS_PER_BAND * b + k}").cast("string")
            for k in range(ROWS_PER_BAND)
        ]).cast("binary")).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    want_bands = {
        (r.doc_id, b): r[f"b{b}"]
        for r in sig.select("doc_id", *band_cols).collect()
        for b in range(N_BANDS)
    }
    assert got_bands == want_bands and len(got_bands) == 5 * N_BANDS

    # expected ownership: first arrival per (band_no, band_key) wins
    # (arrival ts strictly ordered across all docs here)
    arrival = {d: i for i, (d, _, _) in enumerate(all_rows)}
    owner: dict[tuple, str] = {}
    for (did, bno), key in sorted(got_bands.items(), key=lambda kv: arrival[kv[0][0]]):
        owner.setdefault((bno, key), did)
    want_owned = {d: 0 for d, _, _ in all_rows}
    for did in owner.values():
        want_owned[did] += 1
    assert want_owned["a1"] == N_BANDS and want_owned["a2"] == 0  # exact dup
    assert want_owned["c1"] < N_BANDS  # near-dup lost >=1 band to b1

    # (2) run the stream in two ingest runs with a restart between
    in_dir = str(tmp_path_factory.mktemp("nd_in"))
    out_dir = str(tmp_path_factory.mktemp("nd_out"))
    out_path = os.path.join(out_dir, "band_claims_stream")
    spark.createDataFrame(rows1, DEDUP_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet"))
    m1 = stream_dedup_near(spark, in_dir, out_dir)
    claims1 = spark.read.parquet(out_path)
    assert claims1.count() == 2 * N_BANDS  # a1, b1 both novel
    spark.createDataFrame(rows2, DEDUP_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet"))
    m2 = stream_dedup_near(spark, in_dir, out_dir)
    claims = spark.read.parquet(out_path)
    got_owned = {r.doc_id: r.n_owned for r in claims.groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_owned")).collect()}
    for d, _, _ in all_rows:
        assert got_owned.get(d, 0) == want_owned[d], d

    cands = {r.doc_id for r in near_dup_candidates(claims, docs_df).collect()}
    assert cands == {d for d, n in want_owned.items() if n < N_BANDS}
    assert "a2" in cands and "c1" in cands and "d1" not in cands

    # (3) bounded state: exactly one state row per live distinct band value
    n_distinct = len({(b, k) for (_, b), k in got_bands.items()})
    assert m2["state_rows"] == n_distinct == claims.count()


def test_streaming_visual_dedup_across_runs(spark, tmp_path_factory):
    """VERDICT r5 item 6 — streaming dHash visual near-dup candidates:
    (1) the stateless per-row banding is value-identical to the batch
    media_dhash + _signature_bands path; (2) a planted exact visual dup
    and a 1-bit near-dup across micro-batches AND a query restart lose
    bands to the earlier arrival; (3) state is bounded at one row per
    live distinct band value."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    from ocrd_anybaseocr_spark.operators.dedup import (
        SIMHASH_BANDS,
        _signature_bands,
    )
    from ocrd_anybaseocr_spark.operators.media import dhash_bytes, media_dhash
    from ocrd_anybaseocr_spark.png import encode_gray
    from ocrd_anybaseocr_spark.streaming.stream import (
        MEDIA_STREAM,
        dhash_bands_stream,
        stream_dedup_visual,
        visual_dup_candidates,
    )

    # block-constant images: dhash block means equal the grid values
    # exactly, so every gradient bit is constructed, not sampled
    def img_from_grid(grid):
        return np.kron(np.asarray(grid, dtype=np.uint8), np.ones((8, 8), np.uint8))

    rng = np.random.default_rng(5)
    g_a = rng.integers(0, 200, size=(8, 9), dtype=np.uint8)
    g_a += np.arange(9, dtype=np.uint8)  # break ties deterministically
    g_b = g_a.copy()
    # swap one adjacent pair in row 0: flips the (0,1) comparison and at
    # most the neighboring (1,2) one — hamming <= 3 < SIMHASH_BANDS, so
    # the pigeonhole guarantees >=1 shared band with pA
    g_b[0, 0], g_b[0, 1] = g_b[0, 1], g_b[0, 0]
    if g_a[0, 1] == g_a[0, 0]:
        g_b[0, 1] = g_b[0, 0] + 1
    g_d = (g_a[::-1, ::-1] + 37) % 251  # unrelated pattern
    pngs = {
        "pA": encode_gray(img_from_grid(g_a)),
        "pB": encode_gray(img_from_grid(g_b)),      # 1-bit near-dup of pA
        "pC": encode_gray(img_from_grid(g_a)),      # exact visual dup of pA
        "pD": encode_gray(img_from_grid(g_d)),      # novel
    }
    h = {k: dhash_bytes(v) for k, v in pngs.items()}
    assert h["pA"] == h["pC"] and h["pA"] != h["pD"]
    assert 1 <= bin((h["pA"] ^ h["pB"]) & ((1 << 64) - 1)).count("1") <= 3

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows1 = [("pA", T0, bytearray(pngs["pA"]))]
    rows2 = [
        ("pB", T0 + dt.timedelta(minutes=5), bytearray(pngs["pB"])),
        ("pC", T0 + dt.timedelta(minutes=6), bytearray(pngs["pC"])),
        ("pD", T0 + dt.timedelta(minutes=7), bytearray(pngs["pD"])),
    ]
    all_rows = rows1 + rows2
    blobs_df = spark.createDataFrame(all_rows, MEDIA_STREAM)

    # (1) parity: stream banding == batch media_dhash banding
    got = {
        (r.media_ref, r.band_no): r.band_val
        for r in dhash_bands_stream(blobs_df).collect()
    }
    batch = media_dhash(blobs_df.withColumnRenamed("ts", "_ts").select("media_ref", "image"))
    want = {
        (r.media_ref, r.band_no): r.band_val
        for r in _signature_bands(batch, "media_ref", "dhash").collect()
    }
    assert got == want and len(got) == 4 * SIMHASH_BANDS

    # expected first-arrival ownership
    arrival = {m: i for i, (m, _, _) in enumerate(all_rows)}
    owner: dict[tuple, str] = {}
    for (mid, bno), val in sorted(got.items(), key=lambda kv: arrival[kv[0][0]]):
        owner.setdefault((bno, val), mid)
    want_owned = {m: 0 for m, _, _ in all_rows}
    for mid in owner.values():
        want_owned[mid] += 1
    assert want_owned["pA"] == SIMHASH_BANDS
    assert want_owned["pC"] == 0                      # exact dup: all bands lost
    assert 0 < want_owned["pB"] < SIMHASH_BANDS       # 1-bit near-dup: loses 3
    assert want_owned["pD"] == SIMHASH_BANDS

    # (2) two ingest runs with a restart between
    in_dir = str(tmp_path_factory.mktemp("vd_in"))
    out_dir = str(tmp_path_factory.mktemp("vd_out"))
    out_path = os.path.join(out_dir, "visual_band_claims_stream")
    spark.createDataFrame(rows1, MEDIA_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet"))
    stream_dedup_visual(spark, in_dir, out_dir)
    assert spark.read.parquet(out_path).count() == SIMHASH_BANDS
    spark.createDataFrame(rows2, MEDIA_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet"))
    m2 = stream_dedup_visual(spark, in_dir, out_dir)
    claims = spark.read.parquet(out_path)
    got_owned = {
        r.media_ref: r.n
        for r in claims.groupBy("media_ref").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for m, _, _ in all_rows:
        assert got_owned.get(m, 0) == want_owned[m], m

    cands = {r.media_ref for r in visual_dup_candidates(claims, blobs_df).collect()}
    assert cands == {"pB", "pC"}

    # (3) bounded state: one row per live distinct band value
    n_distinct = len({(b, v) for (_, b), v in got.items()})
    assert m2["state_rows"] == n_distinct == claims.count()


def test_streaming_audio_dedup_bands(spark, tmp_path_factory):
    """Audio twin of the visual streaming pass through the SHARED
    media_sig_bands_stream machinery: (1) the stateless per-row banding is
    value-identical to the batch audio_fingerprint + _signature_bands
    path; (2) one AvailableNow run of dedup_audio_stream leaves a planted
    exactly-gain-scaled audio dup owning ZERO first-seen band claims
    while the novel signal owns all of its bands; (3) state is bounded at
    one row per live distinct band value."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    from ocrd_anybaseocr_spark.operators.dedup import (
        SIMHASH_BANDS,
        _signature_bands,
    )
    from ocrd_anybaseocr_spark.operators.media import (
        AFP_NWIN,
        AFP_WINDOW,
        audio_fingerprint,
    )
    from ocrd_anybaseocr_spark.streaming.stream import (
        MEDIA_STREAM,
        afp_bands_stream,
        dedup_audio_stream,
    )

    rng = np.random.default_rng(9)
    n = AFP_WINDOW * AFP_NWIN
    base = rng.integers(-8000, 8000, size=n, dtype=np.int16)
    gain = (base.astype(np.int32) * 2).astype(np.int16)  # fingerprint-exact dup
    other = rng.integers(-8000, 8000, size=n, dtype=np.int16)
    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        ("aA", T0, bytearray(base.tobytes())),
        ("aB", T0 + dt.timedelta(minutes=2), bytearray(gain.tobytes())),
        ("aC", T0 + dt.timedelta(minutes=3), bytearray(other.tobytes())),
    ]
    blobs_df = spark.createDataFrame(rows, MEDIA_STREAM)

    got = {
        (r.media_ref, r.band_no): r.band_val
        for r in afp_bands_stream(blobs_df).collect()
    }
    batch = audio_fingerprint(blobs_df.select("media_ref", "image"))
    want = {
        (r.media_ref, r.band_no): r.band_val
        for r in _signature_bands(batch, "media_ref", "afp").collect()
    }
    assert got == want and len(got) == 3 * SIMHASH_BANDS
    # the gain dup shares every band with the original
    for b in range(SIMHASH_BANDS):
        assert got[("aA", b)] == got[("aB", b)]

    # two ingest runs: the original lands a run BEFORE its dup — first-seen
    # within one micro-batch is partition-order-dependent, across runs it
    # is not (the visual twin's drop structure, same reason)
    in_dir = str(tmp_path_factory.mktemp("ad_in"))
    out_dir = str(tmp_path_factory.mktemp("ad_out"))
    spark.createDataFrame(rows[:1], MEDIA_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet"))

    def run():
        src = (
            spark.readStream.schema(MEDIA_STREAM)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir)
        )
        q = (
            dedup_audio_stream(src)
            .writeStream.format("parquet")
            .option("path", os.path.join(out_dir, "claims"))
            .option("checkpointLocation", os.path.join(out_dir, "_cp"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
        return q

    run()
    spark.createDataFrame(rows[1:], MEDIA_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet"))
    q = run()
    claims = spark.read.parquet(os.path.join(out_dir, "claims"))
    owned = {
        r.media_ref: r.n
        for r in claims.groupBy("media_ref").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert owned.get("aA", 0) == SIMHASH_BANDS
    assert owned.get("aB", 0) == 0            # gain dup: every band lost
    assert owned.get("aC", 0) == SIMHASH_BANDS
    ops = (q.lastProgress or {}).get("stateOperators") or []
    n_distinct = len({(b, v) for (_, b), v in got.items()})
    assert ops and ops[0].get("numRowsTotal") == n_distinct == claims.count()


def test_streaming_passage_dedup_across_runs(spark, tmp_path_factory):
    """Streaming CCNet passage claims: (1) chunk boundaries/hashes are
    value-identical to the batch chunk_relation (shared definition);
    (2) a repeated 8-word passage inside a LATER doc — same or later
    ingest run, within the watermark — claims nothing, while the doc's
    novel passages still pass; (3) state rides the checkpoint across a
    restart and stays bounded (one row per live passage)."""
    import datetime as dt
    import os

    from ocrd_anybaseocr_spark.operators.dedup import chunk_relation
    from ocrd_anybaseocr_spark.streaming.stream import (
        DEDUP_STREAM,
        stream_dedup_passages,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def doc(did, minutes, text):
        return (did, T0 + dt.timedelta(minutes=minutes), text)

    shared = " ".join(f"w{i}" for i in range(8))       # the repeated passage
    novel1 = " ".join(f"n{i}" for i in range(8))
    novel2 = " ".join(f"m{i}" for i in range(8))

    in_dir = str(tmp_path_factory.mktemp("pp_in"))
    out_dir = str(tmp_path_factory.mktemp("pp_out"))
    out_path = os.path.join(out_dir, "passage_claims_stream")

    # run 1: d1 owns (shared, novel1); d2 repeats shared + adds novel2
    drop1 = [doc("d1", 0, shared + " " + novel1),
             doc("d2", 5, shared + " " + novel2)]
    spark.createDataFrame(drop1, DEDUP_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet")
    )
    m1 = stream_dedup_passages(spark, in_dir, out_dir)
    got1 = spark.read.parquet(out_path).collect()
    claims1 = {(r.doc_id, r.chunk_no): r.h for r in got1}
    # 3 distinct passages -> exactly 3 claims; shared claimed ONCE
    assert len(claims1) == 3
    assert ("d1", 1) in claims1 and ("d2", 1) in claims1  # novel chunks pass
    assert (("d1", 0) in claims1) ^ (("d2", 0) in claims1)  # one shared claim
    # hashes identical to the batch chunk relation (shared definition)
    batch = {
        (r.doc_id, r.chunk_no): r.h
        for r in chunk_relation(
            spark.createDataFrame(drop1, DEDUP_STREAM)
        ).collect()
    }
    for k, h in claims1.items():
        assert batch[k] == h
    assert m1["state_rows"] == 3  # one state entry per live passage

    # run 2 (restart): d3 repeats shared inside the watermark -> dropped;
    # its novel passage still claims
    drop2 = [doc("d3", 20, shared + " " + " ".join(f"z{i}" for i in range(8)))]
    spark.createDataFrame(drop2, DEDUP_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet")
    )
    stream_dedup_passages(spark, in_dir, out_dir)
    got2 = {(r.doc_id, r.chunk_no) for r in spark.read.parquet(out_path).collect()}
    assert ("d3", 1) in got2 and ("d3", 0) not in got2
    assert {k for k in claims1} <= got2


def test_streaming_session_windows_across_runs(spark, tmp_path_factory):
    """Session-window semantics pinned: (1) events within the gap merge
    into ONE session whose end = last_ts + gap; (2) a gap strictly larger
    than 30 min splits sessions; (3) users never share sessions; (4) a
    session only FINALIZES once the watermark passes its end — verified
    across a restart: run 1 leaves the open session in state, run 2's
    later drop advances the watermark and flushes it."""
    import datetime as dt
    import os

    from ocrd_anybaseocr_spark.streaming.stream import (
        SESSION_STREAM,
        stream_sessionized_counts,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(eid, minutes, uid, value):
        return (eid, T0 + dt.timedelta(minutes=minutes), uid, value)

    in_dir = str(tmp_path_factory.mktemp("sess_in"))
    out_dir = str(tmp_path_factory.mktemp("sess_out"))
    out_path = os.path.join(out_dir, "event_sessions_stream")

    # run 1: u1 has events at 0,10,20 (one session: [0, 50)); u2 at 5;
    # nothing can finalize yet (watermark = 20 - 30 < all ends)
    drop1 = [ev(1, 0, 1, 1.25), ev(2, 10, 1, 2.00), ev(3, 20, 1, 0.10),
             ev(4, 5, 2, 7.00)]
    spark.createDataFrame(drop1, SESSION_STREAM).write.parquet(
        os.path.join(in_dir, "drop1.parquet")
    )
    m1 = stream_sessionized_counts(spark, in_dir, out_dir)
    assert spark.read.parquet(out_path).count() == 0  # all sessions open
    assert m1["state_rows"] == 2  # one open session per user

    # run 2 (restart): u1 again at 120 (> 30-min gap -> NEW session);
    # watermark advances to 90, flushing u1's [0,50) and u2's [5,35)
    drop2 = [ev(5, 120, 1, 0.01)]
    spark.createDataFrame(drop2, SESSION_STREAM).write.parquet(
        os.path.join(in_dir, "drop2.parquet")
    )
    stream_sessionized_counts(spark, in_dir, out_dir)
    got = {
        (r.user_id, r.session_start): r
        for r in spark.read.parquet(out_path).collect()
    }
    k1 = (1, T0)
    k2 = (2, T0 + dt.timedelta(minutes=5))
    assert set(got) == {k1, k2}
    assert got[k1].session_end == T0 + dt.timedelta(minutes=50)
    assert got[k1].n_events == 3 and got[k1].value_cents == 125 + 200 + 10
    assert got[k2].n_events == 1 and got[k2].value_cents == 700


def test_stream_stream_join_across_runs(spark, tmp_path_factory):
    """Stream-stream event-time join: (1) a purchase pairs with every
    same-user click in the trailing 30 min (inclusive bounds), never a
    later click, never another user's; (2) a click arriving in a LATER
    run still joins a purchase from an earlier run while inside the
    watermark (both sides buffered in checkpointed state); (3) join
    state is bounded by the horizon."""
    import datetime as dt
    import os

    from ocrd_anybaseocr_spark.streaming.stream import (
        SESSION_STREAM,
        stream_click_purchase_join,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(eid, minutes, uid):
        return (eid, T0 + dt.timedelta(minutes=minutes), uid, 0.0)

    c_dir = str(tmp_path_factory.mktemp("ss_clicks"))
    p_dir = str(tmp_path_factory.mktemp("ss_purch"))
    out_dir = str(tmp_path_factory.mktemp("ss_out"))
    out_path = os.path.join(out_dir, "click_purchase_join_stream")

    # run 1: u1 clicks at 0 and 25; purchase at 30 -> pairs with BOTH
    # (0 is exactly on the 30-min bound: inclusive); u2's click at 29
    # must not pair; a click at 31 (after the purchase) must not pair
    spark.createDataFrame(
        [ev(1, 0, 1), ev(2, 25, 1), ev(3, 29, 2), ev(4, 31, 1)], SESSION_STREAM
    ).write.parquet(os.path.join(c_dir, "drop1.parquet"))
    spark.createDataFrame([ev(100, 30, 1)], SESSION_STREAM).write.parquet(
        os.path.join(p_dir, "drop1.parquet")
    )
    stream_click_purchase_join(spark, c_dir, p_dir, out_dir)
    got1 = {(r.purchase_id, r.click_id)
            for r in spark.read.parquet(out_path).collect()}
    assert got1 == {(100, 1), (100, 2)}

    # run 2 (restart): a second purchase at 35 arrives -> joins the
    # still-buffered clicks at 25 (in horizon) but not 0 (out) and 31 (in)
    spark.createDataFrame([ev(101, 35, 1)], SESSION_STREAM).write.parquet(
        os.path.join(p_dir, "drop2.parquet")
    )
    stream_click_purchase_join(spark, c_dir, p_dir, out_dir)
    got2 = {(r.purchase_id, r.click_id)
            for r in spark.read.parquet(out_path).collect()}
    assert got2 == got1 | {(101, 2), (101, 4)}


def test_stream_merge_sink_idempotent(spark, tmp_path_factory):
    """foreachBatch merge sink: within-batch dups collapse (min-ts wins),
    a re-dropped doc_id never re-appends, and replaying the whole input
    against an already-populated target (fresh checkpoint — the crash-
    replay worst case) appends zero rows."""
    import datetime as dt
    import os

    from ocrd_anybaseocr_spark.streaming.stream import (
        SESSION_STREAM,
        stream_merge_documents,
    )

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def doc(did, minutes, val):
        return (did, T0 + dt.timedelta(minutes=minutes), 0, val)

    in_dir = str(tmp_path_factory.mktemp("merge_in"))
    tgt = str(tmp_path_factory.mktemp("merge_tgt"))
    data = os.path.join(tgt, "documents_merged")

    # drop 1: doc 1 twice (ts 5 and 0 -> ts-0 row wins), doc 2 once
    spark.createDataFrame(
        [doc(1, 5, 9.0), doc(1, 0, 1.0), doc(2, 0, 2.0)], SESSION_STREAM
    ).write.parquet(os.path.join(in_dir, "drop1.parquet"))
    m1 = stream_merge_documents(spark, in_dir, tgt)
    got = {r.doc_id: r for r in spark.read.parquet(data).collect()}
    assert m1["appended"] == 2 and set(got) == {1, 2}
    assert got[1].value == 1.0  # min-ts row won

    # drop 2: doc 1 again (must not re-append) + novel doc 3
    spark.createDataFrame(
        [doc(1, 60, 7.0), doc(3, 60, 3.0)], SESSION_STREAM
    ).write.parquet(os.path.join(in_dir, "drop2.parquet"))
    m2 = stream_merge_documents(spark, in_dir, tgt)
    rows = spark.read.parquet(data).collect()
    assert m2["appended"] == 1
    assert sorted(r.doc_id for r in rows) == [1, 2, 3]
    assert {r.doc_id: r.value for r in rows}[1] == 1.0

    # crash-replay worst case: fresh checkpoint, same input, same target
    m3 = stream_merge_documents(
        spark, in_dir, tgt,
        checkpoint_dir=str(tmp_path_factory.mktemp("merge_ckpt2")),
    )
    assert m3["appended"] == 0
    assert sorted(r.doc_id for r in spark.read.parquet(data).collect()) == [1, 2, 3]
