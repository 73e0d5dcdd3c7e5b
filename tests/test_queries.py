"""Registry-wide contracts over queries() / oracle_sql().

The r6 driver run exposed that the external gate's canonicalizer
(pandas ``sort_values`` over all columns) cannot hash list-typed cells:
``embedding_quantize_int8`` returned a top-level ``array<int>`` column
and was the round's one red CORRECTNESS row even though its values
hash-matched DuckDB in a list-aware replica. The contract pinned here:
every registered query emits ATOMIC top-level columns only — sequences
are flattened (posexplode) or pinned as md5 digests (bpe_tokenize's
pattern). Complex types stay available on the raw builder fns.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from ocrd_anybaseocr_spark.queries import ORACLE, QUERIES

# Queries whose BUILD phase is too heavy to construct once per test run
# at sf0.001 are still covered: the gate replica (tools/check_queries.py)
# runs every registered query end-to-end each round, and the driver's
# canonicalizer failure mode is schema-level, so building the DataFrame
# (no collect) is sufficient here.
_COMPLEX = (ArrayType, MapType, StructType)


def test_queries_and_oracles_in_sync():
    """Every queries() entry has an oracle_sql() twin (zero rows-only)."""
    assert set(QUERIES) == set(ORACLE)


def test_no_query_returns_complex_top_level_columns(spark, sf_dir):
    """Driver-canonicalizer contract: no registered query may emit a
    top-level array/map/struct column — pandas row-sort canonicalization
    dies on unhashable cells (CORRECTNESS_r06 embedding_quantize_int8)."""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, _COMPLEX):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_asof_join_events_planted(spark, monkeypatch):
    """As-of semantics pinned on a planted frame: (a) a same-millisecond
    click counts for the purchase (inclusive <=); (b) among equal-ms
    clicks the max event_id wins; (c) a purchase before any click emits
    NULLs; (d) matching never crosses users."""
    import datetime as dt

    import ocrd_anybaseocr_spark.queries as q

    T0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(eid, uid, kind, ms):
        return (eid, T0 + dt.timedelta(milliseconds=ms), uid, kind, 0.0, "")

    rows = [
        # user 1: purchase(10) before any click -> NULL; clicks at 20
        # (two, equal ms -> max event_id 103 wins) then purchase at 20
        # (tie counts) and at 50
        ev(101, 1, "purchase", 10),
        ev(102, 1, "click", 20),
        ev(103, 1, "click", 20),
        ev(104, 1, "purchase", 20),
        ev(105, 1, "purchase", 50),
        # user 2: own click at 5; user 1 must never see it
        ev(201, 2, "click", 5),
        ev(202, 2, "purchase", 7),
        # noise event types are excluded entirely
        ev(301, 1, "view", 15),
    ]
    docs = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(q, "load_table", lambda s, d, n: docs)
    got = {r.event_id: r for r in q.QUERIES["asof_join_events"](spark, "asof-twin").collect()}
    assert set(got) == {101, 104, 105, 202}
    assert got[101].asof_click_id is None and got[101].ms_since_click is None
    assert got[104].asof_click_id == 103 and got[104].ms_since_click == 0
    assert got[105].asof_click_id == 103 and got[105].ms_since_click == 30
    assert got[202].asof_click_id == 201 and got[202].ms_since_click == 2
