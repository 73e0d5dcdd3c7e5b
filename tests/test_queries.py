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
