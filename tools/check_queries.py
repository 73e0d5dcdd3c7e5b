"""Local replica of the driver's correctness gate: run every queries() entry
with Spark and its oracle_sql() with DuckDB on the same parquet tables,
compare row count + schema + order-insensitive values (exact after column
name sort + row sort).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def norm_cell(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            # canonical float formatting (both engines emit doubles)
            return format(v, ".9g")
        try:
            import numpy as np

            if isinstance(v, (np.integer,)):
                return int(v)
            if isinstance(v, (np.floating,)):
                return format(float(v), ".9g")
            if isinstance(v, np.ndarray):
                return tuple(norm_cell(x) for x in v)
        except ImportError:
            pass
        if isinstance(v, (list, tuple)):
            return tuple(norm_cell(x) for x in v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return v

    for c in df.columns:
        df[c] = df[c].map(norm_cell)
    rows = sorted(df.itertuples(index=False, name=None), key=lambda t: tuple(map(repr, t)))
    return pd.DataFrame(rows, columns=df.columns)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ocrd_anybaseocr_spark.sources.tables import spark_session

    spark = spark_session(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rowcount spark={len(got)} duckdb={len(want)}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first diffs:")
            print(pd.concat([g[bad].head(3).add_suffix("_spark"),
                             w[bad].head(3).add_suffix("_duck")], axis=1).to_string())
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
