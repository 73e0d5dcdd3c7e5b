"""A/B the fused-UDF transport (mapInPandas vs mapInArrow) in ONE window.

VERDICT r6 item 3 wants the arrow default validated best-of-2 in >=3
separate windows before (and after) flipping the default. Each
invocation = one window: pandas/arrow at 8 and 32 cores, each config a
fresh subprocess (bench.run_pipeline_bench), plus the same-window raw
mp.Pool kernel floor so a contended window self-identifies
(kernel_floor_ratio > ~1.5 => rerun, don't conclude).

Usage: python tools/ab_transport.py [n_docs]   # default 9600
Appends one JSON line per window to BENCH/ab_transport.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run_window(n_docs: int) -> dict:
    out_root = os.path.join(bench._ROOT, ".bench", "ab_out")
    corpus = bench.ensure_corpus(n_docs)
    rows = {}
    saved = os.environ.get("SPARK_GRAFT_UDF_IMPL")
    try:
        for impl in ("pandas", "arrow"):
            os.environ["SPARK_GRAFT_UDF_IMPL"] = impl
            for cores in (8, 32):
                r = bench.run_pipeline_bench(cores, out_root, n_docs=n_docs, reps=2)
                rows[f"{impl}_{cores}"] = {
                    "pages_per_sec": r["pages_per_sec"],
                    "kernel_util": r["kernel_util"],
                    "ms_per_page": r["ms_per_page"],
                }
                print(f"{impl} local[{cores}]: {r['pages_per_sec']} pages/s",
                      file=sys.stderr)
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_UDF_IMPL", None)
        else:
            os.environ["SPARK_GRAFT_UDF_IMPL"] = saved
    floor = bench.raw_kernel_floor(corpus, 32)
    win = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_docs": n_docs,
        "floor_cpu_ms_per_page": floor.get("cpu_ms_per_page"),
        **rows,
    }
    for cores in (8, 32):
        p, a = rows[f"pandas_{cores}"], rows[f"arrow_{cores}"]
        win[f"arrow_vs_pandas_{cores}"] = round(
            a["pages_per_sec"] / p["pages_per_sec"], 3
        )
    return win


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9600
    w = run_window(n)
    os.makedirs(os.path.join(bench._ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(bench._ROOT, "BENCH", "ab_transport.jsonl"), "a") as f:
        f.write(json.dumps(w) + "\n")
    print(json.dumps(w))
