"""One A/B window: mapInPandas vs mapInArrow fused-stage transport.

VERDICT r6 item 3 orders the default flip to 'arrow' only after best-of-2
validation in >=3 SEPARATE windows (the host's documented +/-30% noise band
makes a single-window delta meaningless). Each invocation of this script is
one window: it measures the same-window raw-kernel floor (window-quality
tag), then runs the full pipeline probe best-of-2 for each transport in its
own subprocess/JVM (CLAUDE.md: never two Spark configs in one process), and
appends one JSON row to .bench/ab_transport.jsonl.

Run it >=3 times spread across the session, then read the ledger: flip the
default only if arrow >= pandas in every window.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    docs = int(os.environ.get("SPARK_GRAFT_AB_DOCS", str(bench.SCALING_DOCS)))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_root = os.path.join(bench._ROOT, ".bench")
    os.makedirs(out_root, exist_ok=True)
    corpus = bench.ensure_corpus(docs)

    floor = bench.raw_kernel_floor(corpus, cores)
    row = {"window_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "docs": docs, "cores": cores, "kernel_floor": floor}
    saved = os.environ.get("SPARK_GRAFT_UDF_IMPL")
    try:
        for impl in ("pandas", "arrow"):
            os.environ["SPARK_GRAFT_UDF_IMPL"] = impl
            r = bench.run_pipeline_bench(cores, out_root, n_docs=docs, reps=2)
            row[impl] = {k: r[k] for k in
                         ("wall_s", "pages_per_sec", "kernel_cpu_s",
                          "ms_per_page", "kernel_util")}
            print(json.dumps({impl: row[impl]}), file=sys.stderr)
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_UDF_IMPL", None)
        else:
            os.environ["SPARK_GRAFT_UDF_IMPL"] = saved
    row["arrow_over_pandas"] = round(
        row["arrow"]["pages_per_sec"] / row["pandas"]["pages_per_sec"], 3)
    # window-quality ratio from the SLOWER impl's kernel ms/page would mix
    # transport cost into the tag; use pandas (the incumbent) for continuity
    row["kernel_floor_ratio_pandas"] = (
        round(row["pandas"]["ms_per_page"] / floor["cpu_ms_per_page"], 2)
        if floor.get("cpu_ms_per_page") else None)
    ledger = os.path.join(out_root, "ab_transport.jsonl")
    with open(ledger, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
