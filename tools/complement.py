"""Print the driver-sample COMPLEMENT for this round (VERDICT r5 item 2).

The driver's correctness gate samples ~50 of the registered queries per
round; every query must still get a recorded hash-green check within any
2-round window. This tool reads the newest CORRECTNESS_r*.json, diffs its
query set against the currently registered QUERIES, and prints the
complement — exactly the list to pass to tools/check_queries.py and
record in ROUND_NOTES.md:

    python tools/complement.py            # list the unchecked queries
    python tools/check_queries.py /root/testdata/sf0.01 $(python tools/complement.py)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, REPO)
    from ocrd_anybaseocr_spark.queries import QUERIES

    runs = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not runs:
        print("no CORRECTNESS_r*.json found — complement is every query", file=sys.stderr)
        checked: set[str] = set()
    else:
        with open(runs[-1]) as f:
            data = json.load(f)
        # the driver records per-query entries; accept either a top-level
        # mapping or a nested "queries" object. Only HASH-GREEN entries
        # count as checked — a sampled-but-failed query must reappear in
        # the complement (round-6 review), and a rows-only record (no
        # hash) is the weaker check, so it reappears too.
        qmap = data.get("queries", data)

        def green(v) -> bool:
            return (
                isinstance(v, dict)
                and bool(v.get("hash_match"))
                and not v.get("err")
            )

        checked = {k for k, v in qmap.items() if k in QUERIES and green(v)}
        print(
            f"# newest: {os.path.basename(runs[-1])} covers {len(checked)} of "
            f"{len(QUERIES)} registered queries",
            file=sys.stderr,
        )
    complement = sorted(set(QUERIES) - checked)
    print(" ".join(complement))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
