"""Degradation-envelope measurement (BENCH/BASELINE.md table).

Runs process_page over the degraded tier at several strengths
(synth.degrade_page's ``strength`` axis — shipped tier is 1.0) and reports
border / skew / label recovery, plus how often the Otsu-confidence gate
escalated to illumination flattening (VERDICT r5 item 5). The r5 envelope
was measured by an ad-hoc harness; this commits it so the table is
reproducible:

    python tools/envelope.py [--docs 20] [--no-gate]

Prints one markdown row per strength. --no-gate disables the escalation
(escalate_low_separability=False) for the counterfactual column.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_docs: int, strength: float, gate: bool) -> dict:
    from dataclasses import replace

    from ocrd_anybaseocr_spark.config import DEFAULT_PARAMS
    from ocrd_anybaseocr_spark.oracle import process_page
    from ocrd_anybaseocr_spark.synth import generate_doc, skew_grid

    params = replace(
        DEFAULT_PARAMS,
        binarize=replace(DEFAULT_PARAMS.binarize, escalate_low_separability=gate),
    )
    grid = skew_grid()
    step = float(grid[1] - grid[0])
    b_errs, s_oks, l_oks, esc = [], [], [], 0
    for i in range(n_docs):
        _, deg = generate_doc(42, i, degraded=strength if strength > 0 else False)
        for db in deg:
            s = db["dpi"] / 300.0
            r = process_page(bytes(db["image"]), params)
            b_errs.append(
                max(abs(a - b) for a, b in zip(r["border"], db["truth_border"])) / s
            )
            s_oks.append(abs(r["skew"] - db["truth_skew"]) <= step + 1e-12)
            l_oks.append(r["labels"] == list(db["truth_labels"]))
            esc += "illum_flattened" in r["features"]
    n = len(b_errs)
    return {
        "strength": strength,
        "pages": n,
        "border_le8": sum(e <= 8.0 for e in b_errs) / n,
        "border_med": statistics.median(b_errs),
        "skew_ok": sum(s_oks) / n,
        "labels_ok": sum(l_oks) / n,
        "escalated": esc / n,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20)
    ap.add_argument("--no-gate", action="store_true")
    ap.add_argument(
        "--strengths", type=float, nargs="*", default=[1.0, 2.0, 4.0]
    )
    args = ap.parse_args()
    gate = not args.no_gate
    print(
        "| strength | border ≤8 px | border med px | skew ≤1 grid step "
        "| labels exact | escalated |"
    )
    print("|---|---|---|---|---|---|")
    for s in args.strengths:
        m = measure(args.docs, s, gate)
        print(
            f"| {s:g}× ({m['pages']} pages) | {m['border_le8']:.2f} "
            f"| {m['border_med']:.1f} | {m['skew_ok']:.2f} "
            f"| {m['labels_ok']:.2f} | {m['escalated']:.2f} |"
        )


if __name__ == "__main__":
    main()
