"""Enforce the input_hint contract: vectorized pandas/Arrow UDFs only —
no row-at-a-time Python UDFs, no RDD API anywhere in the package
(SURVEY.md §2.10)."""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ocrd_anybaseocr_spark")

FORBIDDEN = [
    (re.compile(r"\bF\.udf\s*\("), "row-at-a-time F.udf"),
    (re.compile(r"\budf\s*\(\s*lambda"), "row-at-a-time udf(lambda)"),
    (re.compile(r"@udf\b"), "row-at-a-time @udf"),
    (re.compile(r"\.rdd\b"), "RDD API"),
    (re.compile(r"\bsparkContext\b"), "SparkContext usage"),
    (re.compile(r"\.collect\(\)\s*\)?\s*(?:for|\[|$)", re.M), None),  # informational only
]


def test_no_row_udfs_or_rdd():
    violations = []
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            src = open(path).read()
            for pat, label in FORBIDDEN:
                if label is None:
                    continue
                for m in pat.finditer(src):
                    line = src[: m.start()].count("\n") + 1
                    violations.append(f"{path}:{line}: {label}")
    assert not violations, "\n".join(violations)
