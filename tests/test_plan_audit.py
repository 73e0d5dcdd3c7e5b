"""Registry-wide plan-audit ratchet (VERDICT r7 item 5): every REGISTERED
query's physical plan is audited for the never-allowed flags — a future
query (or an optimization like this round's mapInArrow kernels) cannot
introduce a CartesianProduct or row-at-a-time BatchEvalPython without
failing the suite. PLAN_AUDIT.md stays the human artifact
(tools/plan_audit.py --write); this test is the ratchet.

Explain-only in spirit, but cached wrappers EXECUTE their bounded
builders at construction time — at sf0.01 (500 docs / 200 vectors) the
whole sweep stays well-bounded.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_no_cartesian_or_row_python_anywhere(spark, sf_dir):
    from tools.plan_audit import audit

    rows = audit(spark, sf_dir)
    assert len(rows) >= 115
    flagged = [r for r in rows if r["flags"] != "-"]
    assert not flagged, [(r["query"], r["flags"]) for r in flagged]
