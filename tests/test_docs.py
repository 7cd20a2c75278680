"""Docs-freshness gate (round 11): the round-8 verdict built
tools/gen_docs.py so README counts cannot drift from the live driver
contract, and the round-10 snapshot promptly shipped with the gate
failing (README said 285 tests, PLANS.md lacked two operators) because
nothing RAN it. This test makes a stale snapshot fail the suite
itself: gen_docs --check must exit 0 — README counts match
queries()/oracle_sql()/bench rows/pytest collection, and every
queries() entry has a PLANS.md row (except plan_report's documented
streaming SKIPs).

If this fails: `python tools/gen_docs.py` (README counts) and/or
`python tools/plan_report.py` (PLANS.md rows), then commit the docs.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_match_live_contract():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_docs.py"),
         "--check"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert res.returncode == 0, (
        f"docs are stale — regenerate before committing:\n"
        f"{res.stdout}\n{res.stderr[-500:]}"
    )
