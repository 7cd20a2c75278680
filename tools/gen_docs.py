"""Regenerate contract counts in the docs from the LIVE driver
contract, so README numbers cannot drift from `__spark_entry__.py`
(round-6 verdict: docs said 215/213 while the contract had 222/220).

Usage: python tools/gen_docs.py          # rewrite README.md in place
       python tools/gen_docs.py --check  # exit 1 if docs are stale

Counts come from importing the entry module (no Spark session needed:
queries()/oracle_sql() build plain dicts), and the bench headline count
from bench.HEADLINE plus the build/probe split rows.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _count_tests() -> int:
    """Test count straight from pytest's collector (no Spark session:
    collection only imports the test modules)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise RuntimeError(f"could not parse pytest collection: {out[-200:]}")
    return int(m.group(1))


def main() -> None:
    import bench

    import __spark_entry__ as entry

    n_q = len(entry.queries())
    n_o = len(entry.oracle_sql())
    n_bench = len(bench._expected_rows())
    n_tests = _count_tests()

    readme = os.path.join(REPO, "README.md")
    text = open(readme).read()
    new = re.sub(
        r"driver contract: \d+ queries, \d+ DuckDB oracles",
        f"driver contract: {n_q} queries, {n_o} DuckDB oracles",
        text,
    )
    new = re.sub(
        r"`bench\.py` — \d+-(query|row) headline benchmark",
        f"`bench.py` — {n_bench}-row headline benchmark",
        new,
    )
    new = re.sub(
        r"`tests/` — \d+ tests",
        f"`tests/` — {n_tests} tests",
        new,
    )
    if "--check" in sys.argv:
        if new != text:
            print(
                f"STALE: docs disagree with contract "
                f"({n_q} queries / {n_o} oracles / {n_bench} bench "
                f"rows / {n_tests} tests)"
            )
            sys.exit(1)
        print(f"OK: {n_q} queries / {n_o} oracles / {n_bench} "
              f"bench rows / {n_tests} tests")
        return
    if new != text:
        open(readme, "w").write(new)
        print(f"rewrote README.md: {n_q} queries / {n_o} oracles / "
              f"{n_bench} bench rows / {n_tests} tests")
    else:
        print(f"up to date: {n_q} queries / {n_o} oracles / "
              f"{n_bench} bench rows / {n_tests} tests")


if __name__ == "__main__":
    main()
