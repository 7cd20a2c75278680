"""Capture full `.explain("formatted")` output for named queries()
entries into plans/r14/<query>_<tag>.txt — the judge-facing evidence
files for the optimization round (guide §1: measure first, keep the
plan excerpt).

Usage: python tools/capture_plans.py <tag> <query> [query ...]
       python tools/capture_plans.py <tag> --all-headline
  tag: "before" / "after" (file suffix)
Env: SPARK_GRAFT_SF_DIR (default sf0.001 — plan SHAPE is SF-invariant;
     building stored-index fixtures at sf0.001 keeps capture cheap),
     SPARK_GRAFT_PLANS_DIR (default plans/r14).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from agni_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-capture", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    qs = entry_mod.queries()

    if names == ["--all-headline"]:
        import bench

        names = [n for n in bench.HEADLINE]

    rc = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = (
                jvm.org.apache.spark.sql.api.python.PythonSQLUtils
                .explainString(df._jdf.queryExecution(), "formatted")
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), sf_dir={sf_dir}\n")
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    sys.exit(rc)


if __name__ == "__main__":
    main()
