"""Isolated per-query timing under the bench's cold protocol with the
NOOP SINK (guide §1.4): times the computation of every column of every
row, not the count()-pruned subtree and not a driver collect. Used for
the optimization round's before/after evidence; bench.py's count()
methodology stays untouched for cross-round comparability.

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_RUNS (default 5).
Prints one line per query: name, sorted run times, median, min.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    import bench

    import __spark_entry__ as entry_mod
    from agni_spark.session import get_spark

    spark = get_spark("time-queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # JIT/codegen warm at the smallest SF (bench.py's own protocol)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir.rstrip("/"):
        for name in names:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass

    for name in names:
        times = []
        for i in range(runs):
            bench._cold(spark)
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        st = sorted(times)
        print(
            f"{name}: runs={times} median={st[len(st) // 2]} min={st[0]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
