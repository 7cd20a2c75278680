"""Downsampled rollup tier (the Thanos/M3 pattern: compact raw samples
into coarse-resolution partial aggregates, route queries to the
coarsest resolution that can answer them).

Each resolution stores ALGEBRAIC partials per (series, bucket):
(n, sum, min, max, first, last) — every coarser step that is a multiple
of the stored resolution re-aggregates exactly (sum of sums, min of
mins, lexicographic-struct first/last), so a 1h rollup serves 2h/6h/1d
queries without touching raw data. At 100 TB the rollup is ~1/res of
the raw store and dashboard-range queries never scan raw samples.

Reference scope note: agni ships raw blocks only (Readme.md:6-7
"operational simplicity"); this tier is north-star extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agni_spark.functions.promql import bucket_start


def write_downsampled(samples: DataFrame, path: str, res_ms: int) -> None:
    """Materialize one resolution: partial aggregates per (series,
    res-bucket). One map-side-combining shuffle; written under
    `res=<ms>/` so resolutions coexist and routing is a directory
    choice."""
    t = F.struct(F.col("ts_ms"), F.col("value"))
    (
        samples.groupBy("series_id", bucket_start(res_ms))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min(t).getField("value").alias("first_value"),
            F.max(t).getField("value").alias("last_value"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, f"res={res_ms}"))
    )


def resolutions(spark: SparkSession, path: str) -> list[int]:
    """Available rollup resolutions (ms), finest first."""
    from agni_spark.sources.layout import _hfs

    fs, P = _hfs(spark, path)
    if not fs.exists(P(path)):
        return []
    out = []
    for st in fs.listStatus(P(path)):
        name = st.getPath().getName()
        if name.startswith("res="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def route(spark: SparkSession, path: str, step_ms: int) -> tuple[int, DataFrame]:
    """Pick the COARSEST stored resolution that divides `step_ms`
    (coarser res = fewer rows scanned; divisibility keeps
    re-aggregation exact). Returns (res_ms, rollup frame)."""
    fits = [r for r in resolutions(spark, path) if step_ms % r == 0]
    if not fits:
        raise ValueError(f"no stored resolution divides step {step_ms}")
    res = max(fits)
    return res, spark.read.parquet(os.path.join(path, f"res={res}"))


def agg_over_time_routed(
    spark: SparkSession, path: str, step_ms: int
) -> DataFrame:
    """avg/min/max/sum/count_over_time at `step_ms`, served ENTIRELY
    from the rollup tier: partials re-aggregate (sum of sums / sum of
    counts, min of mins, ...) — bit-for-bit the same answers a raw
    scan would give for count/min/max/sum, and the same 6dp-rounded
    avg."""
    _res, roll = route(spark, path, step_ms)
    return (
        roll.groupBy("series_id", bucket_start(step_ms, "bucket_ms"))
        .agg(
            F.round(F.sum("sum_value") / F.sum("n"), 6).alias("avg_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
            F.sum("n").alias("n"),
        )
    )


def delta_over_time_routed(
    spark: SparkSession, path: str, step_ms: int
) -> DataFrame:
    """last-minus-first per (series, step) served from the rollup tier:
    first/last partials COMPOSE across sub-buckets (the first of the
    earliest sub-bucket is the first of the step — bucket order is time
    order), so gauge delta/rate at any coarser step never touches raw
    samples. No counter-reset correction — partials can't see inside a
    sub-bucket — so this is the GAUGE path; counters go through
    promql.increase on raw (documented trade, same as Thanos
    downsampled rate)."""
    _res, roll = route(spark, path, step_ms)
    return (
        roll.groupBy("series_id", bucket_start(step_ms, "bucket_ms"))
        .agg(
            F.min_by("first_value", "bucket_ms").alias("first_value"),
            F.max_by("last_value", "bucket_ms").alias("last_value"),
        )
        .select(
            "series_id",
            "bucket_ms",
            F.round(F.col("last_value") - F.col("first_value"), 6).alias(
                "delta"
            ),
        )
    )
