"""PromQL-style compute tier as native DataFrame ops.

The reference serves ONLY raw selection; rate/aggregation/topk are
executed by the upstream Prometheus that calls it over remote read
(SURVEY §0, §2.7 — vendored tree has no promql package). This module
is the engine-side equivalent (SURVEY §7 Phase 5), expressed so
Catalyst plans it as ordinary shuffles/windows:

- range functions (increase/rate/delta/agg_over_time) = window lag or
  groupBy over (series_id, time bucket) — one shuffle on series_id,
  map-side partial aggregation, no driver loops;
- label aggregations (sum by (job)) = broadcast join to the series dim
  then groupBy — the fact table shuffles once on the grouping key;
- topk / instant = window rank with explicit deterministic tie-breaks.

Determinism contract: every aggregate column is rounded (ROUND_*)
identically here and in the DuckDB oracles, because float sums are
order-dependent and the driver hash-compares values.

Prometheus semantics kept: counter resets (rate/increase treat a value
drop as a reset: contribution = v, mirroring prometheus counter reset
correction); staleness lookback for instant vectors (default 5m).
Range windows are tumbling buckets rather than per-step sliding
windows — the natural batch formulation; a sliding variant is
`increase` over `F.window` with slideDuration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LOOKBACK_MS = 300_000  # Prometheus default staleness lookback: 5m
ROUND_SUM = 4
ROUND_AVG = 6


def bucket_start(bucket_ms: int, col: str = "ts_ms") -> Column:
    """Tumbling-window start (exact integer arithmetic)."""
    return (F.expr(f"{col} div {bucket_ms}") * bucket_ms).cast("long").alias(
        "bucket_ms"
    )


def _series_time_window() -> Window:
    # value as tie-break makes lag deterministic under duplicate ts
    return Window.partitionBy("series_id").orderBy("ts_ms", "value")


def increase(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """Counter increase per (series, bucket) with reset correction.

    delta_i = v_i - v_{i-1} if v_i >= v_{i-1} else v_i (reset), the
    prometheus extrapolation-free formulation; each delta is attributed
    to the bucket of the later sample."""
    prev = F.lag("value").over(_series_time_window())
    contrib = F.when(prev.isNull(), None).when(
        F.col("value") >= prev, F.col("value") - prev
    ).otherwise(F.col("value"))
    return (
        samples.withColumn("contrib", contrib)
        .where(F.col("contrib").isNotNull())
        .groupBy("series_id", bucket_start(bucket_ms))
        .agg(F.round(F.sum("contrib"), ROUND_SUM).alias("increase"))
    )


def rate(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """increase / bucket seconds."""
    # No re-round after the division: the rounded increase is an
    # identical double on any engine, and dividing identical doubles by
    # the same constant is deterministic — re-rounding would reintroduce
    # engine-dependent decimal-boundary behavior.
    return increase(samples, bucket_ms).select(
        "series_id",
        "bucket_ms",
        (F.col("increase") / F.lit(bucket_ms / 1000.0)).alias("rate"),
    )


def delta(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """Gauge delta: last - first value within each (series, bucket),
    deterministic tie-break on (ts_ms, value)."""
    w = Window.partitionBy("series_id", "bucket_ms")
    first = F.min(F.struct("ts_ms", "value")).over(w)["value"]
    last = F.max(F.struct("ts_ms", "value")).over(w)["value"]
    return (
        samples.withColumn("bucket_ms", bucket_start(bucket_ms))
        .select(
            "series_id",
            "bucket_ms",
            F.round(last - first, ROUND_SUM).alias("delta"),
        )
        .distinct()
    )


def agg_over_time(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """xxx_over_time family per (series, bucket): avg/min/max/sum/count."""
    return samples.groupBy("series_id", bucket_start(bucket_ms)).agg(
        F.round(F.avg("value"), ROUND_AVG).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(F.sum("value"), ROUND_SUM).alias("sum_value"),
        F.count(F.lit(1)).alias("n"),
    )


def aggregate_by(
    samples: DataFrame,
    series: DataFrame,
    by: list[str],
    bucket_ms: int,
) -> DataFrame:
    """sum/avg/count by (labels) per bucket — e.g. `sum by (job, env)`.

    series is the small dim -> broadcast join; the single shuffle is
    the groupBy on (labels..., bucket)."""
    joined = samples.join(F.broadcast(series.select("series_id", *by)), "series_id")
    return joined.groupBy(*by, bucket_start(bucket_ms)).agg(
        F.round(F.sum("value"), ROUND_SUM).alias("sum_value"),
        F.round(F.avg("value"), ROUND_AVG).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


def topk(
    samples: DataFrame,
    k: int,
    mint_ms: int | None = None,
    maxt_ms: int | None = None,
) -> DataFrame:
    """topk(k, sum_over_time(...)): top-k series by summed value in the
    range; deterministic tie-break on series_id (the reference's label
    order). Window rank — no driver-side collect."""
    df = samples
    if mint_ms is not None:
        df = df.where(F.col("ts_ms") >= mint_ms)
    if maxt_ms is not None:
        df = df.where(F.col("ts_ms") <= maxt_ms)
    per_series = df.groupBy("series_id").agg(
        F.round(F.sum("value"), ROUND_SUM).alias("sum_value")
    )
    w = Window.orderBy(F.col("sum_value").desc(), F.col("series_id").asc())
    return (
        per_series.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("series_id", "sum_value", F.col("rk").cast("int").alias("rk"))
    )


def instant(
    samples: DataFrame, at_ms: int, lookback_ms: int = LOOKBACK_MS
) -> DataFrame:
    """Instant-vector evaluation at `at_ms` with staleness lookback:
    the newest sample per series in (at_ms - lookback, at_ms]."""
    w = Window.partitionBy("series_id").orderBy(
        F.col("ts_ms").desc(), F.col("value").desc()
    )
    return (
        samples.where(
            (F.col("ts_ms") <= at_ms) & (F.col("ts_ms") > at_ms - lookback_ms)
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("series_id", "ts_ms", "value")
    )
