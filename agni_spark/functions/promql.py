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


def time_functions(samples: DataFrame) -> DataFrame:
    """PromQL's UTC time functions (minute/hour/day_of_week) evaluated
    at each sample's timestamp — pure integer arithmetic on epoch ms
    (1970-01-01 was a Thursday, hence the +4), so every engine computes
    identical values with no timezone/session dependence. Narrow
    projection, no shuffle."""
    day = F.lit(86_400_000)
    return samples.select(
        "series_id",
        "ts_ms",
        ((F.col("ts_ms") % day) / F.lit(3_600_000)).cast("long").alias("hour"),
        ((F.col("ts_ms") % F.lit(3_600_000)) / F.lit(60_000))
        .cast("long")
        .alias("minute"),
        (((F.col("ts_ms") / day).cast("long") + F.lit(4)) % F.lit(7))
        .cast("long")
        .alias("day_of_week"),
    )


def ext_over_time(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """The rest of the over_time family per (series, bucket):
    last_over_time (value at max timestamp; deterministic via struct
    max with value tie-break — the same lexicographic comparison DuckDB
    applies to struct_pack), stddev/stdvar_over_time (population, as
    Prometheus defines them), present_over_time. One shuffle with
    map-side partial aggregation, like agg_over_time."""
    return samples.groupBy("series_id", bucket_start(bucket_ms)).agg(
        F.max(F.struct("ts_ms", "value")).getField("value").alias("last_value"),
        F.round(F.stddev_pop("value"), ROUND_AVG).alias("stddev_value"),
        F.round(F.var_pop("value"), ROUND_AVG).alias("stdvar_value"),
        F.lit(1.0).alias("present"),
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
    order). orderBy().limit(k) compiles to TakeOrderedAndProject —
    each task keeps a k-row heap and the driver merges k·tasks rows,
    so no global single-partition window even at 10⁸+ series; the rank
    window afterwards only ever sees ≤k rows."""
    df = samples
    if mint_ms is not None:
        df = df.where(F.col("ts_ms") >= mint_ms)
    if maxt_ms is not None:
        df = df.where(F.col("ts_ms") <= maxt_ms)
    per_series = df.groupBy("series_id").agg(
        F.round(F.sum("value"), ROUND_SUM).alias("sum_value")
    )
    order = [F.col("sum_value").desc(), F.col("series_id").asc()]
    return (
        per_series.orderBy(*order)
        .limit(k)
        # constant partition key: the window input is k rows by
        # construction (post-limit); the key stops WindowExec planning
        # a move-everything global window
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy(*order)
            ),
        )
        .select("series_id", "sum_value", F.col("rk").cast("int").alias("rk"))
    )


def resets(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """resets(): number of counter resets (value drops) per (series,
    bucket). Same lag machinery as increase — one shuffle on series_id."""
    prev = F.lag("value").over(_series_time_window())
    is_reset = F.when(prev.isNotNull() & (F.col("value") < prev), 1).otherwise(0)
    return (
        samples.withColumn("is_reset", is_reset)
        .groupBy("series_id", bucket_start(bucket_ms))
        .agg(F.sum("is_reset").cast("long").alias("resets"))
    )


def changes(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """changes(): number of value changes per (series, bucket)."""
    prev = F.lag("value").over(_series_time_window())
    chg = F.when(prev.isNotNull() & (F.col("value") != prev), 1).otherwise(0)
    return (
        samples.withColumn("chg", chg)
        .groupBy("series_id", bucket_start(bucket_ms))
        .agg(F.sum("chg").cast("long").alias("changes"))
    )


def irate(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """irate(): instant rate from the LAST TWO samples of each (series,
    bucket), with counter-reset correction. Window row_number desc —
    no driver work."""
    w = Window.partitionBy("series_id", "bucket_ms").orderBy(
        F.col("ts_ms").desc(), F.col("value").desc()
    )
    ranked = (
        samples.withColumn("bucket_ms", bucket_start(bucket_ms))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
    )
    pair = ranked.groupBy("series_id", "bucket_ms").agg(
        F.max(F.when(F.col("rn") == 1, F.col("ts_ms"))).alias("t1"),
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("v1"),
        F.max(F.when(F.col("rn") == 2, F.col("ts_ms"))).alias("t0"),
        F.max(F.when(F.col("rn") == 2, F.col("value"))).alias("v0"),
    )
    dv = F.when(F.col("v1") >= F.col("v0"), F.col("v1") - F.col("v0")).otherwise(
        F.col("v1")
    )
    dt_s = (F.col("t1") - F.col("t0")) / F.lit(1000.0)
    return pair.where(
        F.col("t0").isNotNull() & (F.col("t1") > F.col("t0"))
    ).select(
        "series_id",
        "bucket_ms",
        F.round(dv / dt_s, ROUND_AVG).alias("irate"),
    )


def idelta(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """idelta(): difference of the LAST TWO samples of each (series,
    bucket) — the gauge twin of irate (no reset correction, no time
    division). Same two-row window shape."""
    w = Window.partitionBy("series_id", "bucket_ms").orderBy(
        F.col("ts_ms").desc(), F.col("value").desc()
    )
    ranked = (
        samples.withColumn("bucket_ms", bucket_start(bucket_ms))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
    )
    pair = ranked.groupBy("series_id", "bucket_ms").agg(
        F.max(F.when(F.col("rn") == 1, F.col("ts_ms"))).alias("t1"),
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("v1"),
        F.max(F.when(F.col("rn") == 2, F.col("ts_ms"))).alias("t0"),
        F.max(F.when(F.col("rn") == 2, F.col("value"))).alias("v0"),
    )
    return pair.where(
        F.col("t0").isNotNull() & (F.col("t1") > F.col("t0"))
    ).select(
        "series_id",
        "bucket_ms",
        F.round(F.col("v1") - F.col("v0"), ROUND_AVG).alias("idelta"),
    )


def _regr_sums(samples: DataFrame, bucket_ms: int):
    """Shared least-squares sums per (series, bucket), x = seconds since
    bucket start (centering keeps the magnitudes small enough that the
    float sums agree across engines at ROUND_AVG)."""
    x = (F.col("ts_ms") - F.col("bucket_ms")) / F.lit(1000.0)
    return (
        samples.withColumn("bucket_ms", bucket_start(bucket_ms))
        .withColumn("x", x)
        .groupBy("series_id", "bucket_ms")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("value").alias("sy"),
            F.sum(F.col("x") * F.col("value")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .where(F.col("n") >= 2)
    )


def deriv(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """deriv(): per-(series, bucket) least-squares slope (per second),
    the PromQL simple linear regression over the range."""
    s = _regr_sums(samples, bucket_ms)
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return s.where(denom != 0).select(
        "series_id", "bucket_ms", F.round(slope, ROUND_AVG).alias("deriv")
    )


def predict_linear(
    samples: DataFrame, bucket_ms: int, ahead_s: float
) -> DataFrame:
    """predict_linear(): extrapolate the per-bucket regression line
    `ahead_s` seconds past the bucket end."""
    s = _regr_sums(samples, bucket_ms)
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    x_at = F.lit(bucket_ms / 1000.0 + ahead_s)
    return s.where(denom != 0).select(
        "series_id",
        "bucket_ms",
        F.round(intercept + slope * x_at, ROUND_AVG).alias("predicted"),
    )


def quantile_by(
    samples: DataFrame,
    series: DataFrame,
    by: list[str],
    q: float,
    bucket_ms: int,
) -> DataFrame:
    """quantile by (labels): continuous (interpolated) quantile of the
    sample values per label group per bucket — Spark `percentile` and
    DuckDB `quantile_cont` share the (n-1)*q definition."""
    joined = samples.join(F.broadcast(series.select("series_id", *by)), "series_id")
    return joined.groupBy(*by, bucket_start(bucket_ms)).agg(
        F.round(F.percentile("value", F.lit(q)), ROUND_AVG).alias("quantile")
    )


def bottomk(
    samples: DataFrame,
    k: int,
    mint_ms: int | None = None,
    maxt_ms: int | None = None,
) -> DataFrame:
    """bottomk(k, sum_over_time(...)): mirror of topk with ascending
    rank, deterministic tie-break on series_id. Same
    TakeOrderedAndProject shape as topk — no global window."""
    df = samples
    if mint_ms is not None:
        df = df.where(F.col("ts_ms") >= mint_ms)
    if maxt_ms is not None:
        df = df.where(F.col("ts_ms") <= maxt_ms)
    per_series = df.groupBy("series_id").agg(
        F.round(F.sum("value"), ROUND_SUM).alias("sum_value")
    )
    order = [F.col("sum_value").asc(), F.col("series_id").asc()]
    return (
        per_series.orderBy(*order)
        .limit(k)
        # constant partition key: the window input is k rows by
        # construction (post-limit); the key stops WindowExec planning
        # a move-everything global window
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(F.lit(0)).orderBy(*order)
            ),
        )
        .select("series_id", "sum_value", F.col("rk").cast("int").alias("rk"))
    )


def count_values(
    samples: DataFrame, mint_ms: int | None = None, maxt_ms: int | None = None
) -> DataFrame:
    """count_values(): number of series/samples carrying each distinct
    value in the range (PromQL count_values("value", m))."""
    df = samples
    if mint_ms is not None:
        df = df.where(F.col("ts_ms") >= mint_ms)
    if maxt_ms is not None:
        df = df.where(F.col("ts_ms") <= maxt_ms)
    return df.groupBy("value").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.countDistinct("series_id").alias("n_series"),
    )


def binop_on(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    op: str = "/",
    left_col: str = "sum_value",
    right_col: str = "sum_value",
) -> DataFrame:
    """Vector-to-vector binary op with `on(...)` matching (PromQL
    `l / on(job, env) r`): inner join on the matching labels. Both
    sides are already-aggregated small vectors -> hash join on the
    label key; the fact-table work happened upstream."""
    ops = {
        "/": lambda a, b: F.when(b != 0, a / b),
        "*": lambda a, b: a * b,
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
    }
    l = left.select(*on, F.col(left_col).alias("_l"))
    r = right.select(*on, F.col(right_col).alias("_r"))
    return l.join(r, on).select(
        *on, F.round(ops[op](F.col("_l"), F.col("_r")), ROUND_AVG).alias("result")
    )


HIST_LE = [25.0, 50.0, 100.0, 250.0, 500.0]  # +Inf implicit


def histogram_buckets(
    samples: DataFrame,
    series: DataFrame,
    by: list[str],
    bucket_ms: int,
    le: list[float] = HIST_LE,
) -> DataFrame:
    """Cumulative le-histogram per (labels, time bucket) — the shape of
    Prometheus `http_request_duration_bucket` series. One groupBy with
    conditional counts (map-side partial agg), then an unpivot."""
    joined = samples.join(F.broadcast(series.select("series_id", *by)), "series_id")
    aggs = [
        F.sum(F.when(F.col("value") <= b, 1).otherwise(0)).alias(f"le_{i}")
        for i, b in enumerate(le)
    ] + [F.count(F.lit(1)).alias("le_inf")]
    wide = joined.groupBy(*by, bucket_start(bucket_ms)).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).alias("le"), F.col(f"le_{i}").cast("long").alias("cum")
            )
            for i, b in enumerate(le)
        ],
        F.struct(
            F.lit(float("inf")).alias("le"), F.col("le_inf").cast("long").alias("cum")
        ),
    )
    return wide.select(*by, "bucket_ms", F.explode(pairs).alias("kv")).select(
        *by, "bucket_ms", F.col("kv.le").alias("le"), F.col("kv.cum").alias("cum")
    )


def histogram_quantile(
    buckets: DataFrame, q: float, by: list[str]
) -> DataFrame:
    """histogram_quantile(q, ...) over cumulative le buckets: find the
    bucket containing rank q*total and interpolate linearly inside it
    (Prometheus semantics: lower bound of the first bucket is 0; if the
    target falls in the +Inf bucket, return the highest finite le)."""
    keys = [*by, "bucket_ms"]
    w = Window.partitionBy(*keys).orderBy("le")
    # Full-partition aggregates share the SORTED window spec with an
    # explicit unbounded frame instead of a second partition-only
    # Window: every expression then lands in ONE Window operator over
    # one exchange+sort (3 Window / 3 Sort passes folded to 1 each).
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # All window expressions are materialized BEFORE the hit filter —
    # window functions evaluate against whatever relation they are
    # selected from, so computing them after the filter would see
    # single-row partitions.
    staged = (
        buckets.withColumn("_rank", q * F.max("cum").over(wfull))
        .withColumn("_prev_cum", F.coalesce(F.lag("cum").over(w), F.lit(0)))
        .withColumn("_prev_le", F.coalesce(F.lag("le").over(w), F.lit(0.0)))
        .withColumn(
            "_max_finite",
            F.max(F.when(F.col("le") != float("inf"), F.col("le"))).over(wfull),
        )
    )
    interp = F.when(F.col("le") == float("inf"), F.col("_max_finite")).otherwise(
        F.col("_prev_le")
        + (F.col("le") - F.col("_prev_le"))
        * (F.col("_rank") - F.col("_prev_cum"))
        / (F.col("cum") - F.col("_prev_cum"))
    )
    # floor-based 6dp discretization instead of round(): the
    # interpolated value can land within an ulp of a .5 rounding tie,
    # where Spark (exact-decimal HALF_UP) and DuckDB (scaled-double
    # rounding) disagree by 1e-6. floor(x*1e6 + 0.5)/1e6 computes the
    # same doubles on both engines, so the tie cannot split.
    q6 = F.floor(interp * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return staged.where(
        (F.col("cum") >= F.col("_rank")) & (F.col("_prev_cum") < F.col("_rank"))
    ).select(*keys, q6.alias("quantile"))


def absent_over_time(
    samples: DataFrame, series: DataFrame, bucket_ms: int,
    mint_ms: int, maxt_ms: int,
) -> DataFrame:
    """absent_over_time(): (series, bucket) pairs inside [mint, maxt]
    with NO samples — cross join of the series dim with the bucket
    spine (both tiny), anti-joined against observed pairs."""
    n_buckets = (maxt_ms - mint_ms) // bucket_ms
    spine = (
        series.select("series_id")
        .crossJoin(
            F.broadcast(
                samples.sparkSession.range(n_buckets).select(
                    (F.lit(mint_ms) + F.col("id") * bucket_ms).alias("bucket_ms")
                )
            )
        )
    )
    present = (
        samples.where(
            (F.col("ts_ms") >= mint_ms) & (F.col("ts_ms") < maxt_ms)
        )
        .select("series_id", bucket_start(bucket_ms))
        .distinct()
    )
    return spine.join(present, ["series_id", "bucket_ms"], "left_anti").withColumn(
        "absent", F.lit(1)
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


def label_replace(
    series: DataFrame, dst: str, replacement: str, src: str, regex: str
) -> DataFrame:
    """PromQL label_replace(): when `regex` FULLY matches the value of
    label `src` (absent label == ""), set label `dst` to `replacement`
    (with $1..$9 capture refs); otherwise the series keeps its existing
    `dst` (absent stays absent). Pure dimension-table projection — no
    touch of the fact table."""
    anchored = f"^(?:{regex})$"
    src_col = F.coalesce(F.col(src), F.lit(""))
    existing = F.col(dst) if dst in series.columns else F.lit(None).cast("string")
    new_val = F.regexp_replace(src_col, anchored, replacement)
    out = F.when(src_col.rlike(anchored), new_val).otherwise(existing)
    return series.withColumn(dst, out)


def label_join(
    series: DataFrame, dst: str, sep: str, *srcs: str
) -> DataFrame:
    """PromQL label_join(): dst = src label values joined by sep
    (absent labels join as ""). Dimension-table projection."""
    cols = [F.coalesce(F.col(s), F.lit("")) for s in srcs]
    return series.withColumn(dst, F.concat_ws(sep, *cols))


def range_agg_sliding(
    samples: DataFrame, window_ms: int, step_ms: int
) -> DataFrame:
    """PromQL range-query evaluation shape: xxx_over_time with a
    sliding window (window > step), one output row per (series,
    eval step) — F.window's slideDuration, epoch-aligned like
    Prometheus step alignment. Each sample lands in window_ms/step_ms
    windows; Catalyst expands them map-side, then one shuffle on
    (series, window)."""
    if window_ms % step_ms != 0:
        raise ValueError("window_ms must be a multiple of step_ms")
    w = F.window(
        F.timestamp_millis(F.col("ts_ms")),
        f"{window_ms} milliseconds",
        f"{step_ms} milliseconds",
    )
    return (
        samples.groupBy("series_id", w.alias("w"))
        .agg(
            F.round(F.sum("value"), ROUND_SUM).alias("sum_value"),
            F.round(F.avg("value"), ROUND_AVG).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            # last sample in the window (ties by value, deterministic)
            F.max_by(
                "value", F.struct(F.col("ts_ms"), F.col("value"))
            ).alias("last_value"),
        )
        .select(
            "series_id",
            F.unix_millis(F.col("w.start")).alias("wstart_ms"),
            "sum_value",
            "avg_value",
            "n",
            "min_value",
            "max_value",
            "last_value",
        )
    )


def range_rate_sliding(
    samples: DataFrame, window_ms: int, step_ms: int
) -> DataFrame:
    """rate()/increase() on a /query_range step grid with window >
    step (the PromQL range-query shape). Per-sample reset-corrected
    deltas are computed ONCE with the global series lag (the delta is
    attributed to the LATER sample's timestamp, matching the tumbling
    increase()), then each delta lands in its window_ms/step_ms
    overlapping windows via F.window's slide expansion — map-side
    explode, ONE shuffle on (series, window). Output one row per
    (series, window start): increase = sum of deltas, rate =
    increase / window seconds."""
    if window_ms % step_ms != 0:
        raise ValueError("window_ms must be a multiple of step_ms")
    lagw = Window.partitionBy("series_id").orderBy("ts_ms", "value")
    d = (
        samples.withColumn("prev", F.lag("value").over(lagw))
        .where(F.col("prev").isNotNull())
        .withColumn(
            "delta",
            F.when(
                F.col("value") >= F.col("prev"),
                F.col("value") - F.col("prev"),
            ).otherwise(F.col("value")),
        )
    )
    w = F.window(
        F.timestamp_millis(F.col("ts_ms")),
        f"{window_ms} milliseconds",
        f"{step_ms} milliseconds",
    )
    inc = F.round(F.sum("delta"), ROUND_SUM)
    return (
        d.groupBy("series_id", w.alias("w"))
        .agg(
            inc.alias("increase"),
            (inc / F.lit(window_ms / 1000.0)).alias("rate"),
        )
        .select(
            "series_id",
            F.unix_millis(F.col("w.start")).alias("wstart_ms"),
            "increase",
            "rate",
        )
    )


def rate_extrapolated(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """Prometheus's actual rate() semantics (promql extrapolatedRate):
    the raw counter delta over the window is extrapolated to the window
    boundaries, limited by 1.1x the average sample spacing, and — for
    counters — by the time at which the counter would have been zero.

    Per (series, bucket), in one aggregation pass + one lag window:
      raw      = reset-corrected sum of deltas (simple increase)
      sampled  = last_t - first_t;  avg_gap = sampled / (n - 1)
      extend_start/end = min(durationTo{Start,End}, avg_gap/2) when the
        gap to the boundary exceeds 1.1*avg_gap, else the full gap
      zero cap = sampled * first_v / raw  (counter can't extrapolate
        below zero)
      rate = raw * (sampled + extend_start + extend_end) / sampled
                 / bucket_seconds
    """
    prev = F.lag("value").over(_series_time_window())
    contrib = F.when(prev.isNull(), None).when(
        F.col("value") >= prev, F.col("value") - prev
    ).otherwise(F.col("value"))
    agg = (
        samples.withColumn("contrib", contrib)
        .groupBy("series_id", bucket_start(bucket_ms))
        .agg(
            F.sum("contrib").alias("raw"),
            F.count(F.lit(1)).alias("n"),
            F.min("ts_ms").alias("first_t"),
            F.max("ts_ms").alias("last_t"),
            F.min(F.struct("ts_ms", "value"))["value"].alias("first_v"),
        )
        .where((F.col("n") >= 2) & F.col("raw").isNotNull())
    )
    sampled_s = (F.col("last_t") - F.col("first_t")) / 1000.0
    avg_gap = sampled_s / (F.col("n") - 1)
    thresh = avg_gap * 1.1
    to_start = (F.col("first_t") - F.col("bucket_ms")) / 1000.0
    to_end = (F.col("bucket_ms") + bucket_ms - F.col("last_t")) / 1000.0
    # counter zero-point cap on the start-side extrapolation
    zero_cap = F.when(
        (F.col("raw") > 0) & (F.col("first_v") >= 0),
        sampled_s * (F.col("first_v") / F.col("raw")),
    )
    ext_start_raw = F.when(to_start < thresh, to_start).otherwise(avg_gap / 2.0)
    ext_start = F.when(
        zero_cap.isNotNull() & (zero_cap < ext_start_raw), zero_cap
    ).otherwise(ext_start_raw)
    ext_end = F.when(to_end < thresh, to_end).otherwise(avg_gap / 2.0)
    factor = (sampled_s + ext_start + ext_end) / sampled_s
    return agg.where(sampled_s > 0).select(
        "series_id",
        "bucket_ms",
        F.round(
            F.col("raw") * factor / F.lit(bucket_ms / 1000.0), ROUND_AVG
        ).alias("rate"),
    )


def aggregate_without(
    samples: DataFrame,
    series: DataFrame,
    without: list[str],
    bucket_ms: int,
) -> DataFrame:
    """sum/avg/count without (labels): aggregate over every label
    EXCEPT the listed ones — the complement form of aggregate_by."""
    label_cols = [c for c in series.columns if c != "series_id"]
    by = [c for c in label_cols if c not in set(without)]
    return aggregate_by(samples, series, by, bucket_ms)


def quantile_over_time(
    samples: DataFrame, q: float, bucket_ms: int
) -> DataFrame:
    """quantile_over_time(q, m[bucket]): continuous quantile of each
    series' values per bucket (same interpolation contract as
    quantile_by; Spark percentile == DuckDB quantile_cont)."""
    return samples.groupBy("series_id", bucket_start(bucket_ms)).agg(
        F.round(F.percentile("value", F.lit(q)), ROUND_AVG).alias("quantile")
    )


def holt_winters(
    samples: DataFrame, bucket_ms: int, sf: float, tf: float
) -> DataFrame:
    """holt_winters(m[r], sf, tf) (a.k.a. double_exponential_smoothing):
    per-(series, bucket) smoothed value via the exact Prometheus
    recurrence (functions.go funcHoltWinters/calcTrendValue):

        s1 = x[0]; b = x[1] - x[0]
        for i in 1..n-1:
            if i > 1: b = tf*(s1 - s0) + (1 - tf)*b
            s0, s1 = s1, sf*x[i] + (1 - sf)*(s1 + b)
        result = s1   (needs >= 2 points)

    The recurrence is order-dependent, so it folds over the bucket's
    time-sorted value array with F.aggregate — a single shuffle, all
    JVM-side; the array is bucket-sized (bounded), never the series'
    full history. The DuckDB oracle mirrors the fold with list_reduce
    over the same sorted list."""
    arr = samples.groupBy("series_id", bucket_start(bucket_ms)).agg(
        F.array_sort(
            F.collect_list(F.struct("ts_ms", "value"))
        ).alias("xs")
    )
    vals = F.transform(F.col("xs"), lambda s: s.getField("value"))
    init = F.struct(
        F.lit(0.0).alias("s0"),
        F.element_at(vals, 1).alias("s1"),
        (F.element_at(vals, 2) - F.element_at(vals, 1)).alias("b"),
        F.lit(1).alias("i"),
    )
    sf_, tf_ = F.lit(float(sf)), F.lit(float(tf))

    def step(acc, x):
        b = F.when(
            acc.getField("i") > 1,
            tf_ * (acc.getField("s1") - acc.getField("s0"))
            + (F.lit(1.0) - tf_) * acc.getField("b"),
        ).otherwise(acc.getField("b"))
        s_new = sf_ * x + (F.lit(1.0) - sf_) * (acc.getField("s1") + b)
        return F.struct(
            acc.getField("s1").alias("s0"),
            s_new.alias("s1"),
            b.alias("b"),
            (acc.getField("i") + 1).alias("i"),
        )

    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init,
        step,
        lambda acc: acc.getField("s1"),
    )
    # floor-based 6dp discretization, not round(): the smoothed value
    # is an arbitrary double that can land within an ulp of a .5
    # rounding tie where Spark (exact-decimal HALF_UP) and DuckDB
    # (scaled-double) disagree; floor(x*1e6 + 0.5)/1e6 computes the
    # same doubles on both engines (histogram_quantile pattern)
    q6 = F.floor(folded * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return arr.where(F.size("xs") >= 2).select(
        "series_id",
        "bucket_ms",
        q6.alias("smoothed"),
    )


def stddev_by(
    samples: DataFrame,
    series: DataFrame,
    by: list[str],
    bucket_ms: int,
) -> DataFrame:
    """stddev by (labels): population standard deviation per label
    group per bucket, computed from explicit sums (sqrt(E[x^2]-E[x]^2))
    rather than Welford aggregates — the formulation whose float result
    agrees across engines at ROUND_AVG."""
    joined = samples.join(F.broadcast(series.select("series_id", *by)), "series_id")
    agg = joined.groupBy(*by, bucket_start(bucket_ms)).agg(
        F.sum("value").alias("sx"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    return agg.select(
        *by,
        "bucket_ms",
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), ROUND_AVG).alias("stddev"),
    )


def binop_group_left(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    op: str = "/",
    left_col: str = "value",
    right_col: str = "value",
    carry: list[str] | None = None,
) -> DataFrame:
    """Many-to-one vector matching: `l / on(...) group_left r` — each
    right row matches MANY left rows; left's extra labels (carry) pass
    through. right must be unique per `on` key (Prometheus errors
    otherwise; here enforced upstream by aggregation). The right side
    is the smaller vector -> broadcast."""
    ops = {
        "/": lambda a, b: F.when(b != 0, a / b),
        "*": lambda a, b: a * b,
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
    }
    carry = carry or []
    l = left.select(*on, *carry, F.col(left_col).alias("_l"))
    r = F.broadcast(right.select(*on, F.col(right_col).alias("_r")))
    return l.join(r, on).select(
        *on,
        *carry,
        F.round(ops[op](F.col("_l"), F.col("_r")), ROUND_AVG).alias("result"),
    )


def downsample_ohlc(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """Continuous-aggregate downsample (the TimescaleDB rollup shape —
    candlestick first/last plus extrema): per (series, bucket) the
    OPEN (value at min ts), HIGH, LOW, CLOSE (value at max ts), mean
    and count. First/last are min/max over a (ts, value) struct —
    lexicographic struct ordering makes ties on ts deterministic on
    every engine, and the whole rollup stays ONE map-side-combining
    aggregation (no window, no second shuffle). This is the rollup
    you materialize once at 100 TB and serve dashboards from."""
    t = F.struct(F.col("ts_ms"), F.col("value"))
    return samples.groupBy("series_id", bucket_start(bucket_ms)).agg(
        F.min(t).getField("value").alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max(t).getField("value").alias("close_value"),
        F.round(F.avg("value"), ROUND_AVG).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


def alert_for_state(
    cond: DataFrame, keys: list[str], for_ms: int, step_ms: int
) -> DataFrame:
    """Prometheus alert `for:` clause over a step grid: an alert
    element is FIRING at step t iff its condition held at EVERY step
    of the trailing `for_ms` window, else PENDING (rows exist only
    where the condition holds — comparison filters drop the rest,
    matching PromQL vector semantics).

    The run-length check is ONE range window (count of condition rows
    in (t-for, t] == for/step) — no self-join, no gaps-and-islands
    subquery; grid regularity turns "held continuously" into a count.
    Scale: partitioned by alert keys, ordered by the grid — the same
    shuffle the condition aggregation already produced."""
    from pyspark.sql import Window

    need = int(for_ms // step_ms)
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ms")
        .rangeBetween(-(for_ms - step_ms), 0)
    )
    return cond.withColumn(
        "state",
        F.when(F.count(F.lit(1)).over(w) >= need, F.lit("firing")).otherwise(
            F.lit("pending")
        ),
    )


def mad_over_time(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """mad_over_time (Prometheus experimental): median absolute
    deviation of values per (series, bucket). Two passes over the same
    bucket key — per-bucket median (exact interpolated percentile),
    then the median of |x - median| — the second groupBy reuses the
    first's partitioning, so AQE plans one real exchange."""
    med = samples.groupBy("series_id", bucket_start(bucket_ms)).agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    joined = samples.select(
        "series_id", bucket_start(bucket_ms), "value"
    ).join(med, ["series_id", "bucket_ms"])
    return joined.groupBy("series_id", "bucket_ms").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)),
            ROUND_AVG,
        ).alias("mad")
    )


def zscore_over_time(samples: DataFrame, window_ms: int) -> DataFrame:
    """Per-sample anomaly score: z = (v - mean) / stddev against the
    series' TRAILING window (t-window, t) — current sample excluded,
    so a spike scores against history, not itself. One range window
    per series (the partitioning every downstream agg reuses); samples
    with under-2-point or zero-variance history yield NULL, matching
    'not enough evidence' rather than 0. Variance via explicit moments
    (E[x^2]-E[x]^2) so the floats match the SQL oracle bit-for-bit
    before the 6dp round."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("series_id")
        .orderBy("ts_ms")
        .rangeBetween(-window_ms, -1)
    )
    m = F.avg("value").over(w)
    v2 = F.avg(F.col("value") * F.col("value")).over(w)
    var = v2 - m * m
    return samples.select(
        "series_id",
        "ts_ms",
        "value",
        F.when(
            var > 0, F.round((F.col("value") - m) / F.sqrt(var), ROUND_AVG)
        ).alias("zscore"),
    )


def native_histogram(samples: DataFrame, bucket_ms: int) -> DataFrame:
    """Native-histogram-style SKETCH of raw observations: Prometheus
    native histograms (schema 0) bucket a positive value v into the
    exponential bucket i = ceil(log2 v), i.e. (2^(i-1), 2^i]. Per
    (series, window, bucket): observation count — a mergeable sparse
    sketch whose size grows with the value RANGE's log, not the sample
    count (the 100 TB rollup you'd actually store for latency data).
    Non-positive values are excluded (the zero-bucket; events values
    are positive by construction — documented contract).

    The log2 arithmetic is the identical IEEE expression in the DuckDB
    oracle, so bucket boundaries land identically on both engines."""
    idx = F.ceil(F.log(2.0, F.col("value"))).cast("long")
    return (
        samples.where(F.col("value") > 0)
        .groupBy("series_id", bucket_start(bucket_ms), idx.alias("bucket_idx"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def native_hist_quantile(
    samples: DataFrame, bucket_ms: int, q: float = 0.9
) -> DataFrame:
    """Quantile from the exponential sketch, Prometheus-native-style:
    walk the cumulative bucket counts to the bucket holding rank
    q*total, interpolate linearly inside its (2^(i-1), 2^i] bounds.
    One shuffle builds the sketch; the walk is a window over the
    (tiny) per-group bucket list. Estimates are within one bucket's
    relative width of the exact quantile by construction."""
    from pyspark.sql import Window

    hb = native_histogram(samples, bucket_ms)
    w = (
        Window.partitionBy("series_id", "bucket_ms")
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("series_id", "bucket_ms")
    cum = (
        hb.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot))
        .withColumn("rank", F.lit(q) * F.col("total"))
    )
    hit = cum.where(F.col("cum") >= F.col("rank")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("series_id", "bucket_ms").orderBy("bucket_idx")
        ),
    ).where(F.col("rn") == 1)
    lower = F.pow(F.lit(2.0), F.col("bucket_idx") - 1)
    upper = F.pow(F.lit(2.0), F.col("bucket_idx"))
    pos = (F.col("rank") - (F.col("cum") - F.col("n"))) / F.col("n")
    return hit.select(
        "series_id",
        "bucket_ms",
        F.round(lower + (upper - lower) * pos, 6).alias("quantile"),
        F.col("total").cast("long").alias("n_obs"),
    )


def alert_inhibit(
    alerts: DataFrame,
    severity_col: str = "severity",
    equal: tuple = ("job", "bucket_ms"),
    source: str = "critical",
    target: str = "warning",
) -> DataFrame:
    """Alertmanager inhibition: suppress `target`-severity alerts
    whenever a `source`-severity alert is firing with EQUAL values on
    the `equal` labels (alertmanager inhibit_rules semantics — the
    dedup layer between paging and noise). One anti-join on the equal
    keys; critical alerts always pass through."""
    crit = alerts.where(F.col(severity_col) == source)
    warn = alerts.where(F.col(severity_col) == target)
    kept_warn = warn.join(
        crit.select(*equal).distinct(), list(equal), "anti"
    )
    return crit.unionByName(kept_warn)


def native_hist_stats(
    samples: DataFrame, bucket_ms: int
) -> DataFrame:
    """histogram_count / histogram_sum / histogram_avg from the
    exponential sketch: count is EXACT (sketch preserves counts); sum
    and avg are midpoint estimates (each bucket's mass at the
    geometric center 0.75 * 2^i of (2^(i-1), 2^i] — the standard
    sketch estimator, within one bucket width relatively)."""
    hb = native_histogram(samples, bucket_ms)
    mid = F.lit(0.75) * F.pow(F.lit(2.0), F.col("bucket_idx"))
    est = F.sum(F.col("n") * mid)
    return (
        hb.groupBy("series_id", "bucket_ms")
        .agg(
            F.sum("n").cast("long").alias("hist_count"),
            (F.floor(est * 1e6 + 0.5) / 1e6).alias("hist_sum_est"),
            (
                F.floor(est / F.sum("n") * 1e6 + 0.5) / 1e6
            ).alias("hist_avg_est"),
        )
        .orderBy("series_id", "bucket_ms")
    )


def native_hist_fraction(
    samples: DataFrame, bucket_ms: int, lo: float, hi: float
) -> DataFrame:
    """histogram_fraction(lo, hi, sketch) over the exponential sketch:
    the estimated fraction of observations in (lo, hi], linearly
    interpolating inside the two boundary buckets (Prometheus
    histogram_fraction semantics for native histograms). Per-bucket
    overlap of (lo, hi] with (2^(i-1), 2^i] is a pure projection; one
    aggregate per (series, window) — the sketch is already tiny.
    Fractions are exact when lo/hi fall on bucket boundaries."""
    hb = native_histogram(samples, bucket_ms)
    lower = F.pow(F.lit(2.0), F.col("bucket_idx") - 1)
    upper = F.pow(F.lit(2.0), F.col("bucket_idx"))
    covered = F.greatest(
        F.lit(0.0),
        F.least(F.lit(hi), upper) - F.greatest(F.lit(lo), lower),
    ) / (upper - lower)
    return (
        hb.groupBy("series_id", "bucket_ms")
        .agg(
            (
                F.floor(
                    F.sum(F.col("n") * covered) / F.sum("n") * 1e6 + 0.5
                )
                / 1e6
            ).alias("fraction"),
            F.sum("n").cast("long").alias("n_obs"),
        )
        .orderBy("series_id", "bucket_ms")
    )
