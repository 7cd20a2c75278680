"""PromQL compute tier: counter-reset correction, staleness lookback,
topk determinism."""

from __future__ import annotations

import pytest

from agni_spark.functions import promql


@pytest.fixture(scope="module")
def samples(spark):
    # series 1: counter with a reset (10 -> 2); series 2: steady gauge
    return spark.createDataFrame(
        [
            (1, 0, 0.0),
            (1, 1000, 5.0),
            (1, 2000, 10.0),
            (1, 3000, 2.0),  # reset: contributes 2, not -8
            (1, 4000, 4.0),
            (2, 0, 7.0),
            (2, 5000, 7.0),
        ],
        "series_id long, ts_ms long, value double",
    )


def test_increase_counter_reset(samples):
    rows = {r.series_id: r.increase for r in promql.increase(samples, 10_000).collect()}
    # series 1: 5 + 5 + 2 (reset) + 2 = 14; series 2: 0
    assert rows == {1: 14.0, 2: 0.0}


def test_rate_is_increase_per_second(samples):
    rows = {r.series_id: r.rate for r in promql.rate(samples, 10_000).collect()}
    assert rows[1] == pytest.approx(14.0 / 10.0)


def test_delta_last_minus_first(samples):
    rows = {r.series_id: r.delta for r in promql.delta(samples, 10_000).collect()}
    assert rows == {1: 4.0, 2: 0.0}


def test_instant_staleness_lookback(samples):
    got = {(r.series_id, r.ts_ms, r.value) for r in promql.instant(samples, 4000, 1500).collect()}
    # only series 1 has a sample in (2500, 4000]
    assert got == {(1, 4000, 4.0)}


def test_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, 0, 5.0), (2, 0, 5.0), (3, 0, 1.0)],
        "series_id long, ts_ms long, value double",
    )
    rows = promql.topk(df, 2).collect()
    # tie on sum=5.0 broken by series_id ascending
    assert [(r.series_id, r.rk) for r in rows] == [(1, 1), (2, 2)]


def test_agg_over_time(samples):
    r = {
        (x.series_id, x.bucket_ms): x
        for x in promql.agg_over_time(samples, 10_000).collect()
    }
    s1 = r[(1, 0)]
    assert (s1.min_value, s1.max_value, s1.n) == (0.0, 10.0, 5)
    assert s1.avg_value == pytest.approx(4.2)


def test_resets_and_changes(samples):
    r = {x.series_id: x.resets for x in promql.resets(samples, 10_000).collect()}
    # series 1 drops once (10 -> 2); series 2 never drops
    assert r == {1: 1, 2: 0}
    c = {x.series_id: x.changes for x in promql.changes(samples, 10_000).collect()}
    # series 1 changes at every step (4 transitions); series 2 stays 7.0
    assert c == {1: 4, 2: 0}


def test_irate_last_two_samples(samples):
    rows = {x.series_id: x.irate for x in promql.irate(samples, 10_000).collect()}
    # series 1: last two samples (3000, 2.0) -> (4000, 4.0): dv=2 over 1s
    assert rows[1] == pytest.approx(2.0)
    # series 2: (0, 7.0) -> (5000, 7.0): 0 over 5s
    assert rows[2] == pytest.approx(0.0)


def test_deriv_exact_line(spark):
    # value = 3 + 2 * x(seconds): slope must be exactly 2, prediction exact
    df = spark.createDataFrame(
        [(1, t * 1000, 3.0 + 2.0 * t) for t in range(5)],
        "series_id long, ts_ms long, value double",
    )
    d = promql.deriv(df, 10_000).collect()
    assert len(d) == 1 and d[0].deriv == pytest.approx(2.0)
    p = promql.predict_linear(df, 10_000, 5.0).collect()
    # x_at = 10 + 5 = 15s -> 3 + 2*15 = 33
    assert p[0].predicted == pytest.approx(33.0)


def test_bottomk_mirror_of_topk(spark):
    df = spark.createDataFrame(
        [(1, 0, 5.0), (2, 0, 5.0), (3, 0, 1.0)],
        "series_id long, ts_ms long, value double",
    )
    rows = promql.bottomk(df, 2).collect()
    assert [(r.series_id, r.rk) for r in rows] == [(3, 1), (1, 2)]


def test_binop_on_division_null_on_zero(spark):
    l = spark.createDataFrame([("a", 10.0), ("b", 3.0)], "k string, sum_value double")
    r = spark.createDataFrame([("a", 4.0), ("b", 0.0)], "k string, sum_value double")
    rows = {x.k: x.result for x in promql.binop_on(l, r, ["k"], "/").collect()}
    assert rows["a"] == pytest.approx(2.5)
    assert rows["b"] is None  # division by zero -> null, not error


def test_histogram_quantile_interpolation(spark):
    series = spark.createDataFrame([(1, "api")], "series_id long, job string")
    # 10 samples, values 10..100 -> cum at le=25:2, 50:5, 100:10
    df = spark.createDataFrame(
        [(1, i, float((i + 1) * 10)) for i in range(10)],
        "series_id long, ts_ms long, value double",
    )
    b = promql.histogram_buckets(df, series, ["job"], 10_000, le=[25.0, 50.0])
    got = promql.histogram_quantile(b, 0.5, ["job"]).collect()
    # rank = 5 -> hit bucket le=50 (cum 5 >= 5, prev 2 < 5):
    # 25 + (50-25) * (5-2)/(5-2) = 50
    assert got[0].quantile == pytest.approx(50.0)


def test_absent_over_time(spark):
    series = spark.createDataFrame([(1,), (2,)], "series_id long")
    # series 1 present in bucket [0,10s) only; series 2 never
    df = spark.createDataFrame(
        [(1, 1000, 1.0)], "series_id long, ts_ms long, value double"
    )
    got = {
        (r.series_id, r.bucket_ms)
        for r in promql.absent_over_time(df, series, 10_000, 0, 20_000).collect()
    }
    assert got == {(1, 10_000), (2, 0), (2, 10_000)}


def test_range_agg_sliding_window_membership(spark):
    df = spark.createDataFrame(
        [(1, 500, 2.0), (1, 1500, 4.0)],
        "series_id long, ts_ms long, value double",
    )
    rows = {
        r.wstart_ms: (r.sum_value, r.n)
        for r in promql.range_agg_sliding(df, 2000, 1000).collect()
    }
    # sample@500 -> windows starting at -1000 and 0; sample@1500 -> 0 and 1000
    assert rows == {-1000: (2.0, 1), 0: (6.0, 2), 1000: (4.0, 1)}
    with pytest.raises(ValueError):
        promql.range_agg_sliding(df, 2500, 1000)


def test_rate_extrapolated_prometheus_semantics(spark):
    # counter starting at 0: the zero-point cap suppresses start-side
    # extrapolation; end side extends by the boundary gap (< 1.1*avg)
    df = spark.createDataFrame(
        [(1, 2000, 0.0), (1, 4000, 5.0), (1, 8000, 10.0)],
        "series_id long, ts_ms long, value double",
    )
    rows = promql.rate_extrapolated(df, 10_000).collect()
    assert len(rows) == 1
    # raw=10 over sampled 6s; ext_start=0 (zero cap), ext_end=2
    # rate = 10 * (8/6) / 10 = 1.333333
    assert rows[0].rate == pytest.approx(10 * (8 / 6) / 10, abs=1e-6)
    # single-sample buckets produce no rate
    one = spark.createDataFrame(
        [(1, 1000, 5.0)], "series_id long, ts_ms long, value double"
    )
    assert promql.rate_extrapolated(one, 10_000).count() == 0


def test_alert_for_state_requires_continuous_hold(spark):
    from agni_spark.functions import promql

    # steps 0,100,200 continuous -> firing at 200 (need=3); gap at 400
    # resets the run, so 500,600 are pending even though 3 rows exist
    cond = spark.createDataFrame(
        [("a", 0), ("a", 100), ("a", 200), ("a", 500), ("a", 600)],
        "job string, bucket_ms long",
    )
    out = promql.alert_for_state(cond, ["job"], for_ms=300, step_ms=100)
    got = {r.bucket_ms: r.state for r in out.collect()}
    assert got == {
        0: "pending", 100: "pending", 200: "firing",
        500: "pending", 600: "pending",
    }


def test_alert_inhibit(spark):
    from agni_spark.functions import promql

    alerts = spark.createDataFrame(
        [
            ("api", 0, 1200.0, "critical"),
            ("api", 0, 1200.0, "warning"),   # suppressed by the critical
            ("web", 0, 800.0, "warning"),    # no critical -> passes
            ("api", 1, 900.0, "warning"),    # other bucket -> passes
        ],
        "job string, bucket_ms long, value double, severity string",
    )
    out = {(r.job, r.bucket_ms, r.severity)
           for r in promql.alert_inhibit(alerts).collect()}
    assert out == {
        ("api", 0, "critical"),
        ("web", 0, "warning"),
        ("api", 1, "warning"),
    }
