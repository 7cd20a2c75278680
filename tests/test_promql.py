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
