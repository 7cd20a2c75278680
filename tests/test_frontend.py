"""Query-frontend results cache: split-by-interval correctness, cache
accounting, manifest-last crash safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agni_spark import datamodel as dm
from agni_spark import promql_parser as pql
from agni_spark.frontend import DAY_MS, ResultsCache
from agni_spark.querier import Querier

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def querier(spark):
    t = dm.derive_tsdb(spark, SF)
    return Querier(t.samples, t.series, t.series_labels, t.blocks)


def _dense_querier(spark):
    # 2 series, one sample every 6h across 6 days: every gap is within
    # the 1-day lookback, so even lag-based functions split exactly
    rows = [
        (sid, 19732 * DAY_MS + i * 21_600_000, float(i * (sid + 1)))
        for sid in (1, 2)
        for i in range(24)
    ]
    samples = spark.createDataFrame(
        rows, "series_id long, ts_ms long, value double"
    )
    series = spark.createDataFrame(
        [(1, "event_error", "api", "prod", "i1", None),
         (2, "event_error", "web", "prod", "i2", None)],
        "series_id long, metric string, job string, env string, "
        "instance string, pod string",
    )
    labels = series.selectExpr(
        "series_id", "'__name__' AS name", "metric AS value"
    )
    return Querier(samples, series, labels, None)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cache_accounting_and_equality(querier, tmp_path):
    fc = ResultsCache(querier, str(tmp_path / "cache"))
    expr = "sum by (job) (sum_over_time(event_error[1d]))"
    t0 = 19732 * DAY_MS
    fc.query_range(expr, t0, t0 + 4 * DAY_MS).count()
    assert (fc.hits, fc.misses) == (0, 4)
    out = fc.query_range(expr, t0, t0 + 10 * DAY_MS)
    assert (fc.hits, fc.misses) == (4, 10)  # 4 served, 6 new
    whole = pql.query(
        querier, expr, mint_ms=t0, maxt_ms=t0 + 10 * DAY_MS - 1
    )
    assert _rows(out) == _rows(whole)
    # a third identical query is all hits, no recompute
    fc.query_range(expr, t0, t0 + 10 * DAY_MS).count()
    assert (fc.hits, fc.misses) == (14, 10)


def test_split_equals_whole_for_lag_functions_when_dense(spark, tmp_path):
    q = _dense_querier(spark)
    fc = ResultsCache(q, str(tmp_path / "cache2"))
    expr = "sum by (job) (increase(event_error[1d]))"
    t0 = 19732 * DAY_MS
    got = fc.query_range(expr, t0, t0 + 6 * DAY_MS)
    whole = pql.query(q, expr, mint_ms=t0, maxt_ms=t0 + 6 * DAY_MS - 1)
    assert _rows(got) == _rows(whole) and got.count() > 0


def test_uncommitted_partial_not_served(querier, tmp_path):
    fc = ResultsCache(querier, str(tmp_path / "cache3"))
    expr = "sum by (job) (sum_over_time(event_error[1d]))"
    t0 = 19732 * DAY_MS
    fc.query_range(expr, t0, t0 + 2 * DAY_MS).count()
    # simulate a crashed partial: data for day d lands, manifest stays
    from agni_spark.frontend import _expr_key

    key = _expr_key(expr)
    spark = querier.samples.sparkSession
    orphan = fc.query_range(expr, t0, t0 + DAY_MS)
    orphan.write.mode("overwrite").parquet(
        f"{fc.path}/{key}/data/day=19999"
    )
    served = fc.query_range(expr, 19_999 * DAY_MS, 20_000 * DAY_MS)
    # the orphan day is not in the manifest: the recompute OVERWRITES
    # the crashed attempt's partition (for this future day: with
    # nothing), so the orphan rows never surface
    assert served.count() == 0
