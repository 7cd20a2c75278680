"""Querier semantics: time-bound inclusivity (querier.go:831-833),
tombstone inclusivity (tombstones.go:158-165), cross-block merge order
(querier.go:314-328), block overlap validation (db.go:206-220)."""

from __future__ import annotations

import pytest

from agni_spark.matchers import eq
from agni_spark.querier import Querier, validate_block_sequence


@pytest.fixture(scope="module")
def q(spark):
    samples = spark.createDataFrame(
        [
            # series 1: spans two "blocks"
            (1, 100, 1.0),
            (1, 200, 2.0),
            (1, 300, 3.0),
            (1, 7200100, 4.0),
            # series 2
            (2, 150, 10.0),
            (2, 250, 20.0),
        ],
        "series_id long, ts_ms long, value double",
    )
    series = spark.createDataFrame([(1,), (2,)], "series_id long")
    sl = spark.createDataFrame(
        [(1, "job", "api"), (2, "job", "web")],
        "series_id long, name string, value string",
    )
    return Querier(samples, series, sl)


def test_time_bounds_inclusive_both_ends(q):
    rows = q.select(mint_ms=100, maxt_ms=300).collect()
    assert [(r.series_id, r.ts_ms) for r in rows] == [
        (1, 100),
        (1, 200),
        (1, 300),
        (2, 150),
        (2, 250),
    ]


def test_select_output_order_series_then_time(q):
    rows = q.select().collect()
    keys = [(r.series_id, r.ts_ms) for r in rows]
    assert keys == sorted(keys)


def test_matcher_plus_time(q):
    rows = q.select([eq("job", "api")], mint_ms=150, maxt_ms=7200100).collect()
    assert [(r.series_id, r.ts_ms) for r in rows] == [(1, 200), (1, 300), (1, 7200100)]


def test_tombstones_inclusive(spark, q):
    tomb = spark.createDataFrame(
        [(1, 200, 300)], "series_id long, mint_ms long, maxt_ms long"
    )
    rows = q.apply_tombstones(q.select(), tomb).collect()
    keys = [(r.series_id, r.ts_ms) for r in rows]
    # 200 and 300 deleted (both ends inclusive); other series untouched
    assert keys == [(1, 100), (1, 7200100), (2, 150), (2, 250)]


def test_block_overlap_detection(spark):
    blocks = spark.createDataFrame(
        [
            ("A", 0, 100),
            ("B", 100, 200),  # touching is NOT overlap (maxt exclusive)
            ("C", 150, 250),  # overlaps B
        ],
        "ulid string, mint_ms long, maxt_ms long",
    )
    pairs = validate_block_sequence(blocks).collect()
    assert [(r.ulid_a, r.ulid_b) for r in pairs] == [("B", "C")]


def test_label_values_restricted(q):
    assert [r.value for r in q.label_values("job").collect()] == ["api", "web"]
    assert [r.value for r in q.label_values("job", [eq("job", "api")]).collect()] == [
        "api"
    ]
    assert [r.name for r in q.label_names().collect()] == ["job"]


def test_merge_on_read_dedupes_duplicate_timestamps(spark):
    from agni_spark.querier import merge_on_read

    df = spark.createDataFrame(
        [(1, 100, 1.0), (1, 100, 3.0), (1, 200, 2.0), (2, 100, 9.0)],
        "series_id long, ts_ms long, value double",
    )
    got = {(r.series_id, r.ts_ms): r.value for r in merge_on_read(df).collect()}
    assert got == {(1, 100): 3.0, (1, 200): 2.0, (2, 100): 9.0}


def test_daily_active_hll_twin(spark):
    """The scale variant of events_daily_active: approx_count_distinct
    (HyperLogLog++) must track the exact distinct within its error
    bound — at 100 TB the sketch replaces the exact two-phase distinct
    without changing the query shape."""
    from pyspark.sql import functions as F

    from agni_spark import datamodel as dm
    from agni_spark.functions import relational

    exact = {
        r.day_ms: r.dau
        for r in relational.events_daily_active(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ev = dm.load(spark, "/root/testdata/sf0.001", "events")
    day = (dm.ms_col(ev, "ts") / F.lit(86_400_000)).cast("long") * F.lit(86_400_000)
    approx = {
        r.day_ms: r.dau_approx
        for r in ev.select(day.alias("day_ms"), "user_id")
        .groupBy("day_ms")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("dau_approx"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, n, approx[k])


def test_int64_timestamp_unit_dispatch(spark, tmp_path):
    """The driver has shipped `ts` as TIMESTAMP(NANOS)-as-int64 and as
    TIMESTAMP_NTZ across rounds; ms_col/ns_to_ms must decode ANY int64
    epoch unit by magnitude (ns/us/ms/s) and querier time bounds must
    still prune correctly (and stay pushable) on each."""
    from pyspark.sql import functions as F

    from agni_spark import datamodel as dm

    base_ms = 1_705_000_000_000
    rows_ms = [(i, base_ms + i * 1000) for i in range(10)]
    for unit, mul in [("ns", 1_000_000), ("us", 1_000), ("ms", 1), ("s", None)]:
        vals = [
            (i, (ms // 1000 if mul is None else ms * mul))
            for i, ms in rows_ms
        ]
        p = str(tmp_path / f"t_{unit}")
        spark.createDataFrame(vals, "id long, ts long").write.parquet(p)
        df = spark.read.parquet(p)
        got = {
            r.id: r.m
            for r in df.select("id", dm.ms_col(df, "ts").alias("m")).collect()
        }
        assert got == dict(rows_ms), unit
        # bound translation: the raw-column OR-of-ranges predicate
        # must select exactly the middle rows
        from agni_spark.querier import Querier

        samples = df.select(
            F.col("id").alias("series_id"),
            dm.ms_col(df, "ts").alias("ts_ms"),
            F.lit(1.0).alias("value"),
            F.col("ts").alias("_ts_ns"),
        )
        q = Querier(samples, samples.select("series_id").distinct(),
                    None, None)
        out = q.select([], mint_ms=base_ms + 2000, maxt_ms=base_ms + 5000,
                       sort=False)
        assert sorted(r.series_id for r in out.collect()) == [2, 3, 4, 5], unit


def test_asof_join_semantics(spark):
    from agni_spark.functions.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k long, ts_ms long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 7, 0.5), (1, 200, 8, 0.6), (1, 200, 9, 0.7), (2, 60, 1, 0.1)],
        "k long, r_ts long, rid long, rv double",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts_ms", right_ts="r_ts",
        right_order="rid",
    ).collect()
    got = {r.tag: (r.r_ts, r.rid, r.rv) for r in out}
    assert got["a"] == (100, 7, 0.5)  # match at equal ts (inclusive)
    assert got["b"] == (200, 9, 0.7)  # tie on r_ts -> largest rid wins
    assert got["c"] == (None, None, None)  # right row is in the future
    assert got["d"] == (None, None, None)  # key has no right rows

    tol = asof_join(
        left, right, on=["k"], left_ts="ts_ms", right_ts="r_ts",
        right_order="rid", tolerance_ms=4,
    ).collect()
    tgot = {r.tag: r.rid for r in tol}
    assert tgot["a"] == 7  # age 0 <= 4
    assert tgot["b"] is None  # age 5 > tolerance -> NULLed, row kept


def test_interval_join_bucketing_exact(spark):
    from agni_spark.functions.relational import interval_join

    pts = spark.createDataFrame(
        [(1, 50), (1, 150), (1, 7250), (2, 100)], "k long, ts_ms long"
    )
    ivs = spark.createDataFrame(
        # [0,100] and [100,200] overlap at 100; [7000,7300] spans a
        # bucket boundary at bucket_ms=3600; [0,100] on k=2
        [(1, 0, 100, "i1"), (1, 100, 200, "i2"), (1, 7000, 7300, "i3"),
         (2, 0, 10, "i4")],
        "k long, start_ms long, end_ms long, name string",
    )
    out = interval_join(pts, ivs, on=["k"], bucket_ms=3600).collect()
    got = sorted((r.ts_ms, r.name) for r in out)
    # ts=50 -> i1; ts=150 -> i2; ts=7250 -> i3 exactly once despite the
    # interval covering two buckets; ts=100@k=2 matches nothing
    assert got == [(50, "i1"), (150, "i2"), (7250, "i3")]

    # boundary point in BOTH adjacent intervals
    out2 = interval_join(
        spark.createDataFrame([(1, 100)], "k long, ts_ms long"),
        ivs, on=["k"], bucket_ms=3600,
    ).collect()
    assert sorted(r.name for r in out2) == ["i1", "i2"]


def test_federated_querier_dedupes_last_wins(spark):
    from pyspark.sql import functions as F

    from agni_spark.querier import federated_querier

    def mk(rows, seq=None):
        s = spark.createDataFrame(
            rows, "series_id long, ts_ms long, value double"
        )
        if seq is not None:
            s = s.withColumn("_seq", F.lit(seq).cast("long"))
        series = spark.createDataFrame([(1,), (2,)], "series_id long")
        sl = spark.createDataFrame(
            [(1, "job", "api"), (2, "job", "web")],
            "series_id long, name string, value string",
        )
        return Querier(s, series, sl)

    # HA pair: store B re-ingested (1,100) with a different value and a
    # HIGHER sequence; store A alone has (2,150)
    a = mk([(1, 100, 1.0), (2, 150, 9.0)], seq=1)
    b = mk([(1, 100, 5.0)], seq=2)
    fed = federated_querier([a, b])
    got = {
        (r.series_id, r.ts_ms): r.value
        for r in fed.samples.collect()
    }
    assert got == {(1, 100): 5.0, (2, 150): 9.0}  # seq 2 wins, no dupes
    # matcher selection works over the federated postings
    sel = fed.select([eq("job", "api")]).collect()
    assert [(r.series_id, r.value) for r in sel] == [(1, 5.0)]
    # legacy store without _seq loses to any sequenced replica
    c = Querier(
        spark.createDataFrame([(1, 100, 99.0)], "series_id long, ts_ms long, value double"),
        spark.createDataFrame([(1,)], "series_id long"),
        spark.createDataFrame([(1, "job", "api")], "series_id long, name string, value string"),
    )
    fed2 = federated_querier([c, b])
    assert {r.value for r in fed2.samples.collect()} == {5.0}


def test_approx_count_distinct_error_bound(spark):
    # HLL++ at rsd=0.02 must land within 5% of exact on a 10k-key set
    from pyspark.sql import functions as F

    df = spark.range(100_000).select(
        (F.col("id") % 10_000).alias("k")
    )
    approx = df.agg(
        F.approx_count_distinct("k", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - 10_000) / 10_000 < 0.05


def test_ha_dedup_elects_one_replica_per_window(spark):
    from agni_spark.querier import ha_dedup

    series = spark.createDataFrame(
        [
            (1, "m", "api", "prod", "i1", "pod-a"),
            (2, "m", "api", "prod", "i1", "pod-b"),  # HA pair of 1
            (3, "m", "web", "prod", "i2", "pod-c"),  # different logical
        ],
        "series_id long, metric string, job string, env string, "
        "instance string, pod string",
    )
    h = 3_600_000
    samples = spark.createDataFrame(
        [
            # hour 0: both replicas report -> pod-a (min) elected
            (1, 10, 1.0), (2, 20, 2.0),
            # hour 1: only pod-b reports -> pod-b elected (failover)
            (2, h + 10, 3.0),
            # the unrelated logical series always passes through
            (3, 15, 9.0),
        ],
        "series_id long, ts_ms long, value double",
    )
    out = {(r.series_id, r.ts_ms) for r in ha_dedup(samples, series).collect()}
    assert out == {(1, 10), (2, h + 10), (3, 15)}


def test_approx_percentile_error_bound(spark):
    """Pins the 100 TB percentile swap-in: approx_percentile (GK
    sketch, accuracy=10000 -> rank error <= 1/10000) against the exact
    interpolated percentile on the real testdata. GK returns an actual
    element at most eps*n ranks away, so |approx - exact| is bounded by
    the value spread across that rank window; on this data 1% relative
    error is a comfortable pin."""
    from agni_spark.functions import relational

    sf = "/root/testdata/sf0.01"
    exact = {
        r.event_type: r
        for r in relational.events_value_percentiles(spark, sf).collect()
    }
    approx = {
        r.event_type: r
        for r in relational.events_value_percentiles_approx(
            spark, sf
        ).collect()
    }
    assert set(exact) == set(approx) and exact
    for et, e in exact.items():
        a = approx[et]
        assert a.n == e.n
        for col in ("p50", "p90", "p99"):
            ev, av = getattr(e, col), getattr(a, col)
            assert abs(av - ev) <= 0.01 * max(abs(ev), 1e-9), (
                et, col, ev, av
            )
