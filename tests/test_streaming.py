"""Structured Streaming tier: file-source ingest (S11/S9 equivalent),
watermarked windowed aggregation, and the custom stateful increase
operator (applyInPandasWithState) across micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agni_spark.streaming import ingest as streaming

SCHEMA = streaming.SAMPLES_SCHEMA


def _write_src(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_ingest_partitions_and_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    _write_src(spark, src, [(1, 0, 1.0), (1, 7_200_000, 2.0)])
    streaming.stream_ingest(spark, src, dest, ckpt).awaitTermination()
    got = spark.read.parquet(dest)
    assert got.count() == 2
    # time-partitioned by block_id (2h blocks)
    assert sorted(
        r.block_id for r in got.select("block_id").distinct().collect()
    ) == [0, 1]
    # restart with the same checkpoint: no new input -> no duplicates
    streaming.stream_ingest(spark, src, dest, ckpt).awaitTermination()
    assert spark.read.parquet(dest).count() == 2
    # new file arrives -> only it is processed (exactly-once resume)
    _write_src(spark, src, [(2, 100, 5.0)])
    streaming.stream_ingest(spark, src, dest, ckpt).awaitTermination()
    assert spark.read.parquet(dest).count() == 3


def test_windowed_sum_append_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    # two full hours of data plus a sample far ahead that advances the
    # watermark past both windows (watermark = max_ts - 2h)
    _write_src(
        spark,
        src,
        [(1, 0, 1.0), (1, 1800_000, 2.0), (1, 3600_000, 4.0),
         (1, 4 * 3600_000 + 7_200_000, 9.0)],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming.windowed_sum(stream, "1 hour", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ws_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.series_id, r.bucket_ms): (r.sum_value, r.n)
        for r in spark.table("ws_test").collect()
    }
    # windows [0,1h) and [1h,2h) are below the final watermark (4h);
    # the window containing the last sample itself is withheld
    assert rows == {(1, 0): (3.0, 2), (1, 3600_000): (4.0, 1)}


def test_streaming_increase_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1 (file 1): counter 10 -> 15; batch 2 (file 2): reset to 3,
    # then 5 — state (last=15) must survive into the second micro-batch
    _write_src(spark, src, [(7, 0, 10.0), (7, 1000, 15.0)])
    _write_src(spark, src, [(7, 2000, 3.0), (7, 3000, 5.0)])
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming.streaming_increase(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r.last_ts, r.n_in_batch, r.increase)
        for r in spark.table("inc_test").collect()
    )
    # one output row per micro-batch; increases are 5 (15-10) then
    # 3 + 2 (reset-corrected against the remembered last_v=15)
    assert len(rows) == 2
    assert rows[0] == (1000, 2, 5.0)
    assert rows[1] == (3000, 2, 5.0)


def test_streaming_sessionize(spark, tmp_path):
    src = str(tmp_path / "src")
    m = 60_000
    # series 1: events at 0,10m (one session), then 60m (new session:
    # gap > 30m); an event far ahead closes both via the watermark
    _write_src(
        spark,
        src,
        [(1, 0, 1.0), (1, 10 * m, 2.0), (1, 60 * m, 4.0),
         (1, 600 * m, 0.0)],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming.streaming_sessionize(stream, "30 minutes", "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.session_start_ms, r.session_end_ms): (r.n, r.sum_value)
        for r in spark.table("sess_test").collect()
    }
    # session 1: [0, 10m+30m); session 2: [60m, 90m); the 600m session
    # is still open (watermark = 600m - 60m < its end) -> withheld
    assert rows == {
        (0, 40 * m): (2, 3.0),
        (60 * m, 90 * m): (1, 4.0),
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")

    dest = str(tmp_path / "dest")

    def run(_name):
        # parquet sink: unlike the memory sink it supports resuming
        # from the checkpoint, which is what run 2 exercises
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = streaming.streaming_dedup(stream, "1 hour")
        q = (
            out.writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.series_id, r.ts_ms, r.value)
            for r in spark.read.parquet(dest).collect()
        )

    m = 60_000
    # run 1: duplicate (series, ts) inside one batch (at-least-once
    # producer); timestamps start above the initial watermark (0) and
    # stay within the 1h horizon of the max
    _write_src(
        spark, src,
        [(1, 10 * m, 1.0), (1, 10 * m, 1.0), (1, 11 * m, 2.0), (1, 30 * m, 3.0)],
    )
    assert run("dd_run1") == [
        (1, 10 * m, 1.0), (1, 11 * m, 2.0), (1, 30 * m, 3.0)
    ]
    # run 2 (same checkpoint -> dedup state survives): a replay of an
    # old row is dropped, only the genuinely new row lands in the sink
    _write_src(spark, src, [(1, 11 * m, 2.0), (1, 40 * m, 4.0)])
    assert run("dd_run2") == [
        (1, 10 * m, 1.0), (1, 11 * m, 2.0), (1, 30 * m, 3.0),
        (1, 40 * m, 4.0),
    ]


def test_streaming_attribution_join(spark, tmp_path):
    ev_schema = "user_id long, event_id long, ts_ms long, value double"
    m = 60_000
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
    spark.createDataFrame(
        [(1, 10, 10 * m, 0.0), (1, 11, 30 * m, 0.0), (2, 12, 10 * m, 0.0),
         (1, 13, 500 * m, 0.0)],  # advances click watermark
        ev_schema,
    ).coalesce(1).write.parquet(csrc)
    spark.createDataFrame(
        # user 1 purchase 40m (within 1h of both clicks), user 2 at 90m
        # (outside 1h of their click at 10m)
        [(1, 20, 40 * m, 5.0), (2, 21, 90 * m, 7.0),
         (2, 22, 500 * m, 0.0)],  # advances purchase watermark
        ev_schema,
    ).coalesce(1).write.parquet(psrc)
    clicks = spark.readStream.schema(ev_schema).parquet(csrc)
    purchases = spark.readStream.schema(ev_schema).parquet(psrc)
    out = streaming.streaming_attribution_join(clicks, purchases, "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted((r.user_id, r.click_id, r.purchase_id)
                  for r in spark.table("attr_test").collect())
    # purchase 20 attributes to clicks 10 AND 11 (both within 1h
    # before); user 2's purchase at 90m matches nothing
    assert rows == [(1, 10, 20), (1, 11, 20)]


def test_stream_ship_registry_commit(spark, tmp_path):
    """stream_ship lands each micro-batch in the block store WITH the
    registry-last commit: after every batch the registry lists exactly
    the blocks whose data is present, and a second incremental run
    picks up only new files (checkpoint exactly-once)."""
    from agni_spark.sources import layout
    from agni_spark.streaming.ingest import stream_ship

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(s, t, float(s + t)) for s in range(3) for t in range(0, 2000, 100)]
    spark.createDataFrame(
        rows1, "series_id long, ts_ms long, value double"
    ).coalesce(1).write.parquet(str(src / "f1"))
    q = stream_ship(spark, f"{src}/*", store, ckpt, block_ms=1000)
    q.awaitTermination(120)
    assert layout.registry_block_ids(spark, store) == [0, 1]
    assert layout.read_samples(spark, store).count() == 60

    # incremental: a new file lands -> only its rows are appended
    rows2 = [(9, t, 1.0) for t in range(2000, 3000, 100)]
    spark.createDataFrame(
        rows2, "series_id long, ts_ms long, value double"
    ).coalesce(1).write.parquet(str(src / "f2"))
    q2 = stream_ship(spark, f"{src}/*", store, ckpt, block_ms=1000)
    q2.awaitTermination(120)
    assert layout.registry_block_ids(spark, store) == [0, 1, 2]
    df = layout.read_samples(spark, store)
    assert df.count() == 70
    assert df.where("series_id = 9").count() == 10


def test_stream_ship_exposition(spark, tmp_path):
    from agni_spark.sources import layout
    from agni_spark.streaming.ingest import stream_ship_exposition

    src = tmp_path / "scrapes"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    (src / "scrape1.txt").write_text(
        'up{job="api"} 1 100\nup{job="api"} 1 1100\nup{job="web"} 0 150\n'
    )
    q = stream_ship_exposition(spark, str(src), store, ckpt, block_ms=1000)
    q.awaitTermination(120)
    assert layout.registry_block_ids(spark, store) == [0, 1]
    got = layout.read_samples(spark, store)
    assert got.count() == 3
    series = spark.read.parquet(f"{store}/series")
    labs = {tuple(sorted(dict(r.labels).items())) for r in series.collect()}
    assert (("__name__", "up"), ("job", "api")) in labs

    # second scrape file: incremental, checkpointed
    (src / "scrape2.txt").write_text('up{job="api"} 1 2100\n')
    q2 = stream_ship_exposition(spark, str(src), store, ckpt, block_ms=1000)
    q2.awaitTermination(120)
    assert layout.registry_block_ids(spark, store) == [0, 1, 2]


def test_stream_downsample_matches_batch_rollup(spark, tmp_path):
    from agni_spark.sources import downsample
    from agni_spark.streaming.ingest import stream_downsample

    src = tmp_path / "src"
    src.mkdir()
    rows = [(s, t, float(s * 10 + t % 7)) for s in range(2)
            for t in range(0, 4000, 250)]
    df = spark.createDataFrame(
        rows, "series_id long, ts_ms long, value double"
    )
    df.coalesce(1).write.parquet(str(src / "f1"))
    # a late marker row far ahead closes all earlier windows past the
    # watermark so append mode emits them
    spark.createDataFrame(
        [(0, 100_000_000, 0.0)], "series_id long, ts_ms long, value double"
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream_path = str(tmp_path / "roll_stream")
    q = stream_downsample(
        spark, f"{src}/*", stream_path, str(tmp_path / "ckpt"),
        res_ms=1000, watermark="1 milliseconds",
    )
    q.awaitTermination(120)

    batch_path = str(tmp_path / "roll_batch")
    downsample.write_downsampled(df, batch_path, 1000)

    s = {
        (r.series_id, r.bucket_ms): (
            r.n, r.sum_value, r.min_value, r.max_value,
            r.first_value, r.last_value,
        )
        for r in spark.read.parquet(f"{stream_path}/res=1000").collect()
        if r.bucket_ms < 10_000  # drop the marker's own bucket if closed
    }
    b = {
        (r.series_id, r.bucket_ms): (
            r.n, r.sum_value, r.min_value, r.max_value,
            r.first_value, r.last_value,
        )
        for r in spark.read.parquet(f"{batch_path}/res=1000").collect()
    }
    assert s == b  # streaming-maintained partials == batch-built


def test_streaming_alert_for_runs_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    B = 1000
    # batch 1: buckets 0,1 have 2 samples each (> threshold 1);
    # batch 2: bucket 2 hot (run reaches 3 -> firing), bucket 3 cold
    # (reset), bucket 4 hot again (pending)
    _write_src(
        spark, src,
        [(7, 10, 1.0), (7, 20, 1.0), (7, 1010, 1.0), (7, 1020, 1.0)],
    )
    _write_src(
        spark, src,
        [(7, 2010, 1.0), (7, 2020, 1.0), (7, 3010, 1.0),
         (7, 4010, 1.0), (7, 4020, 1.0)],
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming.streaming_alert_for(
        stream, threshold=1.0, need=3, bucket_ms=B
    )
    q = (
        out.writeStream.format("memory")
        .queryName("alert_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.bucket_ms: r.state for r in spark.table("alert_test").collect()
    }
    # run: b0 pending, b1 pending, b2 firing (3rd consecutive, state
    # carried across the micro-batch boundary); b3 silent (below
    # threshold -> no row); b4 pending (run restarted)
    assert got == {
        0: "pending", 1000: "pending", 2000: "firing", 4000: "pending"
    }


def test_streaming_topk_sharded_state_and_multibatch(spark, tmp_path):
    """Sharded emit-on-window-close top-k (r6 sharding + r7 emission
    fix). Asserts (a) a window's state spreads over >1 shard, (b) the
    merged result equals the batch groupBy+rank twin, (c) across >= 3
    micro-batches (maxFilesPerTrigger=1) the sink holds EXACTLY ONE
    emission of <= k rows per (closed window, shard) — no per-batch
    cumulative re-emission, so a long-running stream's sink is bounded
    by closed windows, and (d) a window still open at the final
    watermark never emits."""
    src = str(tmp_path / "src")
    day = 86_400_000
    # 40 series x 2 samples across 2 days, split over two files so
    # maxFilesPerTrigger=1 yields multiple micro-batches; a third
    # sentinel file (written LAST -> processed last) advances the
    # watermark past both day windows so they close and emit
    rows1 = [(sid, d * day + 1000, float(sid + d))
             for sid in range(40) for d in (0, 1)]
    rows2 = [(sid, d * day + 2000, float(2 * sid))
             for sid in range(40) for d in (0, 1)]
    sentinel = [(999, 3 * day, 0.0)]
    _write_src(spark, src, rows1)
    _write_src(spark, src, rows2)
    _write_src(spark, src, sentinel)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming.streaming_topk(stream, k=5)
        .writeStream.format("memory")
        .queryName("topk_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.table("topk_test")
    # (d) only CLOSED windows in the sink: days 0 and 1 closed (the
    # sentinel pushed the watermark past their ends); the sentinel's
    # own day-3 window stayed open and must never have emitted
    assert {r.bucket_ms for r in partials.select("bucket_ms").distinct()
            .collect()} == {0, day}
    # (a) state spread: >1 shard key per bucket
    shards_per_bucket = {
        r.bucket_ms: r.n
        for r in partials.groupBy("bucket_ms")
        .agg(F.countDistinct("shard").alias("n"))
        .collect()
    }
    assert all(n > 1 for n in shards_per_bucket.values())
    # (c) exactly ONE emission of <= k rows per (window, shard), even
    # though the replay ran >= 3 micro-batches: no (bucket, shard,
    # series) duplicates, and each shard's partial is <= k rows
    per_shard = partials.groupBy("bucket_ms", "shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("series_id").alias("nd"),
    )
    assert all(r.n <= 5 and r.n == r.nd for r in per_shard.collect())

    got = sorted(
        tuple(r)
        for r in streaming.streaming_topk_merge(partials, k=5).collect()
    )
    # (b) batch twin
    from pyspark.sql import Window

    batch = spark.createDataFrame(rows1 + rows2, SCHEMA)
    sums = (
        batch.withColumn(
            "bucket_ms", (F.col("ts_ms") / day).cast("long") * day
        )
        .groupBy("bucket_ms", "series_id")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
    )
    w = Window.partitionBy("bucket_ms").orderBy(
        F.col("sum_value").desc(), F.col("series_id")
    )
    want = sorted(
        tuple(r)
        for r in sums.withColumn(
            "rk", F.row_number().over(w).cast("int")
        )
        .where(F.col("rk") <= 5)
        .select("bucket_ms", "series_id", "sum_value", "rk")
        .collect()
    )
    assert got == want and len(got) == 10
