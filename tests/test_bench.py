"""Bench-protocol invariants.

The recorded per-round numbers are only comparable if no timed run can
warm a later one through Spark's plan-matching CacheManager — the r6
accounting hazard (leaked persists silently served runs 2-3 of a
median-of-3). bench._cold is the structural fix; this test pins that
it actually scrubs every cache a leak could hide in.
"""

from pyspark.sql import functions as F


def _n_pinned(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_cold_scrubs_all_cache_layers(spark):
    import bench

    # plant the three leak shapes a query can leave behind
    df = spark.range(100).persist()
    df.count()
    spark.range(50).localCheckpoint(eager=True)
    spark.range(25).createOrReplaceTempView("bench_cold_t")
    spark.catalog.cacheTable("bench_cold_t")
    spark.table("bench_cold_t").count()
    assert _n_pinned(spark) > 0
    bench._cold(spark)
    assert _n_pinned(spark) == 0
    assert not spark.catalog.isCached("bench_cold_t")
    spark.catalog.dropTempView("bench_cold_t")


def test_no_cache_survives_between_probe_invocations(spark, tmp_path):
    """Two bench probe invocations with _cold between them: the second
    starts with zero pinned RDDs/tables (nothing from run 1 can warm
    it) and still returns identical results."""
    import bench
    from agni_spark.functions import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    simsearch.write_ivf_index(emb, path, n_centroids=8)
    bench._cold(spark)
    r1 = [
        tuple(r)
        for r in simsearch.ivf_ann_stored(spark, path, q, k=5).collect()
    ]
    bench._cold(spark)
    assert _n_pinned(spark) == 0
    assert len(spark.catalog.listTables()) == 0 or all(
        not spark.catalog.isCached(t.name)
        for t in spark.catalog.listTables()
        if t.tableType == "TEMPORARY"
    )
    r2 = [
        tuple(r)
        for r in simsearch.ivf_ann_stored(spark, path, q, k=5).collect()
    ]
    assert r1 == r2
