"""Relational/aggregation tier over the TPC-H-ish testdata (SURVEY §7
Phase 5; explicitly ABSENT from the reference — SURVEY §2.7 notes agni
has no joins/aggregations at all; this tier is what makes the engine a
general analytics system).

Scale design: lineitem/orders are the fact tables; region/nation/
customer/supplier/part are dims -> broadcast joins (no fact shuffle
for the join itself); aggregations shuffle once on their grouping key
with map-side partial aggregation. Date filters are plain comparisons
-> parquet pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agni_spark.datamodel import load, ts_col


def q1_pricing_summary(spark: SparkSession, sf_dir: str, delta_days: int = 90) -> DataFrame:
    """TPC-H Q1: pricing summary report. Single scan + one shuffle on
    the tiny (returnflag, linestatus) key; everything JVM-side."""
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
    cutoff = F.lit("1998-12-01").cast("timestamp") - F.expr(
        f"INTERVAL {delta_days} DAYS"
    )
    return (
        li.where(F.col("l_shipdate_ts") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped orders revenue. customer is the dim side ->
    broadcast; lineitem groupBy on orderkey is the one shuffle."""
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    _orders = load(spark, sf_dir, "orders")
    orders = _orders.withColumn("o_orderdate_ts", ts_col(_orders, "o_orderdate"))
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
    d = F.lit("1997-06-01").cast("timestamp")
    return (
        li.where(F.col("l_shipdate_ts") > d)
        .join(
            F.broadcast(
                orders.where(F.col("o_orderdate_ts") < d).join(
                    F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey,
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate_ts", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("revenue"),
            F.col("o_orderdate_ts").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation for intra-nation
    customer/supplier pairs. All five dims broadcast; lineitem never
    shuffles until the final small groupBy."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dim = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name", "r_name")
    )
    ord_dim = orders.join(
        F.broadcast(dim), orders.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey", "n_name", "r_name")
    return (
        li.join(F.broadcast(ord_dim), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def events_sessionize(
    spark: SparkSession, sf_dir: str, gap_ms: int = 30 * 60_000
) -> DataFrame:
    """Gap-based sessionization of the events stream (the batch twin of
    Structured Streaming session windows): a new session starts when a
    user's inter-event gap exceeds `gap_ms`. One shuffle on user_id;
    windows stay within partitions afterwards."""
    from agni_spark.datamodel import ns_to_ms

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", ns_to_ms("ts").alias("ts_ms"), "value"
    )
    # event_id tie-break: ms-truncated timestamps can collide, and lag()
    # under a nondeterministic order would break reproducibility.
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.when(
        (F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms, 1
    ).otherwise(0)
    sess = ev.withColumn("new_sess", gap).withColumn(
        "session_no",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("long").alias("session_no"),
            "n_events",
            "start_ms",
            "end_ms",
            "sum_value",
        )
        .orderBy("user_id", "session_no")
    )
