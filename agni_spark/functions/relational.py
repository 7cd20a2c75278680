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

from agni_spark import datamodel as dm
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
    """TPC-H Q3: unshipped orders revenue. customer is the only true dim
    -> broadcast; orders is a fact table, so lineitem⋈orders is a plain
    shuffle join on l_orderkey (AQE may still broadcast the filtered
    orders side at runtime when it genuinely fits — never forced)."""
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
            orders.where(F.col("o_orderdate_ts") < d).join(
                # customer is 150k x SF: no forced broadcast; AQE
                # size-broadcasts the filtered segment when it fits
                cust,
                orders.o_custkey == cust.c_custkey,
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
    customer/supplier pairs. region/nation/customer/supplier are the
    true dims -> broadcast; orders and lineitem are facts, so
    lineitem⋈orders is a plain shuffle join on l_orderkey (at 100 TB a
    forced broadcast of anything orders-derived OOMs the executors)."""
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
    # dim carries every customer row (150k x SF): hint removed so
    # AQE chooses shuffle vs broadcast from the runtime size.
    ord_dim = orders.join(
        dim, orders.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey", "n_name", "r_name")
    return (
        li.join(ord_dim, li.l_orderkey == F.col("o_orderkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
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
    from agni_spark.datamodel import ms_col

    _ev = load(spark, sf_dir, "events")
    ev = _ev.select(
        "user_id", "event_id", ms_col(_ev, "ts").alias("ts_ms"), "value"
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


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change. Pure filter + global agg —
    every predicate is a plain comparison pushed to the parquet scan;
    no shuffle at all (partial aggs coalesce to one row)."""
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    return (
        li.where(
            (F.col("l_shipdate_ts") >= lo)
            & (F.col("l_shipdate_ts") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 (adapted to available columns): top customers by
    revenue lost to returns in one quarter. orders filtered then joined
    to lineitem (fact-fact join on orderkey — the one shuffle);
    customer/nation dims broadcast."""
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.withColumn("o_orderdate_ts", ts_col(_ord, "o_orderdate"))
    lo = F.lit("1996-10-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    orders = orders.where(
        (F.col("o_orderdate_ts") >= lo) & (F.col("o_orderdate_ts") < hi)
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    revenue = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    out = (
        revenue.join(cust, revenue.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey", "c_name", "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )
    return out


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: no l_commitdate in the testdata): count of
    orders per priority in one quarter having at least one line item
    shipped more than 60 days after the order date. The EXISTS becomes
    a left-semi join — orders never duplicates, lineitem never
    aggregates."""
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.withColumn("o_orderdate_ts", ts_col(_ord, "o_orderdate"))
    lo = F.lit("1996-07-01").cast("timestamp")
    hi = F.lit("1996-10-01").cast("timestamp")
    orders = orders.where(
        (F.col("o_orderdate_ts") >= lo) & (F.col("o_orderdate_ts") < hi)
    )
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate")).select(
        "l_orderkey", "l_shipdate_ts"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate_ts > F.col("o_orderdate_ts") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q14_promotion_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share in one month. lineitem joins
    the part dim (broadcast); conditional aggregation in one pass."""
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
    lo = F.lit("1996-09-01").cast("timestamp")
    hi = F.lit("1996-10-01").cast("timestamp")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where((F.col("l_shipdate_ts") >= lo) & (F.col("l_shipdate_ts") < hi))
        .join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str, gap_ms: int = 86_400_000) -> DataFrame:
    """Conversion funnel over the event stream: per user, did a view ->
    click -> purchase sequence complete (each step within gap_ms of the
    previous)? One pass: per-user sorted aggregation via min-timestamps
    of each stage constrained to follow the previous stage.

    Scale: groupBy(user_id) is the single shuffle; no self-joins — the
    stage logic is expressed with conditional min aggregates over
    collected per-user events (cardinality per user is small; for
    heavy-tailed users the collect_list cap would be a max_events
    guard)."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id", dm.ms_col(ev, "ts").alias("ts_ms"), "event_type"
    )
    views = base.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts_ms").alias("t_view")
    )
    clicks = base.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ms").alias("t_click")
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ms").alias("t_purchase")
    )
    first_click = (
        clicks.join(views, "user_id")
        .where(
            (F.col("t_click") > F.col("t_view"))
            & (F.col("t_click") <= F.col("t_view") + gap_ms)
        )
        .groupBy("user_id")
        .agg(F.min("t_click").alias("t_click"), F.min("t_view").alias("t_view"))
    )
    converted = (
        purchases.join(first_click, "user_id")
        .where(
            (F.col("t_purchase") > F.col("t_click"))
            & (F.col("t_purchase") <= F.col("t_click") + gap_ms)
        )
        .groupBy("user_id")
        .agg(F.min("t_purchase").alias("t_purchase"))
    )
    return (
        views.select(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(first_click.select(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(converted.select(F.count(F.lit(1)).alias("n_converted")))
    )


def q7_volume_shipping(
    spark: SparkSession,
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year. The
    supplier/customer nation dims broadcast; lineitem joins orders via
    shuffle on l_orderkey (the single fact-fact join); the nation-pair
    predicate applies post-join on two tiny broadcast-joined columns."""
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin(nation_a, nation_b)
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = (
        load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    return (
        li.where((F.col("l_shipdate_ts") >= lo) & (F.col("l_shipdate_ts") < hi))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate_ts").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    spark: SparkSession,
    sf_dir: str,
    nation: str = "NATION_3",
    region: str = "ASIA",
    ptype: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8: a nation's market share within a region for one part
    type, by order year. part/supplier/customer-region dims broadcast;
    the one shuffle is lineitem joining the order-side fact on
    l_orderkey; the share is a conditional-aggregate ratio (single
    groupBy, no self-join)."""
    part = load(spark, sf_dir, "part").where(F.col("p_type") == ptype).select(
        "p_partkey"
    )
    nat = load(spark, sf_dir, "nation")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == region)
    cust_r = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("c_custkey")
    )
    _ord = load(spark, sf_dir, "orders")
    orders = (
        _ord.withColumn("o_orderdate_ts", ts_col(_ord, "o_orderdate"))
        .where(
            (F.col("o_orderdate_ts") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate_ts") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cust_r, F.col("o_custkey") == cust_r.c_custkey)
        .select("o_orderkey", F.year("o_orderdate_ts").cast("int").alias("o_year"))
    )
    li = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == nation, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_year")
    )


def q9_product_type_revenue(
    spark: SparkSession, sf_dir: str, token: str = "widget"
) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp/ps_supplycost in the testdata, so
    revenue stands in for profit): revenue by supplier nation and order
    year over parts whose name contains `token`. Same join topology as
    the real Q9 minus the partsupp branch."""
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").contains(token))
        .select("p_partkey")
    )
    nat = load(spark, sf_dir, "nation")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.withColumn("o_orderdate_ts", ts_col(_ord, "o_orderdate")).select(
        "o_orderkey", F.year("o_orderdate_ts").cast("int").alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem")
    # decimal accumulation: these groups sum MANY terms (no date
    # filter), so order-dependent double summation can straddle a
    # 2dp rounding boundary; summing exact decimals is engine- and
    # order-independent
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts. orders
    aggregates on o_custkey (one shuffle), customers left-join the
    counts to keep zero-order customers; the final histogram groupBy
    is tiny."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ocounts = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = cust.join(
        ocounts, cust.c_custkey == ocounts.o_custkey, "left"
    ).select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#13"
) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not filled. The
    correlated subquery becomes a per-part aggregate broadcast back
    onto the brand-filtered lineitem slice — no row-at-a-time
    re-evaluation. Quantities are integral so the per-part averages are
    exact (integer sums) on every engine."""
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == brand).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").join(
        part, F.col("l_partkey") == part.p_partkey
    )
    lim = li.groupBy("p_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_lim")
    ).withColumnRenamed("p_partkey", "lim_partkey")
    return (
        li.join(F.broadcast(lim), F.col("p_partkey") == F.col("lim_partkey"))
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str, threshold: float = 300.0, k: int = 100
) -> DataFrame:
    """TPC-H Q18: customers with orders whose total quantity exceeds
    `threshold`. lineitem aggregates once on l_orderkey (exact integer
    sums); the surviving big-order set is tiny -> broadcast onto
    orders; customer dim broadcast; TakeOrderedAndProject for the
    limit."""
    big = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > threshold)
    )
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.withColumn("o_orderdate_ts", ts_col(_ord, "o_orderdate"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate_ts").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(k)
    )


def q22_sales_opportunity(
    spark: SparkSession, sf_dir: str, recent: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 adapted (no c_phone in the testdata, so nation stands
    in for the phone country code, and "no orders" becomes "no orders
    since `recent`" — this testdata has no order-less customers): count
    + balance of above-average-balance customers with no recent orders,
    by nation. The global average is a 1-row broadcast cross join
    (scalar subquery); the no-recent-orders test is a left-anti join on
    the date-filtered orders custkey projection (filter pushed to the
    scan)."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    # round the threshold to 6dp: the average of arbitrary doubles is
    # summation-order-dependent at the ulp level, and an unrounded
    # threshold could flip a boundary customer between engines
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("abal")
    )
    _ord = load(spark, sf_dir, "orders")
    recent_orders = (
        _ord.withColumn("o_orderdate_ts", ts_col(_ord, "o_orderdate"))
        .where(F.col("o_orderdate_ts") >= F.lit(recent).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("abal"))
        .join(recent_orders, cust.c_custkey == recent_orders.o_custkey, "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


def q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str, size: int = 15,
    token: str = "gear", region: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp in the testdata: the observed
    average unit sale price from lineitem stands in for ps_supplycost):
    for every part of `size` whose name contains `token`, the
    region-local supplier(s) achieving the MINIMUM unit price. Keeps
    Q2's correlated-min-subquery shape: per-part min over the
    region-restricted cost table, equality-joined back. Cost table
    groups on (part, supp) — one shuffle; region dims broadcast;
    supplier/part are SF-scaling and stay unhinted for AQE."""
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == region)
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        load(spark, sf_dir, "part")
        .where((F.col("p_size") == size) & F.col("p_name").contains(token))
        .select("p_partkey", "p_name")
    )
    li = load(spark, sf_dir, "lineitem")
    # 6dp-rounded avg: summation-order-independent at the comparison.
    # cost is (filtered parts x region suppliers)-sized and feeds both
    # the min subquery and the equality join back — persist so the
    # fact-table aggregation runs once, not twice.
    cost = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("unit_cost")
        )
        .persist()
    )
    min_cost = cost.groupBy(F.col("p_partkey").alias("mp")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost.p_partkey == min_cost.mp)
            & (cost.unit_cost == min_cost.min_cost),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


def q11_important_flow(
    spark: SparkSession, sf_dir: str, nation: str = "NATION_7",
    times_mean: float = 2.0,
) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp: lineitem flow value stands in
    for stock value): parts whose flow value from `nation`'s suppliers
    exceeds `times_mean` x the mean per-part flow. Keeps Q11's
    group-by-with-global-scalar-threshold shape: the threshold is a
    1-row broadcast cross join; one shuffle on partkey. (The spec's
    FRACTION constant is SF-scaled — 0.0001/SF; a mean-relative
    threshold is the scale-free equivalent.)"""
    nat = load(spark, sf_dir, "nation").where(F.col("n_name") == nation)
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    flow = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum(val), 2).cast("double").alias("value"))
    )
    # exact decimal sum -> ONE double cast -> double arithmetic in a
    # fixed order: the threshold is bit-identical on every engine (an
    # avg-of-doubles would be summation-order-dependent at the ulp)
    thr = flow.agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            * F.lit(float(times_mean))
            / F.count(F.lit(1))
        ).alias("thr")
    )
    return (
        flow.crossJoin(F.broadcast(thr))
        .where(F.col("value") > F.col("thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


def q12_late_shipments(
    spark: SparkSession, sf_dir: str, late_days: int = 90
) -> DataFrame:
    """TPC-H Q12 adapted (no l_shipmode/commit/receipt dates: the
    ship-vs-order delay buckets stand in for ship modes): per delay
    class, how many high- vs low-priority orders shipped there. Keeps
    Q12's conditional-CASE-sum shape. Delay is exact integer epoch-ms
    arithmetic (engine-independent, no tz)."""
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.select(
        "o_orderkey", "o_orderpriority",
        F.unix_millis(ts_col(_ord, "o_orderdate")).alias("o_ms"),
    )
    _li = load(spark, sf_dir, "lineitem")
    li = _li.select(
        "l_orderkey", F.unix_millis(ts_col(_li, "l_shipdate")).alias("s_ms")
    )
    # bucket on raw ms comparisons — no day division, whose negative-
    # value truncation semantics differ between engines (Spark `div`
    # truncates toward zero, DuckDB // floors)
    delay_ms = F.col("s_ms") - F.col("o_ms")
    bucket = (
        F.when(delay_ms <= 30 * 86_400_000, F.lit("0-30"))
        .when(delay_ms <= late_days * 86_400_000, F.lit("31-90"))
        .otherwise(F.lit(">90"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(bucket.alias("delay_class"), high.alias("h"))
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("h"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("h"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


def q15_top_supplier(
    spark: SparkSession, sf_dir: str,
    lo: str = "1996-01-01", hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in a quarter.
    The revenue view is one shuffle on suppkey; the max is a 1-row
    broadcast (scalar subquery shape) joined back by equality —
    exactly the view + subquery structure of the spec query."""
    _li = load(spark, sf_dir, "lineitem")
    li = _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    revenue = (
        li.where(
            (F.col("l_shipdate_ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate_ts") < F.lit(hi).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp/comments: lineitem is the
    part-supplier link and the name-suffix exclusion stands in for the
    complaints filter): distinct supplier count per (brand, type, size)
    for parts outside one brand/type class. Keeps Q16's NOT-IN +
    count-distinct shape: the exclusion is an anti-join; the count
    shuffles once on the group key with partial distinct."""
    part = (
        load(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "SMALL")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_name").endswith("7"))
        .select(F.col("s_suppkey").alias("x_suppkey"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(excluded, li.l_suppkey == F.col("x_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted (no container/shipmode columns: size classes
    stand in for containers): revenue from three disjunctive
    brand/size/quantity predicates. Keeps Q19's OR-of-conjunctions
    shape — one join + one conditional scan; the predicate pushes to
    the part scan as an IN(brand) prefilter."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(
        part.where(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")),
        li.l_partkey == part.p_partkey,
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return j.where(cond).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q20_excess_shippers(
    spark: SparkSession, sf_dir: str, token: str = "widget",
    year_lo: str = "1997-01-01", year_hi: str = "1998-01-01",
    share: float = 0.5, nation: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp availqty: a supplier's own
    shipped share of a part's total stands in for the
    availqty > 0.5*qty test): suppliers in `nation` who shipped more
    than `share` of some token-matching part's total volume in a year.
    Keeps Q20's nested-semi-join chain: per-(part,supp) sums vs a
    per-part threshold, EXISTS via left-semi, nation filter last."""
    part = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").contains(token))
        .select("p_partkey")
    )
    _li = load(spark, sf_dir, "lineitem")
    li = (
        _li.withColumn("l_shipdate_ts", ts_col(_li, "l_shipdate"))
        .where(
            (F.col("l_shipdate_ts") >= F.lit(year_lo).cast("timestamp"))
            & (F.col("l_shipdate_ts") < F.lit(year_hi).cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("pp")).agg(
        F.sum("l_quantity").alias("tq")
    )
    hot = (
        per_ps.join(per_p, per_ps.l_partkey == per_p.pp)
        .where(F.col("sq") > F.col("tq") * F.lit(float(share)))
        .select("l_suppkey")
        .distinct()
    )
    nat = load(spark, sf_dir, "nation").where(F.col("n_name") == nation)
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(hot, supp.s_suppkey == hot.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


def q21_lone_late_supplier(
    spark: SparkSession, sf_dir: str, late_days: int = 90, k: int = 100
) -> DataFrame:
    """TPC-H Q21 adapted (no receipt/commit dates: ship-vs-order delay
    defines "late"): suppliers who were the ONLY late shipper on a
    multi-supplier order. Keeps Q21's exists/not-exists shape, but as
    ONE aggregation per order (distinct suppliers vs distinct late
    suppliers) instead of two correlated subqueries — the
    Catalyst-native formulation. Top-k via TakeOrderedAndProject."""
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.select(
        "o_orderkey", F.unix_millis(ts_col(_ord, "o_orderdate")).alias("o_ms")
    )
    _li = load(spark, sf_dir, "lineitem")
    li = (
        _li.select(
            "l_orderkey", "l_suppkey",
            F.unix_millis(ts_col(_li, "l_shipdate")).alias("s_ms"),
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .withColumn(
            "late",
            (F.col("s_ms") - F.col("o_ms"))
            > F.lit(late_days * 86_400_000),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late"
        ),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    lone = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    ).select("late_supp")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lone.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def events_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + volume — the canonical engagement rollup.
    One shuffle on the day key; COUNT(DISTINCT) runs as Spark's
    two-phase partial-distinct aggregate (map-side dedup first), so the
    fact table shuffles already-deduplicated (day, user) pairs. For
    approximate-at-scale variants see the HLL twin pinned in tests
    (approx_count_distinct over the same grouping)."""
    ev = load(spark, sf_dir, "events")
    day = (dm.ms_col(ev, "ts") / F.lit(86_400_000)).cast("long") * F.lit(86_400_000)
    return (
        ev.select(day.alias("day_ms"), "user_id", "value")
        .groupBy("day_ms")
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("day_ms")
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: of each day's active users, the fraction
    active again the following day. Distinct (user, day) pairs
    self-join on (user, day+1) — both sides are already deduplicated
    (user-day cardinality, far below event cardinality), so the join
    input is minimal; one shuffle for the distinct, one for the join."""
    ev = load(spark, sf_dir, "events")
    day = (dm.ms_col(ev, "ts") / F.lit(86_400_000)).cast("long")
    act = ev.select("user_id", day.alias("day")).distinct()
    nxt = act.select("user_id", (F.col("day") - 1).alias("day"))
    per_day = act.groupBy("day").agg(F.count(F.lit(1)).alias("n_active"))
    retained = (
        act.join(nxt, ["user_id", "day"], "left_semi")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    return (
        per_day.join(retained, "day", "left")
        .select(
            (F.col("day") * 86_400_000).alias("day_ms"),
            "n_active",
            F.coalesce(F.col("n_retained"), F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce(F.col("n_retained"), F.lit(0))
                / F.col("n_active"),
                6,
            ).alias("retention"),
        )
        .orderBy("day_ms")
    )


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup: extract a JSON property from the raw
    props column and aggregate per event type. get_json_object is a
    JVM-side expression (no Python), so JSON handling stays inside
    whole-stage codegen; one small groupBy shuffle."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    right_order: str | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Distributed left as-of join: for every left row, attach the
    right row with the greatest `right_ts` <= `left_ts` within the same
    `on` key (the kdb aj / pandas merge_asof / DuckDB ASOF JOIN
    operator; Spark has no built-in).

    NOT a range-explode or a per-key loop: both sides are union-tagged
    into ONE frame, shuffled ONCE on the key, and the match is a
    running last(ignorenulls) carry-forward window over (ts, side) —
    O(n log n) in the partition, no candidate blowup however dense the
    right side is. At 100 TB this is the only as-of strategy that
    survives: a range join would produce |left| x |matching-window|
    intermediates.

    `right_order` (a right-side column) breaks ties deterministically
    when several right rows share (key, right_ts): the LARGEST value
    wins. Right columns other than `on`/`right_ts` must not collide
    with left columns (pre-rename on the caller side). With
    `tolerance_ms`, matches older than left_ts - tolerance_ms are
    discarded (row kept, right side NULL — merge_asof semantics)."""
    rpay = [c for c in right.columns if c not in set(on)]
    rstruct = F.struct(*[F.col(c) for c in rpay])
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType
    rord = (
        F.col(right_order) if right_order is not None else F.lit(0)
    ).cast("long")
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rord"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(rtype).alias("_r"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        rord.alias("_rord"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_l"),
        rstruct.alias("_r"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.when(F.col("_side") == 0, F.col("_r")), ignorenulls=True).over(w)
    out = (
        l2.unionByName(r2)
        .withColumn("_m", matched)
        .where(F.col("_side") == 1)
    )
    if tolerance_ms is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_ats") - F.col("_m").getField(right_ts) <= tolerance_ms,
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col("_l").getField(c).alias(c) for c in left.columns],
        *[F.col("_m").getField(c).alias(c) for c in rpay],
    )


def events_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined as-of to the user's most recent view at or
    before the purchase time (ties on view ts -> largest event_id).
    Oracle: DuckDB's native ASOF LEFT JOIN — an independent engine
    implementation of the same operator."""
    _ev = load(spark, sf_dir, "events")
    base = _ev.select(
        "event_id", "user_id", dm.ms_col(_ev, "ts").alias("ts_ms"),
        "event_type", "value",
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms", "value"
    )
    # one row per (user, ts) so the as-of match is engine-independent
    views = (
        base.where(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_ms").alias("view_ts_ms"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts_ms",
        right_ts="view_ts_ms",
        right_order="view_event_id",
    ).orderBy("event_id")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts_ms",
    start: str = "start_ms",
    end: str = "end_ms",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Point-in-interval range join: left rows matched to every right
    interval with start <= ts <= end on the same `on` key — WITHOUT a
    nested-loop/theta join. Both sides are mapped onto a time-bucket
    grid: a point lands in exactly ONE bucket, an interval explodes to
    the buckets it covers, and the match becomes an equi-join on
    (key, bucket) + a residual BETWEEN filter.

    Scale: the only shuffle is the equi-join; interval replication is
    bounded by ceil(interval_len / bucket_ms) + 1 (pick bucket_ms near
    the typical interval length), and because a point has exactly one
    bucket each (point, interval) pair meets exactly once — no
    dedup pass. Hot buckets are ordinary join skew — AQE splits them.
    Catalyst alone would plan BroadcastNestedLoop for this shape, which
    dies at 100 TB unless one side is tiny."""
    lb = left.withColumn("_b", F.floor(F.col(ts) / F.lit(bucket_ms)))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / F.lit(bucket_ms)),
                F.floor(F.col(end) / F.lit(bucket_ms)),
            )
        ),
    )
    return (
        lb.join(rb, [*on, "_b"])
        .where(F.col(ts).between(F.col(start), F.col(end)))
        .drop("_b")
    )


def events_purchases_in_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event attached to its containing session interval
    (sessions from the gap-based sessionizer) via the bucketed
    interval join. Oracle: plain SQL BETWEEN join over the same session
    CTE — DuckDB plans it as an IEJoin, an independent range-join
    algorithm."""
    _ev = load(spark, sf_dir, "events")
    purchases = _ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", dm.ms_col(_ev, "ts").alias("ts_ms")
    )
    sessions = events_sessionize(spark, sf_dir).select(
        "user_id", "session_no", "start_ms", "end_ms"
    )
    return interval_join(
        purchases, sessions, on=["user_id"], ts="ts_ms"
    ).select(
        "event_id", "user_id", "ts_ms", "session_no", "start_ms", "end_ms"
    ).orderBy("event_id")


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles of event value per type: Spark's sort-based
    `percentile` (linear interpolation at rank (n-1)*p — the same
    definition as SQL quantile_cont, which is the oracle). One shuffle
    on the tiny grouping key; at 100 TB swap in approx_percentile
    (t-digest sketch, mergeable map-side) where 6dp exactness isn't
    contractual — same plan shape."""
    ev = load(spark, sf_dir, "events")
    pct = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile(value, {p})"), 6
    )
    return (
        ev.select("event_type", "value")
        .groupBy("event_type")
        .agg(
            pct(0.5).alias("p50"),
            pct(0.9).alias("p90"),
            pct(0.99).alias("p99"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


def events_value_percentiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB percentile path: `approx_percentile` (Greenwald-
    Khanna sketch — mergeable, map-side combining, bounded memory
    1/accuracy rank error) over the same grouping as the exact twin
    `events_value_percentiles`. At scale the exact sort-based
    percentile buffers every group's values on one reducer; the sketch
    keeps O(accuracy * log n) per partition and merges. Approximate BY
    DESIGN, so the query is declared rows-only for the driver (no
    value-hash oracle, like events_approx_users); the error bound vs
    the exact twin is pinned in tests/test_querier.py instead."""
    ev = load(spark, sf_dir, "events")
    apct = lambda p: F.round(  # noqa: E731
        F.expr(f"approx_percentile(value, {p}, {accuracy})"), 6
    )
    return (
        ev.select("event_type", "value")
        .groupBy("event_type")
        .agg(
            apct(0.5).alias("p50"),
            apct(0.9).alias("p90"),
            apct(0.99).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile (the Deequ/Great-Expectations analyzer
    shape): per column — row count, null count, distinct count, min,
    max (min/max cast to string so heterogeneous column types share
    one result schema). ONE pass over the data: all per-column
    aggregates evaluate in a single Aggregate node (no per-column
    scans), then a tiny unpivot on the 1-row result."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    gap_ms: int = 86_400_000,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
) -> DataFrame:
    """Generalized N-step conversion funnel: per user, step i counts
    iff an event of type steps[i] occurred strictly after — and within
    `gap_ms` of — the user's (earliest qualifying) step i-1 event.
    Returns (step, event_type, n_users), one row per step.

    Shape: the per-user frontier table (user, earliest qualifying ts)
    flows through one equi-join + min-aggregate per step — no window
    over event history, no collect_list, no self-join blowup; each
    stage shrinks the frontier. The per-step counts are tiny aggregates
    unioned at the end (one job, not N actions)."""
    stage = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    outs = [
        stage.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step"),
            F.lit(steps[0]).alias("event_type"),
            "n_users",
        )
    ]
    for i, st in enumerate(steps[1:], start=2):
        stage = (
            events.where(F.col(type_col) == st)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(stage, user_col)
            .where(
                (F.col("_ts") > F.col("t"))
                & (F.col("_ts") <= F.col("t") + gap_ms)
            )
            .groupBy(user_col)
            .agg(F.min("_ts").alias("t"))
        )
        outs.append(
            stage.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step"), F.lit(st).alias("event_type"), "n_users"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("step")


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = b | current = a) estimated from adjacent event
    pairs (user timeline order, event_id tie-break). One shuffle on
    user_id for the lead window, one tiny (a, b) count — the
    sequence-mining primitive behind flow/sankey dashboards."""
    _ev = load(spark, sf_dir, "events")
    ev = _ev.select(
        "user_id", "event_id", dm.ms_col(_ev, "ts").alias("ts_ms"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).where(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p",
            F.floor(
                F.col("n") / F.sum("n").over(tot) * 1e6 + 0.5
            ) / 1e6,
        )
        .orderBy("from_type", "to_type")
    )


def _dist_row_number(
    df: DataFrame, order_cols: list, out_col: str,
    total_col: str | None = None,
) -> DataFrame:
    """Exact `ROW_NUMBER() OVER (ORDER BY ...)` without a
    single-partition global window. The naive window moves the ENTIRE
    input to one partition to rank it; here the input is
    range-repartitioned on the order key (distributed sort) and the
    global rank is (rows in earlier partitions) + (position within
    this partition).

    Round-15 (guide §2.4/§5.2; replaces the r14 persist+collect
    shape, which pinned the whole ranged frame for the session AND
    paid a second full hashpartitioning(_pid) exchange for the local
    row_number window): the frame is now ONE lazy plan with exactly
    one data-proportional exchange —
      * local position: sortWithinPartitions on the range partitions,
        then monotonically_increasing_id(), whose documented layout is
        (partition_id << 33) | record_position; the projection sits
        above the sort and the expression is nondeterministic-tagged,
        so the optimizer cannot reorder it below the sort.
      * per-partition offsets: a groupBy over spark_partition_id() on
        the SAME exchange (Spark's ReuseExchange serves both subtrees
        from one shuffle, so the partitioning the counts see is the
        partitioning the data pass sees — plan-asserted in tests),
        cumulated by a window over at most #shuffle-partitions rows
        (bounded metadata, never data-proportional) and broadcast
        back.
    No action, no persist: nothing is pinned after the caller's own
    materialization (the r14 verdict's pin-release item).

    Identical output to the global window for any tie-free ORDER BY
    (callers append a unique key). `total_col` additionally carries
    the total row count on every row (for in-plan ntile math)."""
    sp = df.sparkSession
    nparts = max(
        1, int(sp.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    ranged = df.repartitionByRange(nparts, *order_cols)
    # bounded: one row per shuffle partition, partial-aggregated
    # map-side — the exchange below it moves <= nparts rows
    cnts = ranged.groupBy(
        F.spark_partition_id().alias("_pid")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    cum = Window.partitionBy(F.lit(0)).orderBy("_pid")
    offsets = cnts.select(
        "_pid",
        (F.sum("_cnt").over(cum) - F.col("_cnt")).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy(F.lit(0))).alias("_tot"),
    )
    local = (
        ranged.sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn(
            "_pid", F.shiftright(F.col("_mid"), 33).cast("int")
        )
    )
    ranked = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (
                F.col("_off")
                + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
                + 1
            ).cast("long"),
        )
    )
    keep = [F.col("_tot").alias(total_col)] if total_col else []
    return ranked.select(*df.columns, F.col(out_col), *keep)


def _dist_ntile(
    df: DataFrame, order_cols: list, n_buckets: int, out_col: str,
) -> DataFrame:
    """Exact `NTILE(n) OVER (ORDER BY ...)` without a single-partition
    global window: the range-partitioned global rank from
    _dist_row_number, bucketed by the exact ntile piecewise formula —
    with n rows and k buckets the first n%k buckets hold ceil(n/k)
    rows. The formula is evaluated IN-PLAN from the carried total
    (integer `div`/`%` only — exact, and the whole operator stays one
    lazy plan with no driver-side action). Identical output to the
    global window for any tie-free ORDER BY (callers append a unique
    key)."""
    k = int(n_buckets)
    ranked = _dist_row_number(df, order_cols, "_rn", total_col="_tot")
    # CASE guards make every div/% divisor nonzero on the branch that
    # evaluates it (ANSI-safe): _tot >= k implies _tot div k >= 1
    bucket = F.expr(
        f"CASE WHEN _tot < {k} THEN _rn "
        f"WHEN _rn <= (_tot % {k}) * ((_tot div {k}) + 1) "
        f"THEN (_rn - 1) div ((_tot div {k}) + 1) + 1 "
        f"ELSE (_tot % {k}) "
        f"+ (_rn - (_tot % {k}) * ((_tot div {k}) + 1) - 1) "
        f"div (_tot div {k}) + 1 END"
    )
    return (
        ranked.withColumn(out_col, bucket.cast("int"))
        .drop("_rn", "_tot")
    )


def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events: per user the
    Recency (days since last purchase, relative to the corpus's last
    event), Frequency (purchase count) and Monetary (value sum), each
    scored into quintiles over a fully deterministic order (metric,
    then user_id — ties can't float between buckets). Quintiles come
    from _dist_ntile (exact ntile semantics, range-partitioned global
    rank) — never a single-partition window over the whole user
    dimension."""
    _ev = load(spark, sf_dir, "events")
    ev = _ev.select(
        "user_id", dm.ms_col(_ev, "ts").alias("ts_ms"), "event_type", "value"
    )
    horizon = ev.agg(F.max("ts_ms").alias("t_max"))
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts_ms").alias("t_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 4).alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .withColumn(
            "recency_days",
            F.floor((F.col("t_max") - F.col("t_last")) / 86_400_000).cast(
                "long"
            ),
        )
    )
    scored = _dist_ntile(
        per_user, [F.col("recency_days").asc(), F.col("user_id")],
        5, "r_score",
    )
    scored = _dist_ntile(
        scored, [F.col("frequency").desc(), F.col("user_id")],
        5, "f_score",
    )
    scored = _dist_ntile(
        scored, [F.col("monetary").desc(), F.col("user_id")],
        5, "m_score",
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    ).orderBy("user_id")


def events_cohort_matrix(
    spark: SparkSession, sf_dir: str, period_ms: int = 7 * 86_400_000
) -> DataFrame:
    """Cohort retention MATRIX (the product-analytics heatmap): users
    cohorted by first-activity period, each cell = fraction of the
    cohort active again k periods later. Built entirely from the
    distinct (user, period) activity table: first-activity via one
    min-aggregate, the matrix via one join back (cohort x offset
    cells, all counts — no per-cell queries)."""
    ev = load(spark, sf_dir, "events")
    period = (dm.ms_col(ev, "ts") / F.lit(period_ms)).cast("long")
    act = ev.select("user_id", period.alias("p")).distinct()
    first = act.groupBy("user_id").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    cells = (
        act.join(first, "user_id")
        .groupBy(
            "cohort", (F.col("p") - F.col("cohort")).alias("period_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        cells.join(sizes, "cohort")
        .select(
            (F.col("cohort") * period_ms).alias("cohort_ms"),
            "period_offset",
            "n_cohort",
            "n_active",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_ms", "period_offset")
    )


def series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-metric correlation — the analytics query PromQL cannot
    express: per job, the Pearson correlation of hourly click volume
    vs hourly error volume. Hourly sums pivot via conditional
    aggregation (one shuffle); the correlation is computed from
    EXPLICIT moments (E[xy], E[x], E[y], E[x^2], E[y^2]) so the float
    path matches the SQL oracle exactly (built-in corr() accumulates
    Welford-style and diverges in the last ulp)."""
    tsdb = dm.derive_tsdb(spark, sf_dir)
    hour = (F.col("ts_ms") / F.lit(3_600_000)).cast("long")
    base = (
        tsdb.samples.join(
            tsdb.series.select("series_id", "metric", "job"), "series_id"
        )
        .where(F.col("metric").isin("event_click", "event_error"))
        .groupBy("job", hour.alias("h"))
        .agg(
            F.sum(
                F.when(F.col("metric") == "event_click", F.col("value"))
                .otherwise(0.0)
            ).alias("x"),
            F.sum(
                F.when(F.col("metric") == "event_error", F.col("value"))
                .otherwise(0.0)
            ).alias("y"),
        )
    )
    exy = F.avg(F.col("x") * F.col("y"))
    ex, ey = F.avg("x"), F.avg("y")
    ex2, ey2 = F.avg(F.col("x") * F.col("x")), F.avg(F.col("y") * F.col("y"))
    corr = (exy - ex * ey) / (
        F.sqrt(ex2 - ex * ex) * F.sqrt(ey2 - ey * ey)
    )
    return (
        base.groupBy("job")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.round(corr, 6).alias("click_error_corr"),
        )
        .orderBy("job")
    )


def events_top_paths(
    spark: SparkSession,
    sf_dir: str,
    gap_ms: int = 30 * 60_000,
    max_len: int = 8,
    k: int = 20,
) -> DataFrame:
    """Top-k session paths (sequence mining over user journeys): each
    session's first `max_len` event types joined into an ordered
    `a>b>c` path string, counted across all sessions. Builds on the
    same gap-based sessionization as events_sessionize — one shuffle
    on user_id for the session windows, one tiny shuffle on the path
    string for the count. The path string is assembled with
    array_sort(collect_list(struct(rn, type))) so its order is the
    session order regardless of aggregation order (collect_list alone
    has no ordering contract under partial aggs)."""
    _ev = load(spark, sf_dir, "events")
    ev = _ev.select(
        "user_id", "event_id", dm.ms_col(_ev, "ts").alias("ts_ms"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    sess = ev.withColumn(
        "new_sess",
        F.when((F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms, 1)
        .otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wn = Window.partitionBy("user_id", "session_no").orderBy(
        "ts_ms", "event_id"
    )
    steps = sess.withColumn("rn", F.row_number().over(wn)).where(
        F.col("rn") <= max_len
    )
    paths = steps.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def series_autocorrelation(
    spark: SparkSession, sf_dir: str, bucket_ms: int = 3_600_000
) -> DataFrame:
    """Per-series lag-1 autocorrelation of the hourly-summed signal —
    the seasonality/persistence diagnostic behind anomaly dashboards.
    Hourly sums (one shuffle, map-side partials), consecutive-bucket
    pairs via one lead() window (stays within the series partition),
    Pearson from EXPLICIT moments (same reason as series_correlation:
    built-in corr() accumulates Welford-style and diverges from the
    SQL oracle in the last ulp). Series with < 3 buckets or zero
    variance on either side are dropped (corr undefined)."""
    tsdb = dm.derive_tsdb(spark, sf_dir)
    hourly = tsdb.samples.groupBy(
        "series_id",
        (F.col("ts_ms") / F.lit(bucket_ms)).cast("long").alias("h"),
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("series_id").orderBy("h")
    pairs = (
        hourly.select(
            "series_id",
            F.col("v").alias("x"),
            F.lead("v").over(w).alias("y"),
            (F.lead("h").over(w) - F.col("h")).alias("dh"),
        )
        # only ADJACENT buckets form a lag-1 pair (gaps break the lag)
        .where(F.col("y").isNotNull() & (F.col("dh") == 1))
    )
    moments = pairs.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg(F.col("x") * F.col("y")).alias("exy"),
        F.avg("x").alias("ex"),
        F.avg("y").alias("ey"),
        F.avg(F.col("x") * F.col("x")).alias("ex2"),
        F.avg(F.col("y") * F.col("y")).alias("ey2"),
    )
    vx = F.col("ex2") - F.col("ex") * F.col("ex")
    vy = F.col("ey2") - F.col("ey") * F.col("ey")
    # variance guard BEFORE the division: 0/0 is NULL in Spark but a
    # FP error class in other engines — filter on the moments so the
    # Spark plan and the SQL oracle drop exactly the same rows.
    return (
        moments.where((F.col("n_pairs") >= 3) & (vx > 0) & (vy > 0))
        .select(
            "series_id",
            "n_pairs",
            F.round(
                (F.col("exy") - F.col("ex") * F.col("ey"))
                / F.sqrt(vx * vy),
                6,
            ).alias("autocorr_lag1"),
        )
        .orderBy("series_id")
    )


def events_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotal report in ONE pass (GROUP BY ROLLUP):
    per (event_type, day) cells, per-event_type subtotals, and the
    grand total. Spark compiles rollup() to a single Expand +
    aggregation — one shuffle total, not three queries; grouping_id
    disambiguates subtotal rows from data nulls (bit order matches
    SQL GROUPING(event_type, day))."""
    _ev = load(spark, sf_dir, "events")
    ev = _ev.select(
        "event_type",
        (dm.ms_col(_ev, "ts") / F.lit(86_400_000)).cast("long").alias("day"),
        "value",
    )
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy("event_type", "day", "gid")
    )


def seasonal_backtest(
    spark: SparkSession, sf_dir: str,
    season_buckets: int = 24, bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (yhat_t =
    y_{t-season}, here: same hour yesterday) — the baseline every
    fancier model must beat, and the obvious missing piece next to
    predict_linear/holt_winters. Hourly sums (one shuffle), the
    forecast is an equi-join of the bucket grid onto itself shifted by
    the season (a join, not lag: gaps in the series must not slide the
    season), then per-series MAE / bias over the covered buckets."""
    tsdb = dm.derive_tsdb(spark, sf_dir)
    # backtest the per-job signal: individual series are sparse on an
    # hourly grid (no forecastable history), the job rollup is dense
    hourly = (
        tsdb.samples.join(
            F.broadcast(tsdb.series.select("series_id", "job")), "series_id"
        )
        .groupBy(
            "job",
            (F.col("ts_ms") / F.lit(bucket_ms)).cast("long").alias("h"),
        )
        .agg(F.sum("value").alias("v"))
    )
    prev = hourly.select(
        "job",
        (F.col("h") + season_buckets).alias("h"),
        F.col("v").alias("yhat"),
    )
    scored = hourly.join(prev, ["job", "h"])
    return (
        scored.groupBy("job")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.avg(F.abs(F.col("v") - F.col("yhat"))), 6).alias(
                "mae"
            ),
            F.round(F.avg(F.col("v") - F.col("yhat")), 6).alias("bias"),
        )
        .where(F.col("n_buckets") >= 3)
        .orderBy("job")
    )


def events_cumulative_users(
    spark: SparkSession, sf_dir: str, period_ms: int = 86_400_000
) -> DataFrame:
    """Growth accounting: per day, NEW users (first ever activity) and
    the cumulative registered-user total. Running COUNT(DISTINCT) is
    not incrementally computable, so it is reformulated exactly: first
    activity day per user (one aggregate), then new-users-per-day and
    a running sum window — the standard growth-curve rewrite that
    scales (the window runs over #days rows, not events)."""
    ev = load(spark, sf_dir, "events")
    first = (
        ev.select(
            "user_id",
            (dm.ms_col(ev, "ts") / F.lit(period_ms)).cast("long").alias("d"),
        )
        .groupBy("user_id")
        .agg(F.min("d").alias("first_day"))
    )
    daily = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # day-granular input (bounded by the calendar, not the corpus);
    # the constant partition key pins the single-partition cumulative
    # sum explicitly instead of via WindowExec's move-everything
    # fallback (round-14 hygiene — result identical)
    w = Window.partitionBy(F.lit(0)).orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")


def series_churn(
    spark: SparkSession, sf_dir: str, period_ms: int = 86_400_000
) -> DataFrame:
    """Series churn per day — the cardinality-health diagnostic behind
    'why did my TSDB blow up': per period, how many distinct series are
    active, how many are NEW (absent the previous period) and how many
    CHURNED (present previous period, absent now). Built from one
    distinct (series, period) activity table self-joined onto its
    shifted grid — counts only, no window over history."""
    tsdb = dm.derive_tsdb(spark, sf_dir)
    # persisted: the activity table feeds prev/new/churned/totals/days
    # — five consumers over one distinct, not five fact scans
    act = tsdb.samples.select(
        "series_id",
        (F.col("ts_ms") / F.lit(period_ms)).cast("long").alias("d"),
    ).distinct().persist()
    prev = act.select("series_id", (F.col("d") + 1).alias("d"))
    new = act.join(prev, ["series_id", "d"], "anti").groupBy("d").agg(
        F.count(F.lit(1)).alias("new_series")
    )
    churned = prev.join(act, ["series_id", "d"], "anti").groupBy("d").agg(
        F.count(F.lit(1)).alias("churned_series")
    )
    totals = act.groupBy("d").agg(F.count(F.lit(1)).alias("active_series"))
    days = act.select("d").distinct()
    return (
        days.join(totals, "d", "left")
        .join(new, "d", "left")
        .join(churned, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce("active_series", F.lit(0)).alias("active_series"),
            F.coalesce("new_series", F.lit(0)).alias("new_series"),
            F.coalesce("churned_series", F.lit(0)).alias("churned_series"),
        )
        .orderBy("day")
    )


def basket_lift(
    spark: SparkSession, sf_dir: str, min_pairs: int = 3, k: int = 50
) -> DataFrame:
    """Market-basket analysis over orders: part pairs co-purchased in
    >= min_pairs orders, with support and lift — the association-rule
    primitive (lift > 1 = parts bought together more than chance).
    The pair generator is a self-join WITHIN orders (each order has a
    handful of lineitems, so the blowup is bounded by the max basket
    size, never corpus-quadratic); part frequencies broadcast back.
    Lift is floor-discretized at 1e6 (cross-engine tie rule)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = li.persist()  # feeds totals, part counts AND the pair join
    n_orders = li.select("l_orderkey").distinct().count()
    part_n = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= min_pairs)
    )
    na = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    nb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    lift = (
        F.col("n_co").cast("double")
        * F.lit(float(n_orders))
        / (F.col("n_a") * F.col("n_b"))
    )
    return (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_co",
            (F.floor(lift * 1e6 + 0.5) / 1e6).alias("lift"),
        )
        .orderBy(F.col("n_co").desc(), "part_a", "part_b")
        .limit(k)
    )


def series_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrape-health diagnostic per series: observed sample count, the
    MEDIAN inter-sample interval (the de-facto scrape interval) and the
    largest gap — what staleness/absent alerting is tuned against.
    One lag window inside the series partition, one aggregate; the
    median is exact percentile (percentile_cont twin in the oracle)."""
    tsdb = dm.derive_tsdb(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("ts_ms", "value")
    deltas = (
        tsdb.samples.select("series_id", "ts_ms", "value")
        .withColumn("dt", F.col("ts_ms") - F.lag("ts_ms").over(w))
        .where(F.col("dt").isNotNull())
    )
    return (
        deltas.groupBy("series_id")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_samples"),
            F.round(F.percentile("dt", F.lit(0.5)), 6).alias(
                "median_interval_ms"
            ),
            F.max("dt").alias("max_gap_ms"),
        )
        .orderBy("series_id")
    )


def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time (the interval-counting pattern):
    an order opens at o_orderdate and closes at its LAST l_shipdate;
    per month boundary, how many orders are open. Computed sweep-line
    style — +1/-1 events at open/close months, one sort-free running
    sum over the tiny month axis — never an explode of order x month
    (the version that dies at 100 TB)."""
    _ord = load(spark, sf_dir, "orders")
    orders = _ord.select(
        "o_orderkey",
        (
            F.year(ts_col(_ord, "o_orderdate")) * 12
            + F.month(ts_col(_ord, "o_orderdate"))
        ).alias("open_m"),
    )
    _li = load(spark, sf_dir, "lineitem")
    closes = (
        _li.select(
            "l_orderkey",
            (
                F.year(ts_col(_li, "l_shipdate")) * 12
                + F.month(ts_col(_li, "l_shipdate"))
            ).alias("m"),
        )
        .groupBy("l_orderkey")
        .agg(F.max("m").alias("close_m"))
    )
    ev = (
        orders.join(
            closes, orders.o_orderkey == closes.l_orderkey, "left"
        )
        .select(
            "open_m",
            F.coalesce("close_m", F.col("open_m")).alias("close_m"),
        )
    )
    deltas = (
        ev.select(F.col("open_m").alias("m"), F.lit(1).alias("d"))
        .unionByName(
            # close takes effect the month AFTER the last shipment
            ev.select(
                (F.col("close_m") + 1).alias("m"), F.lit(-1).alias("d")
            )
        )
        .groupBy("m")
        .agg(F.sum("d").alias("delta"))
    )
    # month-granular input (calendar-bounded) — same explicit
    # single-partition idiom as the daily cumulative sum above
    w = Window.partitionBy(F.lit(0)).orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        deltas.select(
            "m", F.sum("delta").over(w).cast("long").alias("open_orders")
        )
        .orderBy("m")
    )
