"""Skew utilities: salted join / two-phase agg must be result-identical
to their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from agni_spark.functions import skew


def test_salted_join_equals_plain_join(spark):
    # one pathologically hot key: 90% of the fact rows
    fact = spark.createDataFrame(
        [(1 if i < 90 else i % 7, i, float(i)) for i in range(100)],
        "k long, row_id long, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "k long, name string"
    )
    plain = {(r.row_id, r.name) for r in fact.join(dim, "k").collect()}
    salted = {
        (r.row_id, r.name)
        for r in skew.salted_join(fact, dim, "k", n_salts=4, salt_from="row_id").collect()
    }
    assert salted == plain and len(plain) == 100


def test_salted_join_left_outer(spark):
    fact = spark.createDataFrame([(1, 10), (99, 20)], "k long, row_id long")
    dim = spark.createDataFrame([(1, "a")], "k long, name string")
    rows = {
        (r.row_id, r.name)
        for r in skew.salted_join(fact, dim, "k", n_salts=3, salt_from="row_id",
                                  how="left").collect()
    }
    assert rows == {(10, "a"), (20, None)}


def test_two_phase_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], "k long, value double"
    )
    plain = {
        (r.k, round(r.s, 4), r.n)
        for r in df.groupBy("k")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    two = {
        (r.k, round(r.sum_value, 4), r.n)
        for r in skew.two_phase_agg(df, "k").collect()
    }
    assert two == plain
