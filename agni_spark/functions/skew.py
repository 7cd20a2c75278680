"""Skew-handling primitives for 100 TB joins/aggregations.

AQE's skew-join splitting (enabled session-wide, session.py) handles
most skew at runtime; these utilities are the explicit fallback for the
pathological cases AQE can't fix — a shuffle join where ONE key holds a
double-digit percentage of the fact table (the classic hot-series /
hot-shingle problem).

- salted_join: fact side gets a deterministic salt in [0, n); the dim
  side is replicated n times; the join key becomes (key, salt), fanning
  one hot key's rows across n reducers. Result row-for-row equal to the
  plain join (tested).
- two_phase_agg: partial agg on (key, salt) then final agg on key.
  Spark's map-side partial aggregation already does this within a task;
  the explicit salt adds a REDUCER-level split for keys whose partials
  still concentrate on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, from_col: str) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from an existing
    high-cardinality column (NOT rand() — keeps every run, retry, and
    engine replayable)."""
    return df.withColumn(
        "_salt", (F.abs(F.hash(F.col(from_col))) % n_salts).cast("int")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the hot-key split: fact salted, dim replicated
    n_salts times, join on (key, salt). Use when a single join key
    dominates the fact table and the dim side is too big to broadcast."""
    salt_src = salt_from or key
    f = with_salt(fact, n_salts, salt_src)
    # generator must be top-level in withColumn (no cast wrapper) —
    # the array literals are already int
    replicas = F.explode(F.array(*[F.lit(int(i)) for i in range(n_salts)]))
    d = dim.withColumn("_salt", replicas)
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str = "value",
    n_salts: int = 8,
) -> DataFrame:
    """sum/count per key via an explicit two-phase (salted) shuffle:
    phase 1 aggregates (key, salt) partials, phase 2 merges per key.
    Float-sum note: the regrouping changes addition order, so round
    final sums before hash-comparing across engines."""
    salted = df.withColumn(
        "_salt", (F.abs(F.hash(F.col(value))) % n_salts).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count(F.lit(1)).alias("_pn")
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("sum_value"),
        F.sum("_pn").cast("long").alias("n"),
    )
