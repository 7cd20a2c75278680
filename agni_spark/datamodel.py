"""Data model + deterministic TSDB-shaped derivation from the driver
testdata.

Model (SURVEY §1, FIXTURES.md): series = sorted label set identified by
a dense series_id; sample = (int64 ms timestamp, float64 value); blocks
= non-overlapping 2-hour time partitions (vendor tsdb block.go:64-96).

The driver's DuckDB oracle only registers the testdata tables, so the
TSDB fixtures are DERIVED from `events` by a pure deterministic mapping
implemented twice — here with DataFrame ops, and in
`agni_spark.oracle.PRELUDE` as a DuckDB CTE — so every TSDB operator is
differentially testable. The mapping assigns each event a series via
(event_type, user_id mod 420); 420 = lcm of the label moduli, so
series_id <-> label set is bijective:

    uid      = user_id % 420
    metric   = 'event_' || event_type                     (__name__)
    job      = ['api','web','worker'][uid % 3]
    env      = ['prod','dev'][uid % 2]
    instance = env || '-' || lpad(uid % 20, 2, '0')
    pod      = 'pod-' || (uid % 7)  only when uid % 5 < 3  (absent ~40%:
               exercises P6 absent-label semantics)
    series_id= type_idx * 1000 + uid
    ts_ms    = epoch milliseconds of ts
    block    = 2-hour bucket of ts_ms (vendor tsdb db.go:49 block range)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
BLOCK_MS = 2 * 3600 * 1000  # 2-hour blocks, vendor tsdb db.go:49
SERIES_MOD = 420  # lcm(3, 2, 20, 5, 7)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    The driver parquet stores TIMESTAMP(NANOS) which Spark rejects by
    default; `nanosAsLong` reads those columns as int64 nanoseconds.
    All downstream code converts explicitly with exact integer
    arithmetic (`div`), never float division (2024 epoch-nanos exceed
    2^53, a double round-trip would corrupt millisecond values).

    Session timezone is pinned to UTC here (the one choke point every
    query goes through) so TIMESTAMP_NTZ -> epoch conversions agree
    with DuckDB's naive reading regardless of the caller's session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # immutable in this session
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ns_to_ms(col: str) -> Column:
    """int64 epoch -> int64 millis, exact (floor division), with
    MAGNITUDE dispatch on the unit: the driver has regenerated the
    testdata with different timestamp physical types between rounds
    (round 3 died on one such change), so a bigint column is not
    assumed to be nanos — 2024-epoch nanos are ~1.7e18, micros ~1.7e15,
    millis ~1.7e12, seconds ~1.7e9; the thresholds are unambiguous for
    any date between 1973 and 5138. Pure expression (constant-folded
    per row, no action needed)."""
    return F.expr(
        f"CAST(CASE WHEN {col} > 100000000000000000 THEN {col} div 1000000 "
        f"WHEN {col} > 100000000000000 THEN {col} div 1000 "
        f"WHEN {col} > 100000000000 THEN {col} "
        f"ELSE {col} * 1000 END AS BIGINT)"
    )


def ns_to_ts(col: str) -> Column:
    """int64 epoch (unit via magnitude, see ns_to_ms) -> TIMESTAMP
    (microsecond precision, matching what DuckDB sees when it coerces
    TIMESTAMP_NS to TIMESTAMP)."""
    micros = (
        f"CASE WHEN {col} > 100000000000000000 THEN {col} div 1000 "
        f"WHEN {col} > 100000000000000 THEN {col} "
        f"WHEN {col} > 100000000000 THEN {col} * 1000 "
        f"ELSE {col} * 1000000 END"
    )
    return F.timestamp_micros(F.expr(f"CAST({micros} AS BIGINT)"))


def ms_col(df: DataFrame, name: str) -> Column:
    """Epoch milliseconds regardless of the physical parquet type: the
    driver has shipped `ts` both as TIMESTAMP(NANOS) (int64 under
    nanosAsLong) and as TIMESTAMP(MICROS) NTZ. unix_millis truncates
    sub-ms precision, exactly like DuckDB's epoch_ms."""
    dt = dict(df.dtypes)[name]
    if dt == "bigint":
        return ns_to_ms(name)
    return F.unix_millis(F.col(name).cast("timestamp"))


def ts_col(df: DataFrame, name: str) -> Column:
    """Timestamp column regardless of physical parquet type: the
    testdata mixes TIMESTAMP(NANOS) (read as int64 under nanosAsLong)
    and TIMESTAMP(MICROS) NTZ. Always yields TimestampType in UTC
    session time, which matches DuckDB's naive reading."""
    dt = dict(df.dtypes)[name]
    if dt == "bigint":
        return ns_to_ts(name)
    return F.col(name).cast("timestamp")


@dataclass
class TsdbTables:
    """The four TSDB-shaped tables (FIXTURES.md core fixtures)."""

    samples: DataFrame  # (series_id, ts_ms, value)
    series: DataFrame  # (series_id, metric, job, env, instance, pod)
    series_labels: DataFrame  # (series_id, name, value) — the postings table
    blocks: DataFrame  # (ulid, block_id, mint_ms, maxt_ms, stats...)


# The series registry is a dimension table (thousands of rows vs the
# fact table's billions) referenced several times per matcher plan; the
# memo + persist below keeps it materialized once per session instead of
# re-running the distinct-over-facts for every branch of every query.
_TSDB_CACHE: dict[tuple[str, str], TsdbTables] = {}


def _event_base(events: DataFrame) -> DataFrame:
    """Project events into the TSDB shape. When `ts` is a raw int64
    nanos column it is ALSO carried through as hidden `_ts_ns`: a
    predicate on the derived `ts_ms` (`ts div 1e6 >= c`) cannot reach
    the parquet reader, but the equivalent raw-column bound
    (`ts >= c*1e6`) becomes a pushed filter -> row-group min/max
    skipping, the moral equivalent of the reference's chunk-time
    pruning (agni querier.go:510-548). querier.select does the bound
    translation and drops the column from results."""
    type_idx = F.array_position(
        F.array(*[F.lit(t) for t in EVENT_TYPES]), F.col("event_type")
    ) - F.lit(1)
    uid = F.col("user_id") % SERIES_MOD
    env = F.when(uid % 2 == 0, F.lit("prod")).otherwise(F.lit("dev"))
    return events.select(
        (type_idx * 1000 + uid).cast("long").alias("series_id"),
        F.concat(F.lit("event_"), F.col("event_type")).alias("metric"),
        F.element_at(
            F.array(F.lit("api"), F.lit("web"), F.lit("worker")),
            (uid % 3 + 1).cast("int"),
        ).alias("job"),
        env.alias("env"),
        F.concat(env, F.lit("-"), F.lpad((uid % 20).cast("string"), 2, "0")).alias(
            "instance"
        ),
        F.when(uid % 5 < 3, F.concat(F.lit("pod-"), (uid % 7).cast("string"))).alias(
            "pod"
        ),
        ms_col(events, "ts").alias("ts_ms"),
        F.col("value"),
        # Raw source column carried under a hidden name so time bounds
        # can be restated against it and reach the parquet reader as
        # pushed filters (querier.select does the bound translation).
        F.col("ts").alias(
            "_ts_ns" if dict(events.dtypes).get("ts") == "bigint" else "_ts_raw"
        ),
    )


def derive_tsdb(spark: SparkSession, sf_dir: str) -> TsdbTables:
    """Build the TSDB tables from `events` (see module docstring).

    Scale note: in a real deployment `samples` is the 100 TB fact table
    written time-partitioned (see storage.layout); the derivation here
    is narrow (no shuffle) except the small distinct for the series
    registry."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TSDB_CACHE.get(key)
    if cached is not None:
        return cached

    base = _event_base(load(spark, sf_dir, "events"))

    raw = [c for c in ("_ts_ns", "_ts_raw") if c in base.columns]
    samples = base.select(*(["series_id", "ts_ms", "value"] + raw))

    series = base.select(
        "series_id", "metric", "job", "env", "instance", "pod"
    ).distinct().persist()

    # Exploded long form = the inverted index / postings table
    # (vendor tsdb postings.go). Empty values are never emitted —
    # absent label ≡ "" (querier.go:189-195).
    pairs = F.array(
        F.struct(F.lit("__name__").alias("name"), F.col("metric").alias("value")),
        F.struct(F.lit("env").alias("name"), F.col("env").alias("value")),
        F.struct(F.lit("instance").alias("name"), F.col("instance").alias("value")),
        F.struct(F.lit("job").alias("name"), F.col("job").alias("value")),
        F.struct(F.lit("pod").alias("name"), F.col("pod").alias("value")),
    )
    series_labels = (
        series.select("series_id", F.explode(pairs).alias("kv"))
        .select("series_id", "kv.name", "kv.value")
        .where(F.col("value").isNotNull())
    )

    block_id = (F.col("ts_ms") / BLOCK_MS).cast("long")
    blocks = (
        samples.select(block_id.alias("block_id"), "series_id")
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("num_samples"),
            F.countDistinct("series_id").alias("num_series"),
        )
        .select(
            F.concat(F.lit("BLK"), F.lpad(F.col("block_id").cast("string"), 23, "0"))
            .alias("ulid"),
            "block_id",
            (F.col("block_id") * BLOCK_MS).alias("mint_ms"),
            ((F.col("block_id") + 1) * BLOCK_MS).alias("maxt_ms"),
            "num_samples",
            "num_series",
            # mostly level 1; a few level-2 to exercise the shipper
            # filter S10 (shipper.go:22-44 ships level-1 only).
            F.when(F.col("block_id") % 9 == 0, F.lit(2))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("compaction_level"),
        )
    )
    out = TsdbTables(samples, series, series_labels, blocks)
    _TSDB_CACHE[key] = out
    return out


def tombstones_for(spark: SparkSession) -> DataFrame:
    """Static deterministic tombstones (FIXTURES.md): every series with
    series_id % 97 == 0 has one deleted interval, both ends inclusive
    (vendor tombstones.go:158-165)."""
    rows = [(sid, 1704844800000, 1704931199999) for sid in range(0, 5000, 97)]
    return spark.createDataFrame(
        rows, "series_id long, mint_ms long, maxt_ms long"
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the TSDB model as temp views (samples / series /
    series_labels / blocks) plus the raw testdata tables — the raw-SQL
    surface: spark.sql('SELECT ... FROM samples JOIN series ...') works
    directly, with the same Catalyst plans as the DataFrame API."""
    t = derive_tsdb(spark, sf_dir)
    t.samples.createOrReplaceTempView("samples")
    t.series.createOrReplaceTempView("series")
    t.series_labels.createOrReplaceTempView("series_labels")
    t.blocks.createOrReplaceTempView("blocks")
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def label_set_key(labels_map: Column) -> Column:
    """Canonical sorted `n=v,...` string of a labels map — the
    engine-wide series identity (same bytes every ingest path hashes:
    remote-write receiver, exposition parser, rule materializer)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(labels_map)),
            lambda e: F.concat_ws("=", e.getField("key"), e.getField("value")),
        ),
        ",",
    )


def label_set_id(labels_map: Column) -> Column:
    """Deterministic 60-bit series id of a labels map (md5 of the
    canonical key — `server.decode_write`'s python twin, JVM-side)."""
    from agni_spark.functions.dedup import hash60

    return hash60(label_set_key(labels_map))
