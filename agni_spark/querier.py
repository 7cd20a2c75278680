"""The query engine: matcher selection + time pruning + cross-block merge.

Reference lifecycle (SURVEY §3.1, agni querier.go): matchers -> postings
(inverted index) -> intersect -> per-block series sets -> k-way merge ->
time-clipped sample iterators. Here the whole pipeline is ONE Catalyst
plan:

    samples (huge fact, time-partitioned parquet)
      |> partition/row-group pruning on ts_ms          (P1, P7, P8)
      |> LEFT SEMI join w/ broadcast(matched series)   (P2-P6, A1, A2)
      |> ORDER BY series_id, ts_ms                     (M1, M2, A3)

Scale notes (100 TB posture):
- `series_labels` is the dimension side (series count << sample count);
  matcher evaluation never touches the fact table.
- The matched-series set is broadcast into the semi-join, so the fact
  table is filtered scan-side with zero shuffle. For pathologically
  large matched sets pass broadcast_series=False and let AQE pick a
  shuffle join.
- Time predicates are plain `ts_ms` comparisons -> pushed to parquet
  (partition pruning + row-group min/max skipping replace the
  reference's block pruning querier.go:25-46 and chunk pruning
  querier.go:510-548).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agni_spark.matchers import Matcher


class Querier:
    """Query surface over the TSDB-shaped tables.

    Parameters mirror the reference's DB (db.go:28-38): a samples fact
    table, a series registry, the exploded labels (postings) table, and
    optionally the block registry.

    Expected schemas (see agni_spark.datamodel):
      samples(series_id long, ts_ms long, value double)
      series(series_id long, ...label columns or map)
      series_labels(series_id long, name string, value string)
      blocks(ulid string, mint_ms long, maxt_ms long, ...)
    """

    def __init__(
        self,
        samples: DataFrame,
        series: DataFrame,
        series_labels: DataFrame,
        blocks: DataFrame | None = None,
    ) -> None:
        self.samples = samples
        self.series = series
        self.series_labels = series_labels
        self.blocks = blocks

    # -- matcher -> series (the postings tier) -----------------------------
    def select_series(
        self, matchers: Iterable[Matcher], broadcast_series: bool = True
    ) -> DataFrame:
        """Compile matchers into the set of matching series_ids.

        Equality/regex/prefix postings lookup: agni querier.go:236-283;
        intersection tree: vendor tsdb postings.go:168-233; absent-label
        deferral: querier.go:189-195,457-462. See matchers.py for the
        semi/anti join rule.
        """
        out = self.series.select("series_id")
        sl = self.series_labels
        for m in matchers:
            # literal-regex rewrite: =~"a|b" -> IN, =~"lit.*" -> prefix
            # (pushdown-capable predicates; rlike never pushes)
            m = m.simplify()
            if m.matches_empty():
                # series with the label present-but-not-matching are out;
                # series lacking the label survive (absent == "").
                bad = sl.where(
                    (F.col("name") == m.name) & m.negated_condition(F.col("value"))
                ).select("series_id")
                out = out.join(bad, "series_id", "left_anti")
            else:
                good = sl.where(
                    (F.col("name") == m.name) & m.positive_condition(F.col("value"))
                ).select("series_id").distinct()
                out = out.join(good, "series_id", "left_semi")
        if broadcast_series:
            out = F.broadcast(out)
        return out

    # -- the main entry point: Select() (querier.go:75-89) -----------------
    def select(
        self,
        matchers: Iterable[Matcher] = (),
        mint_ms: int | None = None,
        maxt_ms: int | None = None,
        with_labels: bool = False,
        broadcast_series: bool = True,
        sort: bool = True,
    ) -> DataFrame:
        """Time-range + matcher selection over samples.

        Both time bounds are INCLUSIVE, matching the reference's
        per-sample clipping (querier.go:831-833: `t < mint` and
        `t > maxt` are rejected).
        Result is sorted (series_id, ts_ms) — the reference's output
        contract: series in label-set order (series_id is assigned in
        label-sorted order), samples in time order (querier.go:314-328).

        `sort=False` skips the global range-partition sort for
        INTERNAL consumers (the PromQL compute tier) whose next step is
        a hash-partitioned window or aggregation on series_id anyway —
        at scale the output sort is a full extra shuffle the window
        immediately redoes. Serving paths keep the sorted contract.
        """
        matchers = list(matchers)
        df = self.samples
        # P1/P7/P8: plain comparisons -> partition pruning + row-group
        # skip. When samples carry the raw `_ts_ns` source column, the
        # bounds are ALSO stated against it (exact integer equivalence:
        # ts div 1e6 >= lo  <=>  ts >= lo*1e6;  ts div 1e6 <= hi  <=>
        # ts < (hi+1)*1e6) so the predicate reaches the parquet reader
        # as a pushed filter instead of a post-scan expression.
        raw_ns = "_ts_ns" in df.columns
        raw_ts = "_ts_raw" in df.columns

        def _raw_ts_lit(ms: int):
            # constant-folded to a plain timestamp literal -> pushable;
            # cast to the column's exact type (NTZ vs LTZ) to avoid
            # mixed-type comparison errors. Session tz is UTC (load()).
            return F.timestamp_millis(F.lit(ms)).cast(dict(df.dtypes)["_ts_raw"])

        def _raw_int_bound(lo_ms: int | None, hi_ms_excl: int | None):
            # Unit-agnostic bound on the raw int64 column, mirroring
            # ns_to_ms's magnitude dispatch (the driver has shipped
            # several timestamp physical types): an OR of per-unit
            # (range-gate AND bound) conjunctions — every leaf is
            # col <op> literal, so the whole predicate still reaches
            # the parquet reader as a pushed filter.
            c = F.col("_ts_ns")
            arms = []
            for gate_lo, gate_hi, mul in (
                (100_000_000_000_000_000, None, 1_000_000),  # nanos
                (100_000_000_000_000, 100_000_000_000_000_000, 1_000),
                (100_000_000_000, 100_000_000_000_000, 1),  # millis
                (None, 100_000_000_000, None),  # seconds
            ):
                gate = F.lit(True)
                if gate_lo is not None:
                    gate = gate & (c > F.lit(gate_lo))
                if gate_hi is not None:
                    gate = gate & (c <= F.lit(gate_hi))
                if mul is None:  # seconds: ms bounds floor-divide
                    b = F.lit(True)
                    if lo_ms is not None:
                        b = b & (c >= F.lit(lo_ms // 1000 + (1 if lo_ms % 1000 else 0)))
                    if hi_ms_excl is not None:
                        b = b & (c < F.lit((hi_ms_excl + 999) // 1000))
                else:
                    b = F.lit(True)
                    if lo_ms is not None:
                        b = b & (c >= F.lit(lo_ms * mul))
                    if hi_ms_excl is not None:
                        b = b & (c < F.lit(hi_ms_excl * mul))
                arms.append(gate & b)
            out = arms[0]
            for a in arms[1:]:
                out = out | a
            return out

        if raw_ns and (mint_ms is not None or maxt_ms is not None):
            df = df.where(
                _raw_int_bound(
                    mint_ms, (maxt_ms + 1) if maxt_ms is not None else None
                )
            )
        if mint_ms is not None:
            df = df.where(F.col("ts_ms") >= F.lit(mint_ms))
            if raw_ts:
                df = df.where(F.col("_ts_raw") >= _raw_ts_lit(mint_ms))
        if maxt_ms is not None:
            df = df.where(F.col("ts_ms") <= F.lit(maxt_ms))
            if raw_ts:
                df = df.where(F.col("_ts_raw") < _raw_ts_lit(maxt_ms + 1))
        if matchers:
            ids = self.select_series(matchers, broadcast_series=broadcast_series)
            df = df.join(ids, "series_id", "left_semi")
        if raw_ns or raw_ts:
            df = df.drop("_ts_ns", "_ts_raw")
        if with_labels:
            df = df.join(self.series, "series_id", "left")
        return df.orderBy("series_id", "ts_ms") if sort else df

    # -- label introspection (M4/M5, querier.go:48-73) ---------------------
    def label_values(
        self, name: str, matchers: Iterable[Matcher] = ()
    ) -> DataFrame:
        """Sorted distinct values of one label, optionally restricted to
        series matching `matchers` (LabelValuesFor — unimplemented in the
        reference, querier.go:71-73; implemented here as an extension)."""
        sl = self.series_labels.where(F.col("name") == name)
        matchers = list(matchers)
        if matchers:
            ids = self.select_series(matchers)
            sl = sl.join(ids, "series_id", "left_semi")
        return sl.select("value").distinct().orderBy("value")

    def label_names(self, matchers: Iterable[Matcher] = ()) -> DataFrame:
        """Sorted distinct label names (index LabelNames equivalent)."""
        sl = self.series_labels
        matchers = list(matchers)
        if matchers:
            ids = self.select_series(matchers)
            sl = sl.join(ids, "series_id", "left_semi")
        return sl.select("name").distinct().orderBy("name")

    def series_for(self, matchers: Iterable[Matcher]) -> DataFrame:
        """/api/v1/series equivalent: matching series with their labels,
        label-sorted (S6 series lookup, vendor index.go:779-847)."""
        ids = self.select_series(list(matchers))
        return self.series.join(ids, "series_id", "left_semi").orderBy("series_id")

    # -- tombstones (P9, querier.go:845-879) -------------------------------
    def apply_tombstones(self, df: DataFrame, tombstones: DataFrame) -> DataFrame:
        """Drop samples falling inside deleted intervals (both interval
        ends inclusive, vendor tombstones.go:158-165). The reference
        evaluates this at read time; on Spark a Delta DELETE at write
        time is strictly stronger — this is the read-time equivalent.

        tombstones(series_id long, mint_ms long, maxt_ms long) is tiny
        (~1% of series) -> broadcast anti range-join, no shuffle of the
        fact side."""
        t = F.broadcast(tombstones)
        cond = (
            (df["series_id"] == t["series_id"])
            & (df["ts_ms"] >= t["mint_ms"])
            & (df["ts_ms"] <= t["maxt_ms"])
        )
        return df.join(t, cond, "left_anti")


def validate_block_sequence(blocks: DataFrame) -> DataFrame:
    """Overlapping-block detection (S3, db.go:206-220): returns the
    offending pairs; empty result == valid. Self-join on interval
    overlap with ulid < ulid to dedup pairs."""
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ulid") < F.col("b.ulid"))
            & (F.col("a.mint_ms") < F.col("b.maxt_ms"))
            & (F.col("b.mint_ms") < F.col("a.maxt_ms")),
        )
        .select(
            F.col("a.ulid").alias("ulid_a"),
            F.col("b.ulid").alias("ulid_b"),
        )
        .orderBy("ulid_a", "ulid_b")
    )


def merge_on_read(samples: DataFrame) -> DataFrame:
    """Duplicate-sample resolution at read time: one value per
    (series_id, ts_ms). The reference's storage can hold the same
    timestamp in overlapping sources; TSDB keeps the LAST ingested
    (vendor tsdb mergedSeriesSet). Stores written through
    `layout.write_blocks(..., seq=)` / `stream_ship` carry an `_seq`
    ingest-sequence column, and the highest sequence wins — true
    last-ingested semantics (value is the deterministic tie-break
    within one sequence). Legacy stores without `_seq` fall back to
    max value. One shuffle on the natural key either way; at scale
    this folds into the same exchange as any downstream (series, time)
    aggregation."""
    if "_seq" in samples.columns:
        return samples.groupBy("series_id", "ts_ms").agg(
            F.max_by(
                "value", F.struct(F.col("_seq"), F.col("value"))
            ).alias("value")
        )
    return samples.groupBy("series_id", "ts_ms").agg(
        F.max("value").alias("value")
    )


def federated_querier(queriers: list[Querier], dedupe: bool = True) -> Querier:
    """Fan-in over N stores (the Thanos Store-API / agni multi-tenant
    read pattern: every Prometheus ships its own block store; queries
    see one logical TSDB). Samples/series/postings union lazily —
    Catalyst pushes matcher predicates and time bounds into EVERY
    store's scan independently, so federation adds no shuffle of its
    own; with `dedupe`, overlapping stores (HA pairs shipping the same
    samples) resolve per (series, ts) through merge_on_read's
    last-ingested-wins before use.

    Stores with and without `_seq` can mix: rows lacking a sequence
    union in as NULL, and NULLs lose to any real sequence under
    max_by's struct ordering — replicas that stamp sequences win over
    legacy writes, which is the conservative choice."""
    if not queriers:
        raise ValueError("federated_querier needs at least one store")
    samples = queriers[0].samples
    for q in queriers[1:]:
        samples = samples.unionByName(q.samples, allowMissingColumns=True)
    series = queriers[0].series
    for q in queriers[1:]:
        series = series.unionByName(q.series, allowMissingColumns=True)
    labels = queriers[0].series_labels
    for q in queriers[1:]:
        labels = labels.unionByName(q.series_labels)
    blocks = None
    if all(q.blocks is not None for q in queriers):
        blocks = queriers[0].blocks
        for q in queriers[1:]:
            blocks = blocks.unionByName(q.blocks, allowMissingColumns=True)
    if dedupe:
        samples = merge_on_read(samples)
    return Querier(samples, series.distinct(), labels.distinct(), blocks)


def querier_from_store(spark, path: str) -> Querier:
    """Open a self-describing store — one written by ANY ingest path
    that lands `data/` + a map-form `series/` dim (remote-write
    receiver, exposition shipper, rule materializer) — as a Querier.

    The label vocabulary is discovered once from the series dim
    (O(#distinct label names) driver work, never touches the fact
    table) and widened into label COLUMNS (`__name__` -> `metric`,
    the engine's series-dim convention); the postings table is the
    map exploded. Samples read through the registry-committed data
    dir with merge-on-read left to the caller's selects."""
    from agni_spark.sources import layout

    samples = layout.read_samples(spark, path)
    cols = ["series_id", "ts_ms", "value"] + (
        ["_seq"] if "_seq" in samples.columns else []
    )
    samples = samples.select(*cols)
    ser = spark.read.parquet(f"{path}/series").dropDuplicates(["series_id"])
    names = sorted(
        r.k
        for r in ser.select(
            F.explode(F.map_keys(F.col("labels"))).alias("k")
        ).distinct().collect()
    )
    wide = ser.select(
        "series_id",
        *[
            F.col("labels").getItem(k).alias(
                "metric" if k == "__name__" else k
            )
            for k in names
        ],
    )
    labels_long = ser.select(
        "series_id", F.explode(F.col("labels"))
    ).withColumnsRenamed({"key": "name"})
    return Querier(samples, wide, labels_long)


def ha_dedup(
    samples: DataFrame,
    series: DataFrame,
    replica_label: str = "pod",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """HA-pair deduplication (the Cortex/Mimir distributor's replica
    election, batch form): series identical except for the REPLICA
    label are the same logical series scraped by redundant collectors;
    per (logical series, time window) exactly one replica's samples
    are kept. The elected replica is the lexicographically smallest
    replica value present in that window — a deterministic stand-in
    for the distributor's lease (which elects whoever wrote first;
    order of arrival doesn't exist in batch).

    Output: (series_id of the elected replica's series, ts_ms, value)
    — downstream queries see one series per HA pair per window.

    Spark shape: the logical-series key is a broadcast projection of
    the registry (replica column dropped); election is one min()
    window per (logical key, time bucket); the final semi-join keeps
    only elected (series, window) sample rows. Two small shuffles on
    the logical key; the samples fact table is never widened."""
    label_cols = [
        c for c in series.columns if c not in ("series_id", replica_label)
    ]
    key = F.concat_ws(
        ",", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in label_cols]
    )
    reg = F.broadcast(
        series.select(
            "series_id",
            key.alias("_lkey"),
            F.coalesce(F.col(replica_label), F.lit("")).alias("_replica"),
        )
    )
    tagged = samples.join(reg, "series_id").withColumn(
        "_w", (F.col("ts_ms") / F.lit(bucket_ms)).cast("long")
    )
    elected = (
        tagged.groupBy("_lkey", "_w")
        .agg(F.min("_replica").alias("_elected"))
    )
    return (
        tagged.join(elected, ["_lkey", "_w"])
        .where(F.col("_replica") == F.col("_elected"))
        .select("series_id", "ts_ms", "value")
    )
