"""Physical storage layout: TSDB blocks as time-partitioned Parquet.

Reference mapping (SURVEY §1.4, §3.2-3.3):
- block (2h ULID dir of index+chunks+meta)  -> `block_id=<n>` partition
  of a parquet table, block_id = ts_ms div block_ms (vendor tsdb
  db.go:49: 2h base range)
- chunk (<=120-sample compressed column)    -> parquet row group; files
  are sorted by (series_id, ts_ms) so row-group min/max stats give the
  same chunk-level time pruning as ChunkMeta (agni querier.go:510-548)
- meta.json + S3 marker key commit protocol (shipper.go:252-325,
  marker-last ordering) -> the partition write is made visible by
  appending its row to the block REGISTRY parquet last; readers list
  the registry, not the data dir (db.go:72 lists markers, not data)
- block discovery loop (db.go:62-122)       -> re-read the registry
- overlap validation (db.go:206-220)        -> querier.validate_block_sequence
- level-1 ship filter (shipper.go:22-44)    -> `level` column filter

Scale: partitioning on block_id gives partition pruning for time
predicates; sortWithinPartitions(series_id, ts_ms) gives row-group
skipping within a block for series-selective queries. At 100 TB,
`block_ms` stays 2h (fixed partition count per day) and files per
partition scale with cluster width; compaction (below) keeps file
counts bounded — exactly the reference's compaction tiers, expressed
as a rewrite."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agni_spark.datamodel import BLOCK_MS


def block_id_col(block_ms: int = BLOCK_MS):
    return F.expr(f"CAST(ts_ms div {block_ms} AS BIGINT)")


# ---------------------------------------------------------------------------
# filesystem abstraction: all store mutation goes through the Hadoop
# FileSystem API so the SAME code runs against file://, hdfs:// and
# s3a:// (the reference is S3-native end-to-end — block.go:20-43,
# shipper.go:252-325; a driver-side os.listdir/shutil lifecycle would
# not). Listing for discovery still never touches the data dir: readers
# enumerate blocks from the REGISTRY (db.go:72 lists marker keys).
# ---------------------------------------------------------------------------
def _hfs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for `path`'s scheme."""
    jvm = spark.sparkContext._jvm
    jpath_cls = jvm.org.apache.hadoop.fs.Path
    fs = jpath_cls(path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath_cls


def _fs_delete(spark: SparkSession, path: str) -> bool:
    fs, P = _hfs(spark, path)
    return fs.delete(P(path), True)


def _fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, P = _hfs(spark, src)
    return fs.rename(P(src), P(dst))


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, P = _hfs(spark, path)
    return fs.exists(P(path))


def registry_block_ids(spark: SparkSession, path: str) -> list[int]:
    """Committed block ids per the registry — the discovery surface
    (S2). Never lists the data directory."""
    return sorted(
        r.block_id for r in read_registry(spark, path).select("block_id").collect()
    )


# Store files compress with zstd: ~30% smaller than snappy at
# comparable scan speed — at 100 TB that's tens of TB of object-store
# footprint and proportional scan I/O. (Gorilla/XOR plays this role in
# the reference's chunk format; parquet encodings + zstd play it here.)
STORE_COMPRESSION = "zstd"


def write_blocks(
    samples: DataFrame,
    path: str,
    block_ms: int = BLOCK_MS,
    mode: str = "overwrite",
    level: int = 1,
    seq: int | None = None,
) -> None:
    """Shipper-equivalent sink (S9): write samples time-partitioned,
    then commit by (re)writing the registry LAST — the marker-key
    protocol. Files are sorted by (series_id, ts_ms): parquet row
    groups become the 'chunks'.

    `seq` stamps an `_seq` ingest-sequence column (monotone per
    append) so `querier.merge_on_read` can resolve duplicate
    (series, ts) points LAST-INGESTED-WINS, matching TSDB's
    mergedSeriesSet. A pre-existing `_seq` column is carried through
    unchanged. Write a store consistently with or without seq —
    parquet schema inference across mixed partitions would drop the
    column silently."""
    if seq is not None and "_seq" not in samples.columns:
        samples = samples.withColumn("_seq", F.lit(int(seq)).cast("long"))
    data_path = os.path.join(path, "data")
    (
        samples.withColumn("block_id", block_id_col(block_ms))
        .repartition("block_id")
        .sortWithinPartitions("series_id", "ts_ms")
        .write.partitionBy("block_id")
        .option("compression", STORE_COMPRESSION)
        .mode(mode)
        .parquet(data_path)
    )
    # registry written AFTER data = commit point (marker-key-last,
    # shipper.go:311-319)
    refresh_registry(samples.sparkSession, path, block_ms, level)


def refresh_registry(
    spark: SparkSession,
    path: str,
    block_ms: int = BLOCK_MS,
    level: int = 1,
    levels: dict[int, int] | None = None,
) -> None:
    """Rebuild the block registry from the data partitions — the commit
    point of every write (batch shipper, streaming sink, remote-write
    receiver). Readers list the registry, never the data dir (db.go:72
    lists marker keys, not data keys).

    `levels` assigns per-block compaction levels (block_id -> level);
    blocks absent from the map get `level`. This lets compaction bump
    levels in the SAME registry commit instead of a second rewrite."""
    data_path = os.path.join(path, "data")
    reg = (
        spark.read.parquet(data_path)
        # partition-dir inference types block_id as INT; widen before
        # arithmetic (INT * 7_200_000 overflows under ANSI mode)
        .withColumn("block_id", F.col("block_id").cast("long"))
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("num_samples"),
            F.countDistinct("series_id").alias("num_series"),
            F.min("ts_ms").alias("data_mint_ms"),
            F.max("ts_ms").alias("data_maxt_ms"),
        )
        .select(
            F.concat(F.lit("BLK"), F.lpad(F.col("block_id").cast("string"), 23, "0"))
            .alias("ulid"),
            "block_id",
            (F.col("block_id") * block_ms).alias("mint_ms"),
            ((F.col("block_id") + 1) * block_ms).alias("maxt_ms"),
            "num_samples",
            "num_series",
            "data_mint_ms",
            "data_maxt_ms",
            F.lit(level).cast("int").alias("compaction_level"),
        )
    )
    if levels:
        # levels is O(blocks) tiny — broadcast-join it onto the summary
        lv = spark.createDataFrame(
            [(int(b), int(l)) for b, l in sorted(levels.items())],
            "block_id long, lvl int",
        )
        reg = (
            reg.join(F.broadcast(lv), "block_id", "left")
            .withColumn(
                "compaction_level",
                F.coalesce(F.col("lvl"), F.col("compaction_level")).cast("int"),
            )
            .drop("lvl")
            .select(
                "ulid", "block_id", "mint_ms", "maxt_ms", "num_samples",
                "num_series", "data_mint_ms", "data_maxt_ms", "compaction_level",
            )
        )
    reg = reg.repartition(1)
    reg.write.mode("overwrite").parquet(os.path.join(path, "registry"))
    # snapshot history: every commit ALSO lands as an immutable
    # registry_history/version=N partition (after the live registry —
    # the live write stays the commit point; history is the audit/
    # time-travel surface). O(#blocks) rows per version, negligible
    # next to the data.
    vs = registry_versions(spark, path)
    nxt = (max(vs) + 1) if vs else 0
    reg.withColumn("version", F.lit(nxt).cast("long")).write.partitionBy(
        "version"
    ).mode("append").parquet(os.path.join(path, "registry_history"))


def read_samples(spark: SparkSession, path: str) -> DataFrame:
    """Open the block store (S1/S2): one scan over all partitions;
    Catalyst prunes by block_id for time-bounded queries."""
    return spark.read.parquet(os.path.join(path, "data"))


def read_registry(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Block registry = the meta.json/marker listing (S2/S4).
    `version` time-travels to a past commit's registry snapshot
    (see snapshot_samples for what that does and doesn't pin)."""
    if version is None:
        return spark.read.parquet(os.path.join(path, "registry"))
    return (
        spark.read.parquet(os.path.join(path, "registry_history"))
        .where(F.col("version") == int(version))
        .drop("version")
    )


def registry_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed registry snapshot versions, oldest first."""
    hist = os.path.join(path, "registry_history")
    if not _fs_exists(spark, hist):
        return []
    return sorted(
        r.version
        for r in spark.read.parquet(hist).select("version").distinct().collect()
    )


def snapshot_samples(
    spark: SparkSession, path: str, version: int
) -> DataFrame:
    """Time-travel read: the store's samples AS OF registry commit
    `version` — the scan is filtered to that snapshot's block ids
    (partition pruning on the IN list, no data copied at commit time).

    What this pins: block MEMBERSHIP (appends after the snapshot are
    invisible; blocks dropped by retention since then still resolve if
    their partitions remain). What it does not pin: in-place rewrites
    — compaction/delete rewrite block partitions under the same
    block_id, and the snapshot then serves the rewritten bytes (the
    same contract as Prometheus block ULID listings; immutable-rewrite
    stores get full fidelity for free)."""
    ids = [
        r.block_id
        for r in read_registry(spark, path, version).select("block_id").collect()
    ]
    return read_samples(spark, path).where(
        F.col("block_id").cast("long").isin(ids)
    )


def time_pruned(
    df: DataFrame,
    mint_ms: int | None,
    maxt_ms: int | None,
    block_ms: int = BLOCK_MS,
) -> DataFrame:
    """Time-range selection with EXPLICIT partition pruning: the
    block_id predicate prunes whole partitions (the reference's block
    skip, querier.go:25-46); the ts_ms predicate then row-group-skips
    and row-filters inside surviving blocks (P7/P8). Both inclusive."""
    if mint_ms is not None:
        df = df.where(
            (F.col("block_id") >= mint_ms // block_ms)
            & (F.col("ts_ms") >= mint_ms)
        )
    if maxt_ms is not None:
        df = df.where(
            (F.col("block_id") <= maxt_ms // block_ms)
            & (F.col("ts_ms") <= maxt_ms)
        )
    return df


def compact(
    spark: SparkSession,
    path: str,
    block_ids: list[int] | None = None,
    files_per_block: int = 1,
) -> None:
    """Compaction (Phase 4; the reference defers to upstream tsdb
    compact.go and never invokes it — SURVEY §2.7): rewrite each
    partition's many small files into `files_per_block` sorted files.
    Registry is rewritten last in ONE commit with the touched blocks'
    levels bumped (tsdb Compaction.Level semantics).

    Both paths repartition FIRST and sort WITHIN the final partitions —
    sorting before a coalesce would concatenate sorted partitions out
    of order and break the 'row groups = chunks' skipping property.
    All enumeration is registry-driven; no data-dir listing, so the
    same code runs against an object store."""
    data_path = os.path.join(path, "data")
    df = spark.read.parquet(data_path)
    # remember pre-compaction levels so untouched blocks keep theirs
    try:
        old_levels = {
            r.block_id: r.compaction_level
            for r in read_registry(spark, path).collect()
        }
    except Exception:  # no registry yet
        old_levels = {}
    if block_ids is not None:
        df = df.where(F.col("block_id").isin(block_ids))
        compacted = set(block_ids)
    else:
        compacted = set(old_levels) or {
            r.block_id
            for r in df.select("block_id").distinct().collect()
        }
    # (block_id, series-hash salt) partitioning yields exactly
    # `files_per_block` files per block, each internally sorted by
    # (series_id, ts_ms) so row-group min/max skipping holds per file;
    # every block compacts in parallel (no single-task bottleneck).
    salt = F.pmod(F.xxhash64("series_id"), F.lit(max(1, files_per_block)))
    sub = (
        df.repartition(F.col("block_id"), salt)
        .sortWithinPartitions("series_id", "ts_ms")
    )
    sub.write.partitionBy("block_id").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).option("compression", STORE_COMPRESSION).parquet(data_path)
    # commit point: registry rebuilt once, levels bumped ONLY for the
    # blocks this compaction touched
    levels = {
        b: old_levels.get(b, 1) + (1 if b in compacted else 0)
        for b in set(old_levels) | compacted
    }
    refresh_registry(spark, path, block_ms=BLOCK_MS, levels=levels)


def plan_compaction(
    spark: SparkSession,
    path: str,
    factor: int = 3,
    max_level: int = 5,
) -> list[list[int]]:
    """tsdb-style compaction planning (upstream tsdb compact.go Plan —
    the piece agni defers to Prometheus, SURVEY §2.7): exponential
    windows of `factor**level` base blocks; a window is eligible when
    EVERY block in it exists at exactly that level (full window, no
    partial merges). Purely registry-driven metadata work — no data
    read, no FS listing — so planning is O(#blocks) on the driver no
    matter the store size. Returns sorted block-id groups; feed each to
    `compact(block_ids=group)` (levels bump on its registry commit)."""
    reg = read_registry(spark, path).select(
        "block_id", "compaction_level"
    ).collect()
    by_level: dict[int, int] = {r.block_id: r.compaction_level for r in reg}
    plans: list[list[int]] = []
    for level in range(1, max_level):
        w = factor ** level
        windows: dict[int, list[int]] = {}
        for b, lv in by_level.items():
            if lv == level:
                windows.setdefault(b // w, []).append(b)
        for _wid, blocks in sorted(windows.items()):
            if len(blocks) == w:
                plans.append(sorted(blocks))
    return plans


def drop_blocks_before(
    spark: SparkSession, path: str, cutoff_block_id: int
) -> list[int]:
    """Retention: partition drop for blocks entirely before the cutoff
    (VACUUM equivalent — the reference's retention is an S3 prefix
    delete keyed off marker listing, db.go:62-122). Enumeration is
    registry-driven (never lists the data dir) and deletion goes
    through the Hadoop FileSystem API, so the same code runs against
    s3a://. Registry rewritten last (commit point). Returns dropped
    ids."""
    data_path = os.path.join(path, "data")
    dropped = [b for b in registry_block_ids(spark, path) if b < cutoff_block_id]
    for bid in dropped:
        _fs_delete(spark, os.path.join(data_path, f"block_id={bid}"))
    if dropped:
        reg = read_registry(spark, path).where(
            F.col("block_id") >= cutoff_block_id
        )
        reg.cache().count()  # materialize before overwriting the source
        reg.repartition(1).write.mode("overwrite").parquet(
            os.path.join(path, "registry_tmp")
        )
        _fs_delete(spark, os.path.join(path, "registry"))
        _fs_rename(
            spark, os.path.join(path, "registry_tmp"), os.path.join(path, "registry")
        )
    return dropped


def delete_samples(
    spark: SparkSession,
    path: str,
    tombstones: DataFrame,
    block_ms: int = BLOCK_MS,
) -> list[int]:
    """Tombstone WRITE path (P9 upgraded): physically delete samples
    falling inside (series_id, mint_ms, maxt_ms) intervals — the Delta
    DELETE equivalent, strictly stronger than the reference's read-time
    interval filtering (and its server runs with nop tombstones anyway,
    block.go:73-75).

    Scale posture: only blocks whose time range intersects a tombstone
    interval are rewritten (dynamic partition overwrite); untouched
    blocks are never read or written. The tombstone set is tiny ->
    collected once for pruning, broadcast for the anti-join. Returns
    the rewritten block_ids."""
    t = tombstones.select("series_id", "mint_ms", "maxt_ms").cache()
    bounds = t.agg(F.min("mint_ms"), F.max("maxt_ms")).first()
    if bounds[0] is None:
        return []
    intervals = t.collect()
    data_path = os.path.join(path, "data")
    all_blocks = registry_block_ids(spark, path)
    hit = [
        b
        for b in all_blocks
        if any(
            b * block_ms <= iv.maxt_ms and iv.mint_ms < (b + 1) * block_ms
            for iv in intervals
        )
    ]
    if not hit:
        return []
    df = spark.read.parquet(data_path).where(F.col("block_id").isin(hit))
    cond = (
        (df["series_id"] == t["series_id"])
        & (df["ts_ms"] >= t["mint_ms"])
        & (df["ts_ms"] <= t["maxt_ms"])
    )
    kept = df.join(F.broadcast(t), cond, "left_anti")
    (
        kept.repartition("block_id")
        .sortWithinPartitions("series_id", "ts_ms")
        .write.partitionBy("block_id")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", STORE_COMPRESSION)
        .parquet(data_path)
    )
    refresh_registry(spark, path, block_ms)
    return sorted(hit)


def write_bucketed(
    samples: DataFrame,
    series: DataFrame,
    table_prefix: str,
    n_buckets: int = 32,
) -> None:
    """Bucketed variant of the store (co-located joins): both tables
    hash-bucketed on series_id, so samples JOIN series plans with ZERO
    shuffle on either side (asserted in test_plans). This is the 100 TB
    answer to repeated series-dim joins (PromQL aggregate_by, serving
    matrix assembly): pay the bucketing once at write, never shuffle
    the fact table again.

    Uses saveAsTable (bucket metadata lives in the session catalog —
    Spark cannot express bucketing through path-only writes). Stale
    warehouse directories from prior sessions are removed first: the
    catalog is session-scoped but its file locations persist, and
    saveAsTable refuses to reuse an orphaned location."""
    from urllib.parse import urlparse

    spark = samples.sparkSession
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for suffix in ("samples", "series"):
        name = f"{table_prefix}_{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = os.path.join(warehouse, name.lower())
        if _fs_exists(spark, loc):
            _fs_delete(spark, loc)
    (
        samples.write.bucketBy(n_buckets, "series_id")
        .sortBy("series_id", "ts_ms")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{table_prefix}_samples")
    )
    (
        series.write.bucketBy(n_buckets, "series_id")
        .sortBy("series_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(f"{table_prefix}_series")
    )


def repair_overlaps(spark: SparkSession, path: str, block_ms: int = BLOCK_MS) -> int:
    """Overlap REPAIR — the remedy the reference lacks: agni rejects a
    block set with overlapping time ranges outright (db.go:206-220,
    validateBlockSequence) and upstream tsdb needs vertical compaction.
    Here: re-bucket every sample to the canonical block grid, resolve
    duplicate (series, ts) collisions merge-on-read style (max value),
    and rewrite the store; the result is by construction non-overlapping
    with registry recommit. Returns the number of rows after repair."""
    from agni_spark.querier import merge_on_read

    cols = ["series_id", "ts_ms", "value"]
    df = read_samples(spark, path)
    # keep the ingest sequence when the store has one: the repair then
    # resolves collisions last-ingested-wins instead of max-value
    df = df.select(*cols, *(["_seq"] if "_seq" in df.columns else []))
    clean = merge_on_read(df)
    # Spark cannot overwrite its own lazy input: repair lands in a
    # staging store first, then swaps in (the write itself is the
    # barrier that materializes `clean` from the OLD files)
    stage = path.rstrip("/") + "_repair"
    write_blocks(clean, stage, block_ms=block_ms, mode="overwrite")
    n = read_samples(spark, stage).count()
    _fs_delete(spark, path)
    _fs_rename(spark, stage, path)
    return n


def vacuum_store(spark: SparkSession, path: str) -> list[int]:
    """GC orphaned data partitions: block dirs present under `data/`
    but ABSENT from the registry — exactly the debris a crashed write
    leaves behind under the marker-key-last protocol (data landed,
    registry rewrite never happened, so no reader has ever seen them).
    This is the one lifecycle op that MUST list the data dir (orphans
    are by definition unlisted); everything goes through the Hadoop
    FileSystem API so it runs against s3a:// unchanged. Registry is
    untouched — vacuum removes only what was never committed. Returns
    the orphaned block ids removed."""
    data_path = os.path.join(path, "data")
    fs, P = _hfs(spark, data_path)
    if not fs.exists(P(data_path)):
        return []
    committed = set(registry_block_ids(spark, path))
    removed = []
    for st in fs.listStatus(P(data_path)):
        name = st.getPath().getName()
        if not name.startswith("block_id="):
            continue
        bid = int(name.split("=", 1)[1])
        if bid not in committed:
            _fs_delete(spark, os.path.join(data_path, name))
            removed.append(bid)
    return sorted(removed)


# ---------------------------------------------------------------------------
# multi-tenancy: one REGISTRY-COMMITTED store per tenant under a common
# root (the Cortex/Thanos layout — tenant isolation is directory
# isolation, so per-tenant retention/compaction/vacuum reuse the
# single-store ops unchanged and a tenant's query can never scan
# another tenant's bytes).
# ---------------------------------------------------------------------------
_TENANT_OK = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"


def tenant_path(root: str, tenant: str) -> str:
    """Validated per-tenant store path (reject separators — a tenant
    name must never traverse out of the root)."""
    if not tenant or any(c not in _TENANT_OK for c in tenant):
        raise ValueError(f"invalid tenant name {tenant!r}")
    return os.path.join(root, f"tenant={tenant}")


def write_tenant_blocks(
    samples: DataFrame, root: str, tenant: str, **kwargs
) -> None:
    write_blocks(samples, tenant_path(root, tenant), **kwargs)


def tenants(spark: SparkSession, root: str) -> list[str]:
    fs, P = _hfs(spark, root)
    if not fs.exists(P(root)):
        return []
    return sorted(
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(P(root))
        if st.getPath().getName().startswith("tenant=")
    )


def cross_tenant_samples(
    spark: SparkSession, root: str, only: list[str] | None = None
) -> DataFrame:
    """Federated read across tenants, each row tagged with its tenant
    (the cross-tenant admin/billing query shape). The union is lazy —
    per-tenant scans keep their own pruning, and an `only` list is a
    directory choice, not a filter over everyone's data."""
    names = only if only is not None else tenants(spark, root)
    if not names:
        raise ValueError("no tenants found")
    parts = [
        read_samples(spark, tenant_path(root, t)).withColumn(
            "tenant", F.lit(t)
        )
        for t in names
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def audit_store(spark: SparkSession, path: str) -> DataFrame:
    """Integrity audit: reconcile the registry against the data
    partitions — per block, registered vs actual sample/series counts.
    status: 'ok' (counts match), 'count_mismatch' (tampered/partial
    partition), 'missing_data' (registered block with no partition —
    lost data), 'uncommitted' (partition with no registry row — vacuum
    candidate). One scan + one tiny full-outer join; run it after any
    lifecycle operation or on a schedule against s3a:// unchanged."""
    reg = read_registry(spark, path).select(
        "block_id",
        F.col("num_samples").alias("reg_samples"),
        F.col("num_series").alias("reg_series"),
    )
    actual = (
        read_samples(spark, path)
        .withColumn("block_id", F.col("block_id").cast("long"))
        .groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("act_samples"),
            F.countDistinct("series_id").alias("act_series"),
        )
    )
    joined = reg.join(actual, "block_id", "full_outer")
    status = (
        F.when(F.col("reg_samples").isNull(), F.lit("uncommitted"))
        .when(F.col("act_samples").isNull(), F.lit("missing_data"))
        .when(
            (F.col("reg_samples") == F.col("act_samples"))
            & (F.col("reg_series") == F.col("act_series")),
            F.lit("ok"),
        )
        .otherwise(F.lit("count_mismatch"))
    )
    return joined.select(
        "block_id", "reg_samples", "act_samples", "reg_series", "act_series",
        status.alias("status"),
    ).orderBy("block_id")


def rollback_store(spark: SparkSession, path: str, version: int) -> None:
    """Restore the LIVE registry to a historical snapshot — the undo
    for a bad compaction/retention/ingest commit (data partitions are
    untouched; blocks the snapshot doesn't list become orphans that
    `vacuum_store` can then GC, and blocks it lists must still exist —
    validated before anything is overwritten). The restore itself
    lands with the same tmp+rename commit as every registry rewrite,
    and is recorded as a NEW history version (audit trail keeps
    moving forward — time travel, not history rewriting)."""
    snap = read_registry(spark, path, version)
    snap.cache().count()
    want = [r.block_id for r in snap.select("block_id").collect()]
    data_path = os.path.join(path, "data")
    missing = [
        b for b in want
        if not _fs_exists(spark, os.path.join(data_path, f"block_id={b}"))
    ]
    if missing:
        raise ValueError(
            f"cannot roll back to version {version}: data partitions "
            f"missing for blocks {missing}"
        )
    snap.repartition(1).write.mode("overwrite").parquet(
        os.path.join(path, "registry_tmp")
    )
    _fs_delete(spark, os.path.join(path, "registry"))
    _fs_rename(
        spark, os.path.join(path, "registry_tmp"), os.path.join(path, "registry")
    )
    vs = registry_versions(spark, path)
    nxt = (max(vs) + 1) if vs else 0
    snap.withColumn("version", F.lit(nxt).cast("long")).write.partitionBy(
        "version"
    ).mode("append").parquet(os.path.join(path, "registry_history"))


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-dimensional file/row-group pruning
# ---------------------------------------------------------------------------
def morton_col(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative int columns
    (truncated to `bits` bits each): bit i of x lands at position 2i,
    bit i of y at 2i+1. Pure shift/mask arithmetic — constant-folded
    into whole-stage codegen, no UDF."""
    xm = F.col(x) if isinstance(x, str) else x
    ym = F.col(y) if isinstance(y, str) else y
    xm = xm.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = ym.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def zorder_write(
    df: DataFrame, path: str, c1: str, c2: str,
    n_files: int = 16, bits: int = 16, sample_rows: int = 1_000_000,
) -> None:
    """Write `df` clustered on the Morton curve of (c1, c2): range-
    partition on the z value, sort within files, drop the helper
    column. The effect is the Delta/Iceberg OPTIMIZE ZORDER layout:
    parquet footer min/max on BOTH columns become tight per file/row
    group, so a 2-D rectangle predicate skips most files — linear
    sorting can only ever prune one of the two dimensions. The write
    itself is one range shuffle; no reader-side change is needed
    (pruning falls out of ordinary parquet stats + pushed filters).

    Range boundaries: RangePartitioner normally *samples* ~100 rows
    per input partition, so file boundaries (and thus which files a
    slab predicate touches) shift run to run. We raise
    sampleSizePerPartition for the duration of this write so that any
    input partition up to `sample_rows` rows is sketched exhaustively
    — boundaries become the exact _z quantiles, and the layout is
    deterministic for a given input. At 100 TB the sketch is still
    bounded (sample_rows per partition, collected once on the driver),
    the same knob Delta/Iceberg OPTIMIZE jobs turn."""
    spark = df.sparkSession
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(sample_rows))
    try:
        (
            df.withColumn("_z", morton_col(c1, c2, bits))
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
