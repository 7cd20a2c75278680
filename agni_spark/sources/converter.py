"""TSDB block <-> Spark converter (shipper parity, SURVEY §7 Phase 2).

Write side (tests / fixtures): cut samples into <=120-sample XOR chunks
per series (the reference design point, vendor tsdb chunks/xor.go:75),
write chunk segment files + index + meta.json — a complete block dir.

Read side (the ingest path, replacing `agni shipper` + server sync):
discover block dirs, filter Compaction.Level==1 (S10, shipper.go:22-44),
then DISTRIBUTE the decode: a DataFrame of block paths feeds
mapInPandas workers that each decode their blocks' chunks into sample
rows. At 100 TB this is one task per block (2h of data) — the same
unit of parallelism the reference uses per upload, but fanned across
the cluster; downstream `layout.write_blocks` lands it partitioned.

Worker closures are self-contained (inline imports of the codec
functions via a file-local import indirection is NOT possible without
sys.path, so the codec source is shipped through cloudpickle by
value: the helpers below are defined at call time inside the
generator).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from agni_spark.sources import tsdb_format as tf

SAMPLES_PER_CHUNK = 120  # design point, xor.go:75-77
SEGMENT_MAX_BYTES = tf.SEGMENT_MAX_BYTES  # enforced in write_chunk_segments


def write_block(
    block_dir: str,
    series: list[tuple[dict[str, str], list[tuple[int, float]]]],
    ulid: str,
    level: int = 1,
    stones: list[tuple[dict[str, str], int, int]] | None = None,
) -> None:
    """Materialize one TSDB block dir: chunks/000001, index, meta.json
    (delegates to the self-contained tsdb_format.write_block_dir so the
    same code runs inside distributed export workers). `stones` are
    (labels, mint_ms, maxt_ms) deletion intervals, written as the
    block's binary `tombstones` file (vendor tombstones.go:41-84) —
    the label set is resolved to its series ref via the just-written
    index, the same uint64 the reference's Stone.ref carries."""
    tf.write_block_dir(block_dir, series, ulid, level)
    if stones:
        by_labels = {
            tuple(sorted(labels.items())): ref
            for ref, labels, _ in tf.read_index_series(
                os.path.join(block_dir, "index")
            )
        }
        tf.write_tombstones(
            block_dir,
            [
                (by_labels[tuple(sorted(labels.items()))], mint, maxt)
                for labels, mint, maxt in stones
            ],
        )


def discover_blocks(root: str, level: int | None = 1) -> list[str]:
    """Block discovery (db.go:62-122): dirs with a valid meta.json;
    optional Compaction.Level filter (S10). Sorted by ULID."""
    out = []
    for name in sorted(os.listdir(root)):
        meta_path = os.path.join(root, name, "meta.json")
        if not os.path.exists(meta_path):
            continue
        meta = tf.read_meta(meta_path)
        if level is not None and meta["compaction"]["level"] != level:
            continue
        out.append(os.path.join(root, name))
    return out


def read_block_samples(block_dir: str) -> list[tuple[dict[str, str], int, float]]:
    """Decode one block into (labels, t_ms, value) rows (driverless
    helper used by both the local tests and the distributed reader).
    Applies the block's `tombstones` file: samples inside a series'
    deleted intervals (inclusive both ends, vendor tombstones.go:161)
    are excluded, matching the reference's deletedIterator
    (vendor tsdb querier.go chunk read path)."""
    entries = tf.read_index_series(os.path.join(block_dir, "index"))
    stones = tf.read_tombstones(block_dir)
    chunks_dir = os.path.join(block_dir, "chunks")
    rows = []
    for ref, labels, chunks in entries:
        dead = stones.get(ref, [])
        for cm in chunks:
            # ref = segment<<32 | offset (chunks.go:113-116): chunks
            # past segment 000001 must resolve too
            data = tf.read_chunk_at(
                tf.segment_path(chunks_dir, cm.ref), cm.ref & 0xFFFFFFFF
            )
            for t, v in tf.decode_xor_chunk(data):
                if any(mint <= t <= maxt for mint, maxt in dead):
                    continue
                rows.append((labels, t, v))
    return rows


def spark_read_tsdb_blocks(
    spark: SparkSession, root: str, level: int | None = 1
) -> DataFrame:
    """Distributed block ingest: one task per block decodes its chunks
    into rows (labels_json, ts_ms, value). The decode source is shipped
    by value inside the closure — workers never import agni_spark."""
    blocks = discover_blocks(root, level)
    paths_df = spark.createDataFrame(
        [(p,) for p in blocks], "block_dir string"
    ).repartition(max(1, len(blocks)))

    # Capture the codec module's source and re-materialize it inside the
    # worker: keeps byte-level decode out of the driver AND avoids any
    # sys.path requirement on workers.
    import inspect

    from agni_spark.sources import tsdb_format as _tf

    codec_src = inspect.getsource(_tf)

    def gen(batches):
        import json as _json
        import os as _os
        import sys as _sys
        import types

        import pandas as _pd

        mod = _sys.modules.get("_tsdb_codec")
        if mod is None:
            mod = types.ModuleType("_tsdb_codec")
            # dataclass decorators introspect sys.modules[cls.__module__]
            _sys.modules["_tsdb_codec"] = mod
            exec(compile(codec_src, "_tsdb_codec", "exec"), mod.__dict__)

        for pdf in batches:
            out = []
            for block_dir in pdf["block_dir"]:
                entries = mod.read_index_series(_os.path.join(block_dir, "index"))
                stones = mod.read_tombstones(block_dir)
                chunks_dir = _os.path.join(block_dir, "chunks")
                for ref, labels, chunks in entries:
                    lbl = _json.dumps(labels, sort_keys=True)
                    dead = stones.get(ref, [])
                    for cm in chunks:
                        data = mod.read_chunk_at(
                            mod.segment_path(chunks_dir, cm.ref),
                            cm.ref & 0xFFFFFFFF,
                        )
                        for t, v in mod.decode_xor_chunk(data):
                            if any(m0 <= t <= m1 for m0, m1 in dead):
                                continue
                            out.append((lbl, t, v))
            yield _pd.DataFrame(
                out, columns=["labels_json", "ts_ms", "value"]
            )

    return paths_df.mapInPandas(gen, "labels_json string, ts_ms long, value double")


def spark_write_tsdb_blocks(
    df: DataFrame,
    out_root: str,
    block_ms: int = 7_200_000,
    level: int = 1,
) -> DataFrame:
    """Distributed EXPORT: write (labels_json, ts_ms, value) rows back
    out as real TSDB block dirs — one block per 2h window, one task per
    block (the reference's unit of work, inverted: instead of shipping
    Prometheus blocks to the store, the store materializes blocks that
    Prometheus tooling reads). Each worker writes chunks (XOR,
    CRC-32C), a v1 binary index, and meta.json last (marker-file
    ordering). Returns a summary DataFrame (block_id, ulid, n_series,
    n_samples); `out_root` must be shared storage.

    Scale: one groupBy on block_id (2h of data per group — bounded by
    design, same as a Prometheus block); blocks export in parallel
    across the cluster. Workers never import agni_spark — the codec
    module ships by source."""
    import inspect

    from pyspark.sql import functions as F

    codec_src = inspect.getsource(tf)
    out = df.withColumn(
        "block_id", F.expr(f"CAST(ts_ms div {block_ms} AS BIGINT)")
    )

    def gen(key, pdf):
        import json as _json
        import os as _os
        import sys as _sys
        import types

        import pandas as _pd

        mod = _sys.modules.get("_tsdb_codec")
        if mod is None:
            mod = types.ModuleType("_tsdb_codec")
            _sys.modules["_tsdb_codec"] = mod
            exec(compile(codec_src, "_tsdb_codec", "exec"), mod.__dict__)

        (block_id,) = key
        series: dict[str, list] = {}
        for lbl, ts, v in zip(pdf["labels_json"], pdf["ts_ms"], pdf["value"]):
            series.setdefault(lbl, []).append((int(ts), float(v)))
        entries = [
            (_json.loads(lbl), sorted(samples))
            for lbl, samples in sorted(series.items())
        ]
        ulid = f"BLK{int(block_id):023d}"
        mod.write_block_dir(
            _os.path.join(out_root, ulid), entries, ulid, level
        )
        return _pd.DataFrame(
            {
                "block_id": [int(block_id)],
                "ulid": [ulid],
                "n_series": [len(entries)],
                "n_samples": [int(len(pdf))],
            }
        )

    return out.groupBy("block_id").applyInPandas(
        gen, "block_id long, ulid string, n_series long, n_samples long"
    )
