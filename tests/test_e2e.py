"""SURVEY §5 item 5 — the full lifecycle, end to end:

TSDB blocks on disk (XOR chunks + index + meta, written by the
converter's own encoder) -> distributed decode (spark_read_tsdb_blocks)
-> block-store write (time-partitioned, registry commit) -> Querier
matcher selection -> remote-read protocol over real HTTP -> Matrix.

The cross-block series is the key assertion (M1/M2): one series whose
samples span two blocks must come back as ONE TimeSeries with chained,
time-ordered samples.
"""

from __future__ import annotations

import urllib.request

import pytest
from pyspark.sql import functions as F

from agni_spark.protocol import remote_pb as pb
from agni_spark.protocol import snappy_codec as snappy
from agni_spark.protocol.server import RemoteReadServer
from agni_spark.querier import Querier
from agni_spark.sources import converter, layout

BLOCK_MS = 7_200_000


def test_full_lifecycle_tsdb_to_matrix(spark, tmp_path):
    # 1. two sealed level-1 TSDB blocks; series "up{job=api}" spans both
    root = tmp_path / "tsdb"
    blk = lambda i, series: converter.write_block(  # noqa: E731
        str(root / f"01BLK{i}"), series, f"01BLK{i}", level=1
    )
    blk(
        0,
        [
            ({"__name__": "up", "job": "api"}, [(1_000, 1.0), (2_000, 2.0)]),
            ({"__name__": "up", "job": "web"}, [(1_500, 7.0)]),
        ],
    )
    blk(
        1,
        [
            (
                {"__name__": "up", "job": "api"},
                [(BLOCK_MS + 1_000, 3.0), (BLOCK_MS + 2_000, 4.0)],
            ),
        ],
    )

    # 2. distributed decode + store write (registry commit last)
    decoded = converter.spark_read_tsdb_blocks(spark, str(root), level=1)
    assert decoded.count() == 5
    with_ids = decoded.withColumn(
        "series_id",
        F.conv(F.substring(F.md5("labels_json"), 1, 15), 16, 10).cast("long"),
    )
    store = str(tmp_path / "store")
    layout.write_blocks(
        with_ids.select("series_id", "ts_ms", "value"), store
    )
    reg = layout.read_registry(spark, store)
    assert sorted(r.block_id for r in reg.collect()) == [0, 1]

    # 3. querier over the store (series dim from the decoded labels)
    series = (
        with_ids.select(
            "series_id",
            F.get_json_object("labels_json", "$.__name__").alias("metric"),
            F.get_json_object("labels_json", "$.job").alias("job"),
        )
        .distinct()
    )
    labels_long = series.select(
        "series_id", F.lit("__name__").alias("name"), F.col("metric").alias("value")
    ).unionByName(
        series.select(
            "series_id", F.lit("job").alias("name"), F.col("job").alias("value")
        )
    )
    q = Querier(layout.read_samples(spark, store), series, labels_long)

    # 4. remote read over real HTTP, spanning both blocks
    srv = RemoteReadServer(q)
    srv.start()
    try:
        req = pb.ReadRequest(
            queries=[
                pb.Query(
                    start_ms=0,
                    end_ms=2 * BLOCK_MS,
                    matchers=[pb.LabelMatcher(0, "job", "api")],
                )
            ]
        )
        http_req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/read",
            data=snappy.compress(pb.encode_read_request(req)),
            method="POST",
        )
        with urllib.request.urlopen(http_req) as resp:
            body = resp.read()
        matrix = pb.decode_read_response(snappy.decompress(body)).results[0]
    finally:
        srv.stop()

    # 5. ONE chained series, label-sorted, samples time-ordered across
    # the block boundary (M1/M2)
    assert len(matrix) == 1
    ts = matrix[0]
    assert ("__name__", "up") in ts.labels and ("job", "api") in ts.labels
    assert ts.samples == [
        (1.0, 1_000),
        (2.0, 2_000),
        (3.0, BLOCK_MS + 1_000),
        (4.0, BLOCK_MS + 2_000),
    ]


def test_queries_dict_has_no_duplicate_keys():
    """The first 50 entries of queries() are the driver-checked window
    — a positional contract. A duplicate key later in the dict literal
    silently drops one binding and can silently diverge; guard at the
    AST level (runtime dict construction can't see literal dups)."""
    import ast
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "queries",
            "oracle_sql",
        ):
            for stmt in ast.walk(node):
                if isinstance(stmt, ast.Dict):
                    keys = [
                        k.value
                        for k in stmt.keys
                        if isinstance(k, ast.Constant)
                    ]
                    dups = sorted(
                        {k for k in keys if keys.count(k) > 1}
                    )
                    assert not dups, f"duplicate keys in {node.name}: {dups}"
