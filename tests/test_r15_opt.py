"""Round-15 optimization pins: tiered speculation in the beam walks.

The walk guards step the speculative prefetch depth DOWN (depth 3 ->
2 -> sequential) instead of sharding the query batch when the
prefetch-inflated state budget would overflow _BEAM_MAX_STATE —
every depth selects byte-identically, so only the action count moves.
"""
from __future__ import annotations

import hashlib
import tempfile

import pytest
from pyspark.sql import functions as F

from agni_spark.functions import simsearch


def _vec(seed, base):
    h = int(hashlib.md5(f"{seed}".encode()).hexdigest()[:12], 16)
    eps = (h / float(1 << 48)) * 0.02 - 0.01
    return [b + eps for b in base]


@pytest.fixture(scope="module")
def hub_index(spark):
    """A stored graph index whose measured hub degree is far above
    knn: 3 appended batches all aiming at node 0 (reverse links)."""
    hub = [1.0] + [0.0] * 7
    rows = [(i, _vec(i, hub if i == 0 else [0.3] * 8)) for i in range(40)]
    base = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    path = tempfile.mkdtemp(prefix="agni_r15_hub_") + "/g"
    simsearch.write_graph_index(base, path, knn=5)
    for b in range(3):
        app = spark.createDataFrame(
            [(100 + b * 20 + j, _vec(1000 + b * 20 + j, hub))
             for j in range(20)],
            "vec_id long, embedding array<double>",
        )
        simsearch.append_graph_index(spark, path, app)
    return base, path


def _count_collects(monkeypatch):
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    calls = {"n": 0}
    orig = CDF.collect

    def counted(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(CDF, "collect", counted)
    return calls, orig


def test_tiered_guard_single_chunk_and_identical(
    spark, hub_index, monkeypatch
):
    base, path = hub_index
    h = simsearch.GraphIndexHandle(spark, path)
    # the hub degree makes the depth-3 budget overflow for this batch:
    # the old guard sharded into single-query chunks here
    deg = h.max_out_degree
    assert deg > 2 * h.knn
    q = base.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    per_q_spec3 = 1 + 3 * 8 * deg * (1 + deg + deg * deg)
    monkeypatch.setattr(simsearch, "_BEAM_MAX_STATE", 4 * per_q_spec3)
    # reference: budget large enough that depth-3 runs the whole batch
    big = simsearch.graph_ann_stored(spark, h, q, k=10, beam=8, hops=3)
    want = [tuple(r) for r in big.collect()]

    # budget that fits 8 queries only on the SEQUENTIAL tier
    # (1 + hops*beam*deg), not on depth 2/3: the walk must step down
    # to one chunk, not shard
    seq_per_q = 1 + 3 * 8 * deg
    monkeypatch.setattr(simsearch, "_BEAM_MAX_STATE", 8 * seq_per_q + 8)
    assert 8 * (1 + 3 * 8 * deg * (1 + deg)) > 8 * seq_per_q + 8
    calls, orig = _count_collects(monkeypatch)
    got = [
        tuple(r)
        for r in orig(
            simsearch.graph_ann_stored(spark, h, q, k=10, beam=8, hops=3)
        )
    ]
    assert got == want
    # ONE chunk on the sequential tier: 1 entry-scoring collect +
    # hops=3 expansion collects, not 4 per query
    assert calls["n"] == 4, calls["n"]


def test_tiered_guard_still_shards_below_sequential_budget(
    spark, hub_index, monkeypatch
):
    base, path = hub_index
    h = simsearch.GraphIndexHandle(spark, path)
    q = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = [
        tuple(r)
        for r in simsearch.graph_ann_stored(
            spark, h, q, k=10, beam=8, hops=3
        ).collect()
    ]
    # the floor: even the sequential tier cannot fit -> single-query
    # chunks, results identical (the r11 contract, unchanged)
    monkeypatch.setattr(simsearch, "_BEAM_MAX_STATE", 1)
    got = [
        tuple(r)
        for r in simsearch.graph_ann_stored(
            spark, h, q, k=10, beam=8, hops=3
        ).collect()
    ]
    assert got == want and len(got) == 30
