"""Round-14 optimization equivalence pins: every rewrite that changed
an operator's internals must produce byte-identical results to the
shape it replaced (the driver re-hashes every declared query, so
"faster but different" is a regression by definition).

Covers:
  * _nearest_centroids n=1 — max_by aggregation vs the rank window
  * knn_graph — fused single-ranked-pass vs ivf_ann(corpus, corpus)
  * text._bucket_pred — foldable bucket routing vs the collected ids
  * _ivfpq_train with_v assignment — carried subvector vs re-join
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from agni_spark.functions import simsearch, text

EMB = "/root/testdata/sf0.001/embeddings.parquet"
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_nearest_centroids_maxby_matches_window(spark):
    emb = spark.read.parquet(EMB)
    cents = simsearch.ivf_centroids(emb, 8)
    df = emb.select("vec_id", F.col("embedding").alias("ce"))
    fast = simsearch._nearest_centroids(df, cents, "vec_id", "ce", 1)
    # the window shape the aggregate replaced: keep_rank forces the
    # rank-window path even for n=1
    slow = simsearch._nearest_centroids(
        df, cents, "vec_id", "ce", 1, keep_rank=True
    ).drop("rn")
    assert fast.columns == slow.columns
    a = _rows(fast.select("vec_id", "centroid_id"))
    b = _rows(slow.select("vec_id", "centroid_id"))
    assert a == b


def test_knn_graph_matches_ivf_ann_self_query(spark):
    emb = spark.read.parquet(EMB)
    fused = simsearch.knn_graph(emb, k=5)
    via_ivf = simsearch.ivf_ann(
        emb,
        emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=5, n_centroids=8, nprobe=2,
    )
    assert _rows(fused) == _rows(via_ivf)


def test_bucket_pred_routes_like_collected_buckets(spark):
    docs = spark.read.parquet(DOCS)
    path = tempfile.mkdtemp(prefix="r14_bucket_")
    text.write_text_index(docs, path, n_buckets=16)
    terms = ["spark", "query", "fast"]
    # collected routing (the old per-probe job)
    buckets = sorted(
        {
            r.bucket
            for r in spark.createDataFrame([(t,) for t in terms], "w string")
            .select(
                F.pmod(F.xxhash64("w"), F.lit(16)).cast("int").alias("bucket")
            )
            .collect()
        }
    )
    scan = spark.read.parquet(f"{path}/postings")
    via_pred = scan.where(text._bucket_pred(terms, 16))
    via_ids = scan.where(F.col("bucket").isin(buckets))
    assert _rows(via_pred) == _rows(via_ids)
    # and the predicate constant-folds into the scan's partition
    # filters — static pruning, no job
    plan = via_pred._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_bm25_indexed_still_matches_scan_bm25(spark):
    docs = spark.read.parquet(DOCS)
    path = tempfile.mkdtemp(prefix="r14_bm25_")
    text.write_text_index(docs, path, n_buckets=16)
    terms = ["spark", "query", "fast"]
    served = text.bm25_topk_indexed(spark, path, terms, k=10)
    scanned = text.bm25_topk(docs, terms, k=10)
    assert _rows(served) == _rows(scanned)


def test_graph_entry_medoids_maxby_matches_window(spark):
    # round-14: the own-cell top-1 inside graph_entry_medoids is a
    # max_by aggregation; pin it against the rank-window shape it
    # replaced (same idiom as the _nearest_centroids pin above)
    from pyspark.sql import Window

    emb = spark.read.parquet(EMB)
    cents = simsearch.ivf_centroids(emb, 8)
    fast = simsearch.graph_entry_medoids(emb, 8, centroids=cents)
    sims = (
        emb.select("vec_id", F.col("embedding").alias("ce"))
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "centroid_id",
            F.round(
                simsearch.cosine(F.col("ce"), F.col("cvec")), 6
            ).alias("sim"),
        )
    )
    own = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    slow = (
        sims.withColumn("rn", F.row_number().over(own))
        .where(F.col("rn") == 1)
        .groupBy("centroid_id")
        .agg(
            F.min_by(
                "vec_id",
                F.struct((-F.col("sim")).alias("ns"), F.col("vec_id")),
            ).alias("node")
        )
        .select("node")
        .distinct()
    )
    assert _rows(fast) == _rows(slow)
    cents.unpersist()


def test_ivfpq_train_cells_match_direct_assignment(spark):
    # round-14: _ivfpq_train now serves the (vec_id, centroid_id)
    # assignment from the persisted residual table instead of
    # re-running the corpus assignment pass per consumer — pin that
    # the served pairs are identical to a direct fresh assignment
    emb = spark.read.parquet(EMB)
    cents, cells, cb, codes, release = simsearch._ivfpq_train(
        emb, n_centroids=8, m=4, ksub=8, lloyd_rounds=1
    )
    direct = simsearch._nearest_centroids(
        emb.select("vec_id", F.col("embedding").alias("ce")),
        cents, "vec_id", "ce", 1,
    )
    assert _rows(cells.select("vec_id", "centroid_id")) == _rows(
        direct.select("vec_id", "centroid_id")
    )
    for df in release:
        df.unpersist()
    cents.unpersist()


def test_ivfpq_train_zero_rounds_still_serves_seed_codebook(spark):
    # round-14: the eager per-round codebook pin must not break the
    # lloyd_rounds=0 (seed-only) path — the seed codebook is persisted
    # and codes stay one-per-(vec, sub)
    emb = spark.read.parquet(EMB)
    cents, cells, cb, codes, release = simsearch._ivfpq_train(
        emb, n_centroids=8, m=4, ksub=8, lloyd_rounds=0
    )
    got = sorted(
        (int(r.vec_id), int(r.sub), int(r.cid)) for r in codes.collect()
    )
    assert got and len(got) == len({(v, s) for v, s, _ in got})
    assert cb.storageLevel.useMemory  # the seed codebook is the pin
    for df in release:
        df.unpersist()
    cents.unpersist()


def test_ivfpq_train_assignment_carries_v_unchanged(spark):
    emb = spark.read.parquet(EMB)
    cents, cells, cb, codes, release = simsearch._ivfpq_train(
        emb, n_centroids=8, m=4, ksub=8, lloyd_rounds=1
    )
    got = sorted(
        (int(r.vec_id), int(r.sub), int(r.cid)) for r in codes.collect()
    )
    # the stored-index write path shares this training, and its oracle
    # rows pin the end result; here pin the invariant the with_v
    # rewrite relies on — one assignment per (vec, sub), codes in range
    assert len(got) == len({(v, s) for v, s, _ in got})
    assert all(1 <= c <= 8 for *_, c in got)
    for df in release:
        df.unpersist()


def test_dist_row_number_matches_global_window(spark):
    from pyspark.sql import Window

    from agni_spark.functions.relational import _dist_row_number

    df = spark.range(0, 997).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("a"),
        (F.col("id") % 7).alias("b"),
    )
    order = [F.col("a").desc_nulls_last(), F.col("b"), F.col("id")]
    ranked, n = _dist_row_number(df, order, "ord")
    got = sorted(
        (r.id, r.ord) for r in ranked.select("id", "ord").collect()
    )
    want = sorted(
        (r.id, r.ord)
        for r in df.withColumn(
            "ord", F.row_number().over(Window.orderBy(*order))
        ).select("id", "ord").collect()
    )
    assert n == 997
    assert got == want
    ranked.unpersist()


def test_materialize_ctes_rewrites_only_cte_heads():
    """The oracle-side CTE materialization hint (DuckDB re-inlines a
    plain CTE at every reference, exponential in the walk templates'
    hop count) must touch exactly the `name AS (SELECT|WITH ...)`
    heads: WINDOW clauses and column aliases stay, the rewrite is
    idempotent, and a hinted query returns the same rows as the plain
    one."""
    import duckdb

    import __spark_entry__ as entry

    sql = (
        "WITH a AS (SELECT 1 AS x), "
        "b AS (WITH i AS (SELECT x + 1 AS x FROM a) SELECT * FROM i) "
        "SELECT sum(x) OVER w AS s FROM b "
        "WINDOW w AS (PARTITION BY x) ORDER BY s"
    )
    hinted = entry._materialize_ctes(sql)
    assert hinted.count("AS MATERIALIZED (") == 3  # a, b, i — not w
    assert "w AS MATERIALIZED" not in hinted
    assert entry._materialize_ctes(hinted) == hinted  # idempotent
    assert duckdb.sql(sql).fetchall() == duckdb.sql(hinted).fetchall()


def test_materialize_ctes_leaves_recursive_statements_alone():
    """DuckDB 1.0 returns wrong rows when a MATERIALIZED CTE is read
    from inside a recursive CTE's recursion (the MMR oracle's `sims`
    lookup came back NULL once hinted), so WITH RECURSIVE statements
    must pass through untouched."""
    import __spark_entry__ as entry

    sql = (
        "WITH RECURSIVE base AS (SELECT 1 AS x), "
        "walk AS (SELECT x FROM base UNION ALL "
        "SELECT x + 1 FROM walk WHERE x < 3) SELECT * FROM walk"
    )
    assert entry._materialize_ctes(sql) == sql
    assert entry._materialize_ctes(entry._SQL_MMR_RERANK) == entry._SQL_MMR_RERANK


def test_oracle_sql_is_materialized_everywhere():
    """Every declared non-recursive oracle's CTE heads carry the hint
    (the rewrite runs at oracle_sql() assembly, so no template can
    miss it); recursive statements carry none."""
    import re as _re

    import __spark_entry__ as entry

    plain = _re.compile(
        r"\b[A-Za-z_][A-Za-z0-9_]*\s+AS\s*\(\s*(?=SELECT\b|WITH\b)",
        _re.IGNORECASE,
    )
    recursive = _re.compile(r"\bWITH\s+RECURSIVE\b", _re.IGNORECASE)
    n_rec = 0
    for name, sql in entry.oracle_sql().items():
        if recursive.search(sql):
            n_rec += 1
            assert "MATERIALIZED" not in sql, name
        else:
            assert not plain.search(sql), name
    assert n_rec >= 9  # the recursive walk/cluster/pack templates
