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
    # round-15: both _nearest_centroids paths are now literal-inlined
    # pure projections (array_max / sort_array over per-centroid score
    # structs) — pin them against the original r13 crossJoin + rank
    # window shape, rebuilt inline here as the reference
    from pyspark.sql import Window

    emb = spark.read.parquet(EMB)
    cents = simsearch.ivf_centroids(emb, 8)
    df = emb.select("vec_id", F.col("embedding").alias("ce"))
    fast = simsearch._nearest_centroids(df, cents, "vec_id", "ce", 1)
    ranked = simsearch._nearest_centroids(
        df, cents, "vec_id", "ce", 2, keep_rank=True
    )
    assert fast.columns == ranked.drop("rn").columns

    def _sq_norm(col):
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )

    cents2 = cents.select(
        "centroid_id", "cvec", _sq_norm(F.col("cvec")).alias("_nb")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("ce"), F.col("cvec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    ref = (
        df.withColumn("_na", _sq_norm(F.col("ce")))
        .crossJoin(F.broadcast(cents2))
        .withColumn(
            "sim", F.round(dot / F.sqrt(F.col("_na") * F.col("_nb")), 6)
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("vec_id", "centroid_id", "rn")
    )
    got_rank = _rows(ranked.select("vec_id", "centroid_id", "rn"))
    assert got_rank == _rows(ref)
    a = _rows(fast.select("vec_id", "centroid_id"))
    b = _rows(ref.where("rn = 1").select("vec_id", "centroid_id"))
    assert a == b
    # and the assignment is a pure projection: zero exchanges
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    cents.unpersist()


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
    # round-14: the own-cell top-1 inside graph_entry_medoids became a
    # max_by aggregation; round-15: a literal-inlined pure projection
    # (keep_sim path of _nearest_centroids). Pin it against the
    # original rank-window shape (same idiom as the pin above).
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
    pins_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    sel = _dist_row_number(df, order, "ord").select("id", "ord")
    got = sorted((r.id, r.ord) for r in sel.collect())
    want = sorted(
        (r.id, r.ord)
        for r in df.withColumn(
            "ord", F.row_number().over(Window.orderBy(*order))
        ).select("id", "ord").collect()
    )
    assert got == want
    # round-15 shape assertions on the EXECUTED adaptive plan: ONE
    # data-proportional exchange (the range repartition), served to
    # both the data pass and the offset counts by runtime exchange
    # reuse (the counts MUST see the same partitioning the data pass
    # sees — correctness, not just speed: a re-sampled range exchange
    # could draw different bounds); no second hashpartitioning(_pid)
    # exchange; and the operator pins nothing (the r14 persist+collect
    # shape leaked its ranged frame into the session until bench._cold
    # scrubbed it)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    assert final.count("+- Exchange rangepartitioning") == 1
    assert "ReusedExchange" in final
    assert "hashpartitioning(_pid" not in final
    pins_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert pins_after == pins_before  # the operator pins nothing


def test_dist_ntile_matches_global_ntile(spark):
    from pyspark.sql import Window

    from agni_spark.functions.relational import _dist_ntile

    for nrows, k in ((997, 5), (996, 4), (3, 5)):
        df = spark.range(0, nrows).select(
            F.col("id"),
            (F.col("id") * 37 % 101).alias("a"),
        )
        order = [F.col("a").desc_nulls_last(), F.col("id")]
        got = sorted(
            (r.id, r.q)
            for r in _dist_ntile(df, order, k, "q").collect()
        )
        want = sorted(
            (r.id, r.q)
            for r in df.withColumn(
                "q", F.ntile(k).over(Window.orderBy(*order))
            ).collect()
        )
        assert got == want, f"nrows={nrows} k={k}"


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
