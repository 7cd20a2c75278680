"""Hybrid lexical + vector retrieval: ranked-list fusion (round 11).

The reference engine is a metrics TSDB and ships no retrieval surface —
this module is part of the beyond-reference LLM-pipeline tier: the
serving-side composition every RAG stack runs, fusing the text-index
tier (text.py BM25) with the vector-index tier (simsearch.py ANN) into
one ranked answer. Both fusion methods are public standards:

- Reciprocal Rank Fusion — Cormack, Clarke & Buettcher, SIGIR 2009
  ("Reciprocal rank fusion outperforms Condorcet and individual rank
  learning methods"); the default hybrid combiner in Elasticsearch /
  OpenSearch / Vespa. Score = sum over lists of 1 / (K + rank), K = 60.
- Min-max weighted score fusion — the CombSUM lineage (Fox & Shaw,
  TREC-2): per-list min-max normalization to [0, 1], then a weighted
  sum, so a BM25 score in [0, ~12] and a cosine in [-1, 1] become
  commensurable before blending.

Scale shape: every fusion input is an ALREADY-RANKED top-k' list —
bounded (tens of rows) regardless of corpus size — so the fusion itself
is O(k' x lists) arithmetic with no corpus-sized shuffle anywhere; the
heavy lifting lives in the upstream probes, which prune to posting
buckets (text index) / IVF cell partitions (vector index). The fused
output is a window rank over at most sum(k') rows.

Determinism (cross-engine oracle contract): every per-list contribution
is discretized with floor(x*1e6 + 0.5)/1e6 BEFORE the sum and the sum
is discretized again — the same 6dp two-level floor the BM25 scorer
uses — so IEEE addition order can never flip a rank tie; final ties
break on doc_id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor6(col):
    return F.floor(col * 1e6 + 0.5) / 1e6


def rrf_fuse(
    lists: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Reciprocal Rank Fusion over N ranked lists.

    Each input needs (id_col, rank_col) with rank 1-based; an id absent
    from a list simply contributes nothing for it (the standard RRF
    treatment — no imputed rank). Output: (id_col, rrf, n_lists, rk)
    top-k by fused score, ties on id.

    Spark shape: union of the (bounded) lists -> one tiny groupBy ->
    distributed top-k (orderBy().limit(k) = TakeOrderedAndProject —
    round-14: same shape as text._topk_ranked, so even a caller that
    fuses corpus-proportional lists never funnels them through a
    move-everything window). Nothing here scales with the corpus."""
    from agni_spark.functions.text import _topk_ranked

    contribs = [
        df.select(
            F.col(id_col),
            _floor6(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col)))
            .alias("c"),
        )
        for df in lists
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    tot = u.groupBy(id_col).agg(
        _floor6(F.sum("c")).alias("rrf"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    order = [F.col("rrf").desc(), F.col(id_col).asc()]
    return _topk_ranked(tot, order, k).orderBy("rk")


def weighted_fuse(
    lists: list[DataFrame],
    weights: list[float],
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Min-max weighted score fusion (CombSUM over normalized scores).

    Each list's score column is min-max normalized to [0, 1] over that
    list (a constant-score list normalizes to 1.0 — every member is
    equally 'best'); the fused score is sum(w_i * norm_i) with a
    missing id contributing 0 for that list. Output: (id_col, fused,
    rk) top-k, ties on id.

    The per-list min/max are 2-value aggregates broadcast back into the
    (bounded) list — no window over an unpartitioned corpus, no shuffle
    bigger than the lists themselves."""
    if len(lists) != len(weights):
        raise ValueError("one weight per list")
    parts = []
    for df, wgt in zip(lists, weights):
        mm = df.agg(
            F.min(score_col).alias("lo"), F.max(score_col).alias("hi")
        )
        norm = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
            (F.col(score_col) - F.col("lo")) / (F.col("hi") - F.col("lo"))
        )
        parts.append(
            df.crossJoin(F.broadcast(mm)).select(
                F.col(id_col),
                _floor6(F.lit(float(wgt)) * _floor6(norm)).alias("c"),
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), parts)
    tot = u.groupBy(id_col).agg(_floor6(F.sum("c")).alias("fused"))
    # distributed top-k, not a move-everything window (round-14)
    from agni_spark.functions.text import _topk_ranked

    order = [F.col("fused").desc(), F.col(id_col).asc()]
    return _topk_ranked(tot, order, k).orderBy("rk")


def _rrf_two_way(
    text_hits: DataFrame, vec_hits: DataFrame, k: int, rrf_k: int
) -> DataFrame:
    """Shared 2-list RRF with per-source rank provenance: full-outer
    join of (doc_id, text_rk) x (doc_id, vec_rk), fused score, top-k.
    Output: (doc_id, text_rk, vec_rk, rrf, rk) — the nullable source
    ranks are what a serving caller shows next to each hit."""
    j = text_hits.join(vec_hits, "doc_id", "full_outer")
    contrib = lambda c: F.coalesce(  # noqa: E731 — local scoring lambda
        _floor6(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(c))), F.lit(0.0)
    )
    fused = j.select(
        "doc_id",
        F.col("text_rk").cast("int").alias("text_rk"),
        F.col("vec_rk").cast("int").alias("vec_rk"),
        _floor6(contrib("text_rk") + contrib("vec_rk")).alias("rrf"),
    )
    # distributed top-k, not a move-everything window (round-14)
    from agni_spark.functions.text import _topk_ranked

    order = [F.col("rrf").desc(), F.col("doc_id").asc()]
    return _topk_ranked(fused, order, k).orderBy("rk")


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid search, scan-served: BM25 over `docs` + exact cosine over
    `emb` (query = the embedding of `query_id`, self-match excluded),
    RRF-fused. doc_id and vec_id share an id space (one row per
    document in both tables)."""
    from agni_spark.functions.simsearch import cosine_topk
    from agni_spark.functions.text import bm25_topk

    t = bm25_topk(docs, query_terms, k=k_each).select(
        "doc_id", F.col("rank").alias("text_rk")
    )
    qdf = emb.where(F.col("vec_id") == query_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    v = cosine_topk(emb, qdf, k=k_each).select(
        F.col("vec_id").alias("doc_id"), F.col("rk").alias("vec_rk")
    )
    return _rrf_two_way(t, v, k, rrf_k)


def hybrid_rrf_indexed(
    spark,
    text_index,
    ivf_index,
    query_terms: list[str],
    queries: DataFrame,
    k: int = 10,
    k_each: int = 20,
    nprobe: int = 2,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid search, INDEX-served: the same fusion, but the text side
    probes a stored inverted index (bucket-pruned postings) and the
    vector side probes a stored IVF index (nprobe cell partitions) —
    the actual serving topology, where neither side ever scans a
    corpus. `queries` is a 1-row (query_id, embedding) DataFrame.
    Results match the scan-served fusion whenever the IVF probe's
    recall does (same contract as ivf_ann_stored vs cosine_topk)."""
    from agni_spark.functions.simsearch import ivf_ann_stored
    from agni_spark.functions.text import bm25_topk_indexed

    t = bm25_topk_indexed(spark, text_index, query_terms, k=k_each).select(
        "doc_id", F.col("rk").alias("text_rk")
    )
    v = ivf_ann_stored(spark, ivf_index, queries, k=k_each, nprobe=nprobe)
    v = v.select(F.col("vec_id").alias("doc_id"), F.col("rk").alias("vec_rk"))
    return _rrf_two_way(t, v, k, rrf_k)


# MMR candidate-set guard: the greedy selection is driver-side over a
# parameter-bounded list; N^2 pairwise sims are collected, so refuse
# anything that isn't clearly serving-edge sized
_MMR_MAX_CANDIDATES = 2048


def mmr_rerank(candidates: DataFrame, lam: float = 0.7, k: int = 10):
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR'98): greedily re-rank a top-N candidate list so
    each pick balances relevance against redundancy with what was
    already picked — mmr_i = lam*rel_i - (1-lam)*max_{j in S} sim(i,j)
    (the first pick is argmax rel, scored lam*rel). The standard
    post-ANN diversity pass in retrieval serving.

    `candidates` is (vec_id, embedding array<float>, rel double) — a
    BOUNDED top-N list from an upstream ANN stage (guarded at
    _MMR_MAX_CANDIDATES). Deterministic: scores discretized with the
    repo's floor(x*1e6+0.5)/1e6 at every step, ties on vec_id.

    Spark shape: the N^2 pairwise cosines are computed JVM-SIDE (the
    same `cosine` expression every ANN tier uses, so driver and oracle
    floats can never diverge) and collected; the greedy loop itself is
    inherently sequential — k selections, each conditioned on the
    previous set — and runs as O(k*N) scalar ops on the driver, the
    same parameter-bounded serving-edge budget as the graph walk's
    frontier. The corpus-sized work (the ANN stage that produced the
    candidates) stays distributed; nothing here scales with the
    corpus."""
    import math

    from agni_spark.functions.dedup import cosine

    spark = candidates.sparkSession
    c = candidates.select("vec_id", "embedding", "rel")
    rel_rows = c.select("vec_id", "rel").collect()
    if len(rel_rows) > _MMR_MAX_CANDIDATES:
        raise ValueError(
            f"mmr_rerank got {len(rel_rows)} candidates (> "
            f"{_MMR_MAX_CANDIDATES}) — pass a bounded top-N list"
        )
    rel = {int(r.vec_id): float(r.rel) for r in rel_rows}
    a = c.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = c.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    sims = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ia") != F.col("ib"))
        .select(
            "ia", "ib",
            _floor6(cosine(F.col("ea"), F.col("eb"))).alias("s"),
        )
    )
    s = {(int(r.ia), int(r.ib)): float(r.s) for r in sims.collect()}
    f6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    w = 1.0 - lam  # the exact double the oracle's (1.0 - lam) computes
    first = max(rel, key=lambda v: (rel[v], -v))
    picked = [(first, f6(lam * rel[first]))]
    chosen = [first]
    while len(picked) < k and len(chosen) < len(rel):
        best = None
        for v, rv in rel.items():
            if v in chosen:
                continue
            m = f6(lam * rv - w * max(s[(v, j)] for j in chosen))
            if best is None or (m, -v) > (best[1], -best[0]):
                best = (v, m)
        chosen.append(best[0])
        picked.append(best)
    return spark.createDataFrame(
        [(v, m, i + 1) for i, (v, m) in enumerate(picked)],
        "vec_id long, mmr double, rk int",
    )


def hybrid_weighted_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    w_text: float = 0.6,
    w_vec: float = 0.4,
) -> DataFrame:
    """Hybrid search with min-max weighted SCORE fusion (the
    alternative to RRF when calibrated score blending is wanted):
    BM25 scores and cosines are each normalized to [0, 1] over their
    own top-k' list, then blended w_text : w_vec. Output: (doc_id,
    fused, rk)."""
    from agni_spark.functions.simsearch import cosine_topk
    from agni_spark.functions.text import bm25_topk

    t = bm25_topk(docs, query_terms, k=k_each).select("doc_id", "score")
    qdf = emb.where(F.col("vec_id") == query_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    v = cosine_topk(emb, qdf, k=k_each).select(
        F.col("vec_id").alias("doc_id"), F.col("cos").alias("score")
    )
    return weighted_fuse([t, v], [w_text, w_vec], k=k)
