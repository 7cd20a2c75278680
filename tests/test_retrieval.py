"""Hybrid retrieval fusion + phrase search (positional index) semantics."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from agni_spark.functions import retrieval, simsearch, text

PHRASE_DOCS = [
    (0, "a b c a b c a b"),        # "a b c" twice, "a b" three times
    (1, "x a b c y"),              # "a b c" once
    (2, "c b a"),                  # reversed — never a phrase hit
    (3, "a a a b b"),              # repeated-term runs: "a a" x2, "b b" x1
    (4, "a b"),                    # shorter than a trigram
]


@pytest.fixture(scope="module")
def pdocs(spark):
    return spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------- fusion


def test_rrf_fuse_hand_computed(spark):
    # two lists; doc 10 is rank 1 in both, doc 20 only in list A,
    # doc 30 only in list B — RRF(K=60): 10 -> 2/61, 20 = 30 -> 1/62,
    # tie broken on id
    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rk int")
    b = spark.createDataFrame([(10, 1), (30, 2)], "doc_id long, rk int")
    got = _rows(retrieval.rrf_fuse([a, b], k=10))
    c1 = __import__("math").floor((1.0 / 61.0) * 1e6 + 0.5) / 1e6
    c2 = __import__("math").floor((1.0 / 62.0) * 1e6 + 0.5) / 1e6
    assert got == [
        (10, round(2 * c1, 6), 2, 1),
        (20, c2, 1, 2),
        (30, c2, 1, 3),
    ]


def test_rrf_fuse_three_lists(spark):
    # an id present in all three lists must outrank one present in two
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, rk int")
    lists = [
        mk([(1, 1), (2, 2)]),
        mk([(1, 2), (2, 1)]),
        mk([(1, 3), (9, 1)]),
    ]
    got = _rows(retrieval.rrf_fuse(lists, k=3))
    assert [g[0] for g in got] == [1, 2, 9]
    assert got[0][2] == 3 and got[1][2] == 2  # n_lists provenance


def test_weighted_fuse_constant_list_normalizes_to_one(spark):
    # a constant-score list gives every member norm 1.0 (no 0/0); the
    # varying list separates its members
    flat = spark.createDataFrame(
        [(1, 5.0), (2, 5.0)], "doc_id long, score double"
    )
    var = spark.createDataFrame(
        [(1, 0.0), (2, 10.0)], "doc_id long, score double"
    )
    got = _rows(retrieval.weighted_fuse([flat, var], [0.5, 0.5], k=10))
    # doc 2: 0.5*1 + 0.5*1 = 1.0; doc 1: 0.5*1 + 0.5*0 = 0.5
    assert got == [(2, 1.0, 1), (1, 0.5, 2)]


def test_weighted_fuse_missing_id_contributes_zero(spark):
    a = spark.createDataFrame(
        [(1, 1.0), (2, 3.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame([(9, 7.0)], "doc_id long, score double")
    got = {r[0]: r[1] for r in _rows(retrieval.weighted_fuse([a, b], [0.6, 0.4]))}
    assert got[2] == 0.6 and got[9] == 0.4 and got[1] == 0.0


def test_hybrid_rrf_carries_source_ranks(spark):
    # tiny corpus where the lexical and vector answers differ: the
    # fused row keeps both provenance ranks, null where absent
    docs = spark.createDataFrame(
        [(0, "query engine"), (1, "spark spark spark"), (2, "x y")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    got = _rows(
        retrieval.hybrid_rrf_topk(docs, emb, ["spark"], query_id=0, k=3)
    )
    by_id = {r[0]: r for r in got}
    assert by_id[1][1] == 1  # text rank 1 ("spark" x3)
    assert by_id[2][2] == 1  # vector rank 1 (closest to query 0)
    assert by_id[1][2] is not None  # doc 1 also in the vector top-k
    assert by_id[2][1] is None  # doc 2 never matches the term


def test_mmr_promotes_diversity(spark):
    # two near-duplicate high-relevance vectors + one orthogonal
    # medium-relevance one: pure relevance ranks the twins 1-2; MMR
    # picks one twin, then prefers the diverse candidate over the
    # redundant twin
    cand = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0.99),
            (2, [0.999, 0.01, 0.0], 0.98),   # near-dup of 1
            (3, [0.0, 1.0, 0.0], 0.60),      # orthogonal
        ],
        "vec_id long, embedding array<float>, rel double",
    )
    got = [tuple(r) for r in retrieval.mmr_rerank(cand, lam=0.7, k=3).collect()]
    assert [g[0] for g in got] == [1, 3, 2]
    assert got[0][2] == 1 and got[0][1] == 0.693  # floor6(0.7*0.99)
    # lam=1.0 degenerates to pure relevance order
    pure = [r.vec_id for r in retrieval.mmr_rerank(cand, lam=1.0, k=3).collect()]
    assert pure == [1, 2, 3]


def test_mmr_candidate_guard(spark):
    big = spark.range(retrieval._MMR_MAX_CANDIDATES + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        F.lit(0.5).alias("rel"),
    )
    with pytest.raises(ValueError, match="bounded top-N"):
        retrieval.mmr_rerank(big, k=3)


# ------------------------------------------------------- phrase search


def test_phrase_scan_counts_and_ranks(pdocs):
    got = _rows(text.phrase_search(pdocs, "a b c", k=10))
    assert got == [(0, 2, 1), (1, 1, 2)]
    # reversed tokens never match; short docs never explode negative
    assert _rows(text.phrase_search(pdocs, "c b a x", k=10)) == []


def test_phrase_repeated_term_runs(pdocs):
    # overlapping repeated-term occurrences count per start position:
    # "a a a b b" has "a a" at starts 0 and 1
    got = _rows(text.phrase_search(pdocs, "a a", k=10))
    assert got == [(3, 2, 1)]


def test_phrase_indexed_equals_scan(spark, pdocs):
    path = tempfile.mkdtemp(prefix="agni_t_pos_")
    text.write_text_index(pdocs, path, n_buckets=4, positions=True)
    for phrase in ("a b c", "a b", "a a", "b b", "c"):
        scan = _rows(text.phrase_search(pdocs, phrase, k=10))
        idx = _rows(text.phrase_topk_indexed(spark, path, phrase, k=10))
        assert idx == scan, phrase


def test_phrase_index_append_inherits_positions(spark, pdocs):
    # build positional on part of the corpus, append the rest WITHOUT
    # re-stating positionality — the appended docs must still serve
    # phrase queries (the layer's existence is the flag)
    path = tempfile.mkdtemp(prefix="agni_t_posa_")
    text.write_text_index(
        pdocs.where(F.col("doc_id") < 2), path, n_buckets=4, positions=True
    )
    text.append_text_index(spark, path, pdocs.where(F.col("doc_id") >= 2))
    got = _rows(text.phrase_topk_indexed(spark, path, "a a", k=10))
    assert got == [(3, 2, 1)]  # doc 3 arrived via the append


def test_phrase_requires_positional_layer(spark, pdocs):
    path = tempfile.mkdtemp(prefix="agni_t_nopos_")
    text.write_text_index(pdocs, path, n_buckets=4)
    with pytest.raises(ValueError, match="positional layer"):
        text.phrase_topk_indexed(spark, path, "a b", k=10)


def test_phrase_delete_and_compact(spark, pdocs):
    # tombstoned docs vanish from phrase results; compaction scrubs
    # positions/ physically and the probe result is unchanged
    path = tempfile.mkdtemp(prefix="agni_t_posd_")
    text.write_text_index(pdocs, path, n_buckets=4, positions=True)
    dead = spark.createDataFrame([(0,)], "doc_id long")
    simsearch.delete_from_index(
        spark, path, dead, simsearch.TEXT_INDEX_SUBDIRS, id_col="doc_id"
    )
    got = _rows(text.phrase_topk_indexed(spark, path, "a b c", k=10))
    assert got == [(1, 1, 1)]  # doc 0 tombstoned
    simsearch.compact_index(spark, path, simsearch.TEXT_INDEX_SUBDIRS)
    simsearch.vacuum_index(spark, path, simsearch.TEXT_INDEX_SUBDIRS)
    assert _rows(
        text.phrase_topk_indexed(spark, path, "a b c", k=10)
    ) == [(1, 1, 1)]
    # the scrub was physical: no row for doc 0 survives in positions/
    surv = (
        spark.read.parquet(f"{path}/positions")
        .where(F.col("doc_id") == 0)
        .count()
    )
    assert surv == 0