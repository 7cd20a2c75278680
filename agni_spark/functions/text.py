"""Text-analysis operators for LLM training-data pipelines (north-star
extension tier; no counterpart in the reference — SURVEY §7 Phase 5).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen); no Python UDFs. Every operator has a DuckDB
oracle twin in __spark_entry__ using the same arithmetic.

Scale: each operator is a narrow map over the documents fact table plus
at most one small aggregation — embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic heuristic marker words per language. The testdata's
# `text` uses a synthetic uniform vocabulary, so scores are driven by
# whatever markers do occur; the operator shape (per-language scoring +
# argmax with deterministic tie-break) is the real deliverable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "query"],
    "de": ["der", "die", "und", "nicht"],
    "es": ["el", "la", "que", "de"],
    "fr": ["le", "la", "et", "les"],
    "zh": ["spark", "data", "value", "stream"],
}

STOPWORDS = ["the", "a", "b"]


def word_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


def token_count(text: Column) -> Column:
    """BPE-ish token estimate: alnum runs + standalone punctuation."""
    return F.regexp_count(text, F.lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))


def _occurrences(text: Column, word: str) -> Column:
    """Whole-word occurrence count, regex-free arithmetic (identical
    semantics in any SQL engine): count of ' w ' in ' text '."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality metrics: counts + ratios + a quality score.

    quality = penalties for very short docs, high punctuation density
    and stopword stuffing — the usual cheap pre-filter ahead of
    model-based scoring."""
    text = F.col("text")
    n_words = word_count(text)
    n_stop = sum(_occurrences(text, w) for w in STOPWORDS)
    punct = F.regexp_count(text, F.lit("[^A-Za-z0-9\\s]"))
    out = docs.select(
        "doc_id",
        F.length(text).alias("n_chars_measured"),
        n_words.alias("n_words"),
        token_count(text).alias("n_tokens"),
        F.round(F.length(F.replace(text, F.lit(" "), F.lit(""))) / n_words, 6).alias(
            "avg_word_len"
        ),
        F.round(punct / F.length(text), 6).alias("punct_ratio"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
    )
    quality = (
        F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0))
        * (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0)))
        * (1 - F.least(F.col("stopword_ratio") * 2, F.lit(1.0)))
    )
    return out.withColumn("quality", F.round(quality, 6))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: score = sum of whole-word marker hits;
    argmax with lexicographic tie-break (greatest(struct(score, lang
    DESC))-free formulation: explicit chained comparison)."""
    text = F.col("text")
    scores = {
        lang: sum(_occurrences(text, w) for w in markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    scored = docs.select("doc_id", F.col("lang").alias("lang_meta"), *scores.values())
    langs = sorted(LANG_MARKERS)  # lexicographic tie-break order
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = None
    for lg in reversed(langs):  # earliest lang wins ties
        c = F.when(F.col(f"score_{lg}") == best, F.lit(lg))
        pred = c.otherwise(pred) if pred is not None else c
    return scored.select(
        "doc_id",
        "lang_meta",
        *[f"score_{lg}" for lg in langs],
        pred.alias("lang_pred"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (the deterministic-hash stand-in for a rolling Rabin hash;
    same normalization as dedup.exact)."""
    norm = F.lower(F.regexp_replace(F.col("text"), "\\s+", " "))
    return docs.select(
        "doc_id", F.md5(norm).alias("fingerprint"), F.length(norm).alias("norm_len")
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Global top-k word n-grams: explode + one shuffle on the n-gram
    key (map-side combine), deterministic tie-break on the n-gram."""
    words = F.split(F.col("text"), " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
    )
    return (
        docs.where(F.size(words) >= n)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(k)
    )


def repeated_passages(
    docs: DataFrame, window: int = 8, min_docs: int = 2, k: int = 50
) -> DataFrame:
    """ExactSubstr-lite (the dedup-repeated-substrings idea from the
    'Deduplicating Training Data Makes Language Models Better' line of
    work, done with hashes instead of suffix arrays): word windows of
    length `window` appearing in >= min_docs distinct documents. One
    explode + one shuffle on the window hash — no pairwise work.

    Returns the top-k repeated windows by document frequency with a
    sample window text (deterministic min), ordered for hashing."""
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {window - 1}, 0)), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i, {window})))"
    )
    exploded = docs.where(
        F.size(F.split(F.col("text"), " ")) >= window
    ).select("doc_id", F.explode(grams).alias("passage"))
    # no pre-distinct: countDistinct dedupes (passage, doc) in the same
    # shuffle — a separate distinct would add a full extra exchange
    return (
        exploded.groupBy("passage")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), "passage")
        .limit(k)
    )


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style rule filter (public Rae et al. 2021 heuristics,
    adapted to available signals): per doc, boolean pass/fail on
      - word count in [8, 100000]
      - mean word length in [1, 12]
      - symbol-to-word ratio <= 0.5
      - stopword presence (>= 1 hit of a common English stopword)
    plus the conjunction. Pure projections, no shuffle."""
    text = F.col("text")
    n_words = word_count(text)
    mean_wl = F.length(F.replace(text, F.lit(" "), F.lit(""))) / n_words
    symbols = F.regexp_count(text, F.lit("[#*\\.]{1,}|[^A-Za-z0-9\\s]"))
    n_stop = sum(_occurrences(text, w) for w in STOPWORDS)
    checks = {
        "ok_word_count": (n_words >= 8) & (n_words <= 100_000),
        "ok_word_len": (mean_wl >= 1.0) & (mean_wl <= 12.0),
        "ok_symbol_ratio": (symbols / n_words) <= 0.5,
        "ok_stopwords": n_stop >= 1,
    }
    out = docs.select(
        "doc_id", *[c.alias(name) for name, c in checks.items()]
    )
    passes = None
    for name in checks:
        passes = F.col(name) if passes is None else (passes & F.col(name))
    return out.withColumn("gopher_pass", passes)
