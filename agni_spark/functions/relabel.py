"""Prometheus relabel_config over the series registry.

The reference ships raw TSDB blocks and has no relabeling of its own,
but every Prometheus-ecosystem ingest path (scrape configs, remote
write, Thanos/Cortex tenancy) is configured through relabel rules, so
an engine claiming drop-in utility needs them. Semantics follow
prometheus/prometheus model/relabel/relabel.go: rules apply in order,
each reading the CURRENT label set; regexes are fully anchored
(`^(?:re)$`); a missing label reads as "".

Spark shape: the label set is the engine's wide series table (one
column per label, `metric` = `__name__`), so every action compiles to
plain column expressions — value-level actions (replace / keep / drop
/ hashmod / lowercase / uppercase) are JVM-side `rlike` /
`regexp_replace` / md5 projections and filters on the tiny registry;
name-level actions (labelmap / labeldrop / labelkeep) rewrite the
STATIC schema driver-side (no data movement at all). No shuffle
anywhere; at 100 TB the registry is still thousands-of-rows dimension
data.

Portability: hashmod uses the repo-wide 60-bit md5 prefix
(dedup.hash60) rather than Prometheus's uint64-of-md5-tail — same
distribution properties, restatable in any SQL engine (documented
deviation). Regexes should stay in the Java∩RE2∩DuckDB subset (same
rule as text.gopher_rules).
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agni_spark.functions.dedup import hash60


@dataclass
class RelabelRule:
    """One relabel_config entry (YAML field names preserved)."""

    action: str = "replace"
    source_labels: tuple = ()
    separator: str = ";"
    regex: str = "(.*)"
    target_label: str | None = None
    replacement: str = "$1"
    modulus: int | None = None


_VALUE_ACTIONS = {
    "replace", "keep", "drop", "hashmod", "lowercase", "uppercase",
}
_NAME_ACTIONS = {"labelmap", "labeldrop", "labelkeep"}


def _anchored(regex: str) -> str:
    return f"^(?:{regex})$"


def _src(df: DataFrame, rule: RelabelRule) -> Column:
    """Concatenated source-label value; a missing/NULL label reads as
    "" (relabel.go uses labels.Get, which returns "" when absent)."""
    cols = [
        F.coalesce(F.col(c), F.lit("")) if c in df.columns else F.lit("")
        for c in rule.source_labels
    ]
    if not cols:
        return F.lit("")
    return F.concat_ws(rule.separator, *cols)


def relabel(series: DataFrame, rules: list[RelabelRule]) -> DataFrame:
    """Apply a relabel rule chain to the series registry. Each rule
    sees the output of the previous one, like Prometheus. Returns the
    rewritten registry; identity (series_id) is passed through — the
    ingest paths recompute it from the final label set via
    datamodel.label_set_id when relabeling changes identity."""
    df = series
    for rule in rules:
        a = rule.action
        if a not in _VALUE_ACTIONS | _NAME_ACTIONS:
            raise ValueError(f"unknown relabel action: {a}")
        if a in ("keep", "drop"):
            m = _src(df, rule).rlike(_anchored(rule.regex))
            df = df.where(m if a == "keep" else ~m)
        elif a == "replace":
            if not rule.target_label:
                raise ValueError("replace needs target_label")
            val = _src(df, rule)
            anchored = _anchored(rule.regex)
            new = F.when(
                val.rlike(anchored),
                F.regexp_replace(val, anchored, rule.replacement),
            ).otherwise(
                F.col(rule.target_label)
                if rule.target_label in df.columns
                else F.lit(None).cast("string")
            )
            df = df.withColumn(rule.target_label, new)
        elif a in ("lowercase", "uppercase"):
            if not rule.target_label:
                raise ValueError(f"{a} needs target_label")
            val = _src(df, rule)
            df = df.withColumn(
                rule.target_label,
                F.lower(val) if a == "lowercase" else F.upper(val),
            )
        elif a == "hashmod":
            if not rule.target_label or not rule.modulus:
                raise ValueError("hashmod needs target_label and modulus")
            df = df.withColumn(
                rule.target_label,
                (hash60(_src(df, rule)) % rule.modulus).cast("string"),
            )
        elif a == "labelmap":
            pat = _re.compile(_anchored(rule.regex))
            repl = rule.replacement.replace("$", "\\")
            for c in list(df.columns):
                if c != "series_id" and pat.match(c):
                    df = df.withColumn(pat.sub(repl, c), F.col(c))
        elif a == "labeldrop":
            pat = _re.compile(_anchored(rule.regex))
            df = df.drop(
                *[
                    c
                    for c in df.columns
                    if c != "series_id" and pat.match(c)
                ]
            )
        elif a == "labelkeep":
            pat = _re.compile(_anchored(rule.regex))
            df = df.select(
                "series_id",
                *[
                    c
                    for c in df.columns
                    if c != "series_id" and pat.match(c)
                ],
            )
    return df
