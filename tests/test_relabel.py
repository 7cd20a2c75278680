"""Prometheus relabel_config semantics (relabel.go): anchored regexes,
rules read the previous rule's output, missing labels read as ""."""

from __future__ import annotations

import pytest

from agni_spark.functions.dedup import py_hash60
from agni_spark.functions.relabel import RelabelRule, relabel


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        (1, "event_click", "api", "prod", "prod-01", "pod-1"),
        (2, "event_error", "web", "dev", "dev-02", None),
        (3, "other_metric", "api", "prod", "prod-03", "pod-2"),
    ]
    return spark.createDataFrame(
        rows,
        "series_id long, metric string, job string, env string, "
        "instance string, pod string",
    )


def test_keep_drop_anchored(series):
    kept = relabel(
        series,
        [RelabelRule(action="keep", source_labels=("metric",),
                     regex="event_.*")],
    )
    assert {r.series_id for r in kept.collect()} == {1, 2}
    # anchoring: a substring match is NOT a match
    none = relabel(
        series,
        [RelabelRule(action="keep", source_labels=("metric",),
                     regex="event")],
    )
    assert none.count() == 0
    dropped = relabel(
        series,
        [RelabelRule(action="drop", source_labels=("metric",),
                     regex="event_.*")],
    )
    assert {r.series_id for r in dropped.collect()} == {3}


def test_replace_composite_and_no_match_keeps_old(series):
    out = relabel(
        series,
        [
            RelabelRule(
                action="replace", source_labels=("env", "job"),
                separator="/", regex="prod/(.*)",
                target_label="tier", replacement="fe-$1",
            )
        ],
    ).collect()
    tiers = {r.series_id: r.tier for r in out}
    assert tiers == {1: "fe-api", 2: None, 3: "fe-api"}
    # overwriting an EXISTING label only where the regex matches
    out2 = relabel(
        series,
        [
            RelabelRule(
                action="replace", source_labels=("metric",),
                regex="event_(.*)", target_label="job",
                replacement="$1-job",
            )
        ],
    ).collect()
    jobs = {r.series_id: r.job for r in out2}
    assert jobs == {1: "click-job", 2: "error-job", 3: "api"}


def test_missing_label_reads_empty(series):
    # pod is NULL for series 2: source concat reads "" there
    out = relabel(
        series,
        [
            RelabelRule(
                action="replace", source_labels=("pod", "env"),
                separator=";", regex=";(.*)", target_label="flag",
                replacement="nopod-$1",
            )
        ],
    ).collect()
    flags = {r.series_id: r.flag for r in out}
    assert flags[2] == "nopod-dev" and flags[1] is None


def test_hashmod_matches_python_twin(series):
    out = relabel(
        series,
        [
            RelabelRule(
                action="hashmod", source_labels=("instance",),
                target_label="shard", modulus=8,
            )
        ],
    ).collect()
    for r in out:
        assert r.shard == str(py_hash60(r.instance) % 8)


def test_name_level_actions(series):
    mapped = relabel(
        series,
        [RelabelRule(action="labelmap", regex="(job|env)",
                     replacement="src_$1")],
    )
    assert {"src_job", "src_env"} <= set(mapped.columns)
    row = mapped.where("series_id = 1").collect()[0]
    assert row.src_job == "api" and row.src_env == "prod"

    kept = relabel(
        series,
        [RelabelRule(action="labelkeep", regex="metric|job")],
    )
    assert kept.columns == ["series_id", "metric", "job"]

    dropped = relabel(series, [RelabelRule(action="labeldrop", regex="pod")])
    assert "pod" not in dropped.columns and "series_id" in dropped.columns


def test_rules_chain_in_order(series):
    # rule 2 reads rule 1's output: keep on a label rule 1 created
    out = relabel(
        series,
        [
            RelabelRule(
                action="replace", source_labels=("metric",),
                regex="event_(.*)", target_label="kind",
                replacement="$1",
            ),
            RelabelRule(action="keep", source_labels=("kind",),
                        regex="click"),
        ],
    ).collect()
    assert [r.series_id for r in out] == [1]
    with pytest.raises(ValueError):
        relabel(series, [RelabelRule(action="bogus")])
