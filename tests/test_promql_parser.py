"""PromQL parser/compiler: parsed expressions must produce the same
results as hand-composed pipelines over the engine's own operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agni_spark import datamodel as dm
from agni_spark import promql_parser as pql
from agni_spark.functions import promql
from agni_spark.matchers import Matcher, eq
from agni_spark.querier import Querier

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def querier(spark):
    t = dm.derive_tsdb(spark, SF)
    return Querier(t.samples, t.series, t.series_labels, t.blocks)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parse_shapes():
    e = pql.parse('sum by (job, env) (rate(event_click{env="prod"}[1d]))')
    assert e.op == "sum" and e.mode == "by" and e.labels == ["job", "env"]
    assert e.arg.name == "rate"
    sel = e.arg.arg
    assert sel.metric == "event_click" and sel.range_ms == 86_400_000
    assert sel.matchers == [Matcher("=", "env", "prod")]
    with pytest.raises(ValueError):
        pql.parse("rate(event_click)")  # missing range
    with pytest.raises(ValueError):
        pql.parse('sum by (job) (x{a="b"}) trailing')


def test_selector_equals_querier_select(querier):
    got = pql.query(querier, 'event_click{job="api"}')
    want = querier.select([eq("job", "api"), eq("__name__", "event_click")])
    assert _rows(got) == _rows(want)


def test_rate_pipeline_equivalence(querier):
    got = pql.query(querier, 'rate(event_click{env="prod"}[1d])')
    sel = querier.select([eq("env", "prod"), eq("__name__", "event_click")])
    want = promql.rate(sel, 86_400_000).withColumnRenamed("rate", "value")
    assert _rows(got) == _rows(want)


def test_sum_by_equivalence(querier):
    got = pql.query(querier, "sum by (job) (increase(event_error[1d]))")
    sel = querier.select([eq("__name__", "event_error")])
    inc = promql.increase(sel, 86_400_000).withColumnRenamed("increase", "value")
    dim = F.broadcast(querier.series.select("series_id", "job"))
    want = (
        inc.join(dim, "series_id")
        .groupBy("job", "bucket_ms")
        .agg(F.round(F.sum("value"), 4).alias("value"))
    )
    assert _rows(got) == _rows(want)


def test_topk(querier):
    got = pql.query(querier, 'topk(3, avg_over_time(event_view[1d]))')
    assert [r.rk for r in got.orderBy("rk").collect()] == [1, 2, 3]


def test_without_grouping(querier):
    got = pql.query(querier, "count without (instance, pod, metric) (event_view)")
    # grouping collapses to (job, env): 3x2 groups
    assert got.select("job", "env").distinct().count() == 6


def test_binop_between_aggregations(querier):
    got = pql.query(
        querier,
        "sum by (job) (increase(event_error[1d]))"
        " / sum by (job) (increase(event_click[1d]))",
    )
    # manual: same two pipelines joined on (job, bucket_ms)
    def side(metric):
        sel = querier.select([eq("__name__", metric)])
        inc = promql.increase(sel, 86_400_000).withColumnRenamed(
            "increase", "value"
        )
        dim = F.broadcast(querier.series.select("series_id", "job"))
        return (
            inc.join(dim, "series_id")
            .groupBy("job", "bucket_ms")
            .agg(F.round(F.sum("value"), 4).alias("value"))
        )

    l, r = side("event_error"), side("event_click")
    want = (
        l.withColumnRenamed("value", "_l")
        .join(r.withColumnRenamed("value", "_r"), ["job", "bucket_ms"])
        .select(
            "job",
            "bucket_ms",
            F.round(
                F.when(F.col("_r") != 0, F.col("_l") / F.col("_r")), 6
            ).alias("value"),
        )
    )
    assert _rows(got) == _rows(want)


def test_binop_parse_shape_and_parens():
    e = pql.parse("(sum by (job) (x)) - sum by (job) (y)")
    assert isinstance(e, pql.BinOp) and e.op == "-"
    chain = pql.parse("sum by (a) (x) / sum by (a) (y) * sum by (a) (z)")
    # left-associative: (x/y)*z
    assert chain.op == "*" and chain.left.op == "/"
    with pytest.raises(ValueError):
        pql.parse("sum by (job) (x) /")  # dangling operator


def test_offset_modifier(querier):
    # offset 1d: same data, reported one day later
    base = pql.query(querier, "increase(event_click[1d])")
    off = pql.query(querier, "increase(event_click[1d] offset 1d)")
    b = {(r.series_id, r.bucket_ms): r.value for r in base.collect()}
    o = {(r.series_id, r.bucket_ms): r.value for r in off.collect()}
    assert o == {(s, t + 86_400_000): v for (s, t), v in b.items()}


def test_math_funcs(querier):
    clamped = pql.query(
        querier, "clamp_max(sum by (job) (event_view), 100)"
    )
    raw = pql.query(querier, "sum by (job) (event_view)")
    r = {x.job: x.value for x in raw.collect()}
    c = {x.job: x.value for x in clamped.collect()}
    assert c == {j: min(v, 100.0) for j, v in r.items()}
    with pytest.raises(ValueError):
        pql.parse("clamp_min(x)")  # missing scalar


def test_over_time_family_and_extrapolated(querier):
    for fn in ["min_over_time", "max_over_time", "count_over_time",
               "rate_extrapolated"]:
        df = pql.query(querier, f"{fn}(event_view[1d])")
        assert df.columns == ["series_id", "bucket_ms", "value"]
        assert df.count() > 0


def test_bottomk_and_quantile_agg(querier):
    bk = pql.query(querier, "bottomk(3, sum_over_time(event_view[1d]))")
    assert [r.rk for r in bk.orderBy("rk").collect()] == [1, 2, 3]
    tk = pql.query(querier, "topk(3, sum_over_time(event_view[1d]))")
    assert {r.series_id for r in bk.collect()}.isdisjoint(
        {r.series_id for r in tk.collect()}
    )
    q = pql.query(querier, "quantile by (job) (0.5, event_view)")
    # median per job of instant samples: one value per job
    from pyspark.sql import functions as F

    rows = {r.job: r.value for r in q.collect()}
    assert set(rows) == {"api", "web", "worker"}
    sel = querier.select([pql.Matcher("=", "__name__", "event_view")])
    dim = F.broadcast(querier.series.select("series_id", "job"))
    want = {
        r.job: r.m
        for r in sel.join(dim, "series_id")
        .groupBy("job")
        .agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("m"))
        .collect()
    }
    assert rows == want


def test_comparison_filters_vector(querier):
    base = pql.query(querier, "sum by (job) (event_error)")
    vals = {r.job: r.value for r in base.collect()}
    cut = sorted(vals.values())[1]  # threshold keeping some, dropping some
    got = pql.query(querier, f"sum by (job) (event_error) > {cut}")
    kept = {r.job: r.value for r in got.collect()}
    assert kept == {j: v for j, v in vals.items() if v > cut}
    # vector-vector comparison: error totals exceeding view totals
    gt = pql.query(
        querier, "sum by (job) (event_error) > sum by (job) (event_view)"
    )
    views = {r.job: r.value
             for r in pql.query(querier, "sum by (job) (event_view)").collect()}
    assert {r.job: r.value for r in gt.collect()} == {
        j: v for j, v in vals.items() if v > views[j]
    }


def test_set_operators_and_unless(querier):
    left = pql.query(querier, "sum by (job) (event_error)")
    jobs = {r.job for r in left.collect()}
    vals = {r.job: r.value for r in left.collect()}
    cut = sorted(vals.values())[1]
    both = pql.query(
        querier,
        f"sum by (job) (event_error) and (sum by (job) (event_view) > 0)",
    )
    assert {r.job for r in both.collect()} == jobs  # all jobs have views
    # unless removes the jobs whose error total clears the threshold
    rest = pql.query(
        querier,
        f"sum by (job) (event_error) unless "
        f"(sum by (job) (event_error) > {cut})",
    )
    assert {r.job: r.value for r in rest.collect()} == {
        j: v for j, v in vals.items() if v <= cut
    }


def test_precedence_promql_levels():
    # * binds tighter than +: a + b*c, not (a+b)*c
    ast = pql.parse("a + b * c")
    assert ast.op == "+" and isinstance(ast.right, pql.BinOp)
    assert ast.right.op == "*"
    # comparison binds looser than arithmetic
    ast = pql.parse("a + b > c")
    assert ast.op == ">" and ast.left.op == "+"
    # set ops bind loosest; or below and
    ast = pql.parse("a and b or c")
    assert ast.op == "or" and ast.left.op == "and"
    # explicit parens override
    ast = pql.parse("(a + b) * c")
    assert ast.op == "*" and ast.left.op == "+"


def test_scalar_arithmetic_both_sides(querier):
    base = {r.job: r.value
            for r in pql.query(querier, "sum by (job) (event_error)").collect()}
    double = {r.job: r.value
              for r in pql.query(
                  querier, "sum by (job) (event_error) * 2").collect()}
    assert double == {j: round(v * 2, 6) for j, v in base.items()}
    swapped = {r.job: r.value
               for r in pql.query(
                   querier, "100 - sum by (job) (event_error)").collect()}
    assert swapped == {j: round(100 - v, 6) for j, v in base.items()}
    with pytest.raises(ValueError, match="scalar-scalar"):
        pql.query(querier, "1 + 2")


def test_cross_metric_vector_matching(querier):
    # label-set matching ignoring __name__: the canonical error/total
    # ratio at series level must be non-empty and correct
    df = pql.query(querier, "rate(event_error[1d]) / rate(event_click[1d])")
    rows = df.collect()
    assert len(rows) > 0
    assert "series_id" not in df.columns  # resolved to label columns
    # spot-check one row against separately computed sides
    err = pql.query(querier, "rate(event_error[1d])")
    clk = pql.query(querier, "rate(event_click[1d])")
    from agni_spark.functions.promql import ROUND_AVG
    lbls = [c for c in df.columns if c not in ("bucket_ms", "value")]
    want_err = {tuple([r[c] for c in lbls] + [r.bucket_ms]): r.value
                for r in err.join(querier.series, "series_id").collect()}
    want_clk = {tuple([r[c] for c in lbls] + [r.bucket_ms]): r.value
                for r in clk.join(querier.series, "series_id").collect()}
    for r in rows[:20]:
        k = tuple([r[c] for c in lbls] + [r.bucket_ms])
        assert k in want_err and k in want_clk
        if want_clk[k] != 0:
            assert r.value == round(want_err[k] / want_clk[k], ROUND_AVG)


def test_or_set_operator(querier):
    vals = {r.job: r.value
            for r in pql.query(querier, "sum by (job) (event_error)").collect()}
    cut = sorted(vals.values())[1]
    # low-error jobs OR all jobs -> union fills back the dropped jobs
    # (left value wins where both sides match)
    merged = pql.query(
        querier,
        f"(sum by (job) (event_error) > {cut}) or sum by (job) (event_error)",
    )
    got = {r.job: r.value for r in merged.collect()}
    assert got == vals
    with pytest.raises(ValueError, match="requires vector operands"):
        pql.parse("sum(a) or 5")


def test_merged_scan_ratio_equivalence(querier):
    # the shared-scan rewrite must produce the same result as compiling
    # both sides independently
    ratio = pql.query(
        querier,
        "sum by (job) (increase(event_error[1d]))"
        " / sum by (job) (increase(event_click[1d]))",
    )
    num = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier, "sum by (job) (increase(event_error[1d]))").collect()}
    den = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier, "sum by (job) (increase(event_click[1d]))").collect()}
    from agni_spark.functions.promql import ROUND_AVG
    got = {(r.job, r.bucket_ms): r.value for r in ratio.collect()}
    want = {k: round(num[k] / den[k], ROUND_AVG)
            for k in num if k in den and den[k] != 0}
    assert got == want and len(got) > 0


def test_merged_sides_split_differing_aggs(querier):
    # differing agg ops disqualify the single-groupBy pivot but still
    # take the shared-scan sides-split path; results must match
    # independently compiled sides
    expr = (
        "sum by (job) (increase(event_error[1d]))"
        " - avg by (job) (increase(event_click[1d]))"
    )
    got = {(r.job, r.bucket_ms): r.value for r in pql.query(querier, expr).collect()}
    s = {(r.job, r.bucket_ms): r.value
         for r in pql.query(
             querier, "sum by (job) (increase(event_error[1d]))").collect()}
    a = {(r.job, r.bucket_ms): r.value
         for r in pql.query(
             querier, "avg by (job) (increase(event_click[1d]))").collect()}
    from agni_spark.functions.promql import ROUND_AVG
    want = {k: round(s[k] - a[k], ROUND_AVG) for k in s if k in a}
    assert got == want and len(got) > 0


def test_math_function_family(querier):
    import math as pymath

    base = {(r.job, r.bucket_ms): r.value
            for r in pql.query(
                querier, "sum by (job) (increase(event_error[1d]))").collect()}
    checks = {
        "ceil": lambda v: float(pymath.ceil(v)),
        "floor": lambda v: float(pymath.floor(v)),
        "sqrt": lambda v: pymath.sqrt(v),
        "ln": lambda v: pymath.log(v),
        "log2": lambda v: pymath.log2(v),
        "log10": lambda v: pymath.log10(v),
        "sgn": lambda v: float((v > 0) - (v < 0)),
    }
    for fn, py in checks.items():
        got = {(r.job, r.bucket_ms): r.value
               for r in pql.query(
                   querier,
                   f"{fn}(sum by (job) (increase(event_error[1d])))",
               ).collect()}
        for k, v in base.items():
            assert got[k] == pytest.approx(py(v)), (fn, k)
    # round to nearest multiple, ties up
    got = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier,
               "round(sum by (job) (increase(event_error[1d])), 10)",
           ).collect()}
    for k, v in base.items():
        assert got[k] == pytest.approx(pymath.floor(v / 10 + 0.5) * 10.0)
    # clamp with two scalars
    got = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier,
               "clamp(sum by (job) (increase(event_error[1d])), 40, 60)",
           ).collect()}
    for k, v in base.items():
        assert got[k] == pytest.approx(min(max(v, 40.0), 60.0))
    with pytest.raises(ValueError, match="min and max"):
        pql.parse("clamp(a, 1)")


def test_parser_fuzz_roundtrip(querier):
    """Grammar fuzz: randomly composed valid expressions must parse,
    compile to a plan, and re-parse to the same AST (parse is a pure
    function of the text). Catches precedence/tokenizer regressions."""
    import random

    rng = random.Random(20260813)
    metrics = ["event_click", "event_error", "event_view"]

    def selector():
        m = rng.choice(metrics)
        if rng.random() < 0.4:
            m += '{env="prod"}'
        return m

    def term(depth):
        r = rng.random()
        if depth > 2 or r < 0.3:
            return f"sum by (job) (increase({selector()}[1d]))"
        if r < 0.45:
            return f"avg by (job) (increase({selector()}[1d]))"
        if r < 0.6:
            fn = rng.choice(["abs", "ceil", "sqrt", "floor"])
            return f"{fn}({term(depth + 1)})"
        if r < 0.8:
            op = rng.choice(["+", "-", "*", "/"])
            if rng.random() < 0.3:
                return f"{term(depth + 1)} {op} {rng.randint(1, 100)}"
            return f"{term(depth + 1)} {op} {term(depth + 1)}"
        op = rng.choice(["and", "unless", "or", ">", "<="])
        if op in (">", "<=") and rng.random() < 0.5:
            return f"{term(depth + 1)} {op} {rng.randint(1, 100)}"
        return f"({term(depth + 1)}) {op} ({term(depth + 1)})"

    for _ in range(40):
        text = term(0)
        ast1 = pql.parse(text)
        ast2 = pql.parse(text)
        assert repr(ast1) == repr(ast2), text
        df = pql.compile_expr(ast1, querier)
        assert "value" in df.columns, text
        df.schema  # analysis must succeed


def test_vector_matching_modifiers(querier):
    # on(job): match two differently-grouped vectors on job only
    num = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier, "sum by (job) (increase(event_error[1d]))").collect()}
    den = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier, "sum by (job) (increase(event_click[1d]))").collect()}
    from agni_spark.functions.promql import ROUND_AVG
    got = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier,
               "sum by (job) (increase(event_error[1d]))"
               " / on(job, bucket_ms) sum by (job) (increase(event_click[1d]))",
           ).collect()}
    want = {k: round(num[k] / den[k], ROUND_AVG)
            for k in num if k in den and den[k] != 0}
    assert got == want and len(got) > 0
    # group_left: per-series rate divided by a per-job aggregate — the
    # many side keeps its extra labels
    df = pql.query(
        querier,
        "rate(event_error[1d])"
        " / on(job, bucket_ms) group_left"
        " sum by (job) (rate(event_error[1d]))",
    )
    cols = set(df.columns)
    assert {"job", "bucket_ms", "value"} <= cols
    assert len(cols) > 3  # carried left labels (env/instance/pod)
    rows = df.collect()
    assert len(rows) > 0
    # ignoring(env) + group_left: share of each (job, env) in its job
    # total — the right side is unique per job, left labels carry
    part = {(r.job, r.env, r.bucket_ms): r.value
            for r in pql.query(
                querier,
                "sum by (job, env) (increase(event_error[1d]))").collect()}
    tot = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier, "sum by (job) (increase(event_error[1d]))").collect()}
    share = {(r.job, r.env, r.bucket_ms): r.value
             for r in pql.query(
                 querier,
                 "sum by (job, env) (increase(event_error[1d]))"
                 " / ignoring(env) group_left"
                 " sum by (job) (increase(event_error[1d]))",
             ).collect()}
    want_share = {
        (j, e, b): round(v / tot[(j, b)], ROUND_AVG)
        for (j, e, b), v in part.items()
        if tot.get((j, b))
    }
    assert share == want_share and len(share) > 0
    # on() with an absent label errors loudly
    with pytest.raises(ValueError, match="absent"):
        pql.query(
            querier,
            "sum by (job) (increase(event_error[1d]))"
            " / on(nope) sum by (job) (increase(event_click[1d]))",
        ).collect()


def test_subquery_over_time(querier):
    # daily max of 6-hourly per-job sums == manual re-bucketing
    inner = {(r.job, r.bucket_ms): r.value
             for r in pql.query(
                 querier,
                 "sum by (job) (increase(event_error[6h]))").collect()}
    got = {(r.job, r.bucket_ms): r.value
           for r in pql.query(
               querier,
               "max_over_time(sum by (job)"
               " (increase(event_error[6h]))[1d:6h])").collect()}
    want = {}
    for (j, b), v in inner.items():
        k = (j, b // 86_400_000 * 86_400_000)
        want[k] = max(want.get(k, float("-inf")), v)
    assert got == want and len(got) > 0
    # malformed subqueries error loudly
    with pytest.raises(ValueError, match="multiple of step"):
        pql.parse("avg_over_time(rate(x[6h])[1d:5h])")
    with pytest.raises(ValueError, match="_over_time family"):
        pql.parse("rate(sum(increase(x[6h]))[1d:6h])")


def test_extended_range_funcs_in_parser(querier):
    # deriv + the ext over_time family compile through the parser and
    # match their engine twins
    got = pql.query(querier, "deriv(event_view[1d])")
    want = promql.deriv(
        querier.select([pql.Matcher("=", "__name__", "event_view")], sort=False),
        86_400_000,
    ).withColumnRenamed("deriv", "value")
    assert _rows(got) == _rows(want)
    for fn in ["last_over_time", "stddev_over_time", "stdvar_over_time",
               "present_over_time"]:
        df = pql.query(querier, f"{fn}(event_view[1d])")
        assert df.columns == ["series_id", "bucket_ms", "value"]
        assert df.count() > 0


def test_scalar_arg_range_funcs(querier):
    """quantile_over_time(q, m[r]) / predict_linear(m[r], t) /
    holt_winters(m[r], sf, tf) parse and match their hand-composed
    operator equivalents."""
    e = pql.parse("quantile_over_time(0.9, event_click[6h])")
    assert e.name == "quantile_over_time" and e.scalar == 0.9
    e = pql.parse("predict_linear(event_click[1d], 3600)")
    assert e.scalar == 3600.0
    e = pql.parse("holt_winters(event_click[1d], 0.5, 0.1)")
    assert (e.scalar, e.scalar2) == (0.5, 0.1)
    with pytest.raises(ValueError):
        pql.parse("quantile_over_time(0.9, event_click)")  # no range
    with pytest.raises(ValueError):
        pql.parse("holt_winters(event_click[1d], 0.5)")  # missing tf

    sel = querier.select([Matcher("=", "__name__", "event_click")], sort=False)
    got = _rows(pql.query(querier, "quantile_over_time(0.9, event_click[6h])"))
    want = _rows(
        promql.quantile_over_time(sel, 0.9, 21_600_000).withColumnRenamed(
            "quantile", "value"
        )
    )
    assert got == want
    got = _rows(pql.query(querier, "predict_linear(event_click[1d], 3600)"))
    want = _rows(
        promql.predict_linear(sel, 86_400_000, 3600.0).withColumnRenamed(
            "predicted", "value"
        )
    )
    assert got == want


def test_holt_winters_recurrence(spark):
    """The fold computes the exact Prometheus functions.go recurrence
    (python reference on a hand-made series)."""
    xs = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6]
    sf, tf = 0.5, 0.1

    def ref(vals):
        s0, s1, b = 0.0, vals[0], vals[1] - vals[0]
        for i in range(1, len(vals)):
            if i > 1:
                b = tf * (s1 - s0) + (1 - tf) * b
            s0, s1 = s1, sf * vals[i] + (1 - sf) * (s1 + b)
        return s1

    samples = spark.createDataFrame(
        [(1, i * 1000, v) for i, v in enumerate(xs)] + [(2, 0, 7.0)],
        "series_id long, ts_ms long, value double",
    )
    out = {
        r.series_id: r.smoothed
        for r in promql.holt_winters(samples, 10_000_000, sf, tf).collect()
    }
    assert out[1] == pytest.approx(ref(xs), abs=1e-6)
    assert 2 not in out  # < 2 points -> no result


def test_new_agg_ops(querier):
    # stddev/stdvar: population moments; group: constant 1
    sd = pql.query(querier, "stddev by (job) (sum_over_time(event_click[6h]))")
    sv = pql.query(querier, "stdvar by (job) (sum_over_time(event_click[6h]))")
    g = pql.query(querier, "group by (job) (sum_over_time(event_click[6h]))")
    sd_m = {(r.job, r.bucket_ms): r.value for r in sd.collect()}
    sv_m = {(r.job, r.bucket_ms): r.value for r in sv.collect()}
    assert set(sd_m) == set(sv_m)
    for k in sd_m:
        assert sd_m[k] ** 2 == pytest.approx(sv_m[k], abs=1e-4)
    assert {r.value for r in g.collect()} == {1.0}


def test_count_values_shape(querier):
    df = pql.query(
        querier,
        'count_values("v", sum by (job, env) (increase(event_error[1d])))',
    )
    assert set(df.columns) == {"bucket_ms", "v", "value"}
    # counts per (bucket, value-string) sum back to the vector's size
    base = pql.query(
        querier, "sum by (job, env) (increase(event_error[1d]))"
    )
    assert df.agg(F.sum("value")).first()[0] == base.count()


def test_label_funcs(querier):
    df = pql.query(
        querier,
        'label_join(label_replace('
        "sum by (job, env) (increase(event_error[1d])), "
        '"tier", "t-$1", "job", "(api|web)"), "je", "-", "job", "env")',
    )
    rows = df.collect()
    for r in rows:
        assert r.je == f"{r.job}-{r.env}"
        if r.job in ("api", "web"):
            assert r.tier == f"t-{r.job}"
        else:
            assert r.tier is None  # regex must match ENTIRE value
    with pytest.raises(ValueError):
        pql.query(querier, 'label_join(event_click, "x", "-", "nolabel")')


def test_sort_and_timestamp(querier):
    vals = [
        r.value
        for r in pql.query(
            querier, "sort_desc(sum by (job) (increase(event_error[1d])))"
        ).collect()
    ]
    assert vals == sorted(vals, reverse=True)
    ts = pql.query(querier, 'timestamp(event_click{job="api"})')
    r0 = ts.first()
    assert r0.value == r0.ts_ms / 1000.0


def test_at_modifier(querier):
    """@ pins the evaluation time: instant form returns each series'
    latest lookback sample AT that time; range form pins the data
    window to (at - range, at]."""
    T = 1705505099
    e = pql.parse(f'event_click[1d] @ {T}')
    assert e.at_ms == T * 1000
    inst = pql.query(querier, f'{{env="prod"}} @ {T}')
    rows = inst.collect()
    assert all(r.ts_ms == T * 1000 for r in rows)
    assert len({r.series_id for r in rows}) == len(rows)  # one per series
    rng = pql.query(querier, f"sum by (job) (increase(event_error[1d] @ {T}))")
    # data window pinned: no bucket may start at/after the eval time,
    # none may end before at - range
    for r in rng.collect():
        assert r.bucket_ms <= T * 1000
        assert r.bucket_ms + 86_400_000 > T * 1000 - 86_400_000


def test_bool_and_group_right(querier):
    base = pql.query(querier, "sum by (job, env) (increase(event_error[1d]))")
    b = pql.query(
        querier, "sum by (job, env) (increase(event_error[1d])) > bool 50"
    )
    assert b.count() == base.count()  # bool never filters
    assert {r.value for r in b.collect()} <= {0.0, 1.0}
    # vector-vector bool through the generic path
    bv = pql.query(
        querier,
        "sum by (job, env) (increase(event_error[1d]))"
        " >= bool sum by (job, env) (increase(event_error[1d]))",
    )
    assert {r.value for r in bv.collect()} == {1.0}  # x >= x always
    # group_right mirrors group_left with operand order preserved
    gl = pql.query(
        querier,
        "sum by (job, env) (increase(event_error[1d]))"
        " / ignoring(env) group_left sum by (job) (increase(event_error[1d]))",
    )
    gr = pql.query(
        querier,
        "sum by (job) (increase(event_error[1d]))"
        " / ignoring(env) group_right sum by (job, env) (increase(event_error[1d]))",
    )
    gl_m = {(r.job, r.env, r.bucket_ms): r.value for r in gl.collect()}
    gr_m = {(r.job, r.env, r.bucket_ms): 1 / r.value
            for r in gr.collect() if r.value}
    for k in gl_m:
        if gl_m[k]:
            assert abs(gl_m[k] - gr_m[k]) < 1e-4


def test_histogram_quantile_parsed(querier):
    """Parser-level histogram_quantile over a virtual _bucket metric
    must equal the hand-composed histogram_buckets + histogram_quantile
    pipeline (rate and increase compile identically — the window factor
    cancels out of the rank arithmetic)."""
    parsed = pql.query(
        querier,
        "histogram_quantile(0.9,"
        " sum by (job, le) (increase(event_error_bucket[1d])))",
    )
    sel = querier.select(
        [Matcher("=", "__name__", "event_error")], sort=False
    )
    manual = promql.histogram_quantile(
        promql.histogram_buckets(sel, querier.series, ["job"], 86_400_000),
        0.9,
        ["job"],
    ).withColumnRenamed("quantile", "value")
    assert _rows(parsed) == _rows(manual)
    via_rate = pql.query(
        querier,
        "histogram_quantile(0.9,"
        " sum by (job, le) (rate(event_error_bucket[1d])))",
    )
    assert _rows(via_rate) == _rows(parsed)


def test_histogram_quantile_grammar_errors():
    with pytest.raises(ValueError):  # by() without le
        pql.parse(
            "histogram_quantile(0.9, sum by (job) (rate(event_error_bucket[1d])))"
        )
    with pytest.raises(ValueError):  # metric must end in _bucket
        pql.parse("histogram_quantile(0.9, rate(event_error[1d]))")
    with pytest.raises(ValueError):  # only rate/increase inside
        pql.parse(
            "histogram_quantile(0.9, delta(event_error_bucket[1d]))"
        )


def test_time_scalar_vector_scaffolding(querier):
    # time() resolves to the vector's own bucket time in seconds
    t = pql.query(querier, "time() - max_over_time(event_error[1d])")
    mx = pql.query(querier, "max_over_time(event_error[1d])")
    exp = {
        (r.series_id, r.bucket_ms): round(r.bucket_ms / 1000.0 - r.value, 6)
        for r in mx.collect()
    }
    got = {(r.series_id, r.bucket_ms): r.value for r in t.collect()}
    assert got == pytest.approx(exp)
    # scalar(): per-bucket shares sum to ~1 across jobs
    sr = pql.query(
        querier,
        "sum by (job) (increase(event_error[1d]))"
        " / scalar(sum(increase(event_error[1d])))",
    )
    by_bucket: dict = {}
    for r in sr.collect():
        by_bucket.setdefault(r.bucket_ms, 0.0)
        by_bucket[r.bucket_ms] += r.value or 0.0
    assert all(abs(v - 1.0) < 1e-3 for v in by_bucket.values())
    # vector(): constant one-element vector
    v = pql.query(querier, "vector(2.5)").collect()
    assert len(v) == 1 and v[0].value == 2.5
    # scalar-valued expressions are rejected standalone
    with pytest.raises(ValueError):
        pql.parse("time()")
    with pytest.raises(ValueError):
        pql.parse("scalar(sum(increase(event_error[1d])))")


def test_sliding_step_grid_rate(querier):
    """step_ms < window -> sliding evaluation; at window-aligned starts
    the sliding window covers exactly one tumbling bucket, so those
    rows must equal the tumbling rate()."""
    DAY, H6 = 86_400_000, 21_600_000
    sliding = pql.query(querier, "rate(event_error[1d])", step_ms=H6)
    tumbling = pql.query(querier, "rate(event_error[1d])")
    s = {
        (r.series_id, r.bucket_ms): r.value
        for r in sliding.collect()
        if r.bucket_ms % DAY == 0
    }
    t = {(r.series_id, r.bucket_ms): r.value for r in tumbling.collect()}
    assert s == t
    # 4x as many distinct window starts as tumbling buckets (minus grid
    # edges): every step offset appears
    starts = {r.bucket_ms % DAY for r in sliding.collect()}
    assert starts == {0, H6, 2 * H6, 3 * H6}
    # step == window (or no step) keeps the tumbling path
    same = pql.query(querier, "rate(event_error[1d])", step_ms=DAY)
    assert {tuple(r) for r in same.collect()} == {
        tuple(r) for r in tumbling.collect()
    }


def test_parse_limitk_grouped_topk_and_at_sentinels():
    from agni_spark.promql_parser import parse

    a = parse("limitk(5, event_click)")
    assert a.op == "limitk" and a.k == 5
    r = parse("limit_ratio(0.25, event_click)")
    assert r.op == "limit_ratio" and r.q == 0.25
    t = parse("topk by (job) (2, event_click)")
    assert (t.op, t.mode, t.labels, t.k) == ("topk", "by", ["job"], 2)
    s = parse("event_click @ end()")
    assert s.at_ms == "end"
    hw = parse("double_exponential_smoothing(event_click[1h], 0.5, 0.3)")
    assert hw.name == "holt_winters" and hw.scalar == 0.5 and hw.scalar2 == 0.3


def test_at_sentinel_requires_bounds(querier):
    import pytest as _pytest

    from agni_spark import promql_parser as pql

    with _pytest.raises(ValueError, match="requires explicit query bounds"):
        pql.query(querier, "event_click @ start()").collect()


def test_materialize_rules_roundtrip(spark, querier, tmp_path):
    # evaluate -> persist -> query-back: the ruler loop
    from pyspark.sql import functions as F

    from agni_spark import promql_parser as pql
    from agni_spark.matchers import eq
    from agni_spark.querier import querier_from_store

    store = str(tmp_path / "rules_store")
    rules = {
        "job:clicks:increase1d": "sum by (job) (increase(event_click[1d]))",
    }
    pql.materialize_rules(querier, rules, store)

    back = querier_from_store(spark, store)
    # the recorded metric is selectable by its rule name like any metric
    got = back.select([eq("__name__", "job:clicks:increase1d")])
    direct = pql.query(querier, "sum by (job) (increase(event_click[1d]))")
    d = {
        (r.job, r.bucket_ms): r.value
        for r in direct.where(F.col("value").isNotNull()).collect()
    }
    jobs = {r.series_id: r.job for r in back.series.collect()}
    g = {(jobs[r.series_id], r.ts_ms): r.value for r in got.collect()}
    assert g == d and len(g) > 0
    # label API works over the store-backed querier
    assert back.label_values("job") is not None


def test_trig_functions(spark, querier):
    import math

    # deg(rad(x)) is the identity up to float noise; pi() folds to a NUM
    base = pql.query(querier, "sum by (job) (increase(event_click[1d]))")
    ident = pql.query(
        querier, "deg(rad(sum by (job) (increase(event_click[1d]))))"
    )
    b = {(r.job, r.bucket_ms): r.value for r in base.collect()}
    i = {(r.job, r.bucket_ms): r.value for r in ident.collect()}
    assert b.keys() == i.keys() and len(b) > 0
    assert all(
        abs(b[k] - i[k]) < 1e-6 for k in b if b[k] is not None
    )
    # sin through the parser equals sin applied to the base vector
    got = pql.query(
        querier, "sin(sum by (job) (increase(event_click[1d])))"
    )
    g = {(r.job, r.bucket_ms): r.value for r in got.collect()}
    assert all(
        abs(g[k] - math.sin(b[k])) < 1e-9 for k in b if b[k] is not None
    )
    # pi() parses to a scalar literal usable in arithmetic (a bare
    # scalar is rejected at the top level like any NUM — wrap it)
    e = pql.parse("vector(pi())")
    assert abs(e.s - math.pi) < 1e-15
    # hyperbolics use the exp() identity (oracle-restatable float path)
    th = pql.query(
        querier, "tanh(sum by (job) (increase(event_click[1d])))"
    )
    t = {(r.job, r.bucket_ms): r.value for r in th.collect()}
    assert all(
        abs(
            t[k]
            - (math.exp(b[k]) - math.exp(-b[k]))
            / (math.exp(b[k]) + math.exp(-b[k]))
        ) < 1e-9
        for k in b
        if b[k] is not None and abs(b[k]) < 700
    )
