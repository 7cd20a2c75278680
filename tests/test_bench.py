"""Bench-protocol invariants.

The recorded per-round numbers are only comparable if no timed run can
warm a later one through Spark's plan-matching CacheManager — the r6
accounting hazard (leaked persists silently served runs 2-3 of a
median-of-3). bench._cold is the structural fix; these tests pin that
it scrubs every cache a leak could hide in while leaving locally-
checkpointed RDDs alone (their lineage is truncated, so unpersisting
one makes it unrecomputable — and a fresh plan can't match it through
the CacheManager anyway).

The emitter tests pin the round-9 recording contract: the driver
captures only the last ~2000 chars of stdout, so the JSON line must
fit that window for the WORST-CASE row set (BENCH_r08 lost its
headline total and 16 rows to a prose-bloated line) and the prose
notes must go to stderr.
"""

import io
import json

from pyspark.sql import functions as F


def _n_pinned(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _n_scrubbable(spark) -> int:
    """Pinned RDDs _cold is SUPPOSED to scrub: everything except
    locally-checkpointed ones (spared by design — and other tests in
    the shared session may legitimately leave those behind)."""
    n = 0
    for jrdd in list(
        spark.sparkContext._jsc.getPersistentRDDs().values()
    ):
        try:
            if jrdd.rdd().isLocallyCheckpointed():
                continue
        except Exception:
            pass
        n += 1
    return n


def test_cold_scrubs_caches_but_spares_local_checkpoints(spark):
    import bench

    # plant the leak shapes a query can leave behind, plus a
    # localCheckpoint (handle state a probe ctx may legitimately hold)
    df = spark.range(100).persist()
    df.count()
    ck = spark.range(50).localCheckpoint(eager=True)
    spark.range(25).createOrReplaceTempView("bench_cold_t")
    spark.catalog.cacheTable("bench_cold_t")
    spark.table("bench_cold_t").count()
    assert _n_pinned(spark) >= 3
    bench._cold(spark)
    # persist + cached table scrubbed; the localCheckpoint survives
    # AND is still readable (unpersisting it would have made it
    # unrecomputable — the r8 ADVICE footgun). Count scrubbable pins,
    # not total pins: other tests in the shared session may leave
    # their own localCheckpoints behind, which _cold spares by design.
    assert _n_scrubbable(spark) == 0
    assert not spark.catalog.isCached("bench_cold_t")
    assert ck.count() == 50
    ck.unpersist()
    spark.catalog.dropTempView("bench_cold_t")


def test_no_cache_survives_between_probe_invocations(spark, tmp_path):
    """Two bench probe invocations with _cold between them: the second
    starts with zero pinned RDDs/tables (nothing from run 1 can warm
    it) and still returns identical results."""
    import bench
    from agni_spark.functions import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    simsearch.write_ivf_index(emb, path, n_centroids=8)
    bench._cold(spark)
    r1 = [
        tuple(r)
        for r in simsearch.ivf_ann_stored(spark, path, q, k=5).collect()
    ]
    bench._cold(spark)
    assert _n_scrubbable(spark) == 0
    assert len(spark.catalog.listTables()) == 0 or all(
        not spark.catalog.isCached(t.name)
        for t in spark.catalog.listTables()
        if t.tableType == "TEMPORARY"
    )
    r2 = [
        tuple(r)
        for r in simsearch.ivf_ann_stored(spark, path, q, k=5).collect()
    ]
    assert r1 == r2


def test_emit_line_fits_driver_capture_and_prose_goes_to_stderr(tmp_path):
    """The FULL expected row set (headliners + every build/probe/warm
    split row), emitted with worst-case-width values AND the round-11
    per-row mins array, must fit the driver's ~2000-char stdout tail
    with headroom — and parse back to the exact numbers. Prose notes
    land on stderr and in BENCH_NOTES.md; the mins array is positional
    against the queries key order (the spread contract the r10 drift
    adjudication was missing)."""
    import bench

    rows = bench._expected_rows()
    # sanity: the round-9 additions are present
    assert "simsearch_pagerank_stored_probe" in rows
    assert "simsearch_graph_stored_probe_warm" in rows
    assert "simsearch_pagerank_stored_build" not in rows  # shared artifact
    results = {name: 123.456 for name in rows}  # worst-case width
    mins = {name: 120.123 for name in rows}
    out, err = io.StringIO(), io.StringIO()
    notes = str(tmp_path / "BENCH_NOTES.md")
    line = bench._emit(results, 0.1, out=out, err=err, mins=mins,
                       runs=3, notes_path=notes)
    assert len(line) <= bench._MAX_LINE, len(line)
    assert out.getvalue().strip() == line
    parsed = json.loads(line)
    # every COLD row is in the line verbatim; at worst-case widths the
    # *_probe_warm duplicates may shed to BENCH_NOTES.md (the r10
    # verdict's own space valve), counted by the "warm" marker
    cold = {k: v for k, v in results.items()
            if not k.endswith("_probe_warm")}
    assert all(parsed["queries"][k] == v for k, v in cold.items())
    shed = set(results) - set(parsed["queries"])
    assert all(k.endswith("_probe_warm") for k in shed)
    if shed:
        assert parsed["warm"] == len(shed)
    assert parsed["metric"] == "headline_queries_wall_total"
    assert parsed["sf"] == 0.1
    # round-11 spread contract: runs + positional spread survive the
    # cap even at worst-case row widths (spread_pct[i] pairs with the
    # i-th queries key; (123.456-120.123)/123.456 = 2.7% -> 3)
    assert parsed["runs"] == 3
    assert parsed["spread_pct"] == [3] * len(parsed["queries"])
    assert len(parsed["spread_pct"]) == len(parsed["queries"])
    # stdout is ONLY the JSON line; the notes are on stderr and quote
    # recorded numbers, never aspirations
    assert "\n" not in out.getvalue().strip()
    assert "123.456" in err.getvalue()
    # ... and the record is reconstructable from the repo alone: the
    # notes file holds the prose plus the per-row median/min table,
    # INCLUDING any warm rows the line shed
    with open(notes) as f:
        body = f.read()
    assert "123.456" in body and "120.123" in body
    assert "| simsearch_pagerank_stored_probe |" in body
    for k in shed:
        assert f"| {k} |" in body


def test_emit_drops_note_then_spread_rather_than_overflow(tmp_path):
    import bench

    # pathological row set: many long names — the emitter must shed
    # the note, then the spread array (medians are the cross-round
    # contract; the exact median/min table survives in the notes
    # file), instead of emitting an unparseable tail
    results = {f"extremely_long_query_name_number_{i:04d}": 1.0
               for i in range(40)}
    mins = {k: 0.9 for k in results}
    out, err = io.StringIO(), io.StringIO()
    line = bench._emit(results, 0.1, out=out, err=err, mins=mins,
                       runs=3, notes_path=str(tmp_path / "n.md"))
    parsed = json.loads(line)
    assert parsed["queries"] == results
    assert len(line) <= bench._MAX_LINE

    # so big the queries dict alone busts the cap: spread is shed, the
    # medians still parse (pre-existing last-resort behavior), and the
    # notes file keeps the full record
    huge = {f"an_even_longer_pathological_row_name_{i:05d}": 1.0
            for i in range(60)}
    line2 = bench._emit(huge, 0.1, out=io.StringIO(), err=io.StringIO(),
                        mins={k: 0.9 for k in huge}, runs=3,
                        notes_path=str(tmp_path / "n2.md"))
    parsed2 = json.loads(line2)
    assert parsed2["queries"] == huge
    assert "spread_pct" not in parsed2  # shed to keep medians parseable
    with open(tmp_path / "n2.md") as f:
        assert "| 1.0 | 0.9 |" in f.read()


def test_emit_records_host_load_in_notes(tmp_path):
    """The notes record carries the run's start/end load averages (the
    host evidence the r14 steal-phase adjudication needed) without
    touching the JSON driver contract; omitting it says so explicitly
    instead of silently dropping the field."""
    import bench

    results = {"p7_select_samples": 1.0}
    out, err = io.StringIO(), io.StringIO()
    notes = str(tmp_path / "n.md")
    line = bench._emit(results, 0.1, out=out, err=err,
                       mins={"p7_select_samples": 0.9}, runs=3,
                       notes_path=notes,
                       hostload="start 0.50/0.60/0.70, end 1.10/0.90/0.80")
    assert "loadavg" not in line and "hostload" not in line  # JSON untouched
    with open(notes) as f:
        body = f.read()
    assert "start 0.50/0.60/0.70, end 1.10/0.90/0.80" in body
    assert "start 0.50/0.60/0.70" in err.getvalue()

    line2 = bench._emit(results, 0.1, out=io.StringIO(),
                        err=io.StringIO(), runs=3,
                        notes_path=str(tmp_path / "n2.md"))
    assert json.loads(line2)["queries"] == results
    with open(tmp_path / "n2.md") as f:
        assert "host load average: not recorded" in f.read()
