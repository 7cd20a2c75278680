"""Build BASELINE_EPOCH2.json — the round-14 host-epoch anchor.

The r13 verdict proved BENCH_r12 vs BENCH_r13 disagreed 1.22x with
zero code cause (same-host A/B of the r12 checkout): the host moved
between recording sessions, and min-of-consecutive-runs cannot see a
drift that spans the whole session. The fix is (a) the
calibration_host row bench.py now times first under the same cold
protocol — a fixed data-independent workload whose drift measures the
HOST — and (b) this anchor: per-row statistics over TWO consecutive
idle-host bench sessions (3 cold runs per row each), so every future
round adjudicates as

    normalized_delta = (row_now / row_anchor)
                       / (calibration_now / calibration_anchor)

with row_anchor = the MIN across all recorded runs (the
least-contended estimate this host produced) and calibration_anchor =
the min of the two sessions' calibration medians, both stored here.

Usage: python tools/make_epoch2.py A_stderr A_stdout B_stderr B_stdout
Writes BASELINE_EPOCH2.json at the repo root.
"""

from __future__ import annotations

import json
import re
import statistics
import sys

_ROW = re.compile(
    r"\[bench \+\s*[\d.]+s\] (\w+): \[([\d.,\s]+)\]"
)
_REBUILD = re.compile(
    r"\[bench \+\s*[\d.]+s\] (\w+) rebuild: ([\d.]+)"
)
_SENTINEL = re.compile(
    r"\[bench \+\s*[\d.]+s\] sentinel (\w+): ([\d.]+)"
)


def _parse_session(stderr_path: str, stdout_path: str) -> dict:
    text = open(stderr_path).read().replace("\r", "\n")
    runs: dict[str, list[float]] = {}
    for name, arr in _ROW.findall(text):
        runs[name] = [float(x) for x in arr.split(",")]
    # the stderr rebuild line already carries the _build suffix
    for name, v in _REBUILD.findall(text):
        runs.setdefault(name, []).append(float(v))
    sentinels = {
        name: float(v) for name, v in _SENTINEL.findall(text)
    }
    line = None
    for ln in open(stdout_path):
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            line = json.loads(ln)
    return {"runs": runs, "sentinels": sentinels, "emitted": line}


def main(argv: list[str]) -> int:
    if len(argv) != 5:
        print(__doc__)
        return 2
    a = _parse_session(argv[1], argv[2])
    b = _parse_session(argv[3], argv[4])
    rows = sorted(set(a["runs"]) | set(b["runs"]))
    mins, medians_a, medians_b, n_runs = {}, {}, {}, {}
    for r in rows:
        ra, rb = a["runs"].get(r, []), b["runs"].get(r, [])
        mins[r] = round(min(ra + rb), 3)
        n_runs[r] = len(ra) + len(rb)
        if ra:
            medians_a[r] = round(statistics.median(ra), 3)
        if rb:
            medians_b[r] = round(statistics.median(rb), 3)
    cal = min(
        medians_a.get("calibration_host", float("inf")),
        medians_b.get("calibration_host", float("inf")),
    )
    out = {
        "epoch": 2,
        "recorded": "2026-08-16",
        "protocol": (
            "two consecutive idle-host sessions, 3 cold runs/row each "
            "(builds re-timed once at end-of-run), sf0.1 local[32]; "
            "queries = MIN across all runs (least-contended estimate); "
            "calibration_host = min of the two sessions' medians; "
            "adjudication rule: (row_now/row_anchor) / "
            "(cal_now/cal_anchor), read alongside per-session medians"
        ),
        "calibration_host": round(cal, 3),
        "queries": mins,
        "n_runs": n_runs,
        "medians_session_a": medians_a,
        "medians_session_b": medians_b,
        "sentinels_session_a": a["sentinels"],
        "sentinels_session_b": b["sentinels"],
        "emitted_session_a": a["emitted"],
        "emitted_session_b": b["emitted"],
    }
    with open("BASELINE_EPOCH2.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"BASELINE_EPOCH2.json: {len(rows)} rows, "
        f"calibration_host={out['calibration_host']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
