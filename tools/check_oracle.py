"""Local simulator of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same sf dir; compares row count,
column names, and (order-insensitively) the values — exact for
ints/strings, with a near-miss report for floats so hash-breaking
float divergence is caught before the real driver runs.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA-MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avn = av.astype(float).to_numpy()
            bvn = bv.astype(float).to_numpy()
            exact = np.array_equal(avn, bvn, equal_nan=True)
            if not exact:
                close = np.allclose(avn, bvn, rtol=1e-9, atol=1e-12, equal_nan=True)
                worst = np.nanmax(np.abs(avn - bvn)) if len(avn) else 0.0
                return (
                    f"FLOAT-{'NEAR' if close else 'FAR'} col={c} maxabsdiff={worst:.3g}"
                )
        else:
            if not av.equals(bv):
                diff = (av != bv) & ~(av.isna() & bv.isna())
                i = int(np.argmax(diff.to_numpy())) if diff.any() else 0
                return f"VALUE-MISMATCH col={c} row{i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from agni_spark.session import get_spark

    spark = get_spark("check-oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"{name:28s} rows-only  n={len(sdf)}  {time.time()-t0:.1f}s")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"{name:28s} DUCK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(name, sdf, ddf)
        status = verdict if verdict != "OK" else f"OK n={len(sdf)}"
        if verdict != "OK":
            failures += 1
        print(f"{name:28s} {status}  {time.time()-t0:.1f}s")
    spark.stop()
    print(f"{'FAILURES' if failures else 'ALL OK'}: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
