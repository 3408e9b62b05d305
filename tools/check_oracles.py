"""Local mirror of the driver's correctness gate: run every suite query
on Spark and its DuckDB oracle side-by-side, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [--strict] [sf_dir] [query ...]

``--strict`` mimics the driver's comparator instead of the default
float-tolerant one: every cell is canonicalized with str() — so a
Spark DECIMAL '363566.20' vs a DuckDB DOUBLE 363566.2 FAILS, as do
int64-vs-float64 (bigint vs HUGEINT) drifts that float coercion hides.
Run strict before claiming a query done; the driver gate is strict.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


import datetime as _dt


def _canon(v):
    if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
        return "␀NULL"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") or df[c].dtype == object:
            if str(df[c].dtype).startswith("datetime64") and getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].map(_canon)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _dtype_kind(dt) -> str:
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime"
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    return "object"


def compare(
    name: str,
    spark_pdf: pd.DataFrame,
    duck_pdf: pd.DataFrame,
    strict: bool = False,
) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    if strict:
        # Driver-equivalent: canonicalize every cell to str and compare
        # exactly. Dtype drift (Decimal vs float, int64 vs HUGEINT→
        # float64) surfaces as value diffs like '1.20' vs '1.2'.
        for c in sc:
            sk = _dtype_kind(spark_pdf[c].dtype)
            dk = _dtype_kind(duck_pdf[c].dtype)
            # object-vs-datetime is fine (Spark dates arrive as
            # datetime.date objects; _canon strings them identically);
            # numeric-kind drift is the real gate killer.
            if sk != dk and not {sk, dk} <= {"object", "datetime"}:
                problems.append(f"col {c}: dtype kind spark={sk}({spark_pdf[c].dtype}) duck={dk}({duck_pdf[c].dtype})")
        s = spark_pdf.copy().reindex(sc, axis=1)
        d = duck_pdf.copy().reindex(sc, axis=1)
        for frame in (s, d):
            for c in frame.columns:
                if str(frame[c].dtype).startswith("datetime64") and getattr(frame[c].dt, "tz", None) is not None:
                    frame[c] = frame[c].dt.tz_localize(None)
                frame[c] = frame[c].map(_canon)
        s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
        d = d.sort_values(by=list(d.columns), kind="mergesort").reset_index(drop=True)
        for c in s.columns:
            sv2 = s[c].to_numpy()
            dv2 = d[c].to_numpy()
            if not (sv2 == dv2).all():
                bad = int((sv2 != dv2).sum())
                ex_i = int(np.argmax(sv2 != dv2))
                problems.append(
                    f"col {c}: {bad} strict diffs e.g. row{ex_i} spark={sv2[ex_i]!r} duck={dv2[ex_i]!r}"
                )
        return problems
    s, d = normalize(spark_pdf.copy()), normalize(duck_pdf.copy())
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv2 = sv.astype(float).to_numpy()
            dv2 = dv.astype(float).to_numpy()
            both_nan = np.isnan(sv2) & np.isnan(dv2)
            eq = (sv2 == dv2) | both_nan
            if not eq.all():
                bad = int((~eq).sum())
                mx = np.nanmax(np.abs(np.where(both_nan, 0, sv2 - dv2)))
                problems.append(f"col {c}: {bad} value diffs (max abs {mx:.3e})")
        else:
            sv2 = sv.astype(str).to_numpy()
            dv2 = dv.astype(str).to_numpy()
            if not (sv2 == dv2).all():
                bad = int((sv2 != dv2).sum())
                ex_i = int(np.argmax(sv2 != dv2))
                problems.append(
                    f"col {c}: {bad} value diffs e.g. row{ex_i} spark={sv2[ex_i]!r} duck={dv2[ex_i]!r}"
                )
    return problems


def main():
    args = sys.argv[1:]
    strict = "--strict" in args
    if strict:
        args.remove("--strict")
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from automated_data_pipeline_spark.suite import all_specs

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    if vanilla:
        # emulate the driver's gate exactly: a bare SparkSession with
        # default confs (200 shuffle partitions, no UTC pin, NTZ
        # inference on) — every query must self-provision what it needs
        # through suite.load(). Master mirrors the driver's
        # local[$SPARK_GRAFT_CPUS]; any already-running session is
        # stopped first so getOrCreate() cannot hand back a session
        # carrying non-default confs (which would defeat the emulation).
        from pyspark.sql import SparkSession

        for prior in (SparkSession.getActiveSession(),
                      SparkSession._instantiatedSession):
            if prior is not None:
                prior.stop()
        assert SparkSession.getActiveSession() is None, (
            "a configured session survived stop(); vanilla emulation "
            "would inherit its confs"
        )
        cpus = os.environ["SPARK_GRAFT_CPUS"]
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        from automated_data_pipeline_spark.session import get_spark

        spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_skip = 0
    for s in all_specs():
        if only and s.name not in only:
            continue
        t0 = time.time()
        try:
            spdf = s.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {s.name}: spark error: {e}")
            n_fail += 1
            continue
        if s.oracle is None:
            print(f"skip  {s.name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            dpdf = con.execute(s.oracle).df()
        except Exception as e:
            print(f"FAIL  {s.name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = compare(s.name, spdf, dpdf, strict=strict)
        if problems:
            print(f"FAIL  {s.name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {s.name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} FAIL, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
