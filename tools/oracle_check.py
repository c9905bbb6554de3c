"""Local mirror of the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB
at the given SF dir, then compares row count, column names, and
order-insensitive values (exact equality after column-name sort + row
sort). Prints a per-query verdict and a summary.

Usage: python tools/oracle_check.py [--json OUT.json] [sf_dir] [query_name ...]

With --json, also writes a driver-shaped artifact: one object per query
with rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err (rows-only queries get {"rows_only": true, "spark_rows": N}).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from big_data_engineering_project_spark.session import get_spark  # noqa: E402
from big_data_engineering_project_spark.sources.catalog import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Decimal objects → string (scale-insensitive via float repr is
        # lossy; compare as exact strings of normalized Decimal).
        if df[c].dtype == object:
            import decimal

            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].map(
                    lambda v: str(v.normalize()) if isinstance(v, decimal.Decimal) else v
                )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    # numeric dtype unification: int32 vs int64 etc.
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c].dtype):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv.dtype):
            eq = (sv.eq(dv) | (sv.isna() & dv.isna())).all()
        else:
            eq = sv.where(sv.notna(), None).equals(dv.where(dv.notna(), None))
        if not eq:
            mism = (~(sv.eq(dv) | (sv.isna() & dv.isna()))).to_numpy().nonzero()[0][:3]
            examples = [(int(i), sv.iloc[i], dv.iloc[i]) for i in mism]
            problems.append(f"values col={c} examples={examples}")
    return problems


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    report: dict[str, dict] = {}
    from big_data_engineering_project_spark.caches import (
        clear_all_owned_caches,
    )

    for name, builder in queries.items():
        if only and name not in only:
            continue
        # Reclaim operator-owned persists from the PREVIOUS query (CC
        # labels, range-rank frames, ...) — a 190+-query sweep is one
        # long-lived session and orphaned cached frames accumulate.
        # The cross-query shingle-index memo manages its own lifecycle
        # and is untouched.
        clear_all_owned_caches()
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {traceback.format_exc(limit=1)}",
            }
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only) rows={len(sdf)}")
            n_skip += 1
            # Name the pytest invariants that DO verify this query so
            # the rows-only artifact row carries its evidence trail.
            from big_data_engineering_project_spark.plans import REGISTRY

            report[name] = {
                "rows_only": True,
                "spark_rows": len(sdf),
                "err": None,
                "pytest_invariants": list(
                    getattr(REGISTRY.get(name), "invariants", ()) or ()
                ),
            }
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            n_fail += 1
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": f"duckdb: {traceback.format_exc(limit=1)}",
            }
            continue
        problems = compare(name, sdf, ddf)
        dt = time.time() - t0
        report[name] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": not any(p.startswith("columns") for p in problems),
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(ddf),
            "err": "; ".join(problems) or None,
            "sec": round(dt, 2),
        }
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass  {name} ({dt:.1f}s) rows={len(sdf)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
