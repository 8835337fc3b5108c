#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's t2 gate: run graft.Verify (Spark) to dump each query
result as parquet + oracle_sql.json, then run each oracle SQL in DuckDB
over the same testdata parquet tables, sort columns by name, sort rows,
and compare values exactly (floats must be bit-equal — the Scala side
uses decimal-exact aggregation to guarantee this).

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify] [query...]
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify(sf_dir, out_dir):
    import subprocess
    cmd = ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify run failed")


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    problems = []
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"rowcount spark={len(s)} duck={len(d)}")
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            problems.append(f"dtype[{c}] spark={sv.dtype} duck={dv.dtype}")
        for i, (a, b) in enumerate(zip(sv, dv)):
            eq = (a == b) or (a is None and b is None)
            try:
                if isinstance(a, float) and isinstance(b, float):
                    eq = (a == b) or (math.isnan(a) and math.isnan(b))
            except Exception:
                pass
            if not eq and not (pd.isna(a) and pd.isna(b)):
                problems.append(f"value[{c}][row {i}] spark={a!r} duck={b!r}")
                break
    return problems


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv:
        run_verify(sf_dir, out_dir)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            n_bad += 1
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for p in problems[:6]:
                print(f"   {p}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
