#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
(already done by caller or via --run), then compare each query's parquet
output against the DuckDB oracle in oracle_sql.json.

Usage:
  python3 tools/verify_local.py [--sf SFDIR] [--out OUTDIR] [names...]
"""
import json, math, os, subprocess, sys

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"
OUT = "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name, spark_df, oracle_df):
    problems = []
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        return [f"schema mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s = spark_df[s_cols].sort_values(by=s_cols).reset_index(drop=True)
    o = oracle_df[o_cols].sort_values(by=o_cols).reset_index(drop=True)
    n = min(len(s), len(o))
    for c in s_cols:
        sv, ov = s[c][:n], o[c][:n]
        try:
            if sv.dtype.kind == 'f' or ov.dtype.kind == 'f':
                sv = sv.astype(float); ov = ov.astype(float)
                both_nan = sv.isna() & ov.isna()
                neq = ~both_nan & (sv != ov)
                if neq.any():
                    idx = neq.idxmax()
                    diff = (sv[neq] - ov[neq]).abs().max()
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, max abs diff {diff:.3e}, "
                        f"first at row {idx}: spark={sv[idx]!r} oracle={ov[idx]!r}")
            else:
                sv2 = sv.astype(str); ov2 = ov.astype(str)
                neq = sv2 != ov2
                if neq.any():
                    idx = neq.idxmax()
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, first at row {idx}: "
                        f"spark={sv[idx]!r} oracle={ov[idx]!r}")
        except Exception as ex:
            problems.append(f"col {c}: compare error {ex}")
    return problems


def main():
    args = sys.argv[1:]
    sf, out = SF, OUT
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf": sf = args[i + 1]; i += 2
        elif args[i] == "--out": out = args[i + 1]; i += 2
        else: names.append(args[i]); i += 1

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out)):
        path = os.path.join(out, name)
        if not os.path.isdir(path):
            continue
        if names and name not in names:
            continue
        spark_df = pd.read_parquet(path)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_df)} vs {len(oracle_df)} rows)")
            for p in problems[:6]:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"pass {name} ({len(spark_df)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
