#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching oracle SQL from oracle_sql.json in DuckDB with views named
after the parquet tables in <sfDir>. Canonicalizes both sides (columns
sorted by name, rows sorted by all columns) and compares values.
"""
import json, math, sys
import duckdb
import pandas as pd
import numpy as np
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
    return df


def cmp_frames(name, a: pd.DataFrame, b: pd.DataFrame):
    problems = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype != bv.dtype:
            problems.append(f"dtype[{c}]: spark={av.dtype} oracle={bv.dtype}")
        try:
            if av.dtype == object or str(av.dtype).startswith("datetime"):
                eq = (av.astype(str) == bv.astype(str))
            else:
                avf = av.astype(float)
                bvf = bv.astype(float)
                eq = (avf == bvf) | (avf.isna() & bvf.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"values[{c}] differ at row {bad}: spark={av[bad]!r} oracle={bv[bad]!r} "
                    f"({int((~eq).sum())} rows differ)")
        except Exception as e:
            problems.append(f"compare[{c}] error: {e}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ok = fail = skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq_dir = Path(out_dir, name)
        if not pq_dir.exists():
            print(f"MISSING  {name} (no spark output)")
            fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in sorted(pq_dir.glob("*.parquet"))]) \
            if list(pq_dir.glob("*.parquet")) else pd.DataFrame()
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            fail += 1
            continue
        problems = cmp_frames(name, spark_df, odf)
        vals = [p for p in problems if not p.startswith("dtype")]
        dt = [p for p in problems if p.startswith("dtype")]
        if not vals:
            ok += 1
            print(f"OK       {name} ({len(spark_df)} rows)" +
                  (f"  [dtype warn: {'; '.join(dt)}]" if dt else ""))
        else:
            fail += 1
            print(f"FAIL     {name}: " + "; ".join(problems))
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
