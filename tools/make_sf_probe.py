#!/usr/bin/env python3
"""Build a scale-probe dataset by replicating sf0.1 N times with shifted
keys (driver-side tool, like check_oracle.py). The output is PERF-PROBE
data only — correctness always runs against the driver-generated
/root/testdata sets. Region/nation stay fixed (TPC-H dimension scaling);
fact tables shift their keys per copy so joins keep TPC-H-like fan-out.

Usage: make_sf_probe.py <srcDir> <dstDir> [copies=10] [tables]

`tables` (comma-separated) restricts the build — for the ×100 posture
probe of the event/document operators, replicating lineitem 100× would
swamp the box for queries that never read it.

events replicates with SHIFTED event/user ids (per-key event density
stays constant, key count scales with the input — the honest probe for
keyed window operators like the as-of join); ts is left alone so time
ranges keep their density too.
"""
import sys
from pathlib import Path

import duckdb

SHIFTS = {  # table -> {column: key-space letter}
    "customer": {"c_custkey": "C"},
    "orders": {"o_orderkey": "O", "o_custkey": "C"},
    "supplier": {"s_suppkey": "S"},
    "part": {"p_partkey": "P"},
    "lineitem": {"l_orderkey": "O", "l_partkey": "P", "l_suppkey": "S"},
    "documents": {"doc_id": "D"},
    "events": {"event_id": "E", "user_id": "U"},
    "embeddings": {"vec_id": "V"},
}
COPY_AS_IS = ["region", "nation"]

SPAN_SOURCES = {
    "C": ("customer", "c_custkey"),
    "O": ("orders", "o_orderkey"),
    "S": ("supplier", "s_suppkey"),
    "P": ("part", "p_partkey"),
    "D": ("documents", "doc_id"),
    "E": ("events", "event_id"),
    "U": ("events", "user_id"),
    "V": ("embeddings", "vec_id"),
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def wanted(t):
        return only is None or t in only

    spans = {
        k: con.execute(f"SELECT max({col})+1 FROM '{src}/{t}.parquet'").fetchone()[0]
        for k, (t, col) in SPAN_SOURCES.items()
        if wanted(t) or any(k in s.values() and wanted(n) for n, s in SHIFTS.items())
    }
    print(f"[probe] key spans: {spans}, copies={copies}")

    for t in COPY_AS_IS:
        if not wanted(t):
            continue
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"[probe] {t}: copied as-is")

    for t, shifts in SHIFTS.items():
        if not wanted(t):
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"{c} + {i * spans[shifts[c]]} AS {c}" if c in shifts else c for c in cols)
            selects.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"[probe] {t}: {n} rows")


if __name__ == "__main__":
    main()
