#!/usr/bin/env python3
"""Build a scale-probe dataset by replicating sf0.1 N times with shifted
keys (driver-side tool, like check_oracle.py). The output is PERF-PROBE
data only — correctness always runs against the driver-generated
/root/testdata sets. Region/nation stay fixed (TPC-H dimension scaling);
fact tables shift their keys per copy so joins keep TPC-H-like fan-out.

Usage: make_sf_probe.py <srcDir> <dstDir> [copies=10]
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
}
COPY_AS_IS = ["region", "nation", "events", "embeddings"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    spans = {
        "C": con.execute(f"SELECT max(c_custkey)+1 FROM '{src}/customer.parquet'").fetchone()[0],
        "O": con.execute(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0],
        "S": con.execute(f"SELECT max(s_suppkey)+1 FROM '{src}/supplier.parquet'").fetchone()[0],
        "P": con.execute(f"SELECT max(p_partkey)+1 FROM '{src}/part.parquet'").fetchone()[0],
        "D": con.execute(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0],
    }
    print(f"[probe] key spans: {spans}, copies={copies}")

    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"[probe] {t}: copied as-is")

    for t, shifts in SHIFTS.items():
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
