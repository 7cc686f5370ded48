"""Spot-check named queries() entries against their DuckDB oracles.

Usage: python tools/check_queries.py [--sf DIR] name [name ...]
       python tools/check_queries.py --all          # full inventory

Runs each named query with a vanilla local[8] SparkSession (the driver
contract — no repo session factory) and compares row count, sorted
column names, and stringified sorted values against the oracle SQL run
by DuckDB over the same parquet directory, exactly the way the round
harness does. Exit code 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    qs, orc = mod.queries(), mod.oracle_sql()
    names = list(qs) if args.all else args.names
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            sp = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{name}: SPARK ERROR {e}")
            bad += 1
            continue
        if name not in orc:
            print(f"{name}: rows-only ({len(sp)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            du = con.execute(orc[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        cols = sorted(sp.columns)
        if sorted(du.columns) != cols:
            print(f"{name}: SCHEMA MISMATCH spark={cols} duck={sorted(du.columns)}")
            bad += 1
            continue
        if len(sp) != len(du):
            print(f"{name}: ROWS MISMATCH spark={len(sp)} duck={len(du)}")
            bad += 1
            continue
        a = sorted(map(tuple, sp[cols].astype(str).values.tolist()))
        b = sorted(map(tuple, du[cols].astype(str).values.tolist()))
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"{name}: VALUE MISMATCH e.g. {diffs}")
            bad += 1
            continue
        print(f"{name}: MATCH {len(sp)} rows ({time.time()-t0:.1f}s)")
    print("ALL MATCH" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
