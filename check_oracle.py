"""Offline oracle check: run every catalog query through Spark AND its
DuckDB oracle SQL, compare row multisets exactly (order-insensitive,
exact values — the driver's hash comparison is at least this strict).

Usage: python check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = sys.argv[2:]


def norm(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def main():
    import duckdb
    from bench import COPIES, make_spark
    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                       files=494 * COPIES)
    spark.sparkContext.setLogLevel("ERROR")
    from stakgraph_spark.textops.catalog import CATALOG

    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "region", "part", "supplier"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, (fn, sql) in CATALOG.items():
        if ONLY and name not in ONLY:
            continue
        if sql is None:
            print(f"{name}: no oracle (skipped)")
            continue
        srows = [tuple(norm(v) for v in r) for r in fn(spark, SF_DIR).collect()]
        orows = [tuple(norm(v) for v in r) for r in con.execute(sql).fetchall()]
        ok = sorted(map(repr, srows)) == sorted(map(repr, orows))
        print(f"{name}: rows {len(srows)}/{len(orows)} "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(name)
            sset, oset = set(map(repr, srows)), set(map(repr, orows))
            for x in list(sset - oset)[:3]:
                print("  spark-only:", x[:200])
            for x in list(oset - sset)[:3]:
                print("  oracle-only:", x[:200])
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
