"""Spot-check a subset of registry queries against their DuckDB oracles.

Usage: python scripts/check_queries.py q_name [q_name ...] [--sf SF_DIR]

Same canonicalization as scripts/driver_sim.py, but only for the named
queries — the fast inner loop while developing a new operator.
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from scripts.driver_sim import TABLES, norm  # noqa: E402

import __spark_entry__ as e  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    names = argv
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name in names:
        try:
            sdf = qs[name](spark, sf)
            if name not in osql:
                print(f"{name}: rows-only, {sdf.count()} rows")
                continue
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = sorted(
                (tuple(norm(v) for _, v in sorted(zip(s_cols, r)))
                 for r in (tuple(row) for row in sdf.collect())),
                key=repr,
            )
            res = con.execute(osql[name])
            d_cols = [c[0].lower() for c in res.description]
            d_rows = sorted(
                (tuple(norm(v) for _, v in sorted(zip(d_cols, r)))
                 for r in res.fetchall()),
                key=repr,
            )
            ok = sorted(s_cols) == sorted(d_cols) and s_rows == d_rows
            print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(s_rows)} rows)")
            if not ok:
                fails.append(name)
                if sorted(s_cols) != sorted(d_cols):
                    print(f"  cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
                else:
                    diffs = [
                        (a, b) for a, b in zip(s_rows, d_rows) if a != b
                    ][:3]
                    print(f"  first diffs: {diffs}")
                    print(f"  rowcount spark={len(s_rows)} duck={len(d_rows)}")
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:400]}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
