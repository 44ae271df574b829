"""Driver-contract rehearsal under a BARE SparkSession — exactly what the
external checker builds (no package session configs), driving
``__spark_entry__``'s entry()/queries()/oracle_sql() end to end with the same
row-count + column + value-multiset compare as the correctness gate.

Run: python tools/vanilla_rehearsal.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_check import compare_query

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("vanilla-rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows in {time.monotonic() - t0:.1f}s")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    t_all = time.monotonic()
    for name, fn in queries.items():
        sql = oracles.get(name)
        if sql is None:
            try:
                print(f"ROWS-ONLY {name}: {fn(spark, sf_dir).count()} rows")
            except Exception as e:
                n_fail += 1
                print(f"FAIL {name}: rows-only error {e}")
            continue
        try:
            r = compare_query(spark, con, name, fn, sql, sf_dir)
        except Exception as e:
            r = {"name": name, "ok": False, "why": f"spark error: {e}"}
        if r["ok"]:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {r['why'][:300]}")
    print(
        f"\n{n_pass} pass, {n_fail} fail over {len(queries)} queries "
        f"in {time.monotonic() - t_all:.1f}s (bare session, {sf_dir})"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
