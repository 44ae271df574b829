"""Local replica of the driver's DuckDB-oracle correctness gate.

For every entry in the registry with an oracle: run the Spark query and the
DuckDB SQL on the same parquet tables, then compare row count, column names,
and the order-insensitive multiset of row values (exact — floats must match
bitwise, which the decimal-sum/round policy guarantees).

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from drive_health_etl_spark.plans.registry import REGISTRY
from drive_health_etl_spark.session import get_spark
from drive_health_etl_spark.sources.tables import TABLES


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, decimal.Decimal):
        # Strict: a Decimal cell never equals an int cell, mirroring the
        # driver's type-sensitive value hash (DuckDB SUM(BIGINT) -> HUGEINT).
        return ("decimal", str(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if v is None:
        return ("null",)
    return ("str", str(v))


def _canon_type(t: str) -> str:
    """Coarse numeric-width-sensitive type lattice shared by Spark dtypes and
    DuckDB type names. The driver's value hash diverges when DuckDB promotes
    an aggregate to HUGEINT/DECIMAL while Spark stays bigint/double — so those
    map to DIFFERENT canon buckets on purpose (the round-1 failure class)."""
    t = t.strip().upper()
    if re.match(r"^(TINYINT|SMALLINT|INT(EGER)?|BIGINT|BYTE|SHORT|LONG|U?INT\d*)$", t):
        return "i64"
    if t == "HUGEINT" or t.startswith("DECIMAL") or t.startswith("NUMERIC"):
        return "dec"
    if t in ("FLOAT", "REAL", "DOUBLE", "DOUBLE PRECISION"):
        return "f64"
    if t in ("VARCHAR", "STRING", "TEXT", "CHAR", "BPCHAR"):
        return "str"
    if t in ("BLOB", "BINARY", "BYTEA", "VARBINARY"):
        return "bin"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t in ("BOOLEAN", "BOOL"):
        return "bool"
    if t.startswith(("ARRAY", "LIST")) or t.endswith("[]"):
        return "list"
    if t.startswith(("STRUCT", "MAP", "ROW")):
        return "struct"
    return t


def _type_problems(s_cols, s_dtypes, d_cols, d_types):
    """Column-name-aligned declared-type compatibility between Spark and the
    DuckDB oracle (coarse lattice; element types of containers ignored)."""
    s_map = {c: _canon_type(t) for c, t in zip(s_cols, s_dtypes)}
    d_map = {c: _canon_type(str(t)) for c, t in zip(d_cols, d_types)}
    out = []
    for c in s_map:
        if c in d_map and s_map[c] != d_map[c]:
            out.append(f"type mismatch on '{c}': spark={s_map[c]} duckdb={d_map[c]}")
    return out


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, con, name, fn, sql, sf_dir):
    import time as _time

    t0 = _time.monotonic()
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_dtypes = [t for _, t in sdf.dtypes]
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = _time.monotonic() - t0
    t0 = _time.monotonic()
    try:
        rel = con.sql(sql)
        d_cols = list(rel.columns)
        d_types = list(rel.types)
        d_rows = rel.fetchall()
    except Exception as e:  # oracle itself failed
        return {"name": name, "ok": False, "why": f"oracle error: {e}"}
    t_duck = _time.monotonic() - t0

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    else:
        problems.extend(_type_problems(s_cols, s_dtypes, d_cols, d_types))
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        cs, cd = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
        if cs != cd:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
            )
            problems.append(f"values differ at sorted row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
    return {
        "name": name,
        "ok": not problems,
        "why": "; ".join(problems),
        "rows": len(s_rows),
        "t_spark": round(t_spark, 2),
        "t_duck": round(t_duck, 2),
    }


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    spark = get_spark("oracle-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, (fn, sql) in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        if sql is None:
            df = fn(spark, sf_dir)
            print(f"ROWS-ONLY {name}: {df.count()} rows")
            continue
        try:
            r = compare_query(spark, con, name, fn, sql, sf_dir)
        except Exception as e:
            r = {"name": name, "ok": False, "why": f"spark error: {e}"}
        if r["ok"]:
            n_pass += 1
            print(
                f"PASS {name} ({r['rows']} rows, "
                f"spark {r['t_spark']}s, duck {r['t_duck']}s)"
            )
        else:
            n_fail += 1
            print(f"FAIL {name}: {r['why']}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
