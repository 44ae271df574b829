"""Grouped-map and cogrouped pandas operators (SURVEY.md §2.9 U3 surface).

These two queries intentionally route SQL-expressible logic through
``applyInPandas`` / ``cogroup().applyInPandas`` so the DuckDB oracle
hash-checks the *pandas execution path itself* (Arrow batching, group
slicing, schema mapping) — the same pattern a real per-group Python
operator (curve fitting, merge_asof, model scoring) rides on.

All arithmetic inside the pandas functions is int64 (microsecond gaps,
price cents), so results are exact and engine-independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table


def _user_gap_features(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    us = pdf["ts"].astype("int64")  # ns since epoch
    gaps = us.diff().dropna().astype("int64") // 1000  # microseconds
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "n_gaps": [len(gaps)],
            "total_gap_us": [int(gaps.sum()) if len(gaps) else None],
            "max_gap_us": [int(gaps.max()) if len(gaps) else None],
        }
    )


def u3_grouped_map_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence features via applyInPandas; oracle is the
    lag-window SQL formulation — same numbers, different execution engine."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    from drive_health_etl_spark.session import ship_package

    ship_package(spark)
    return events.groupBy("user_id").applyInPandas(
        _user_gap_features,
        schema="user_id long, n_events long, n_gaps long, total_gap_us long, max_gap_us long",
    )


U3_GROUPED_MAP_SQL = """
SELECT user_id, COUNT(*) AS n_events, COUNT(gap_us) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us, MAX(gap_us) AS max_gap_us
FROM (SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
GROUP BY user_id
"""


# Cogroup bucket count: keys are pmod(custkey, N) so each pandas call gets a
# FAT slice (hundreds of customers + their orders) and does a vectorized
# per-customer merge inside — cogrouping directly on custkey costs one
# Arrow/pandas round-trip per customer (~4 ms each; 6.2s for 1500 groups at
# sf0.01). On a cluster, raise N toward total-cores for parallelism.
COGROUP_BUCKETS = 32


def _cogroup_orders(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    if len(cust) == 0:
        return pd.DataFrame(
            columns=["c_custkey", "c_mktsegment", "n_orders", "total_cents"]
        ).astype({"c_custkey": "int64", "n_orders": "int64", "total_cents": "int64"})
    if len(orders):
        o = pd.DataFrame(
            {
                "c_custkey": orders["o_custkey"],
                "cents": (orders["o_totalprice"] * 100).round().astype("int64"),
            }
        )
        agg = o.groupby("c_custkey").agg(n_orders=("cents", "size"), total_cents=("cents", "sum"))
    else:
        agg = pd.DataFrame(columns=["n_orders", "total_cents"], dtype="int64")
    out = cust[["c_custkey", "c_mktsegment"]].join(agg, on="c_custkey")
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    out["total_cents"] = out["total_cents"].fillna(0).astype("int64")
    return out


def u3_cogroup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped join in pandas (customer x orders): both sides' group
    slices arrive as DataFrames — the shape merge_asof/interval-align
    operators use. Exact cents arithmetic; oracle is the plain SQL join."""
    from drive_health_etl_spark.session import ship_package

    ship_package(spark)
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("b", F.pmod(F.col("c_custkey"), F.lit(COGROUP_BUCKETS)))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .withColumn("b", F.pmod(F.col("o_custkey"), F.lit(COGROUP_BUCKETS)))
    )
    return cust.groupBy("b").cogroup(orders.groupBy("b")).applyInPandas(
        _cogroup_orders,
        schema="c_custkey long, c_mktsegment string, n_orders long, total_cents long",
    )


U3_COGROUP_SQL = """
SELECT c_custkey, c_mktsegment, COUNT(o_custkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS total_cents
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
"""


QUERIES: dict[str, tuple] = {
    "u3_grouped_map_features": (u3_grouped_map_features, U3_GROUPED_MAP_SQL),
    "u3_cogroup_join": (u3_cogroup_join, U3_COGROUP_SQL),
}
