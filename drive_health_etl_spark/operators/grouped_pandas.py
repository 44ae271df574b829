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


# --- Grouped-aggregate pandas UDAF (the remaining §2.9 execution path) ------


def _make_wavg():
    """Quantity-weighted mean price as a GROUPED_AGG pandas UDAF.

    Exact arithmetic: int64 cents x int64 quantity summed in Python
    (arbitrary-precision), ONE double division at the end — so the value is
    bit-identical to the oracle's CAST(SUM AS DOUBLE)/SUM/100 regardless of
    group order. Built lazily (pandas_udf registration needs a live
    SparkContext at decoration time)."""

    @F.pandas_udf("double")
    def _wavg(cents: pd.Series, qty: pd.Series) -> float:
        num = int((cents * qty).sum())
        den = int(qty.sum())
        return num / den / 100.0

    @F.pandas_udf("long")
    def _n(cents: pd.Series) -> int:
        return len(cents)

    return _wavg, _n


def _cents_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return li


def u5_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED_AGG UDAF through ``groupBy().agg()`` — the third
    pandas execution path (§2.9) next to grouped-map and cogroup: the whole
    group's columns arrive as Series, one scalar returns. The hook a custom
    statistical aggregate (trimmed mean, HDR quantile) would ride on.

    Scale honesty: GROUPED_AGG has NO partial aggregation — the entire
    group ships to one worker. On low-cardinality keys (3 return flags
    here) that is a deliberate API demonstration, not the production plan;
    a weighted mean at 100 TB is the native partial-aggregable
    ``sum(x*w)/sum(w)`` (see the oracle SQL), and GROUPED_AGG is reserved
    for aggregates that genuinely need the full sample (exact quantiles of
    small-enough groups, model fits per entity)."""
    from drive_health_etl_spark.session import ship_package

    ship_package(spark)
    wavg, n = _make_wavg()
    # Spark refuses to mix GROUPED_AGG pandas UDAFs with JVM aggregates in
    # one agg() — the row count is a second pandas UDAF for that reason.
    return (
        _cents_qty(spark, sf_dir)
        .groupBy("l_returnflag")
        .agg(
            n(F.col("cents")).alias("n_rows"),
            wavg(F.col("cents"), F.col("qty")).alias("wavg_price"),
        )
    )


U5_GROUPED_AGG_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / 100.0 AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""


def u5_window_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME pandas UDAF evaluated over an unbounded window instead of a
    groupBy — Spark runs GROUPED_AGG UDAFs in both positions; the window
    path is what per-row normalization against a group statistic uses.
    Distinct-ing the per-row result must reproduce the groupBy answer."""
    from pyspark.sql import Window

    from drive_health_etl_spark.session import ship_package

    ship_package(spark)
    wavg, _n = _make_wavg()
    w = Window.partitionBy("l_returnflag", "l_linestatus")
    return (
        _cents_qty(spark, sf_dir)
        .select(
            "l_returnflag",
            "l_linestatus",
            wavg(F.col("cents"), F.col("qty")).over(w).alias("wavg_price"),
        )
        .distinct()
    )


U5_WINDOW_AGG_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / 100.0 AS wavg_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


QUERIES: dict[str, tuple] = {
    "u3_grouped_map_features": (u3_grouped_map_features, U3_GROUPED_MAP_SQL),
    "u3_cogroup_join": (u3_cogroup_join, U3_COGROUP_SQL),
    "u5_grouped_agg_udaf": (u5_grouped_agg_udaf, U5_GROUPED_AGG_SQL),
    "u5_window_agg_udaf": (u5_window_agg_udaf, U5_WINDOW_AGG_SQL),
}
