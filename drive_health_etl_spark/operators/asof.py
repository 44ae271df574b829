"""As-of join (SURVEY.md §2 guide extension — the classic operator Spark has
no native form of; DuckDB's native ASOF JOIN is the oracle).

``asof_last_purchase``: for every event, the user's most recent purchase
event at-or-before it, plus the elapsed time. The Spark formulation is the
scale path: instead of a range join (no equi narrowing beyond user_id -> a
per-user cross product), tag the probe rows inside the SAME sorted window
pass and carry the last match forward with ``last(..., ignorenulls=True)``:

    one shuffle on user_id, one sort, zero joins, state O(1) per row.

This generalizes: any as-of join whose build side is a subset of (or can be
unioned with) the probe stream reduces to last-value-carry-forward over the
union — the standard trick for point-in-time correctness in feature
pipelines (no future leakage: the frame ends at the current row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_purchase = F.col("event_type") == "purchase"
    last_purchase_id = F.last(F.when(is_purchase, F.col("event_id")), ignorenulls=True).over(w)
    last_purchase_us = F.last(
        F.when(is_purchase, F.unix_micros(F.col("ts"))), ignorenulls=True
    ).over(w)
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        last_purchase_id.alias("last_purchase_event_id"),
        (F.unix_micros(F.col("ts")) - last_purchase_us).alias("us_since_purchase"),
    )


# DuckDB's native ASOF JOIN: probe = all events, build = purchase events;
# match the greatest p.ts <= e.ts per user. An event that IS a purchase
# matches itself (ts equality), mirroring the window's current-row-inclusive
# frame.
ASOF_SQL = """
SELECT e.event_id, e.user_id, e.event_type,
       p.event_id AS last_purchase_event_id,
       epoch_us(e.ts) - epoch_us(p.ts) AS us_since_purchase
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


QUERIES: dict[str, tuple] = {
    "asof_last_purchase": (asof_last_purchase, ASOF_SQL),
}
