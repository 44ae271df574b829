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


ASOF_FWD_TOL_MIN = 60  # forward-match tolerance (minutes)


def asof_next_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join WITH TOLERANCE (pandas ``merge_asof``
    direction='forward'): for every purchase, the user's next click strictly
    after it, kept only if within ``ASOF_FWD_TOL_MIN`` minutes — the
    follow-up-behavior primitive (post-purchase engagement, retry-after-
    error, etc.). Same single-window scale shape as the backward as-of:
    one shuffle on user_id, one sort, a FOLLOWING frame instead of
    PRECEDING, zero joins.

    The oracle is the identical window construction in DuckDB rather than
    its native ASOF JOIN: at equal timestamps the window's (ts, event_id)
    total order is pinned on both engines, while native ASOF's tie handling
    would not see the event_id tiebreak."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(1, Window.unboundedFollowing)  # strictly after this row
    )
    is_click = F.col("event_type") == "click"
    next_click_id = F.first(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w)
    next_click_us = F.first(
        F.when(is_click, F.unix_micros(F.col("ts"))), ignorenulls=True
    ).over(w)
    gap_us = next_click_us - F.unix_micros(F.col("ts"))
    # The tolerance test must reference the MATERIALIZED gap column: reusing
    # the window expression inside the post-filter select would re-evaluate
    # the window over the purchases-only rows (clicks filtered away -> all
    # null) — windows bind to the DataFrame they are selected from.
    within = F.col("gap_us") <= ASOF_FWD_TOL_MIN * 60 * 1_000_000
    return (
        events.withColumn("nc_id", next_click_id)
        .withColumn("gap_us", gap_us)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.when(within, F.col("nc_id")).alias("next_click_event_id"),
            F.when(within, F.col("gap_us")).alias("us_to_click"),
        )
    )


ASOF_FWD_SQL = f"""
SELECT event_id, user_id,
       CASE WHEN gap_us <= CAST({ASOF_FWD_TOL_MIN} AS BIGINT) * 60 * 1000000 THEN nc_id END
         AS next_click_event_id,
       CASE WHEN gap_us <= CAST({ASOF_FWD_TOL_MIN} AS BIGINT) * 60 * 1000000 THEN gap_us END
         AS us_to_click
FROM (
  SELECT event_id, user_id, event_type,
         FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER fwd AS nc_id,
         FIRST_VALUE(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER fwd - epoch_us(ts) AS gap_us
  FROM events
  WINDOW fwd AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
WHERE event_type = 'purchase'
"""


QUERIES: dict[str, tuple] = {
    "asof_last_purchase": (asof_last_purchase, ASOF_SQL),
    "asof_next_within": (asof_next_within, ASOF_FWD_SQL),
}
