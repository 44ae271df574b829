"""Sessionization and funnel analytics over ``events`` (north-star extension;
SURVEY.md §2.6/§2.8 neighborhood). The reference stores event streams keyed by
tenant/user and day-partitions on event time (``README.md:86-92``); these are
the standard product-analytics queries a warehouse user runs over exactly that
table shape: gap-based sessionization, ordered conversion funnels, and daily
activity rollups.

All native column expressions — two window passes and one aggregation, no
UDFs. Scale notes per operator:

- ``sess_stats``: one shuffle on ``user_id`` (window sort), then the
  session-level groupBy re-uses the same ``user_id``-clustered partitioning
  (``(user_id, sess_idx)`` is a refinement of it), so Spark's partial
  aggregation collapses it map-side before a cheap final exchange. Gap
  arithmetic is on int64 micros — no timestamp diffing in doubles.
- ``sess_funnel``: the three step-time columns come from *unbounded* frames
  over the same ``Window.partitionBy(user_id)`` — one exchange, no sort
  requirement propagates to the plan (min over the whole partition), and the
  final global aggregate is a single partial+final reduce to one row.
- ``sess_daily``: two independent single-shuffle aggregates (per-day stats,
  per-user first-day) joined on day; the first-day side collapses to ≤366
  rows per year so the join is broadcast at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table

SESSION_GAP_MIN = 30  # inactivity gap that closes a session, minutes
_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def sessionized(events: DataFrame) -> DataFrame:
    """Assign a per-user session index: a new session starts at the first
    event and whenever the gap since the previous event exceeds
    ``SESSION_GAP_MIN``. Deterministic order: (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0)
    return events.withColumn(
        "sess_idx",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sess_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session statistics: event count, span, total value."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return (
        sessionized(e)
        .groupBy("user_id", "sess_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("sess_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6
            ).alias("total_value"),
        )
    )


SESS_STATS_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
  FROM g
)
SELECT user_id, sess_idx, COUNT(*) AS n_events, MIN(ts) AS sess_start,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_value
FROM s GROUP BY user_id, sess_idx
"""


# Funnel steps in order; each later step must happen at-or-after the earlier
# step's first occurrence (the standard ordered-funnel definition).
FUNNEL_STEPS = ("signup", "click", "purchase")


def sess_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: users reaching
    each step in order, with step-to-step conversion rates."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STEPS
    e = e.withColumn("t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w))
    e = e.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == s2) & (F.col("ts") >= F.col("t1")), F.col("ts"))
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == s3) & (F.col("ts") >= F.col("t2")), F.col("ts"))
        ).over(w),
    )
    n1 = F.count_distinct(F.when(F.col("t1").isNotNull(), F.col("user_id")))
    n2 = F.count_distinct(F.when(F.col("t2").isNotNull(), F.col("user_id")))
    n3 = F.count_distinct(F.when(F.col("t3").isNotNull(), F.col("user_id")))
    return e.agg(
        F.count_distinct("user_id").alias("n_users"),
        n1.alias("n_step1"),
        n2.alias("n_step2"),
        n3.alias("n_step3"),
        F.round(n2.cast("double") / n1, 6).alias("conv_1_to_2"),
        F.round(n3.cast("double") / n2, 6).alias("conv_2_to_3"),
    )


SESS_FUNNEL_SQL = f"""
WITH a AS (
  SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END)
              OVER (PARTITION BY user_id) AS t1
  FROM events
), b AS (
  SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM a
), c AS (
  SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' AND ts >= t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM b
)
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_step1,
       COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_step2,
       COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_step3,
       ROUND(CAST(COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS DOUBLE)
             / COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END), 6) AS conv_1_to_2,
       ROUND(CAST(COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS DOUBLE)
             / COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END), 6) AS conv_2_to_3
FROM c
"""


def sess_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity rollup: events, distinct active users, and first-seen
    (new) users per day."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    day = F.to_date("ts").alias("day")
    daily = e.groupBy(day).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("dau"),
    )
    first_seen = (
        e.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("new_users"))
    )
    return (
        daily.join(F.broadcast(first_seen), "day", "left")
        .select(
            "day",
            "n_events",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
    )


SESS_DAILY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
), firsts AS (
  SELECT day, COUNT(*) AS new_users FROM (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
  ) GROUP BY day
)
SELECT d.day, d.n_events, d.dau, COALESCE(f.new_users, 0) AS new_users
FROM daily d LEFT JOIN firsts f ON d.day = f.day
"""


def sess_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-lag distribution: for users who complete
    the funnel in order, minutes from first signup to first in-order
    purchase — count, mean, exact p50/p90. The funnel's companion metric
    ('how long does conversion take'), same two-window plan plus one
    per-user collapse and a single-row percentile aggregate."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STEPS
    e = e.withColumn("t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w))
    e = e.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == s2) & (F.col("ts") >= F.col("t1")), F.col("ts"))
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == s3) & (F.col("ts") >= F.col("t2")), F.col("ts"))
        ).over(w),
    )
    lags = (
        e.filter(F.col("t3").isNotNull())
        .groupBy("user_id")
        .agg(
            (
                (F.min(F.unix_micros("t3")) - F.min(F.unix_micros("t1")))
                / F.lit(60_000_000.0)
            ).alias("lag_min")
        )
    )
    return lags.agg(
        F.count("*").alias("n_converted"),
        F.round(F.avg("lag_min"), 6).alias("mean_lag_min"),
        F.round(F.expr("percentile(lag_min, 0.5)"), 6).alias("p50_lag_min"),
        F.round(F.expr("percentile(lag_min, 0.9)"), 6).alias("p90_lag_min"),
    )


SESS_CONVERSION_LAG_SQL = f"""
WITH a AS (
  SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END)
              OVER (PARTITION BY user_id) AS t1
  FROM events
), b AS (
  SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM a
), c AS (
  SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' AND ts >= t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM b
), lags AS (
  SELECT user_id,
         (MIN(epoch_us(t3)) - MIN(epoch_us(t1))) / 60000000.0 AS lag_min
  FROM c WHERE t3 IS NOT NULL GROUP BY user_id
)
SELECT COUNT(*) AS n_converted,
       ROUND(AVG(lag_min), 6) AS mean_lag_min,
       ROUND(quantile_cont(lag_min, 0.5), 6) AS p50_lag_min,
       ROUND(quantile_cont(lag_min, 0.9), 6) AS p90_lag_min
FROM lags
"""


ROLLING_DAYS = 7


def sess_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU curve). Window functions can't
    express COUNT(DISTINCT) over a range frame, so the standard warehouse
    plan is used: dedup to (user, day) — one shuffle that shrinks the input
    to at most users×days rows — then a range join against the calendar-sized
    day grid (broadcast: the grid is ≤366 rows/year at ANY corpus scale) and
    a count-distinct per grid day."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = e.distinct()
    grid = user_days.select("day").distinct().select(F.col("day").alias("d"))
    return (
        user_days.join(
            F.broadcast(grid),
            (F.col("day") <= F.col("d"))
            & (F.col("day") >= F.date_sub(F.col("d"), ROLLING_DAYS - 1)),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("d")
    )


SESS_ROLLING_SQL = f"""
WITH user_days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
grid AS (SELECT DISTINCT day AS d FROM user_days)
SELECT d, COUNT(DISTINCT user_id) AS active_users
FROM user_days JOIN grid
  ON day <= d AND day >= d - {ROLLING_DAYS - 1}
GROUP BY d ORDER BY d
"""


QUERIES: dict[str, tuple] = {
    "sess_rolling_actives": (sess_rolling_actives, SESS_ROLLING_SQL),
    "sess_conversion_lag": (sess_conversion_lag, SESS_CONVERSION_LAG_SQL),
    "sess_stats": (sess_stats, SESS_STATS_SQL),
    "sess_funnel": (sess_funnel, SESS_FUNNEL_SQL),
    "sess_daily": (sess_daily, SESS_DAILY_SQL),
}
