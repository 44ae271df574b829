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


def sess_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week
    (Monday-truncated), retention = fraction of the cohort active in week
    ``cohort_week + offset``. The standard growth-analytics triangle.

    Plan: one groupBy(user) for first-seen day, one distinct over
    (user, week) — both single shuffles on ``user_id`` that AQE coalesces —
    then a join back on ``user_id`` (the cohort side is user-granular but
    carries only two small columns) and a final aggregate on
    (cohort_week, offset). Cohort sizes collapse to ≤ n_weeks rows, so that
    side of the final join is broadcast at any corpus scale."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    user_weeks = e.select("user_id", week.alias("week")).distinct()
    active = (
        user_weeks.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


SESS_RETENTION_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('week', ts)::DATE) AS cohort_week
  FROM events GROUP BY user_id
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_week
), user_weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events
), active AS (
  SELECT f.cohort_week, CAST((week - cohort_week) / 7 AS INTEGER) AS week_offset,
         COUNT(DISTINCT u.user_id) AS n_active
  FROM user_weeks u JOIN firsts f ON u.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
       ROUND(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
"""


def sess_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-event-type daily counts: every (day, event_type) cell in the
    [min_day, max_day] x distinct-types grid, zero-filled where no events
    occurred — the sparse->dense resampling step every time-series feature
    pipeline needs before windowed models.

    Plan: the grid is built driver-free from a 1-row global min/max aggregate
    (``sequence`` + ``explode``) crossed with the distinct event types — both
    sides are calendar/enum-sized, so the grid stays tiny at ANY corpus scale
    and the only real work is the single groupBy(day, type) over the facts.
    Both inputs to the final left join are ≤ |days| x |types| rows."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    counts = e.groupBy("day", "event_type").agg(F.count("*").alias("n_events"))
    days = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    return grid.join(counts, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )


SESS_GAPFILL_SQL = """
WITH f AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
counts AS (
  SELECT day, event_type, COUNT(*) AS n_events FROM f GROUP BY 1, 2
), days AS (
  SELECT unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))::DATE AS day
  FROM f
), types AS (SELECT DISTINCT event_type FROM f)
SELECT d.day, t.event_type, COALESCE(c.n_events, 0) AS n_events
FROM days d CROSS JOIN types t
LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
"""


def sess_event_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type association (market-basket over per-user behavior): for
    every unordered pair of event types, the number of users doing both,
    pair support, and lift vs independence. The co-occurrence statistic
    behind 'users who X also Y'.

    Plan: dedup to (user, type) — one shuffle that bounds everything after
    it by n_users x n_types — then a self-join on ``user_id`` (co-partitioned
    both sides, no broadcast needed; columns aliased apart per the derived
    self-join rule) and a tiny pair-level aggregate. Type marginals are ≤
    n_types rows, broadcast into the final select."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    user_types = e.distinct()
    totals = user_types.agg(F.count_distinct("user_id").alias("n_users"))
    marg = user_types.groupBy("event_type").agg(F.count("*").alias("n_type"))
    a = user_types.select("user_id", F.col("event_type").alias("type_a"))
    b = user_types.select(F.col("user_id").alias("user_b"), F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, (a["user_id"] == b["user_b"]) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n_users"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


SESS_ASSOC_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
marg AS (SELECT event_type, COUNT(*) AS n_type FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       ROUND(CAST(p.n_both AS DOUBLE) / n.n_users, 6) AS support,
       ROUND(CAST(p.n_both AS DOUBLE) * n.n_users / (ma.n_type * mb.n_type), 6) AS lift
FROM pairs p, n, marg ma, marg mb
WHERE ma.event_type = p.type_a AND mb.event_type = p.type_b
"""


ANOMALY_Z = 2.0


def ts_anomaly_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection on the daily event volume: each day is
    z-scored against the other days sharing its WEEKDAY (traffic has a
    weekly rhythm — comparing Saturday to the all-days mean flags every
    weekend as anomalous). The volume monitor an ingest pipeline alarms on.

    Determinism: mean/variance come from exact integer sums (sum n, sum
    n^2 per weekday — the textbook shortcut), so the z computation is the
    same IEEE double sequence in both engines and needs NO rounding.
    Plan: one groupBy(day) over the facts, then three window aggregates
    over the ≤7-partition weekday key on the day-sized table."""
    e = load_table(spark, sf_dir, "events").select(F.to_date("ts").alias("day"))
    daily = e.groupBy("day").agg(F.count("*").alias("n_events"))
    daily = daily.withColumn("weekday", F.weekday("day"))
    w = Window.partitionBy("weekday")
    n = F.col("n_events")
    s = F.sum(n).over(w)
    sq = F.sum(n * n).over(w)
    cnt = F.count("*").over(w)
    mean = s.cast("double") / cnt
    var = (sq.cast("double") - s.cast("double") * s / cnt) / (cnt - 1)
    z = F.when(var > 0, (n.cast("double") - mean) / F.sqrt(var))
    return daily.select(
        "day",
        "n_events",
        "weekday",
        z.alias("z"),
        F.coalesce(F.abs(z) > ANOMALY_Z, F.lit(False)).alias("is_anomaly"),
    )


TS_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events FROM events GROUP BY 1
), wd AS (
  SELECT day, n_events, CAST(isodow(day) - 1 AS INTEGER) AS weekday FROM daily
), stats AS (
  SELECT day, n_events, weekday,
         CAST(SUM(n_events) OVER w AS BIGINT) AS s,
         CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS sq,
         COUNT(*) OVER w AS cnt
  FROM wd WINDOW w AS (PARTITION BY weekday)
), scored AS (
  SELECT day, n_events, weekday,
         CASE WHEN (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1) > 0
              THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / cnt)
                   / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1))
         END AS z
  FROM stats
)
SELECT day, n_events, weekday, z,
       COALESCE(abs(z) > {ANOMALY_Z}, FALSE) AS is_anomaly
FROM scored
"""


def sess_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral Markov model: counts and conditional
    probabilities of event-type transitions within each user's timeline
    (prev_type -> type). The transition matrix behind next-action
    prediction features and funnel-leak diagnosis.

    Plan: one lag window on the ``user_id`` shuffle, then an enum²-bounded
    aggregate (map-side combinable) and a broadcast of the enum-sized
    marginals for the conditional probabilities."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = t.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    marg = counts.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return counts.join(F.broadcast(marg), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias("p_next"),
    )


SESS_MARKOV_SQL = """
WITH t AS (
  SELECT user_id, event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n FROM t
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
), marg AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from FROM counts GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       ROUND(CAST(c.n AS DOUBLE) / m.n_from, 6) AS p_next
FROM counts c JOIN marg m ON c.prev_type = m.prev_type
"""


_ATTR_WINDOW_DAYS = 7  # clicks within 7 days before the purchase get credit


def sess_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: every purchase distributes credit
    to the user's clicks in the prior ``_ATTR_WINDOW_DAYS`` days under three
    models at once — first-touch (1.0 to the earliest click), last-touch
    (1.0 to the latest), linear (1/n to each) — rolled up to credit per
    (model, click day). The marketing-analytics staple.

    Determinism: touch order is pinned on (ts, event_id); linear credit
    1.0/n is the same double in both engines; per-day totals sum per-term
    decimal-cast and round 6 dp (double->decimal cast is the one divergent
    step). Scale: one range equi-join on user_id (the as-of family shape),
    two windows over per-purchase touch lists, then an enum-by-calendar
    sized aggregate — no cross join, no driver loop."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    touches = clicks.join(
        purchases,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")),
    )
    wf = Window.partitionBy("pid").orderBy(F.col("cts").asc(), F.col("cid").asc())
    wl = Window.partitionBy("pid").orderBy(F.col("cts").desc(), F.col("cid").desc())
    wn = Window.partitionBy("pid")
    ranked = touches.select(
        "pid",
        F.to_date("cts").alias("day"),
        F.row_number().over(wf).alias("rn_f"),
        F.row_number().over(wl).alias("rn_l"),
        F.count("*").over(wn).alias("n_touch"),
    )
    first = ranked.filter(F.col("rn_f") == 1).select(
        F.lit("first_touch").alias("model"), "day", F.lit(1.0).alias("credit")
    )
    last = ranked.filter(F.col("rn_l") == 1).select(
        F.lit("last_touch").alias("model"), "day", F.lit(1.0).alias("credit")
    )
    linear = ranked.select(
        F.lit("linear").alias("model"),
        "day",
        (F.lit(1.0) / F.col("n_touch").cast("double")).alias("credit"),
    )
    return (
        first.unionByName(last)
        .unionByName(linear)
        .groupBy("model", "day")
        .agg(
            F.round(
                F.sum(F.col("credit").cast("decimal(38,18)")).cast("double"), 6
            ).alias("credit")
        )
        .orderBy("model", "day")
    )


SESS_ATTRIBUTION_SQL = f"""
WITH clicks AS (
  SELECT user_id AS cu, ts AS cts, event_id AS cid FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id AS pu, ts AS pts, event_id AS pid FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT pid, CAST(cts AS DATE) AS day, cts, cid
  FROM clicks JOIN purchases
    ON cu = pu AND cts <= pts AND cts >= pts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
),
ranked AS (
  SELECT pid, day,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cts ASC, cid ASC) AS rn_f,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cts DESC, cid DESC) AS rn_l,
         COUNT(*) OVER (PARTITION BY pid) AS n_touch
  FROM touches
),
credits AS (
  SELECT 'first_touch' AS model, day, CAST(1.0 AS DOUBLE) AS credit
  FROM ranked WHERE rn_f = 1
  UNION ALL
  SELECT 'last_touch' AS model, day, CAST(1.0 AS DOUBLE) AS credit
  FROM ranked WHERE rn_l = 1
  UNION ALL
  SELECT 'linear' AS model, day, CAST(1.0 AS DOUBLE) / CAST(n_touch AS DOUBLE) AS credit
  FROM ranked
)
SELECT model, day,
       ROUND(CAST(SUM(CAST(credit AS DECIMAL(38,18))) AS DOUBLE), 6) AS credit
FROM credits GROUP BY model, day
ORDER BY model, day
"""


_JOURNEY_LEN = 5  # first N event types form the journey signature
_JOURNEY_TOP = 15


def sess_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: each user's first ``_JOURNEY_LEN`` events
    (time order, event_id tiebreak) joined into a path string, counted
    corpus-wide, top ``_JOURNEY_TOP`` (count desc, path asc) — the
    product-analytics view `sess_markov_transitions` aggregates away.

    One shuffle on user_id for the prefix window, then an enum^N-bounded
    path aggregate — path cardinality is capped by the event-type alphabet,
    not the user count."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prefix = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _JOURNEY_LEN)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda r: r["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        prefix.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(_JOURNEY_TOP)
    )


SESS_JOURNEY_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {_JOURNEY_LEN} GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path ASC LIMIT {_JOURNEY_TOP}
"""


def sess_cohort_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by first-seen day; for each cohort
    age (days since first seen), the cohort's CUMULATIVE value per user —
    the revenue twin of `sess_retention_cohorts` (counts) and the curve
    payback decisions read. Decimal-exact sums end to end; the per-user
    normalization divides exact decimals as doubles, rounded 6 dp.

    Plan: one window for first-seen, one (cohort, age) aggregate, one
    calendar-sized cumulative window — never row-sized state."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), F.col("value").cast("decimal(18,6)").alias("v")
    )
    w = Window.partitionBy("user_id")
    cohorted = e.withColumn("cohort", F.min("day").over(w)).select(
        "cohort",
        F.datediff(F.col("day"), F.col("cohort")).alias("age"),
        "v",
        "user_id",
    )
    sizes = cohorted.groupBy("cohort").agg(
        F.countDistinct("user_id").alias("cohort_users")
    )
    daily = cohorted.groupBy("cohort", "age").agg(F.sum("v").alias("day_value"))
    wc = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.withColumn("cum_value", F.sum("day_value").over(wc))
        .join(sizes, "cohort")
        .filter(F.col("age") <= 14)
        .select(
            "cohort",
            "age",
            "cohort_users",
            F.round(
                F.col("cum_value").cast("double")
                / F.col("cohort_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "age")
    )


SESS_COHORT_VALUE_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
c AS (
  SELECT user_id, day, v,
         MIN(day) OVER (PARTITION BY user_id) AS cohort
  FROM e
),
sizes AS (
  SELECT cohort, COUNT(DISTINCT user_id) AS cohort_users FROM c GROUP BY cohort
),
daily AS (
  SELECT cohort, date_diff('day', cohort, day) AS age, SUM(v) AS day_value
  FROM c GROUP BY 1, 2
),
cum AS (
  SELECT cohort, age,
         SUM(day_value) OVER (PARTITION BY cohort ORDER BY age
                              ROWS UNBOUNDED PRECEDING) AS cum_value
  FROM daily
)
SELECT m.cohort, CAST(m.age AS INTEGER) AS age,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       ROUND(CAST(m.cum_value AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6)
         AS ltv_per_user
FROM cum m JOIN sizes s USING (cohort)
WHERE m.age <= 14
ORDER BY cohort, age
"""


def sess_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the growth-accounting view (is
    today's traffic acquisition or retention?): a user is 'new' on their
    first-seen day, 'returning' on any later active day. One first-seen
    window + one calendar-sized aggregate; all counts exact."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    flagged = e.withColumn("first_day", F.min("day").over(w)).select(
        "day", (F.col("day") == F.col("first_day")).alias("is_new")
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.sum(F.col("is_new").cast("long")).alias("new_users"),
            F.sum((~F.col("is_new")).cast("long")).alias("returning_users"),
        )
        .orderBy("day")
    )


SESS_NEW_RETURNING_SQL = """
WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (
  SELECT day, day = MIN(day) OVER (PARTITION BY user_id) AS is_new FROM e
)
SELECT day,
       CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
FROM f GROUP BY day ORDER BY day
"""


def sess_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type interarrival-time distribution as a log2 histogram of
    microsecond gaps (bucket = floor(log2(gap_us))) — the burstiness
    profile capacity planning reads (tight buckets = bursts, fat tail =
    idle). One per-user lag window + one enum-by-bucket aggregate;
    log2 of identical exact integers, floor, all counts exact."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    return (
        gaps.select(
            "event_type",
            F.floor(F.log2(F.col("gap_us").cast("double"))).cast("int").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n_gaps"))
        .orderBy("event_type", "bucket")
    )


SESS_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(floor(log2(CAST(gap_us AS DOUBLE))) AS INTEGER) AS bucket,
       COUNT(*) AS n_gaps
FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
GROUP BY 1, 2 ORDER BY event_type, bucket
"""


_KM_CENSOR_DAYS = 3  # users last seen in the final window count as censored


def sess_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-churn curve: per user, duration = days between
    first and last event; users whose last event falls within the final
    ``_KM_CENSOR_DAYS`` of the corpus window are right-CENSORED (they may
    still be active — treating them as churned is the classic retention
    bias KM exists to fix). At each duration t with churn events:

        S(t) = prod_{u <= t} (1 - d_u / n_u),   n_u = users at risk (>= u)

    computed as exp(cumulative sum of ln(1 - d/n)) so the product is a
    deterministic left-to-right accumulation in both engines (libm ln/exp
    bit-parity per the bigram-LM precedent; cumsum terms decimal-cast,
    ordered by the unique duration key).

    Scale shape: one groupBy(user), one groupBy(duration), a reverse
    cumulative window for the at-risk counts and a forward one for the
    product — the survival table is duration-valued (calendar-bounded),
    tiny regardless of corpus size."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    per_user = e.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    gmax = e.agg(F.max("day").alias("gmax"))
    users = per_user.crossJoin(F.broadcast(gmax)).select(
        F.datediff("last_day", "first_day").alias("t"),
        (
            F.datediff("gmax", "last_day") >= F.lit(_KM_CENSOR_DAYS)
        ).cast("int").alias("churned"),
    )
    by_t = users.groupBy("t").agg(
        F.count("*").alias("n_at_t"), F.sum("churned").alias("d")
    )
    w_rev = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    at_risk = by_t.withColumn("n_risk", F.sum("n_at_t").over(w_rev))
    steps = at_risk.filter(F.col("d") > 0)
    w_fwd = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lnterm = F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
    return (
        steps.withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(lnterm.cast("decimal(28,12)")).over(w_fwd).cast("double")
                ),
                9,
            ),
        )
        .select(
            "t",
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            "survival",
        )
        .orderBy("t")
    )


SESS_SURVIVAL_KM_SQL = f"""
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
per_user AS (
  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day FROM e GROUP BY user_id
),
g AS (SELECT MAX(day) AS gmax FROM e),
users AS (
  SELECT date_diff('day', first_day, last_day) AS t,
         CASE WHEN date_diff('day', last_day, gmax) >= {_KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS churned
  FROM per_user CROSS JOIN g
),
by_t AS (SELECT t, COUNT(*) AS n_at_t, SUM(churned) AS d FROM users GROUP BY t),
at_risk AS (
  SELECT t, d,
         SUM(n_at_t) OVER (ORDER BY t ASC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM by_t
),
steps AS (SELECT * FROM at_risk WHERE d > 0)
SELECT t, CAST(n_risk AS BIGINT) AS n_at_risk, CAST(d AS BIGINT) AS n_events,
       ROUND(exp(CAST(SUM(CAST(ln(1.0 - CAST(d AS DOUBLE) / n_risk) AS DECIMAL(28,12)))
                      OVER (ORDER BY t ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 9) AS survival
FROM steps ORDER BY t
"""


QUERIES: dict[str, tuple] = {
    "sess_survival_km": (sess_survival_km, SESS_SURVIVAL_KM_SQL),
    "sess_new_vs_returning": (sess_new_vs_returning, SESS_NEW_RETURNING_SQL),
    "sess_interarrival_hist": (sess_interarrival_hist, SESS_INTERARRIVAL_SQL),
    "sess_cohort_value": (sess_cohort_value, SESS_COHORT_VALUE_SQL),
    "sess_journey_paths": (sess_journey_paths, SESS_JOURNEY_SQL),
    "sess_attribution": (sess_attribution, SESS_ATTRIBUTION_SQL),
    "sess_markov_transitions": (sess_markov_transitions, SESS_MARKOV_SQL),
    "ts_anomaly_dow": (ts_anomaly_dow, TS_ANOMALY_SQL),
    "sess_retention_cohorts": (sess_retention_cohorts, SESS_RETENTION_SQL),
    "sess_daily_gapfill": (sess_daily_gapfill, SESS_GAPFILL_SQL),
    "sess_event_assoc": (sess_event_assoc, SESS_ASSOC_SQL),
    "sess_rolling_actives": (sess_rolling_actives, SESS_ROLLING_SQL),
    "sess_conversion_lag": (sess_conversion_lag, SESS_CONVERSION_LAG_SQL),
    "sess_stats": (sess_stats, SESS_STATS_SQL),
    "sess_funnel": (sess_funnel, SESS_FUNNEL_SQL),
    "sess_daily": (sess_daily, SESS_DAILY_SQL),
}
