"""Pipeline operators re-expressed as oracle-checkable queries over ``events``
(SURVEY.md §2.2/2.3).

The full envelope pipeline runs on generated fixtures (tests + the rows-only
``pipeline_ingest_e2e`` entry); these queries prove the *semantics* of each
pipeline stage on driver-provided data so the DuckDB oracle can hash-check
them: required-field filter (O1), key coalesce (O3), deterministic sampling
(O6), row construction with casts/defaults (S4), status routing (O4/O5),
error-string matching (F12), JSON extraction (F7), date bucketing (F9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.functions.sampling import sample_hash_ratio, sample_hash_ratio_sql
from drive_health_etl_spark.sources.tables import load_table


def a1_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's verification aggregate (``src/load-test.js:135``):
    GROUP BY tenant, event_type COUNT(*) — tenant derived as in the ingest
    fixture mapping."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.concat(F.lit("org-"), (F.col("user_id") % 5).cast("string")).alias("tenant_id"),
            "event_type",
        )
        .agg(F.count("*").alias("event_count"))
    )


A1_SQL = """
SELECT 'org-' || CAST(user_id % 5 AS VARCHAR) AS tenant_id, event_type,
       COUNT(*) AS event_count
FROM events GROUP BY 1, 2
"""


def a2_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotency invariant check (``scripts/02_idempotency_test.js:170-173``):
    per-key row counts; on a deduped table every row_count is 1."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_id").alias("idempotency_key"))
        .agg(F.count("*").alias("row_count"))
        .filter(F.col("row_count") >= 1)
    )


A2_SQL = """
SELECT event_id AS idempotency_key, COUNT(*) AS row_count
FROM events GROUP BY 1 HAVING COUNT(*) >= 1
"""


def o1_required_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required-field conjunction (O1, ``src/validation.js:12-25``): presence =
    truthiness (non-null AND non-empty)."""
    e = load_table(spark, sf_dir, "events")
    valid = (
        F.col("event_type").isNotNull()
        & (F.col("event_type") != "")
        & F.col("ts").isNotNull()
        & F.col("props").isNotNull()
        & (F.col("props") != "")
        & F.col("user_id").isNotNull()
    )
    return e.filter(valid).groupBy("event_type").agg(F.count("*").alias("n_valid"))


O1_SQL = """
SELECT event_type, COUNT(*) AS n_valid FROM events
WHERE event_type IS NOT NULL AND event_type <> ''
  AND ts IS NOT NULL AND props IS NOT NULL AND props <> '' AND user_id IS NOT NULL
GROUP BY event_type
"""


def o2_timestamp_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-validity predicate (O2, ``src/validation.js:20-22``):
    ISO strings (one in seven corrupted) -> try-parse -> validity split
    counts. try_to_timestamp/TRY_CAST are the engine-native Date.parse."""
    e = load_table(spark, sf_dir, "events")
    iso = F.when(
        F.col("event_id") % 7 == 0, F.lit("not-a-date")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    parsed = F.try_to_timestamp(iso)
    return (
        e.select(parsed.isNotNull().alias("ts_valid"))
        .groupBy("ts_valid")
        .agg(F.count("*").alias("n"))
    )


O2_SQL = """
SELECT TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-date'
                     ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS TIMESTAMP) IS NOT NULL AS ts_valid,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def o3_key_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way key precedence (O3, ``src/validation.js:33-42``) over JSON props:
    $.call_id > $.message_id > trace fallback."""
    e = load_table(spark, sf_dir, "events")
    # Empty-string components are "missing" (JS falsy fallthrough in the
    # reference) — same nullif('') guard as functions.keys.idempotency_key.
    key = F.coalesce(
        F.nullif(F.get_json_object("props", "$.call_id"), F.lit("")),
        F.nullif(F.get_json_object("props", "$.message_id"), F.lit("")),
        F.concat(F.lit("trace-"), F.col("event_id").cast("string")),
    )
    return e.select("event_id", key.alias("idempotency_key"))


O3_SQL = """
SELECT event_id,
       COALESCE(NULLIF(json_extract_string(props, '$.call_id'), ''),
                NULLIF(json_extract_string(props, '$.message_id'), ''),
                'trace-' || CAST(event_id AS VARCHAR)) AS idempotency_key
FROM events
"""


def o6_sampling_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sampling filter at rate 0.25 (O6,
    ``src/sampling.js:15-24``) — bit-exact sha256/0xffffffff semantics in both
    engines."""
    e = load_table(spark, sf_dir, "events")
    key = F.concat(F.lit("ev-"), F.col("event_id").cast("string"))
    return e.filter(sample_hash_ratio(key) < 0.25).select("event_id", "event_type")


O6_SQL = f"""
SELECT event_id, event_type FROM events
WHERE {sample_hash_ratio_sql("'ev-' || CAST(event_id AS VARCHAR)")} < 0.25
"""


def s4_row_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse row construction (S4, ``src/bq.js:20-35``): casts, defaults
    (source -> 'unknown'), derived tenant, payload passthrough."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.concat(F.lit("org-"), (F.col("user_id") % 5).cast("string")).alias("tenant_id"),
        "event_type",
        F.lit(1).cast("long").alias("schema_version"),
        F.lit(1).cast("long").alias("envelope_version"),
        F.concat(F.lit("trace-"), F.col("event_id").cast("string")).alias("trace_id"),
        F.col("ts").alias("occurred_at"),
        F.coalesce(F.get_json_object("props", "$.source"), F.lit("unknown")).alias("source"),
        F.col("props").alias("payload"),
    )


S4_SQL = """
SELECT 'org-' || CAST(user_id % 5 AS VARCHAR) AS tenant_id,
       event_type,
       CAST(1 AS BIGINT) AS schema_version,
       CAST(1 AS BIGINT) AS envelope_version,
       'trace-' || CAST(event_id AS VARCHAR) AS trace_id,
       ts AS occurred_at,
       COALESCE(json_extract_string(props, '$.source'), 'unknown') AS source,
       props AS payload
FROM events
"""


def o4_status_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error categorization as a when/otherwise status column (O4/O5,
    ``src/handler.js:16-32``, ``src/batchProcessor.js:22-36``) — thresholds
    picked so all three routes are exercised on driver data."""
    e = load_table(spark, sf_dir, "events")
    status = (
        F.when(F.col("value") > 300.0, F.lit("TRANSIENT_ERROR"))
        .when(F.col("value") < 1.0, F.lit("TERMINAL_ERROR"))
        .otherwise(F.lit("OK"))
    )
    return e.withColumn("status", status).groupBy("status").agg(F.count("*").alias("n"))


O4_SQL = """
SELECT CASE WHEN value > 300.0 THEN 'TRANSIENT_ERROR'
            WHEN value < 1.0 THEN 'TERMINAL_ERROR'
            ELSE 'OK' END AS status,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def o5_sink_error_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row sink-error routing (O5, ``src/batchProcessor.js:22-36``):
    BQ insert error reason -> duplicate(=success) / invalid(terminal) /
    transient(retry). Reasons synthesized deterministically from events."""
    e = load_table(spark, sf_dir, "events")
    reason = (
        F.when(F.col("event_id") % 11 == 0, F.lit("duplicate"))
        .when(F.col("event_id") % 11 == 1, F.lit("invalid"))
        .when(F.col("event_id") % 11 == 2, F.lit("backendError"))
        .otherwise(F.lit(None).cast("string"))
    )
    outcome = (
        F.when(reason == "duplicate", F.lit("SUCCESS_DEDUP"))
        .when(reason == "invalid", F.lit("TERMINAL_422"))
        .when(reason.isNotNull(), F.lit("TRANSIENT_503"))
        .otherwise(F.lit("SUCCESS_INSERT"))
    )
    return e.select(outcome.alias("outcome")).groupBy("outcome").agg(F.count("*").alias("n"))


O5_SQL = """
SELECT CASE WHEN event_id % 11 = 0 THEN 'SUCCESS_DEDUP'
            WHEN event_id % 11 = 1 THEN 'TERMINAL_422'
            WHEN event_id % 11 = 2 THEN 'TRANSIENT_503'
            ELSE 'SUCCESS_INSERT' END AS outcome,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def f12_error_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower()+contains error-string classification (F12,
    ``src/handler.js:23-29``)."""
    e = load_table(spark, sf_dir, "events")
    cls = (
        F.when(F.lower("event_type").contains("err"), F.lit("terminal"))
        .when(F.lower("event_type").contains("sign"), F.lit("auth"))
        .otherwise(F.lit("ok"))
    )
    return e.withColumn("error_class", cls).groupBy("error_class").agg(F.count("*").alias("n"))


F12_SQL = """
SELECT CASE WHEN contains(lower(event_type), 'err') THEN 'terminal'
            WHEN contains(lower(event_type), 'sign') THEN 'auth'
            ELSE 'ok' END AS error_class,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction + typed agg (F7, the
    ``JSON_EXTRACT_SCALAR(payload,'$.x')`` pattern of ``scripts/01:143-148``)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.round(F.sum(k).cast("double") / F.count(k), 6).alias("avg_k"),
    )


F7_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events GROUP BY event_type
"""


def f6_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured payloads (SURVEY.md §1.2):
    parse_json once -> typed try_variant_get extraction — the binary-encoded
    upgrade over per-path get_json_object string re-parsing. Oracle: plain
    JSON extraction (same values, different engine internals)."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    return e.groupBy("event_type").agg(
        F.count(k).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


F6_VARIANT_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (expectations-suite shape): per-column null
    counts, distinct cardinality, and range bounds for orders — the check
    run before promoting a batch into the warehouse."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_custkey"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("null_totalprice"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("nonpositive_price"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum((F.col("o_orderdate") > F.current_timestamp()).cast("long")).alias("future_dates"),
    )


DQ_PROFILE_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CASE WHEN o_orderdate > now() THEN 1 ELSE 0 END) AS BIGINT) AS future_dates
FROM orders
"""


def f9_date_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE(occurred_at) bucketing (F9, ``scripts/01:152``) — the predicate
    shape that partition pruning serves on the warehouse table."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


F9_SQL = """
SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


def a4_sampling_rate_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed-sampling-rate monitor (A4, ``docs/monitoring.md:36-86``):
    ratio of sampled rows over total per event_type, sampled = the
    deterministic rate-0.5 decision."""
    e = load_table(spark, sf_dir, "events")
    key = F.concat(F.lit("ev-"), F.col("event_id").cast("string"))
    sampled = (sample_hash_ratio(key) < 0.5).cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.sum(sampled).alias("n_sampled"),
        F.round(F.sum(sampled).cast("double") / F.count("*"), 6).alias("observed_rate"),
    )


A4_SQL = f"""
SELECT event_type, COUNT(*) AS total,
       CAST(SUM(CASE WHEN {sample_hash_ratio_sql("'ev-' || CAST(event_id AS VARCHAR)")} < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(CAST(SUM(CASE WHEN {sample_hash_ratio_sql("'ev-' || CAST(event_id AS VARCHAR)")} < 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS observed_rate
FROM events GROUP BY event_type
"""


def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse constraint validation in one pass each: primary-key
    uniqueness on customer, referential integrity orders→customer (orphan
    count via null-probe on a single left join — no second scan), and a
    not-null rate. The monitoring twin of the reference's post-load
    verification SQL (``scripts/02_idempotency_test.js:170-176`` checks the
    PK invariant the same way). One fact-sized shuffle; at 100 TB the join
    key is the natural distribution and AQE handles skew."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pk = c.agg(
        F.count("*").alias("n_customers"),
        (F.count("*") - F.count_distinct("c_custkey")).alias("n_dup_custkeys"),
    )
    probe = (
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphan_orders"),
            F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_totalprice"),
        )
    )
    return probe.crossJoin(F.broadcast(pk)).select(
        "n_orders", "n_orphan_orders", "n_null_totalprice", "n_customers", "n_dup_custkeys"
    )


DQ_CONSTRAINTS_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders) AS n_orders,
  (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL) AS n_orphan_orders,
  (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL) AS n_null_totalprice,
  (SELECT COUNT(*) FROM customer) AS n_customers,
  (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer) AS n_dup_custkeys
"""


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC shape): classify every key across two table
    versions as added / removed / changed / unchanged via one full outer
    join on the key — the merge-planning primitive behind incremental
    warehouse syncs. Twin snapshots are derived deterministically from
    events (drop every 11th id from 'old', every 13th from 'new', perturb
    value on id%10==3) so the oracle reproduces them exactly. One shuffle
    on the join key; counts only, so the result is scale-stable."""
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    old = e.filter(F.col("event_id") % 11 != 0).select(
        F.col("event_id").alias("okey"), F.col("value").alias("oval")
    )
    new = e.filter(F.col("event_id") % 13 != 0).select(
        F.col("event_id").alias("nkey"),
        (F.col("value") + F.when(F.col("event_id") % 10 == 3, 1.0).otherwise(0.0)).alias(
            "nval"
        ),
    )
    status = (
        F.when(F.col("okey").isNull(), "added")
        .when(F.col("nkey").isNull(), "removed")
        .when(F.col("oval") != F.col("nval"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, F.col("okey") == F.col("nkey"), "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("status")
    )


CDC_DIFF_SQL = """
WITH old AS (
  SELECT event_id AS okey, value AS oval FROM events WHERE event_id % 11 <> 0
), new AS (
  SELECT event_id AS nkey,
         value + CASE WHEN event_id % 10 = 3 THEN 1.0 ELSE 0.0 END AS nval
  FROM events WHERE event_id % 13 <> 0
)
SELECT CASE WHEN okey IS NULL THEN 'added'
            WHEN nkey IS NULL THEN 'removed'
            WHEN oval <> nval THEN 'changed'
            ELSE 'unchanged' END AS status,
       COUNT(*) AS n_keys
FROM old FULL OUTER JOIN new ON okey = nkey
GROUP BY 1 ORDER BY 1
"""


def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a keyed table from an ordered CDC changelog (Debezium /
    Kafka-compaction shape): events form a per-user changelog where
    ``error`` events are DELETEs and everything else an UPSERT of ``value``;
    the latest operation per key wins (ordered by ts, event_id tiebreak) and
    a final DELETE removes the key. Complements ``w1_first_write_wins``
    (first-writer dedup) and ``cdc_snapshot_diff`` (diff two versions):
    this is the APPLY side that turns a log into current state.

    Plan: one shuffle on user_id, sort-local row_number — Spark's standard
    compaction shape; at 100 TB the same window runs per key-bucket and the
    changelog scan prunes to partitions newer than the last materialized
    offset."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("event_type") != "error")  # final DELETE removes the key
    )
    return latest.select(
        "user_id",
        F.col("value").alias("current_value"),
        F.col("ts").alias("updated_at"),
        F.col("event_type").alias("last_op"),
    )


CDC_APPLY_SQL = """
SELECT user_id, value AS current_value, ts AS updated_at,
       event_type AS last_op
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 AND event_type <> 'error'
"""


PSI_BINS = 10


def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two periods of the ``value``
    feature (expected = even days, actual = odd days) — the standard ML-ops
    drift monitor run before trusting a model on fresh data. Equi-width
    bins over the global [min, max] (1-row broadcast bounds), Laplace
    smoothing so empty bins stay finite, per-bin PSI contribution
    ``(pA - pB) * ln(pA / pB)``.

    Plan: one scan for bounds, one scan binned + counted per period (single
    shuffle over ≤``PSI_BINS`` keys with map-side combine). The ln() terms
    are decimal-cast before any cross-engine comparison surface (ln ULP).
    """
    e = load_table(spark, sf_dir, "events").select(
        "value", (F.dayofmonth("ts") % 2 == 0).alias("is_expected")
    )
    bounds = e.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = e.crossJoin(F.broadcast(bounds)).select(
        "is_expected",
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * PSI_BINS
            ).cast("int"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("is_expected"), 1)).alias("n_expected"),
        F.count(F.when(~F.col("is_expected"), 1)).alias("n_actual"),
    )
    totals = counts.agg(
        F.sum("n_expected").alias("te"), F.sum("n_actual").alias("ta")
    )
    pa = (F.col("n_expected") + 1).cast("double") / (F.col("te") + PSI_BINS)
    pb = (F.col("n_actual") + 1).cast("double") / (F.col("ta") + PSI_BINS)
    term = ((pa - pb) * F.log(pa / pb)).cast("decimal(18,12)")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_expected",
            "n_actual",
            F.round(term.cast("double"), 9).alias("psi_term"),
        )
        .orderBy("bin")
    )


DQ_PSI_SQL = f"""
WITH e AS (
  SELECT value, (EXTRACT(day FROM ts) % 2 = 0) AS is_expected FROM events
),
bounds AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM e),
binned AS (
  SELECT is_expected,
         LEAST({PSI_BINS - 1},
               CAST(FLOOR((value - mn) / (mx - mn) * {PSI_BINS}) AS INT)) AS bin
  FROM e, bounds
),
counts AS (
  SELECT bin,
         COUNT(CASE WHEN is_expected THEN 1 END) AS n_expected,
         COUNT(CASE WHEN NOT is_expected THEN 1 END) AS n_actual
  FROM binned GROUP BY bin
),
totals AS (SELECT CAST(SUM(n_expected) AS BIGINT) AS te,
                  CAST(SUM(n_actual) AS BIGINT) AS ta FROM counts)
SELECT bin, n_expected, n_actual,
       ROUND(CAST(CAST(
         ((CAST(n_expected + 1 AS DOUBLE) / (te + {PSI_BINS}))
          - (CAST(n_actual + 1 AS DOUBLE) / (ta + {PSI_BINS})))
         * ln((CAST(n_expected + 1 AS DOUBLE) / (te + {PSI_BINS}))
              / (CAST(n_actual + 1 AS DOUBLE) / (ta + {PSI_BINS})))
       AS DECIMAL(18,12)) AS DOUBLE), 9) AS psi_term
FROM counts, totals
ORDER BY bin
"""


QUERIES: dict[str, tuple] = {
    "dq_constraints": (dq_constraints, DQ_CONSTRAINTS_SQL),
    "cdc_snapshot_diff": (cdc_snapshot_diff, CDC_DIFF_SQL),
    "cdc_apply_changelog": (cdc_apply_changelog, CDC_APPLY_SQL),
    "dq_psi_drift": (dq_psi_drift, DQ_PSI_SQL),
    "a1_group_count": (a1_group_count, A1_SQL),
    "a2_dup_check": (a2_dup_check, A2_SQL),
    "a4_sampling_rate_observed": (a4_sampling_rate_observed, A4_SQL),
    "o1_required_filter": (o1_required_filter, O1_SQL),
    "o2_timestamp_validity": (o2_timestamp_validity, O2_SQL),
    "o3_key_coalesce": (o3_key_coalesce, O3_SQL),
    "o6_sampling_filter": (o6_sampling_filter, O6_SQL),
    "s4_row_construct": (s4_row_construct, S4_SQL),
    "o4_status_router": (o4_status_router, O4_SQL),
    "o5_sink_error_router": (o5_sink_error_router, O5_SQL),
    "f12_error_match": (f12_error_match, F12_SQL),
    "f6_variant_json": (f6_variant_json, F6_VARIANT_SQL),
    "f7_json_extract": (f7_json_extract, F7_SQL),
    "dq_profile": (dq_profile, DQ_PROFILE_SQL),
    "f9_date_group": (f9_date_group, F9_SQL),
}
