"""Declarative data-quality expectations compiled into ONE aggregate pass.

Generalizes the reference's ad-hoc verification SQL (``src/load-test.js:135``
re-queries the warehouse after every load) into the Deequ/Great-Expectations
pattern a production table needs: a spec of named constraints, each compiled
to aggregate EXPRESSIONS over the same scan, evaluated in a single
partial+final aggregate — at 100 TB the whole suite costs one pass, not one
query per check.

Check types:
- ``not_null(col)``       — null fraction must be 0
- ``unique(col)``         — no value occurs twice (count == distinct count)
- ``accepted_values``     — every value drawn from an enum
- ``between(col, lo, hi)``— min/max bounds
- ``row_count_at_least``  — table-level volume floor

``validate()`` returns one row per expectation (name, passed, observed) —
the dashboardable artifact; ``dq_expectations`` runs a representative spec
over orders as the oracle-checked registry query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table


@dataclass(frozen=True)
class Expectation:
    name: str
    # aggregate expression producing the observed metric (double)
    observed: Column = field(compare=False)
    # predicate over the observed metric
    passed: Column = field(compare=False)


def not_null(col: str) -> Expectation:
    frac = F.avg(F.col(col).isNull().cast("double"))
    return Expectation(f"not_null:{col}", frac, frac == 0.0)


def unique(col: str) -> Expectation:
    # count vs distinct-count in one pass; the distinct aggregate costs an
    # Expand when mixed with plain aggs — acceptable for a QA pass, and the
    # compile stays single-scan
    dupes = (F.count(col) - F.count_distinct(F.col(col))).cast("double")
    return Expectation(f"unique:{col}", dupes, dupes == 0.0)


def accepted_values(col: str, values: list) -> Expectation:
    bad = F.sum((~F.col(col).isin(values)).cast("long")).cast("double")
    return Expectation(f"accepted_values:{col}", bad, bad == 0.0)


def between(col: str, lo: float, hi: float) -> Expectation:
    bad = F.sum(((F.col(col) < lo) | (F.col(col) > hi)).cast("long")).cast("double")
    return Expectation(f"between:{col}", bad, bad == 0.0)


def row_count_at_least(n: int) -> Expectation:
    cnt = F.count(F.lit(1)).cast("double")
    return Expectation(f"row_count_at_least:{n}", cnt, cnt >= float(n))


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregate over ``df``; returns
    (expectation, passed, observed) rows. The unpivot from the 1-row wide
    aggregate to per-expectation rows is driver-free (stack expression)."""
    aggs = []
    for i, e in enumerate(expectations):
        aggs.append(e.observed.alias(f"_obs{i}"))
        aggs.append(e.passed.alias(f"_ok{i}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{e.name}', _ok{i}, _obs{i}" for i, e in enumerate(expectations)
    )
    return wide.select(
        F.expr(
            f"stack({len(expectations)}, {stack}) AS (expectation, passed, observed)"
        )
    )


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative expectation suite over orders — one scan, five
    constraints, per-constraint verdicts."""
    o = load_table(spark, sf_dir, "orders")
    return validate(
        o,
        [
            not_null("o_custkey"),
            unique("o_orderkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            between("o_totalprice", 0.0, 1_000_000.0),
            row_count_at_least(100),
        ],
    )


DQ_EXPECTATIONS_SQL = """
WITH m AS (
  SELECT AVG(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END) AS null_frac,
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS DOUBLE) AS dupes,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS DOUBLE) AS bad_status,
         CAST(SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END) AS DOUBLE) AS oob_price,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM orders
)
SELECT 'not_null:o_custkey' AS expectation, null_frac = 0.0 AS passed, null_frac AS observed FROM m
UNION ALL SELECT 'unique:o_orderkey', dupes = 0.0, dupes FROM m
UNION ALL SELECT 'accepted_values:o_orderstatus', bad_status = 0.0, bad_status FROM m
UNION ALL SELECT 'between:o_totalprice', oob_price = 0.0, oob_price FROM m
UNION ALL SELECT 'row_count_at_least:100', n >= 100.0, n FROM m
"""


def dq_reconcile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation — the invoice audit every finance
    warehouse runs nightly: recompute each order's total from its line items
    (extendedprice * (1-discount) * (1+tax), summed as exact decimals) and
    report, per order status, how many headers disagree with their detail
    rows beyond a cent and the worst absolute discrepancy.

    Exactness: the per-line recompute and the per-order sum stay in decimal
    end to end (order-independent under any partitioning); the discrepancy
    is a decimal subtraction; only the final reporting columns cast out.
    Scale: one equi-join orders ⋈ pre-aggregated lineitem on the key both
    sides already shuffle on, then an enum-sized rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            * (F.lit(1).cast("decimal(18,2)") + F.col("l_tax").cast("decimal(18,2)"))
        ).alias("line_total"),
    )
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum("line_total").cast("decimal(28,6)").alias("detail_total")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("decimal(28,6)").alias("header_total")
    )
    joined = orders.join(
        recomputed, orders["o_orderkey"] == recomputed["l_orderkey"], "left"
    ).select(
        "o_orderstatus",
        "header_total",
        F.coalesce("detail_total", F.lit(0).cast("decimal(28,6)")).alias("detail_total"),
    )
    diff = F.abs(F.col("header_total") - F.col("detail_total"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum((diff > 0.01).cast("long")).alias("n_mismatch"),
            F.max(diff).cast("double").alias("max_abs_diff"),
            F.round(F.sum(diff).cast("double"), 2).alias("total_abs_diff"),
        )
        .orderBy("o_orderstatus")
    )


DQ_RECONCILE_SQL = """
WITH li AS (
  SELECT l_orderkey,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS line_total
  FROM lineitem
),
rec AS (
  SELECT l_orderkey, CAST(SUM(line_total) AS DECIMAL(28,6)) AS detail_total
  FROM li GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderstatus,
         CAST(o.o_totalprice AS DECIMAL(28,6)) AS header_total,
         COALESCE(r.detail_total, CAST(0 AS DECIMAL(28,6))) AS detail_total
  FROM orders o LEFT JOIN rec r ON o.o_orderkey = r.l_orderkey
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN abs(header_total - detail_total) > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(MAX(abs(header_total - detail_total)) AS DOUBLE) AS max_abs_diff,
       ROUND(CAST(SUM(abs(header_total - detail_total)) AS DOUBLE), 2) AS total_abs_diff
FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: last-seen event time per event type,
    reported as integer microseconds of lag behind the global max — the
    staleness monitor every ingestion dashboard leads with (a silent
    stream shows up as a growing lag, not a missing row). All
    integer/timestamp-exact; one map-side-combinable MAX aggregate plus a
    1-row broadcast."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    per = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
    )
    glob = e.agg(F.max("ts").alias("global_max"))
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            "n_events",
            "last_ts",
            (F.unix_micros("global_max") - F.unix_micros("last_ts")).alias("lag_us"),
        )
        .orderBy("event_type")
    )


DQ_FRESHNESS_SQL = """
WITH per AS (
  SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS last_ts FROM events GROUP BY event_type
),
g AS (SELECT MAX(ts) AS global_max FROM events)
SELECT event_type, n_events, last_ts,
       epoch_us(global_max) - epoch_us(last_ts) AS lag_us
FROM per CROSS JOIN g ORDER BY event_type
"""


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / unit-mixing detector for financial columns. The first
    digit is extracted through integer truncation + string head (NEVER
    log10: float log of a near-power-of-10 can land on either side in
    different engines), and the Benford probabilities log10(1 + 1/d) are
    computed ONCE in Python and embedded as identical double literals in
    both engines. Emits one row per digit with the observed count, expected
    count, and chi-square term (each rounded; the per-term rounding keeps
    the output engine-deterministic without a cross-row float sum). One
    map-side-combinable groupBy."""
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    # Out-of-range digits (0 from totals in [0,1), NULL from negatives) are
    # excluded on BOTH sides — the oracle's inner join on the 9-digit p0
    # table drops them, so Spark must too; totals still count every row.
    counts = (
        o.filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    total = o.agg(F.count("*").alias("n_total"))
    p = (
        F.when(F.col("digit") == 1, F.lit(0.3010299956639812))
            .when(F.col("digit") == 2, F.lit(0.17609125905568124))
            .when(F.col("digit") == 3, F.lit(0.12493873660829992))
            .when(F.col("digit") == 4, F.lit(0.09691001300805642))
            .when(F.col("digit") == 5, F.lit(0.07918124604762482))
            .when(F.col("digit") == 6, F.lit(0.06694678963061322))
            .when(F.col("digit") == 7, F.lit(0.05799194697768673))
            .when(F.col("digit") == 8, F.lit(0.05115252244738129))
            .when(F.col("digit") == 9, F.lit(0.04575749056067514))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.round(p * F.col("n_total"), 6).alias("expected"),
            F.round(
                (F.col("n_obs") - p * F.col("n_total")) * (F.col("n_obs") - p * F.col("n_total"))
                / (p * F.col("n_total")),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


DQ_BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
counts AS (SELECT digit, COUNT(*) AS n_obs FROM digits
           WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
total AS (SELECT COUNT(*) AS n_total FROM digits),
p0(digit, prob0) AS (VALUES (1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514))
SELECT c.digit, c.n_obs,
       ROUND(p.prob * t.n_total, 6) AS expected,
       ROUND((c.n_obs - p.prob * t.n_total) * (c.n_obs - p.prob * t.n_total)
             / (p.prob * t.n_total), 6) AS chi2_term
FROM counts c
JOIN (SELECT digit, CAST(prob0 AS DOUBLE) AS prob FROM p0) p ON p.digit = c.digit
CROSS JOIN total t
ORDER BY c.digit
"""


_PK_COLUMNS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def dq_pk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide primary-key audit in one pass: for every table with a
    declared key, row count, distinct keys, duplicate keys, and null keys —
    the first page of any data-quality report. Each table contributes one
    count-distinct aggregate; the union is table-count-sized."""
    parts = []
    for table, pk in sorted(_PK_COLUMNS.items()):
        t = load_table(spark, sf_dir, table)
        parts.append(
            t.agg(
                F.lit(table).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.count_distinct(F.col(pk)).alias("n_distinct_keys"),
                (F.count(F.col(pk)) - F.count_distinct(F.col(pk))).alias("n_dup_rows"),
                (F.count("*") - F.count(F.col(pk))).alias("n_null_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


DQ_PK_AUDIT_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{table}' AS table_name, COUNT(*) AS n_rows,
       COUNT(DISTINCT {pk}) AS n_distinct_keys,
       CAST(COUNT({pk}) - COUNT(DISTINCT {pk}) AS BIGINT) AS n_dup_rows,
       CAST(COUNT(*) - COUNT({pk}) AS BIGINT) AS n_null_keys
FROM {table}"""
    for table, pk in sorted(_PK_COLUMNS.items())
) + "\nORDER BY table_name"


_K_LEVELS = (2, 5, 10)


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit over the customer table's quasi-identifiers
    (c_nationkey, c_mktsegment) — the privacy release-gate a training-data
    pipeline runs before data leaves the boundary: a record is k-anonymous
    iff at least k records share its full quasi-identifier tuple, so
    re-identification by linking on those attributes hits a crowd of >= k.

    One QI-grouped count, then ONE constant-width rollup computing every k
    level's columns in the same pass (a per-k union would re-scan the table
    and re-shuffle the identical groups once per level), unpivoted to one
    row per k via stack — the audit cost is the single groupBy regardless
    of table size or the number of k levels."""
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("gn"))
    stats = groups.agg(
        F.count("*").alias("n_groups"),
        F.min("gn").alias("min_group_size"),
        *[
            F.sum(F.when(F.col("gn") < k, 1).otherwise(0)).alias(f"vg{k}")
            for k in _K_LEVELS
        ],
        *[
            F.sum(F.when(F.col("gn") < k, F.col("gn")).otherwise(0)).alias(f"vr{k}")
            for k in _K_LEVELS
        ],
    )
    stack_args = ", ".join(
        f"{k}, vg{k}, vr{k}" for k in _K_LEVELS
    )
    return (
        stats.select(
            F.expr(
                f"stack({len(_K_LEVELS)}, {stack_args}) AS (k, n_violating_groups, n_rows_at_risk)"
            ),
            "n_groups",
            "min_group_size",
        )
        .select("k", "n_groups", "n_violating_groups", "n_rows_at_risk", "min_group_size")
        .orderBy("k")
    )


DQ_K_ANONYMITY_SQL = (
    """WITH stats AS MATERIALIZED (
  SELECT COUNT(*) AS n_groups, MIN(gn) AS min_group_size,
"""
    + ",\n".join(
        f"""         CAST(SUM(CASE WHEN gn < {k} THEN 1 ELSE 0 END) AS BIGINT) AS vg{k},
         CAST(SUM(CASE WHEN gn < {k} THEN gn ELSE 0 END) AS BIGINT) AS vr{k}"""
        for k in _K_LEVELS
    )
    + """
  FROM (SELECT c_nationkey, c_mktsegment, COUNT(*) AS gn FROM customer GROUP BY 1, 2)
)
"""
    + "\nUNION ALL\n".join(
        f"""SELECT {k} AS k, n_groups, vg{k} AS n_violating_groups,
       vr{k} AS n_rows_at_risk, min_group_size FROM stats"""
        for k in _K_LEVELS
    )
    + "\nORDER BY k"
)


# --- differentially private counts --------------------------------------

# Consecutive low-zero-bit count of a 20-bit uniform hash value: the nested
# conditions u % 2 = 0, u % 4 = 0, ... sum to the trailing-zero count, which
# is EXACTLY Geometric(1/2) on {0..19} (cap 20 at u = 0, mass 2^-20). Pure
# integer arithmetic — bit-identical in any engine, no RNG library needed.
_DP_TZ = " + ".join(f"(CASE WHEN {{U}} % {1 << j} = 0 THEN 1 ELSE 0 END)" for j in range(1, 21))


def _dp_tz(u_expr: str) -> str:
    return "(" + _DP_TZ.replace("{U}", u_expr) + ")"


def dq_dp_counts(spark: SparkSession, sf_dir: str, salt: str = "") -> DataFrame:
    """Differentially private histogram release: per-event-type counts with
    two-sided geometric noise (the DISCRETE Laplace mechanism — Ghosh,
    Roughgarden & Sundararajan STOC'09 show it is the universally optimal
    sensitivity-1 mechanism). noise = G1 - G2 with G_i ~ Geometric(1/2)
    gives P(noise = k) ∝ (1/2)^|k|, i.e. epsilon = ln 2 per unit
    sensitivity; histogram cells are disjoint so one count's noise covers
    the whole release.

    The geometric draws come from trailing-zero counts of keyed md5 bits —
    a DETERMINISTIC seeded mechanism so pipeline releases are reproducible
    and the oracle can replay them exactly. With the default empty `salt`
    the domain-separation tags ('dpA|'/'dpB|') are FIXED and the noise is a
    public function of the group key: the release is exactly invertible and
    carries NO privacy — which is why the shipped column is named
    `epsilon_nominal` (the mechanism's epsilon under a secret salt), not
    `epsilon`. A production deployment passes a secret per-release `salt`
    (folded into both tags), which makes the draws unpredictable without
    changing any other code or the bench-reproducible default. Truncation:
    each geometric is capped at 20 (probability 2^-20 per draw) — the
    standard bounded-noise compromise, noted here because it technically
    costs a negligible delta.

    Scale: ONE map-side-combinable count aggregate over the fact table;
    the noise is a per-group scalar expression over the (enum-sized) result."""
    if "'" in salt or "\\" in salt:
        raise ValueError("salt must not contain quotes or backslashes")
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(F.count("*").alias("n_true"))
    u1 = (
        f"CAST(conv(substring(md5(concat('dpA|{salt}', event_type)), 1, 5), 16, 10)"
        " AS BIGINT)"
    )
    u2 = (
        f"CAST(conv(substring(md5(concat('dpB|{salt}', event_type)), 1, 5), 16, 10)"
        " AS BIGINT)"
    )
    return agg.select(
        "event_type",
        "n_true",
        F.expr(f"{_dp_tz(u1)} - {_dp_tz(u2)}").alias("noise"),
        F.expr(f"greatest(0, n_true + {_dp_tz(u1)} - {_dp_tz(u2)})").alias("n_noisy"),
        F.lit(0.6931471805599453).alias("epsilon_nominal"),
    )


_DP_U1 = "(('0x' || substr(md5('dpA|' || event_type), 1, 5))::BIGINT)"
_DP_U2 = "(('0x' || substr(md5('dpB|' || event_type), 1, 5))::BIGINT)"

DQ_DP_COUNTS_SQL = f"""
WITH agg AS (SELECT event_type, COUNT(*) AS n_true FROM events GROUP BY event_type)
SELECT event_type, n_true,
       {_dp_tz(_DP_U1)} - {_dp_tz(_DP_U2)} AS noise,
       greatest(0, n_true + {_dp_tz(_DP_U1)} - {_dp_tz(_DP_U2)}) AS n_noisy,
       CAST(0.6931471805599453 AS DOUBLE) AS epsilon_nominal
FROM agg
"""


QUERIES: dict[str, tuple] = {
    "dq_dp_counts": (dq_dp_counts, DQ_DP_COUNTS_SQL),
    "dq_benford": (dq_benford, DQ_BENFORD_SQL),
    "dq_expectations": (dq_expectations, DQ_EXPECTATIONS_SQL),
    "dq_reconcile_orders": (dq_reconcile_orders, DQ_RECONCILE_SQL),
    "dq_freshness": (dq_freshness, DQ_FRESHNESS_SQL),
    "dq_pk_audit": (dq_pk_audit, DQ_PK_AUDIT_SQL),
    "dq_k_anonymity": (dq_k_anonymity, DQ_K_ANONYMITY_SQL),
}
