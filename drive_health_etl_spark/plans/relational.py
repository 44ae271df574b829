"""Relational query layer over the star schema (SURVEY.md §2.2/2.4-2.7).

Generalizes the verification SQL the reference embeds
(``src/load-test.js:135``, ``scripts/01..04``) to the full relational
operator set. Every query here is a (Spark callable, DuckDB oracle SQL)
pair registered in ``plans.registry``.

Cross-engine float policy: double summation order differs between Spark
(partition-parallel) and DuckDB, so any SUM/AVG over doubles casts elements
to DECIMAL first (exact, order-independent) and converts back to DOUBLE for
output; AVGs divide the exact decimal sum by the count and round. MIN/MAX and
raw column values are bitwise-stable and need no treatment.

Scale notes are per-query; the common ones: dimension joins use explicit
``broadcast()``; aggregations rely on Spark's partial (map-side) aggregation;
no query collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table


def _dsum(col, scale: int, out: str):
    """Order-independent exact sum of a double column: cast each element to
    decimal(18,scale), sum exactly, emit double.

    NO final round: the decimal sums are bit-identical across engines and so
    is the decimal->double conversion (correctly rounded in both), whereas
    round-on-double DIVERGES near double's precision edge — DuckDB's
    multiply/divide round corrupts the 16th significant digit when
    |x| * 10^scale approaches 2^53 (observed on sum_charge at sf0.1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(out)


def _davg(col, scale: int, out: str):
    """Exact decimal sum -> double, divided by count. Division of identical
    doubles is identical (IEEE); no round for the same reason as _dsum."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)).alias(out)


def _sql_dsum(expr: str, scale: int, out: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {out}"


def _sql_davg(expr: str, scale: int, out: str) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})) AS {out}"
    )


# --- A1/A5: the flagship aggregation (TPC-H Q1 shape) ----------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-agg flagship (A1 generalized; reference ``src/load-test.js:135``
    is the 2-key COUNT(*) special case). Scale: partial agg map-side; the
    shuffle carries only (2 keys x handful of partial states)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", 2, "sum_qty"),
            _dsum("l_extendedprice", 2, "sum_base_price"),
            _dsum(disc_price, 4, "sum_disc_price"),
            _dsum(charge, 6, "sum_charge"),
            _davg("l_quantity", 2, "avg_qty"),
            _davg("l_extendedprice", 2, "avg_price"),
            _davg("l_discount", 2, "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 2, 'sum_qty')},
       {_sql_dsum('l_extendedprice', 2, 'sum_base_price')},
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'sum_disc_price')},
       {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6, 'sum_charge')},
       {_sql_davg('l_quantity', 2, 'avg_qty')},
       {_sql_davg('l_extendedprice', 2, 'avg_price')},
       {_sql_davg('l_discount', 2, 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: segment-filtered customer x orders x lineitem,
    revenue per order, top 10. Filters push into all three scans; top-k is
    TakeOrderedAndProject after the aggregation."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, 4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join with the customer-and-supplier-same-nation
    constraint; revenue per nation. Dims broadcast, facts shuffle on keys."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(revenue, 4, "revenue"), F.count("*").alias("n_items"))
    )


Q5_SQL = f"""
SELECT n_name, {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')}, COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + global agg — the minimal
    scan-bound query; every predicate reaches PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = f"""
SELECT {_sql_dsum('l_extendedprice * l_discount', 4, 'revenue')}, COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: orders with at least one line shipped after the
    order date (EXISTS -> left-semi join with an equi key plus a range
    predicate), counted per priority. The semi join shuffles on orderkey
    only; the range term evaluates post-match, so no theta-join blowup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: lost revenue per customer from returned lines
    (l_returnflag = 'R'), top 20. The returnflag filter pushes to the scan;
    facts shuffle on their join keys, the nation dim broadcasts; top-k plans
    TakeOrderedAndProject (no global sort materialization)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(revenue, 4, "revenue"), F.count("*").alias("n_lines"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')},
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: promo-type revenue share. Part is the broadcast
    side; both sums are conditional decimal aggregations over one fact pass.
    The final percentage divides two exact decimal-sourced doubles — the
    division is IEEE-identical across engines, rounded at 6 dp only because
    the quotient (unlike the sums) mixes magnitudes."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _dsum(promo, 4, "_promo"),
            _dsum(revenue, 4, "_total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6).alias("promo_pct"),
            F.col("_total").alias("total_revenue"),
        )
    )


Q14_SQL = f"""
WITH s AS (
  SELECT
    {_sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4, '_promo')},
    {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, '_total')}
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
)
SELECT ROUND(100.0 * _promo / _total, 6) AS promo_pct, _total AS total_revenue FROM s
"""

# ~1.4% of orders qualify (204 at sf0.01) — selective like the classic Q18
# (which uses 300+ at TPC-H quantity distributions).
Q18_MIN_QTY = 250


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: large-volume orders — groupBy + HAVING on the fact,
    then join the qualifying keys back to orders/customer. Per-order
    quantity aggregates map-side before its one shuffle. No broadcast hint
    on the HAVING output: it scales with the corpus (~1.4% of orders), so
    the enrichment join must stay key-partitioned at 100 TB — AQE demotes
    or promotes the build side from the real runtime size."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity", 2, "total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, {_sql_dsum('l_quantity', 2, 'total_qty')}
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN big      ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


# --- O7/O8: filters and projections ---------------------------------------


def o7_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates (reference ``scripts/01_smoke_publish.js:151-152``
    shape). All three predicates push down to the parquet scan."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
            & (F.col("o_totalprice") > 150000.0)
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


O7_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderstatus = 'F'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND o_totalprice > 150000.0
"""


def o8_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with rename/computed columns (``scripts/01:142-149``)."""
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)").cast("double"), 4).alias("net_price"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


O8_SQL = """
SELECT l_orderkey AS order_id,
       l_linenumber AS line_no,
       ROUND(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE), 4) AS net_price,
       l_returnflag || '/' || l_linestatus AS flag_status
FROM lineitem
"""


# --- A5: aggregation suite --------------------------------------------------


def a5_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        _dsum("l_quantity", 2, "sum_qty"),
        _davg("l_extendedprice", 2, "avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


A5_SQL = f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       {_sql_dsum('l_quantity', 2, 'sum_qty')},
       {_sql_davg('l_extendedprice', 2, 'avg_price')},
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
"""


def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dsum("l_quantity", 2, "sum_qty"))
    )


A5_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_sql_dsum('l_quantity', 2, 'sum_qty')}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def a5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), _dsum("o_totalprice", 2, "sum_price"))
    )


A5_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {_sql_dsum('o_totalprice', 2, 'sum_price')}
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- J1-J6: joins -----------------------------------------------------------


def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders x customer. At scale: both sides large ->
    sort-merge on the shuffled key; at test SF AQE converts to broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice", 2, "revenue"))
    )


J1_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {_sql_dsum('o_totalprice', 2, 'revenue')}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def j2_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension joins with explicit broadcast (region/nation are true dims —
    broadcastable at any fact scale)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), _davg("c_acctbal", 2, "avg_acctbal"))
    )


J2_SQL = f"""
SELECT r_name, COUNT(*) AS n_customers, {_sql_davg('c_acctbal', 2, 'avg_acctbal')}
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def j3_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, order count possibly 0."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


J3_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def j3_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-day aggregates (click vs view counts)."""
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("click_cnt"))
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("view_cnt"))
    )
    return (
        clicks.join(views, "d", "full")
        .select(
            F.col("d").alias("event_date"),
            F.coalesce("click_cnt", F.lit(0)).alias("click_cnt"),
            F.coalesce("view_cnt", F.lit(0)).alias("view_cnt"),
        )
    )


J3_FULL_SQL = """
SELECT COALESCE(c.d, v.d) AS event_date,
       COALESCE(click_cnt, 0) AS click_cnt,
       COALESCE(view_cnt, 0) AS view_cnt
FROM (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS click_cnt FROM events WHERE event_type = 'click' GROUP BY 1) c
FULL OUTER JOIN (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS view_cnt FROM events WHERE event_type = 'view' GROUP BY 1) v
ON c.d = v.d
"""


def j4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi — 'keys that already exist' relation (the insertId dedup
    check, ``scripts/02_idempotency_test.js:170-173``)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


J4_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
"""


def j4_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


J4_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def j5_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate: lineitems shipped within 90 days of the order
    date. The equi key carries the join (hash/SMJ); the range is a post-filter
    — scale-safe, no BNLJ."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(orders, cond)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_within_90d"), _dsum("l_extendedprice", 2, "sum_price"))
    )


J5_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_within_90d, {_sql_dsum('l_extendedprice', 2, 'sum_price')}
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


def j6_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact -> orders -> customer -> nation -> region.
    nation/region broadcast; AQE reorders/joins the big pair optimally."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").alias("order_year"))
        .agg(_dsum(revenue, 4, "revenue"), F.count("*").alias("n_lineitems"))
    )


J6_SQL = f"""
SELECT r_name, YEAR(o_orderdate) AS order_year,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')},
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, YEAR(o_orderdate)
"""


# Bloom prefilter sizing: m bits / k hashes, fp ~ (1-e^{-kn/m})^k ≈ 0.7% at
# n = 25k build keys. Config constants, not data-derived — the filter stays
# a fixed 32 KiB broadcast no matter the corpus size.
BLOOM_M_BITS = 1 << 18
BLOOM_K_HASHES = 5
_BLOOM_WORDS = BLOOM_M_BITS // 64


def j7_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit distributed bloom-filter semi-join prefilter — the manual
    runtime-filter pattern for a 100 TB probe side. Build: explode each
    selective build-side key into ``BLOOM_K_HASHES`` bit positions
    (``xxhash64(key, seed) mod m``), OR them into 64-bit words (one shuffle
    over ≤4096 word ids, map-side combined), assemble the full word array in
    a 1-row DataFrame. Probe: broadcast the 32 KiB array onto the orders
    scan and drop rows where any probe bit is unset — BEFORE the semi-join
    shuffle. Bloom filters have no false negatives, so the exact semi join
    that follows returns precisely the oracle's plain semi-join answer;
    false positives only cost shuffle bytes. Complements the
    planner-injected runtime filter asserted by
    ``tests/test_plans.py::test_runtime_bloom_filter_injection``.

    Reference parity: the insertId-existence prefilter shape of
    ``scripts/02_idempotency_test.js:170-173`` at warehouse scale.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    keys = li.select("l_orderkey")

    seed = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K_HASHES - 1))).alias("seed")
    pos = F.pmod(F.xxhash64("l_orderkey", "seed"), F.lit(BLOOM_M_BITS))
    bits = (
        keys.select("l_orderkey", seed)
        .select(
            (pos / 64).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    # Dense word array via a grid left-join + one sorted collect: O(n log n).
    # (A map_from_entries + per-index element_at assembly is O(n^2) — Spark's
    # MapType lookup is a linear scan.)
    grid = spark.range(_BLOOM_WORDS).select(F.col("id").cast("int").alias("word"))
    bloom = (
        grid.join(F.broadcast(bits), "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("b"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word", "b"))),
                lambda x: x["b"],
            ).alias("words")
        )
    )

    orders = load_table(spark, sf_dir, "orders")
    probe_pos = lambda s: F.pmod(F.xxhash64("o_orderkey", s), F.lit(BLOOM_M_BITS))  # noqa: E731
    hit = F.forall(
        F.sequence(F.lit(0), F.lit(BLOOM_K_HASHES - 1)),
        lambda s: (
            F.element_at("words", (probe_pos(s) / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (probe_pos(s) % 64).cast("int")
                )
            )
            != 0
        ),
    )
    pre = orders.join(F.broadcast(bloom)).filter(hit).drop("words")
    return (
        pre.join(keys, pre.o_orderkey == keys.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice", 2, "sum_price"))
        .orderBy("o_orderpriority")
    )


J7_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {_sql_dsum('o_totalprice', 2, 'sum_price')}
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def j8_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under extreme single-key skew, as a first-class query:
    90% of events collapse onto one hot tenant (derived deterministically
    from event_id), which would pin one reducer in a plain shuffle join at
    scale. ``salted_join`` spreads the hot key over (key, salt) sub-keys and
    replicates only the dim side — the oracle is the PLAIN join, because
    salting must be invisible in the result. Complements the AQE skew-join
    path (on by default in session.py) for skew too extreme to split by
    shuffle-file size alone. See ``operators/skew.py``; equivalence is also
    pytest-asserted in ``tests/test_skew.py``."""
    from drive_health_etl_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").withColumn(
        "tenant",
        F.when(F.col("event_id") % 10 < 9, F.lit("hot-tenant")).otherwise(
            F.concat(F.lit("t-"), (F.col("event_id") % 50).cast("string"))
        ),
    )
    dim = (
        e.select("tenant")
        .distinct()
        .withColumn("region", F.substring("tenant", 1, 1))
    )
    joined = salted_join(
        e, dim, "tenant", n_salts=16, salt_source=F.hash(F.col("event_id"))
    )
    return joined.groupBy("tenant", "region").agg(
        F.count("*").alias("n_events"), _dsum("value", 2, "sum_value")
    )


J8_SQL = f"""
WITH e AS (
  SELECT *,
         CASE WHEN event_id % 10 < 9 THEN 'hot-tenant'
              ELSE 't-' || CAST(event_id % 50 AS VARCHAR) END AS tenant
  FROM events
),
d AS (SELECT DISTINCT tenant, substr(tenant, 1, 1) AS region FROM e)
SELECT tenant, region, COUNT(*) AS n_events,
       {_sql_dsum('value', 2, 'sum_value')}
FROM e JOIN d USING (tenant)
GROUP BY tenant, region
"""


# --- T1-T3: sorts / limits / set ops ---------------------------------------


def t1_sort_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-first inspection (``scripts/01:153``). Deterministic tiebreak on
    event_id. Spark plans this as TakeOrderedAndProject — no full sort."""
    return (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").asc())
        .select("event_id", "ts", "event_type", "value")
        .limit(50)
    )


T1_SQL = """
SELECT event_id, ts, event_type, value FROM events
ORDER BY ts DESC, event_id ASC LIMIT 50
"""


def t2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


T2_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def _seg_and_big(spark, sf_dir):
    seg = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return seg, big


_T3_CTE = """
WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     big AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


def t3_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    seg, big = _seg_and_big(spark, sf_dir)
    return seg.union(big).distinct()


T3_UNION_SQL = _T3_CTE + "SELECT c_custkey FROM seg UNION SELECT c_custkey FROM big"


def t3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    seg, big = _seg_and_big(spark, sf_dir)
    return seg.intersect(big)


T3_INTERSECT_SQL = _T3_CTE + "SELECT c_custkey FROM seg INTERSECT SELECT c_custkey FROM big"


def t3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    seg, big = _seg_and_big(spark, sf_dir)
    return seg.subtract(big)


T3_EXCEPT_SQL = _T3_CTE + "SELECT c_custkey FROM seg EXCEPT SELECT c_custkey FROM big"


def t3b_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): duplicates
    carry multiplicity min(m,n) / max(m-n,0) instead of collapsing — Spark
    plans these as an aggregate of per-side counts, NOT a distinct + join,
    so partial aggregation still applies. Summarized to one row per op so
    the result hash pins multiplicities, not just membership."""
    ca = load_table(spark, sf_dir, "customer").select("c_nationkey")
    cb = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_nationkey")
    )
    return (
        ca.intersectAll(cb).agg(F.lit("intersect_all").alias("op"), F.count("*").alias("n"))
        .unionByName(
            ca.exceptAll(cb).agg(F.lit("except_all").alias("op"), F.count("*").alias("n"))
        )
        .unionByName(ca.union(cb).agg(F.lit("union_all").alias("op"), F.count("*").alias("n")))
    )


T3B_SET_OPS_ALL_SQL = """
WITH ca AS (SELECT c_nationkey FROM customer),
     cb AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'intersect_all' AS op, COUNT(*) AS n
FROM (SELECT * FROM ca INTERSECT ALL SELECT * FROM cb)
UNION ALL
SELECT 'except_all' AS op, COUNT(*) AS n
FROM (SELECT * FROM ca EXCEPT ALL SELECT * FROM cb)
UNION ALL
SELECT 'union_all' AS op, COUNT(*) AS n
FROM (SELECT * FROM ca UNION ALL SELECT * FROM cb)
"""


# --- W1-W4: window functions ------------------------------------------------


def w1_first_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-write-wins dedup (the insertId semantics of ``src/bq.js:49``)
    applied to events keyed by (user_id, event_type). One shuffle on the key;
    at 100 TB this is the canonical dedup pattern."""
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


W1_SQL = """
SELECT user_id, event_type, event_id, ts
FROM (SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
WHERE rn = 1
"""


def w2_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value (rank with deterministic tiebreak)."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


W2_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders)
WHERE rnk <= 3
"""


def w5_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, percent_rank,
    cume_dist over order values per status (deterministic tiebreak)."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


W5_SQL = """
SELECT o_orderkey, o_orderstatus,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def w3_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user via lag; exact integer microsecond arithmetic
    (no float drift across engines)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    events = load_table(spark, sf_dir, "events")
    gaps = events.withColumn(
        "gap_us", F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


W3_SQL = """
SELECT user_id, COUNT(gap_us) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us, MAX(gap_us) AS max_gap_us
FROM (SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
      FROM events)
GROUP BY user_id
"""


def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame cumulative sum per user (exact decimal accumulation)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


W4_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
"""


def w6_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first/last/nth event value per user over the
    time-ordered frame (last_value needs the full-partition frame — the
    classic default-frame trap). Single shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.first("value").over(wfull).alias("first_value"),
        F.last("value").over(wfull).alias("last_value"),
        F.nth_value("value", 3).over(wfull).alias("third_value"),
    )


W6_SQL = """
SELECT event_id, user_id,
       FIRST_VALUE(value) OVER w AS first_value,
       LAST_VALUE(value) OVER w AS last_value,
       NTH_VALUE(value, 3) OVER w AS third_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def w8_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing 1-hour event count and value
    sum, anchored on event-time seconds (RANGE frames bound by the ORDER
    value, not row position — the other half of the frame spec that
    w4_running_sum's ROWS frame doesn't cover). One shuffle on user_id."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value",
        # integer div, not `/` + cast: double division puts second boundaries
        # a few ulp below the integer and truncation would then disagree with
        # the oracle's integer floor-div
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_s").asc())
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "sum_trailing_1h"
        ),
    )


W8_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM (SELECT *, epoch_us(ts) // 1000000 AS ts_s FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def a6_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): region roster of
    nations — collect_list is made deterministic by sorting the collected
    structs before joining. Dimension-sized: any plan works; the point is
    the ordered-concat semantics parity."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


A6_SQL = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


def w7_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier flagging: |value - mean| > 2σ over the user's
    own distribution (population σ, full-partition frame) — the streaming-
    telemetry anomaly gate, as one window pass + narrow filter."""
    w = Window.partitionBy("user_id")
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    mean = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    z = (F.col("value") - mean) / sd
    return (
        e.withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.0)
        .select("event_id", "user_id", F.round("z", 6).alias("zscore"))
    )


W7_SQL = """
SELECT event_id, user_id, ROUND(zscore, 6) AS zscore FROM (
  SELECT event_id, user_id,
         (value - AVG(value) OVER w) / STDDEV_POP(value) OVER w AS zscore
  FROM events
  WINDOW w AS (PARTITION BY user_id)
) WHERE ABS(zscore) > 2.0
"""


def w10_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier census per event type: |v - median| >
    3 * 1.4826 * MAD — the anomaly gate that survives the heavy-tailed
    value distributions that wreck mean/σ z-scores (w7's gate). Exact
    medians; the two median passes are two groupBy aggregates on the same
    enum-sized key with the 5-row results broadcast back — no window over
    the full partition, no sort of the fact table.

    The robust-z comparison runs on raw IEEE doubles (exact interpolated
    percentiles are engine-identical; 1.4826 multiply likewise), so the
    outlier COUNTS hash-match; emitted med/mad are rounded once."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    absdev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = absdev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        absdev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                (F.col("adev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
    )


W10_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
adev AS (
  SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM adev GROUP BY event_type
)
SELECT a.event_type, COUNT(*) AS n,
       ROUND(MIN(a.med), 6) AS med, ROUND(MIN(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN a.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM adev a JOIN mad m ON a.event_type = m.event_type
GROUP BY a.event_type
"""


# --- ST8 [ext]: event-time windows (batch twins of the streaming ops) -------


def st8_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window agg — the batch twin of the streaming windowed
    agg; epoch-aligned so date_trunc is the oracle."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), _dsum("value", 2, "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


ST8_TUMBLING_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n,
       {_sql_dsum('value', 2, 'sum_value')}
FROM events GROUP BY 1, 2
"""


def st8_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min (each event in 2 windows)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


ST8_SLIDING_SQL = """
SELECT window_start, COUNT(*) AS n FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start FROM events
) GROUP BY window_start
"""


def st8_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — batch twin of streaming
    sessionization; oracle is the lag/cumsum islands construction."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


ST8_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sess_id
"""


def st8_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (purchase keeps the session
    alive 60 min, click 15, else 30) — the dynamic-gap form of
    ``session_window`` that models intent-dependent session timeouts. Each
    event contributes [ts, ts+gap); overlapping intervals merge. The
    oracle rebuilds the same merge with a gaps-and-islands construction:
    a new session starts when the running MAX of previous interval ends
    (cummax window) is <= the current ts. Same single-shuffle cost as the
    static-gap session window."""
    # dynamic gaps must be CalendarIntervalType — make_interval, not the
    # ANSI INTERVAL literal (which is DayTimeIntervalType and rejected)
    gap = (
        F.when(F.col("event_type") == "purchase", F.expr("make_interval(0,0,0,0,0,60,0)"))
        .when(F.col("event_type") == "click", F.expr("make_interval(0,0,0,0,0,15,0)"))
        .otherwise(F.expr("make_interval(0,0,0,0,0,30,0)"))
    )
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


ST8_SESSION_DYN_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ts + CASE event_type WHEN 'purchase' THEN INTERVAL 60 MINUTE
                              WHEN 'click' THEN INTERVAL 15 MINUTE
                              ELSE INTERVAL 30 MINUTE END AS ev_end
  FROM events
), marked AS (
  SELECT user_id, ts,
         CASE WHEN MAX(ev_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > ts
              THEN 0 ELSE 1 END AS new_sess
  FROM ev
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sess_id
"""


def w9_impute_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (LOCF — last observation carried forward):
    null out a deterministic subset of readings ('click' events, standing in
    for sensor dropouts) and repair each from the user's most recent
    non-null value. The gap-repair step before any per-entity time-series
    model; same shape as the as-of carry-forward join.

    Plan: one window over (user, time) — single shuffle on ``user_id``;
    ``last(ignorenulls=True)`` with a rows-unbounded-preceding frame is
    sort-local within the partition."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    v = F.when(F.col("event_type") != "click", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        v.alias("raw_value"),
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )


W9_SQL = """
SELECT user_id, event_id,
       CASE WHEN event_type <> 'click' THEN value END AS raw_value,
       LAST_VALUE(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS filled_value
FROM events
"""


def w13_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of dropped-out readings — the
    upgrade of `w9_impute_ffill` real telemetry repair uses: each nulled
    'click' reading is rebuilt from the straight line between the user's
    surrounding non-null readings, weighted by actual event-time distance
    (boundary gaps fall back to the single available neighbor).

    Same plan shape as w9: ONE shuffle on user_id, four sort-local window
    expressions (prev/next value and timestamp, ignore-nulls frames). The
    interpolation arithmetic is an identical double chain over exact
    microsecond integers, rounded 6 dp."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    v = F.when(F.col("event_type") != "click", F.col("value"))
    t_of_v = F.when(v.isNotNull(), F.unix_micros("ts"))
    wp = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    wn = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        1, W.unboundedFollowing
    )
    prev_v = F.last(v, ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    prev_t = F.last(t_of_v, ignorenulls=True).over(wp)
    next_t = F.first(t_of_v, ignorenulls=True).over(wn)
    t = F.unix_micros("ts")
    interp = prev_v + (next_v - prev_v) * (
        (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    repaired = F.when(v.isNotNull(), v).otherwise(
        F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return e.select(
        "user_id",
        "event_id",
        v.alias("raw_value"),
        F.round(repaired, 6).alias("repaired_value"),
    )


W13_SQL = """
WITH b AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type <> 'click' THEN value END AS v,
         CASE WHEN event_type <> 'click' THEN epoch_us(ts) END AS tv
  FROM events
),
w AS (
  SELECT user_id, event_id, v, epoch_us(ts) AS t,
         LAST_VALUE(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
         FIRST_VALUE(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
         LAST_VALUE(tv IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t,
         FIRST_VALUE(tv IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t
  FROM b
)
SELECT user_id, event_id, v AS raw_value,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    prev_v + (next_v - prev_v)
                      * (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
                  WHEN prev_v IS NOT NULL THEN prev_v
                  ELSE next_v END, 6) AS repaired_value
FROM w
"""


def w15_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis — each event type's share of its day's total
    and of the grand total, plus the day's running share of the month: the
    'what moved the number' decomposition every metrics review starts
    with. Exact decimal sums at all three grains; the share divisions are
    identical double chains, rounded 6 dp. One fact aggregate + two
    partition-sized windows."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    cell = e.groupBy("day", "event_type").agg(F.sum("v").alias("cell_v"))
    wd = Window.partitionBy("day")
    wall = Window.partitionBy()
    return (
        cell.select(
            "day",
            "event_type",
            F.round(F.col("cell_v").cast("double"), 6).alias("cell_value"),
            F.round(
                F.col("cell_v").cast("double")
                / F.sum("cell_v").over(wd).cast("double"),
                6,
            ).alias("share_of_day"),
            F.round(
                F.col("cell_v").cast("double")
                / F.sum("cell_v").over(wall).cast("double"),
                6,
            ).alias("share_of_total"),
        )
        .orderBy("day", "event_type")
    )


W15_SQL = """
WITH cell AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         SUM(CAST(value AS DECIMAL(18,6))) AS cell_v
  FROM events GROUP BY 1, 2
)
SELECT day, event_type,
       ROUND(CAST(cell_v AS DOUBLE), 6) AS cell_value,
       ROUND(CAST(cell_v AS DOUBLE)
             / CAST(SUM(cell_v) OVER (PARTITION BY day) AS DOUBLE), 6) AS share_of_day,
       ROUND(CAST(cell_v AS DOUBLE)
             / CAST(SUM(cell_v) OVER () AS DOUBLE), 6) AS share_of_total
FROM cell ORDER BY day, event_type
"""


CONCURRENCY_HOLD_MIN = 5  # minutes each event is considered "active"


def w11_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event type — the classic +1/-1 boundary
    sweep: each event holds a resource for ``CONCURRENCY_HOLD_MIN`` minutes;
    emit +1 at start and -1 at end, running-sum in time order, take the max.
    Capacity planning's core query (max simultaneous sessions / connections
    / calls in flight).

    Ordering contract: ends sort before starts at the same instant
    (``ORDER BY t, delta``) — intervals are half-open, so an interval ending
    exactly when another starts never overlaps it. Within equal (t, delta)
    ties the running sum's intermediate values depend on row order, but the
    per-type MAX is order-independent (the max prefix is reached after the
    whole tie group either way) — so the result is engine-deterministic.

    Plan: one shuffle on event_type, sort-local running sum. At 100 TB the
    same sweep runs per (event_type, day) with a per-day carried-in offset
    (the running sum at midnight), keeping partitions bounded."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    starts = e.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = e.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {CONCURRENCY_HOLD_MIN} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        starts.unionAll(ends)
        .select("event_type", F.sum("delta").over(w).alias("cur"))
        .groupBy("event_type")
        .agg(
            F.max("cur").alias("max_concurrent"),
            (F.count("*") / 2).cast("long").alias("n_intervals"),
        )
    )


W11_SQL = f"""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL {CONCURRENCY_HOLD_MIN} MINUTE AS t, -1 AS delta
  FROM events
),
run AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS cur
  FROM pts
)
SELECT event_type, CAST(MAX(cur) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
FROM run GROUP BY event_type
"""


EWMA_ALPHA = 0.3  # smoothing factor; parsed to the same double by both engines


def w12_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value`` over time
    — the recursive smoother (s_t = a*x_t + (1-a)*s_{t-1}) behind alerting
    baselines and trend features. Window functions cannot express the
    recursion, so each user's series folds through ``aggregate`` over the
    time-sorted value array: both engines run the IDENTICAL left-to-right
    float fold, so the result is bit-exact with no rounding discipline.

    Scale shape: one shuffle on user_id; per-key state is the user's own
    history (fine for per-entity series; at 100 TB you bound it to a
    trailing window per partition-day exactly like the rolling-WAU
    pattern). Output: last smoothed value + series length per user."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    series = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("s")
        )
        .select(
            "user_id",
            F.transform("s", lambda x: x["value"]).alias("vals"),
        )
    )
    a = EWMA_ALPHA
    ewma = F.aggregate(
        F.expr("slice(vals, 2, size(vals) - 1)"),
        F.element_at("vals", 1).cast("double"),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return series.select(
        "user_id",
        F.size("vals").alias("n_points"),
        ewma.alias("ewma_last"),
    )


# DuckDB's list_reduce uses the first element as the initial accumulator and
# folds the rest — exactly the Spark construction above (init = vals[1],
# fold vals[2:]), so both engines run the same left-to-right float ops.
W12_SQL = f"""
SELECT user_id, CAST(len(vals) AS INT) AS n_points,
       list_reduce(vals,
         (acc, x) -> {EWMA_ALPHA!r}::DOUBLE * x + {1.0 - EWMA_ALPHA!r}::DOUBLE * acc
       ) AS ewma_last
FROM (
  SELECT user_id,
         list_transform(
           list_sort(list(ROW(ts, event_id, value))),
           r -> CAST(r[3] AS DOUBLE)
         ) AS vals
  FROM (SELECT user_id, ts, event_id, value FROM events)
  GROUP BY user_id
)
"""


# Tercile split points, computed once in Python and embedded verbatim in
# both engines (1/3 is not exactly representable — the literal must be the
# SAME double on both sides).
_RFM_QS = (1 / 3, 2 / 3)
_RFM_QS_SQL = ", ".join(repr(q) for q in _RFM_QS)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, vs the
    corpus max date), frequency (order count), monetary (lifetime cents),
    each tercile-binned against exact interpolated percentiles, combined
    into the classic 'R0F2M1'-style segment code. The campaign-targeting
    segmentation every warehouse team ships.

    Plan: one groupBy(custkey) over orders, a 1-row global-max-date and a
    1-row tercile-bounds aggregate broadcast back (the same
    no-global-sort equi-depth pattern as ``feat_equidepth_bins``), then a
    narrow binning map. Exact integer cents; interpolated percentile
    bounds are identical doubles in both engines."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    gmax = o.agg(F.max("o_orderdate").alias("gmax"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "o_custkey",
            F.datediff("gmax", "last_order").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    qs = ", ".join(repr(q) for q in _RFM_QS)
    bounds = cust.agg(
        F.expr(f"percentile(recency_days, array({qs}))").alias("rb"),
        F.expr(f"percentile(frequency, array({qs}))").alias("fb"),
        F.expr(f"percentile(monetary_cents, array({qs}))").alias("mb"),
    )

    def _bin(bs: str, v: str):
        return F.size(F.filter(F.col(bs), lambda b: b <= F.col(v).cast("double")))

    binned = cust.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        _bin("rb", "recency_days").alias("r_bin"),
        _bin("fb", "frequency").alias("f_bin"),
        _bin("mb", "monetary_cents").alias("m_bin"),
    )
    return binned.withColumn(
        "segment",
        F.concat(
            F.lit("R"), F.col("r_bin").cast("string"),
            F.lit("F"), F.col("f_bin").cast("string"),
            F.lit("M"), F.col("m_bin").cast("string"),
        ),
    )


RFM_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), gmax AS (SELECT MAX(o_orderdate) AS gmax FROM o),
cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   CAST((SELECT gmax FROM gmax) AS DATE)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(cents) AS BIGINT) AS monetary_cents
  FROM o GROUP BY o_custkey
), bounds AS (
  SELECT quantile_cont(recency_days, [{_RFM_QS_SQL}]) AS rb,
         quantile_cont(frequency, [{_RFM_QS_SQL}]) AS fb,
         quantile_cont(monetary_cents, [{_RFM_QS_SQL}]) AS mb
  FROM cust
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       len(list_filter(rb, b -> b <= CAST(recency_days AS DOUBLE))) AS r_bin,
       len(list_filter(fb, b -> b <= CAST(frequency AS DOUBLE))) AS f_bin,
       len(list_filter(mb, b -> b <= CAST(monetary_cents AS DOUBLE))) AS m_bin,
       'R' || len(list_filter(rb, b -> b <= CAST(recency_days AS DOUBLE)))
       || 'F' || len(list_filter(fb, b -> b <= CAST(frequency AS DOUBLE)))
       || 'M' || len(list_filter(mb, b -> b <= CAST(monetary_cents AS DOUBLE))) AS segment
FROM cust, bounds
"""


BASKET_TOP_N = 20


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence over the fact table: the top part pairs
    appearing in the same order ('bought together'), ranked by order count.

    Plan: dedup to (order, part), then a self-join on ``l_orderkey`` —
    both sides hash-partition on the SAME key, so the join is co-located
    after one shuffle each and the pair expansion is bounded by items-per-
    order (a per-entity constant), never all-pairs across the table. The
    pair aggregate is map-side combinable; top-k is a TakeOrdered, not a
    global sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (a["l_orderkey"] == b["ok_b"]) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(BASKET_TOP_N)
    )


BASKET_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_TOP_N}
"""


QUERIES: dict[str, tuple] = {
    "w9_impute_ffill": (w9_impute_ffill, W9_SQL),
    "w13_interpolate_linear": (w13_interpolate_linear, W13_SQL),
    "w15_percent_of_total": (w15_percent_of_total, W15_SQL),
    "w11_interval_concurrency": (w11_interval_concurrency, W11_SQL),
    "w12_ewma_smooth": (w12_ewma_smooth, W12_SQL),
    "basket_part_pairs": (basket_part_pairs, BASKET_SQL),
    "rfm_segments": (rfm_segments, RFM_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q18_large_volume": (q18_large_volume, Q18_SQL),
    "o7_filter_conj": (o7_filter_conj, O7_SQL),
    "o8_projection_rename": (o8_projection_rename, O8_SQL),
    "a5_agg_suite": (a5_agg_suite, A5_SQL),
    "a5_rollup": (a5_rollup, A5_ROLLUP_SQL),
    "a5_cube": (a5_cube, A5_CUBE_SQL),
    "j1_inner_equi": (j1_inner_equi, J1_SQL),
    "j2_broadcast_dims": (j2_broadcast_dims, J2_SQL),
    "j3_left_outer": (j3_left_outer, J3_SQL),
    "j3_full_outer": (j3_full_outer, J3_FULL_SQL),
    "j4_semi": (j4_semi, J4_SEMI_SQL),
    "j4_anti": (j4_anti, J4_ANTI_SQL),
    "j5_range_join": (j5_range_join, J5_SQL),
    "j6_star_join": (j6_star_join, J6_SQL),
    "j7_bloom_prefilter_join": (j7_bloom_prefilter_join, J7_SQL),
    "j8_skew_salted_join": (j8_skew_salted_join, J8_SQL),
    "t1_sort_desc": (t1_sort_desc, T1_SQL),
    "t2_topk": (t2_topk, T2_SQL),
    "t3_union": (t3_union, T3_UNION_SQL),
    "t3_intersect": (t3_intersect, T3_INTERSECT_SQL),
    "t3_except": (t3_except, T3_EXCEPT_SQL),
    "t3b_set_ops_all": (t3b_set_ops_all, T3B_SET_OPS_ALL_SQL),
    "w1_first_write_wins": (w1_first_write_wins, W1_SQL),
    "w2_rank_topn": (w2_rank_topn, W2_SQL),
    "w5_distribution_funcs": (w5_distribution_funcs, W5_SQL),
    "w3_lag_gap": (w3_lag_gap, W3_SQL),
    "w4_running_sum": (w4_running_sum, W4_SQL),
    "w6_value_funcs": (w6_value_funcs, W6_SQL),
    "w7_zscore_outliers": (w7_zscore_outliers, W7_SQL),
    "w10_mad_outliers": (w10_mad_outliers, W10_SQL),
    "w8_range_frame": (w8_range_frame, W8_SQL),
    "a6_listagg": (a6_listagg, A6_SQL),
    "st8_tumbling_window": (st8_tumbling_window, ST8_TUMBLING_SQL),
    "st8_sliding_window": (st8_sliding_window, ST8_SLIDING_SQL),
    "st8_session_window": (st8_session_window, ST8_SESSION_SQL),
    "st8_session_dynamic_gap": (st8_session_dynamic_gap, ST8_SESSION_DYN_SQL),
}
