"""TPC-H analog suite: the 14 query shapes not already covered by
``plans.relational`` (which has Q1/Q3/Q4/Q5/Q6/Q10/Q14/Q18). Together they
complete all 22 TPC-H operator shapes over the driver's star schema.

These are ANALOGS, not transliterations: the testdata lacks ``partsupp``
and several comment/phone/shipmode columns, so each query keeps the
*operator shape* that makes its TPC-H original interesting (correlated
scalar subquery, disjunctive pushdown, multi-EXISTS, count-distinct over a
derived relation, left-outer distribution, global-threshold HAVING...) and
maps it onto the columns that exist. The part-supplier relation is derived
from lineitem's (l_partkey, l_suppkey) pairs where partsupp would be used.

Generalizes the reference's verification SQL (``src/load-test.js:135``,
``scripts/01..04``) the same way plans/relational.py does; float policy
(decimal-cast sums, no gratuitous rounds) is inherited from there.

Scale notes: every query is declarative (Catalyst pushes filters/prunes
columns), dimension joins broadcast, fact-fact joins shuffle on their keys,
and aggregations are partial map-side. No collect, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.plans.relational import _davg, _dsum, _sql_davg, _sql_dsum
from drive_health_etl_spark.sources.tables import load_table


# --- Q2: min-cost supplier (correlated scalar MIN subquery) -----------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) achieving
    the MINIMUM unit price within a region — a correlated scalar subquery
    re-expressed as a per-part MIN WINDOW and an equality filter: ONE
    shuffle on partkey total (the group-min + join-back alternative scans
    the fact twice and shuffles twice; never a per-row subquery loop).

    The part-supplier relation is derived from lineitem (no partsupp
    table); unit price = l_extendedprice / l_quantity (identical IEEE
    division in both engines, so the min-equality matches bitwise). The
    part filter applies BEFORE the window so the shuffle carries only
    qualifying parts' lines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    ps = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("l_partkey", "l_suppkey", "unit", "s_name", "s_acctbal", "n_name",
                "p_partkey", "p_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("min_unit", F.min("unit").over(w))
        .filter(F.col("unit") == F.col("min_unit"))
        .select(
            "p_partkey", "p_name", F.col("l_suppkey").alias("s_suppkey"),
            "s_name", "s_acctbal", "n_name", F.col("min_unit").alias("unit_cost"),
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit,
         s_name, s_acctbal, n_name
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT DISTINCT p_partkey, p_name, l_suppkey AS s_suppkey, s_name, s_acctbal,
       n_name, unit AS unit_cost
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_type = 'STANDARD' AND p_size < 10
  AND unit = (SELECT MIN(unit) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
"""


# --- Q7: volume shipping between two nations (double-aliased dim join) ------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between a nation PAIR (supplier
    nation x customer nation, both directions), per ship year. The nation
    dim joins TWICE under different roles — columns are aliased to distinct
    names BEFORE the joins (a self-join on a derived frame would resolve
    both sides to the same attribute and silently drop the predicate)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(revenue, 4, "revenue"), F.count("*").alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {_sql_dsum('volume', 4, 'revenue')}, COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8: market share (conditional share of a grouped sum) ------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's order volume per
    order year — CASE-conditional numerator over the same grouped sum as
    the denominator (single fact pass, no second scan). Share divides two
    decimal-exact doubles; rounded at 6 dp because the quotient mixes
    magnitudes (the one genuinely engine-divergent spot)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key"))
    n_supp = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(target, 4, "_target"), _dsum(volume, 4, "_total"))
        .select(
            "o_year",
            F.round(F.col("_target") / F.col("_total"), 6).alias("mkt_share"),
            F.col("_total").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT o_year, ROUND(_target / _total, 6) AS mkt_share, _total AS total_volume
FROM (
  SELECT year(o_orderdate) AS o_year,
         {_sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4, '_target')},
         {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, '_total')}
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1
) ORDER BY o_year
"""


# --- Q9: product-type profit (computed measure over a 5-way join) -----------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a computed cost) by supplier
    nation and order year, for parts matching a name substring. Cost uses
    p_retailprice in place of ps_supplycost (no partsupp table). The name
    filter prunes the broadcast part dim before the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("p_retailprice") * F.col(
        "l_quantity"
    ) * F.lit(0.1)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(amount, 4, "sum_profit"), F.count("*").alias("n_lines"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT nation, o_year, {_sql_dsum('amount', 4, 'sum_profit')}, COUNT(*) AS n_lines
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1 AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# --- Q11: important stock (global-threshold scalar subquery in HAVING) ------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value among one nation's
    suppliers, keeping parts whose value exceeds a GLOBAL-AGGREGATE
    threshold — a scalar subquery in HAVING. (TPC-H scales its fraction by
    1/SF to keep the result non-empty; the scale-invariant equivalent here
    is 2x the mean per-part value, which selects the same skew tail at any
    corpus size.) Spark side: the 1-row global aggregate broadcast-joins
    back (no second scan of the grouped data, no collect); sums are
    decimal-exact so the > comparison agrees bitwise across engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    filtered = li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey).join(
        F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
    )
    per_part = filtered.groupBy("l_partkey").agg(_dsum("l_extendedprice", 2, "part_value"))
    thresh = per_part.agg(_davg(F.col("part_value"), 2, "avg_value"))
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("avg_value") * 2.0)
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {_sql_dsum('l_extendedprice', 2, 'part_value')}
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT {_sql_davg('part_value', 2, 't')} FROM per_part) * 2.0
ORDER BY part_value DESC, l_partkey
"""


# --- Q12: shipping delay classes (conditional counts over a join) -----------


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line-status (shipmode stand-in), counts of
    high- vs low-priority orders among LATE lines (shipped >60 days after
    the order date — the commit/receipt-date lag analog). One fact-fact
    join on orderkey, conditional counts map-side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- Q13: customer order-count distribution (outer join + re-aggregation) ---


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many qualifying
    orders they have — LEFT OUTER join (customers with zero orders must
    appear with count 0), then a second aggregation over the first's
    output. The outer join shuffles on custkey; the distribution re-agg is
    tiny (distinct order counts)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q15: top supplier (scalar MAX subquery over a derived view) ------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the MAXIMUM quarterly revenue —
    a derived revenue view referenced twice (once grouped, once for its
    max). Spark computes the view once; the 1-row max broadcasts back
    (no window over the whole table, no collect). Max over decimal-exact
    doubles matches bitwise across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(_dsum(revenue, 4, "total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q16: supplier count by part attrs (distinct-count + NOT IN subquery) ---


def q16_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute group,
    over the derived part-supplier relation, EXCLUDING a supplier subset
    via NOT IN (anti join — negative-balance suppliers stand in for the
    complaints filter). The distinct-pair reduction happens before the
    part join, so the count-distinct shuffle carries (partkey, suppkey)
    pairs, not lineitem rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q17: small-quantity revenue (correlated AVG subquery) ------------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below HALF
    THE PART'S AVERAGE — a correlated AVG subquery, re-expressed as a
    per-part AVG WINDOW and a filter: one shuffle on partkey (the
    group-avg + join-back alternative scans the brand-filtered fact twice).
    The avg is decimal-exact (identical double in both engines), so the <
    comparison agrees bitwise."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    fact = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    return (
        fact.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            _dsum("l_extendedprice", 2, "_total"),
            F.count("*").alias("n_lines"),
        )
        .select(
            F.round(F.col("_total") / 7.0, 6).alias("avg_yearly"),
            "n_lines",
        )
    )


Q17_SQL = f"""
WITH fact AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
),
avg_qty AS (
  SELECT l_partkey AS ap_key, {_sql_davg('l_quantity', 2, 'avg_qty')}
  FROM fact GROUP BY l_partkey
)
SELECT ROUND(_total / 7.0, 6) AS avg_yearly, n_lines
FROM (
  SELECT {_sql_dsum('l_extendedprice', 2, '_total')}, COUNT(*) AS n_lines
  FROM fact JOIN avg_qty ON l_partkey = ap_key
  WHERE l_quantity < 0.5 * avg_qty
)
"""


# --- Q19: disjunctive multi-attribute predicate (OR-of-ANDs pushdown) -------


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three conjunct groups
    spanning BOTH join sides (brand/size on part, quantity on lineitem).
    Catalyst extracts the common l_quantity bounds below the join and
    evaluates the disjunction post-join — the plan to check is that the
    scan still prunes columns and the join stays a broadcast equi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(
        _dsum(revenue, 4, "revenue"), F.count("*").alias("n_lines")
    )


Q19_SQL = f"""
SELECT {_sql_dsum('l_extendedprice * (1 - l_discount)', 4, 'revenue')}, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q20: excess-stock suppliers (nested IN + group-HAVING subquery) --------


Q20_QTY_THRESHOLD = 40.0


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who moved MORE THAN A
    THRESHOLD of any name-matched part in a year — a nested IN chain
    (supplier IN (group-HAVING over lineitem JOIN name-filtered part)),
    executed as semi joins. The HAVING aggregate reduces to (suppkey,
    partkey) grain before any join back to supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(_dsum("l_quantity", 2, "qty"))
        .filter(F.col("qty") > Q20_QTY_THRESHOLD)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(movers, supplier.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 2
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > {Q20_QTY_THRESHOLD}
  )
ORDER BY s_suppkey
"""


# --- Q21: sole late supplier (EXISTS + NOT EXISTS self-join) ----------------


def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: late lines on multi-supplier finished orders where
    the line's supplier was the ONLY late one — EXISTS (another supplier on
    the order) AND NOT EXISTS (another LATE supplier). Late = shipped >90
    days after the order date (receipt/commit-lag analog).

    Distributed formulation: a per-order WINDOW computes the distinct
    supplier set and distinct LATE-supplier set sizes (collect_set over the
    orderkey partition — bounded state, suppliers-per-order is small), so
    the whole EXISTS pair costs ONE shuffle on orderkey and ONE pass over
    the fact (the aggregate + join-back alternative scans lineitem twice;
    the naive EXISTS translation four times). The EXISTS pair becomes
    n_supps > 1 AND n_late_supps = 1 (the late line's own supplier is
    always in the late set, so =1 means 'no OTHER late supplier')."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    with_late = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    w = Window.partitionBy("l_orderkey")
    return (
        with_late.withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supps",
            F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
        )
        .filter(F.col("is_late") & (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- Q22: dormant high-balance customers (anti join + scalar AVG) -----------


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected segments with ABOVE-AVERAGE
    balance and no RECENT orders — a scalar AVG subquery (over positive
    balances) plus an anti join against the filtered orders (every customer
    in this corpus has SOME order, so 'dormant since 1999' is the analog of
    Q22's 'no orders at all'). Segment = custkey mod 10 (the phone
    country-code analog; the schema has no c_phone). The avg broadcasts as
    a 1-row frame; the anti join shuffles on custkey."""
    customer = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_custkey") % 10).cast("int")
    )
    segs = customer.filter(F.col("cntrycode").isin(1, 3, 5, 7, 9))
    avg_bal = segs.filter(F.col("c_acctbal") > 0.0).agg(_davg("c_acctbal", 2, "avg_bal"))
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    return (
        segs.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, segs.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), _dsum("c_acctbal", 2, "totacctbal"))
        .orderBy("cntrycode")
    )


Q22_SQL = f"""
WITH segs AS (
  SELECT *, CAST(c_custkey % 10 AS INT) AS cntrycode FROM customer
  WHERE CAST(c_custkey % 10 AS INT) IN (1, 3, 5, 7, 9)
)
SELECT cntrycode, COUNT(*) AS numcust, {_sql_dsum('c_acctbal', 2, 'totacctbal')}
FROM segs
WHERE c_acctbal > (SELECT {_sql_davg('c_acctbal', 2, 'a')} FROM segs WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES: dict[str, tuple] = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q12_priority_shipping": (q12_priority_shipping, Q12_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_part_supplier_count": (q16_part_supplier_count, Q16_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q19_discounted_revenue": (q19_discounted_revenue, Q19_SQL),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_SQL),
    "q21_waiting_orders": (q21_waiting_orders, Q21_SQL),
    "q22_global_sales_opportunity": (q22_global_sales_opportunity, Q22_SQL),
}
