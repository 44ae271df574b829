"""Advanced-surface suite: Spark 4 recursive CTEs, mergeable sketches, and
the binned range join — query shapes a 100 TB warehouse needs beyond the
classic relational core.

Generalizes the reference's verification-SQL layer (``src/load-test.js:135``)
the same way ``plans/relational.py`` does; each query here exists because the
shape matters at cluster scale:

- **Recursive CTE** (Spark 4's ``WITH RECURSIVE`` / UnionLoop execution):
  hierarchy flattening — org charts, category trees, referral chains — is a
  per-round equi-join whose iteration count is the hierarchy DEPTH (log-ish),
  never the row count.
- **Mergeable sketches** (Apache DataSketches HLL, exposed as
  ``hll_sketch_agg``/``hll_union_agg``): COUNT(DISTINCT) at 100 TB costs a
  full shuffle of the distinct keys, and worse, is NOT re-aggregable across
  partitions/days. A sketch column is: per-partition sketches merge
  associatively, so rollups keep distinct counts without re-scanning. The
  query verifies the estimate against the exact count in-engine (bounded
  relative error) so the oracle stays exact-valued.
- **approx_top_k**: heavy-hitters without a global sort; exact whenever the
  tracked-item budget covers the domain (it does here, asserted by the
  oracle matching the exact GROUP BY).
- **Binned range join**: Spark has no range-join optimization — a bare
  interval predicate plans as BroadcastNestedLoopJoin (quadratic work at
  scale). Binning maps intervals to ≤ ceil(len/w)+1 integer bins and points
  to exactly one, turning the join into an EQUI join on the bin key plus a
  residual filter — shuffle-partitionable on both sides, fan-out bounded by
  interval length / bin width. (Same strategy as Databricks' range-join hint
  and the interval-join in stream processors.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.plans.relational import _dsum
from drive_health_etl_spark.sources.tables import load_table, register_views


# --- Recursive CTE: hierarchy flattening ------------------------------------

# Parent edge: custkey -> floor(custkey / 10); roots are custkey < 10. A
# deterministic synthetic hierarchy (the star schema has no self-referencing
# dim), depth <= 5 at sf0.1. Identical SQL text runs on both engines —
# divisions go through FLOOR(x / 10.0) because bare CAST(double AS BIGINT)
# truncates in Spark but rounds in DuckDB (ROADMAP gotcha).
_RECURSIVE_SQL = """
WITH RECURSIVE chain AS (
  SELECT c_custkey, c_custkey AS node, 0 AS depth FROM customer
  UNION ALL
  SELECT c_custkey, CAST(FLOOR(node / 10.0) AS BIGINT) AS node, depth + 1 AS depth
  FROM chain WHERE node >= 10
)
SELECT node AS root_key, depth, COUNT(*) AS n_customers
FROM chain
WHERE node < 10
GROUP BY node, depth
"""


def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten the synthetic customer hierarchy with Spark 4's native
    ``WITH RECURSIVE``: each customer walks parent edges (integer-divide by
    10) to its root; output is customer count per (root, depth).

    Scale: each recursion round is one equi-join of the frontier against the
    (here: derived) edge relation — rounds = hierarchy depth, independent of
    customer count; the frontier shrinks monotonically. This is the declarative
    twin of the hand-rolled iterative loops in ``operators/graph.py`` (PageRank)
    and ``operators/dedup.py`` (connected components), which remain the right
    tool when per-round logic goes beyond UNION ALL semantics."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


SQL_RECURSIVE_CTE_SQL = _RECURSIVE_SQL


# --- Mergeable-sketch distinct counts ---------------------------------------


def sketch_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct buyers per order status, exact AND via DataSketches HLL —
    including a global row whose estimate comes from MERGING the per-group
    sketches (``hll_union_agg``), never re-scanning the fact.

    The sketch estimate is checked in-engine against the exact count
    (|est - exact| <= 5% * exact, far above HLL lgK=12's ~1.6% RSE) so the
    emitted columns stay exactly reproducible by the DuckDB oracle.

    Scale: per-partition HLL sketches are tiny (<= 2^12 buckets) and merge
    associatively — a daily rollup keeps a sketch column and answers
    "distinct users this month" by unioning 30 sketches instead of
    re-shuffling 100 TB of raw keys. COUNT(DISTINCT) has no such
    re-aggregation property; that asymmetry is the whole point of this
    operator at scale."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    per = orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("exact_nd"),
        F.hll_sketch_agg("o_custkey").alias("sk"),
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact_nd"))
        <= F.lit(0.05) * F.col("exact_nd")
    ).alias("est_ok")
    per_out = per.select(F.col("o_orderstatus").alias("grp"), "exact_nd", ok)
    merged = per.agg(F.hll_union_agg("sk").alias("sk"))
    glob_out = (
        orders.agg(F.count_distinct("o_custkey").alias("exact_nd"))
        .join(F.broadcast(merged))  # 1 row x 1 row
        .select(F.lit("_ALL_").alias("grp"), "exact_nd", ok)
    )
    return per_out.unionByName(glob_out)


SKETCH_DISTINCT_HLL_SQL = """
SELECT o_orderstatus AS grp, COUNT(DISTINCT o_custkey) AS exact_nd, TRUE AS est_ok
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT '_ALL_' AS grp, COUNT(DISTINCT o_custkey) AS exact_nd, TRUE AS est_ok
FROM orders
"""


def sketch_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the event stream via ``approx_top_k``. The tracked
    budget (50) exceeds the event_type domain (5), so the summary is EXACT
    and the plain GROUP BY oracle hash-matches it — the honest way to
    oracle-check an approximate operator in its exact regime.

    Scale: approx_top_k keeps a bounded item->count map per partition and
    merges maps at the final agg — heavy hitters over 100 TB without a
    global shuffle of the full key domain (the Misra-Gries/SpaceSaving
    family; over-budget domains degrade gracefully to approximate counts)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.agg(F.expr("approx_top_k(event_type, 50)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
    )


SKETCH_TOP_K_SQL = """
SELECT event_type AS item, COUNT(*) AS cnt FROM events GROUP BY event_type
"""


def sketch_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantiles (``percentile_approx``, the
    Greenwald-Khanna summary) checked in-engine against the exact
    interpolated percentile — same pattern as ``sketch_distinct_hll``: the
    approximate value is asserted within tolerance, the emitted columns are
    the exact ones the DuckDB oracle reproduces.

    Scale: exact percentiles need a full sort (or one pass per group with
    all values held); the GK summary is bounded-size per partition and
    merges associatively, so it survives partial aggregation and rollups —
    the only percentile that works in one pass over 100 TB."""
    e = load_table(spark, sf_dir, "events")
    exact50 = F.expr("percentile(value, 0.5)")
    exact95 = F.expr("percentile(value, 0.95)")
    ap50 = F.expr("approx_percentile(value, 0.5, 10000)")
    ap95 = F.expr("approx_percentile(value, 0.95, 10000)")

    def _ok(ap, exact):
        return F.abs(ap - exact) <= F.greatest(F.lit(1.0), F.lit(0.05) * F.abs(exact))

    return e.groupBy("event_type").agg(
        F.round(exact50, 6).alias("p50"),
        F.round(exact95, 6).alias("p95"),
        F.count("*").alias("n"),
        (_ok(ap50, exact50) & _ok(ap95, exact95)).alias("approx_ok"),
    )


SKETCH_QUANTILE_SQL = """
SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       COUNT(*) AS n, TRUE AS approx_ok
FROM events GROUP BY event_type
"""


def sketch_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users from MERGED daily sketches: one HLL per
    day, then ``hll_union_agg`` as a RANGE-frame window aggregate — the
    rolling-distinct construction that never re-touches raw events. The
    exact twin (bounded day-grid join over distinct (user, day)) rides
    along to assert the estimate in-engine; emitted columns stay exact.

    Scale: exact rolling distinct must re-expand every (user, day) pair
    into each of its 7 windows (7x shuffle volume, growing with the window
    length); the sketch path unions 7 kilobyte-sized summaries per day —
    O(days) state regardless of user count or window length. That
    asymmetry is why production WAU/MAU dashboards run on sketch columns."""
    e = load_table(spark, sf_dir, "events").select(
        F.unix_date(F.to_date("ts")).alias("day_num"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = e.groupBy("day_num", "day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    est = F.hll_sketch_estimate(
        F.expr(
            "hll_union_agg(sk) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)"
        )
    )
    rolled = daily.select("day_num", "day", est.alias("est_wau"))
    ud = e.select("day_num", "user_id").distinct()
    days = daily.select(F.col("day_num").alias("d_end"))
    exact = (
        ud.join(
            F.broadcast(days),
            (F.col("day_num") >= F.col("d_end") - 6) & (F.col("day_num") <= F.col("d_end")),
        )
        .groupBy("d_end")
        .agg(F.count_distinct("user_id").alias("exact_wau"))
    )
    return (
        rolled.join(exact, rolled.day_num == exact.d_end)
        .select(
            "day",
            "exact_wau",
            (
                F.abs(F.col("est_wau") - F.col("exact_wau"))
                <= F.greatest(F.lit(1.0), F.lit(0.05) * F.col("exact_wau"))
            ).alias("wau_ok"),
        )
    )


SKETCH_ROLLING_WAU_SQL = """
WITH ud AS (
  SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
         CAST(ts AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day_num, day FROM ud)
SELECT d.day, COUNT(DISTINCT u.user_id) AS exact_wau, TRUE AS wau_ok
FROM days d JOIN ud u ON u.day_num BETWEEN d.day_num - 6 AND d.day_num
GROUP BY d.day
"""


def sketch_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on Theta sketches: |clickers ∩ purchasers|,
    |clickers \\ purchasers| and the union — estimated from two per-segment
    sketches WITHOUT joining or re-scanning users. HLL can only union;
    Theta's intersection/difference is what answers audience-overlap
    questions ("how many users did both?") from pre-aggregated per-segment
    state at any scale. Estimates are asserted against exact counts
    in-engine; emitted columns are the exact ones.

    Scale: the exact answer needs a groupBy over every user; the sketch
    answer intersects two kilobyte summaries — per-segment sketches can be
    maintained incrementally (mergeable) and combined on demand."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    sk = e.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)"
        ).alias("sc"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)"
        ).alias("sp"),
    ).select(
        F.expr("theta_sketch_estimate(theta_intersection(sc, sp))").alias("est_both"),
        F.expr("theta_sketch_estimate(theta_difference(sc, sp))").alias("est_click_only"),
        F.expr("theta_sketch_estimate(theta_union(sc, sp))").alias("est_either"),
    )
    per_user = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    exact = per_user.agg(
        F.sum((F.col("c") * F.col("p"))).alias("exact_both"),
        F.sum(F.col("c") * (1 - F.col("p"))).alias("exact_click_only"),
        F.sum(F.greatest("c", "p")).alias("exact_either"),
    )

    def _ok(est, ex):
        return F.abs(F.col(est) - F.col(ex)) <= F.greatest(
            F.lit(2.0), F.lit(0.05) * F.col(ex)
        )

    return (
        exact.join(F.broadcast(sk))  # 1 row x 1 row
        .select(
            "exact_both",
            "exact_click_only",
            "exact_either",
            (
                _ok("est_both", "exact_both")
                & _ok("est_click_only", "exact_click_only")
                & _ok("est_either", "exact_either")
            ).alias("theta_ok"),
        )
    )


SKETCH_THETA_SQL = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(c * p) AS BIGINT) AS exact_both,
       CAST(SUM(c * (1 - p)) AS BIGINT) AS exact_click_only,
       CAST(SUM(GREATEST(c, p)) AS BIGINT) AS exact_either,
       TRUE AS theta_ok
FROM per_user
"""


# --- Binned range join ------------------------------------------------------

_PROMO_PRICE = 490000.0  # ~top-1% orders -> a calendar-bounded window set
_BIN_DAYS = 7  # bin width >= interval length (3d) -> each interval spans <=2 bins


def j5b_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join WITHOUT an equi key, made shuffle-partitionable by
    binning: revenue shipped inside each 3-day promo window (windows = the
    order dates of top-price orders).

    A bare ``ship_day BETWEEN w_start AND w_end`` predicate gives Catalyst no
    join key — it plans a nested-loop join, O(|windows| * |lineitem|). Instead
    both sides map onto 7-day integer bins: a point lands in exactly one bin,
    a 3-day interval spans at most two, enumerated with ``sequence``. The join
    becomes bin-equality plus a residual range filter — a plain shuffle/
    broadcast HASH join whose fan-out per row is bounded by
    ceil(interval/bin)+1, at ANY table size on EITHER side. Bin width tunes
    replication vs. residual-filter selectivity (rule of thumb: the typical
    interval length).

    Here the window side is calendar-bounded (<= ~2400 distinct days at any
    SF) so Spark broadcasts it; the binning is what keeps the pattern valid
    when both sides are fact-sized."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _PROMO_PRICE)
    windows = orders.select(F.to_date("o_orderdate").alias("w_start")).distinct()
    wb = windows.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_date(F.col("w_start")) / _BIN_DAYS),
                F.floor(F.unix_date(F.date_add("w_start", 2)) / _BIN_DAYS),
            )
        ),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.to_date("l_shipdate").alias("ship_day"), "l_extendedprice")
        .withColumn("bin", F.floor(F.unix_date("ship_day") / _BIN_DAYS))
    )
    return (
        li.join(wb, "bin")
        .filter(
            (F.col("ship_day") >= F.col("w_start"))
            & (F.col("ship_day") < F.date_add("w_start", 3))
        )
        .groupBy("w_start")
        .agg(F.count("*").alias("n_items"), _dsum("l_extendedprice", 2, "revenue"))
    )


J5B_BINNED_RANGE_SQL = f"""
WITH w AS (
  SELECT DISTINCT CAST(o_orderdate AS DATE) AS w_start
  FROM orders WHERE o_totalprice > {_PROMO_PRICE!r}
)
SELECT w_start, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM w JOIN lineitem
  ON CAST(l_shipdate AS DATE) >= w_start
 AND CAST(l_shipdate AS DATE) < w_start + INTERVAL 3 DAY
GROUP BY w_start
"""


# --- Spark 4 SQL surface: pipe syntax and scripting -------------------------


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pricing-summary shape written in Spark 4's SQL pipe
    syntax (`|>` operators). Same logical plan as the ANSI form — pipe
    syntax is pure parser surface, so pushdown/pruning/partial-agg behavior
    is identical; this query exists to pin that the surface works and stays
    result-identical to the ANSI oracle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1998-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE COUNT(*) AS n_items,
             CAST(SUM(CAST(disc_price AS DECIMAL(18,4))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        """
    )


SQL_PIPE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1998-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN ... END`` blocks): compute a derived
    threshold into a session variable, then use it in the final statement —
    the procedural surface for parameterized jobs that would otherwise
    round-trip scalars through the driver. The script's value is its LAST
    result set; the oracle inlines the variable as a scalar subquery.

    Scale note: the scalar assignment is a 1-row aggregate; the final query
    is an ordinary declarative plan — scripting adds sequencing, not a new
    execution model, so nothing here bypasses Catalyst."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff DOUBLE DEFAULT 0.0;
          SET cutoff = (SELECT MAX(o_totalprice) * 0.9 FROM orders);
          SELECT o_orderpriority, COUNT(*) AS n_orders
          FROM orders WHERE o_totalprice > cutoff
          GROUP BY o_orderpriority;
        END
        """
    )


SQL_SCRIPTING_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.9 FROM orders)
GROUP BY o_orderpriority
"""


def sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed distinct counting via Spark 4 bitmap aggregates:
    keys bucket into 32k-bit bitmaps (``bitmap_bucket_number`` /
    ``bitmap_bit_position``), per-(group, bucket) bitmaps OR-merge
    (``bitmap_construct_agg`` — map-side combinable, bounded 4 KB state per
    bucket), and the final count is a SUM of per-bucket popcounts. The
    middle ground between COUNT DISTINCT (full shuffle of distinct keys)
    and HLL (approximate): exact, mergeable, memory-bounded — the rollup
    pattern for dense integer keys at 100 TB. The oracle is plain
    COUNT(DISTINCT): values must be EQUAL, bitmaps are not approximate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH b AS (
          SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bmp
          FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(SUM(bitmap_count(bmp)) AS BIGINT) AS distinct_users
        FROM b GROUP BY event_type
        """
    )


SKETCH_BITMAP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
FROM events GROUP BY event_type
"""


# One SQL text both engines run verbatim: lateral column aliases (a SELECT
# item referencing an earlier alias), GROUP BY ALL (group on every
# non-aggregate select item), ORDER BY ALL — the modern-SQL sugar a
# migrating analyst types on day one. Zero translation = zero drift.
SQL_SUGAR_TEXT = """
SELECT o_orderpriority, YEAR(o_orderdate) AS yr, COUNT(*) AS n_orders,
       CAST(SUM(fee) AS DOUBLE) AS sum_fee
FROM (
  SELECT o_orderpriority, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) * (1 - 0.05) AS discounted,
         discounted * 0.1 AS fee
  FROM orders
)
GROUP BY ALL
ORDER BY ALL
"""


def sql_sugar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern-SQL sugar parity: the SAME SQL string (lateral column alias
    chain + GROUP BY ALL + ORDER BY ALL) executes verbatim on Spark and on
    the DuckDB oracle. Sugar is parser surface only — the plan is the
    ordinary pushdown-pruned partial+final aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_SUGAR_TEXT)


def sql_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 ``CREATE FUNCTION ... RETURN``): a scalar
    UDF (discounted price), a second scalar UDF composing the first into a
    price band, and a TABLE-valued SQL UDF applied per row via LATERAL —
    the catalog-persistable way to share business logic across jobs without
    Python.

    Scale note: SQL UDFs inline into the calling plan at analysis time
    (pure parser/analyzer surface — the optimized plan is identical to
    writing the expression inline), so they keep whole-stage codegen and
    pushdown; the oracle proves it by inlining the same logic verbatim. The
    table-valued UDF expands to a LATERAL explode — fan-out bounded by the
    function body, not the input."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN q >= 40 THEN 'bulk' WHEN q >= 10 THEN 'mid' ELSE 'small' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tax_steps(p DOUBLE) "
        "RETURNS TABLE(step INT, taxed DOUBLE) "
        "RETURN SELECT i AS step, p * (1.0 + 0.01 * i) AS taxed "
        "FROM (SELECT explode(sequence(1, 3)) AS i)"
    )
    return spark.sql(
        """
        SELECT qty_band(l_quantity) AS band, t.step,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(t.taxed AS DECIMAL(18,4))) AS DOUBLE) AS taxed_total
        FROM lineitem, LATERAL tax_steps(l_extendedprice) AS t
        WHERE l_shipdate >= DATE '1998-01-01'
        GROUP BY qty_band(l_quantity), t.step
        """
    )


SQL_UDF_SQL = """
SELECT CASE WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS band,
       t.step,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_extendedprice * (1.0 + 0.01 * t.step) AS DECIMAL(18,4))) AS DOUBLE) AS taxed_total
FROM lineitem,
     LATERAL (SELECT unnest([1, 2, 3]) AS step) AS t
WHERE l_shipdate >= DATE '1998-01-01'
GROUP BY 1, 2
"""


# --- Count-min sketch: mergeable frequency estimation ------------------------

_CMS_DEPTH = 3  # independent hash rows
_CMS_WIDTH = 512  # counters per row
_CMS_TOP = 10  # exact heavy-hitters to probe


def sketch_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed at the exact
    top-``_CMS_TOP`` words: (word, exact_n, est_n, overshoot). The CMS
    guarantee est >= exact holds deterministically; overshoot is the
    collision error (bounded by N/width per row in expectation, min across
    ``_CMS_DEPTH`` rows).

    Scale design: this is THE re-aggregable frequency structure — the sketch
    is a fixed (depth x width) integer grid, built with one map-side-
    combinable groupBy on (row, counter) after a depth-way posexplode (shuffle
    key cardinality = depth*width = 1536, independent of corpus size); grids
    from different partitions/days merge by cell-wise addition
    (same property the HLL/Theta/bitmap queries pin for distinct counts).
    Hash parity: md5-derived counter ids, identical bits in both engines.
    All-integer outputs — no float policy involvement."""
    from drive_health_etl_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col()).alias("word"))
    cols = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{r}:"), F.col("word"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _CMS_WIDTH
        ).alias(f"c{r}")
        for r in range(_CMS_DEPTH)
    ]
    cells = (
        toks.select("word", F.posexplode(F.array(*cols)).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    exact = (
        toks.groupBy("word")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("word").asc())
        .limit(_CMS_TOP)
    )
    probes = exact.select(
        "word", "exact_n", F.posexplode(F.array(*cols)).alias("r", "c")
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("word", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return est.select(
        "word",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overshoot"),
    ).orderBy(F.col("exact_n").desc(), F.col("word").asc())


def _cms_col_sql(r: int, word: str = "word") -> str:
    return f"(('0x' || substr(md5('cms{r}:' || {word}), 1, 8))::BIGINT % {_CMS_WIDTH})"


SKETCH_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
cells AS (
  SELECT r, c, COUNT(*) AS cnt FROM (
    {" UNION ALL ".join(f"SELECT {r} AS r, {_cms_col_sql(r)} AS c FROM toks" for r in range(_CMS_DEPTH))}
  ) GROUP BY r, c
),
exact AS (
  SELECT word, COUNT(*) AS exact_n FROM toks GROUP BY word
  ORDER BY exact_n DESC, word ASC LIMIT {_CMS_TOP}
),
probes AS (
  {" UNION ALL ".join(f"SELECT word, exact_n, {r} AS r, {_cms_col_sql(r)} AS c FROM exact" for r in range(_CMS_DEPTH))}
),
est AS (
  SELECT word, exact_n, CAST(MIN(cnt) AS BIGINT) AS est_n
  FROM probes JOIN cells USING (r, c)
  GROUP BY word, exact_n
)
SELECT word, exact_n, est_n, est_n - exact_n AS overshoot
FROM est ORDER BY exact_n DESC, word ASC
"""


def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 session variables at the TOP level (the `sql_scripting` twin
    outside BEGIN/END): ``DECLARE VARIABLE``, ``SET VAR`` from a scalar
    subquery, an ``IDENTIFIER(:var)``-style dynamic table reference, and
    variable use inside an ordinary aggregate — the parameterized-job
    surface analysts use to avoid string-formatting SQL on the driver.

    The oracle inlines the same parameters as literals/scalar subqueries
    (variables are a binding mechanism, not an execution model — the plan
    under them is ordinary Catalyst)."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE fact_table STRING DEFAULT 'lineitem'")
    spark.sql("DECLARE OR REPLACE VARIABLE qty_floor DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR qty_floor = (SELECT AVG(l_quantity) FROM lineitem)")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM IDENTIFIER(fact_table)
        WHERE l_quantity > qty_floor
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


SQL_SESSION_VARIABLES_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min MERGEABILITY, proven end to end: build one sketch per
    document source (partition-local grids), merge them by CELL-WISE
    ADDITION, and probe the merged grid at the exact corpus-wide top
    words — per probe, the merged estimate must equal the whole-corpus
    sketch's estimate exactly (same hash family, addition commutes) and
    still dominate the exact count. This is the property that lets daily
    sketch rollups answer range queries without re-scanning raw tokens.

    The shuffle keys are (source, row, counter) then (row, counter) —
    both bounded by depth*width, never by corpus size."""
    from drive_health_etl_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens_col()).alias("word"))
    cols = [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cms{r}:"), F.col("word"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _CMS_WIDTH
        ).alias(f"c{r}")
        for r in range(_CMS_DEPTH)
    ]
    per_source = (
        toks.select("source", "word", F.posexplode(F.array(*cols)).alias("r", "c"))
        .groupBy("source", "r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    merged = per_source.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    exact = (
        toks.groupBy("word")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("word").asc())
        .limit(_CMS_TOP)
    )
    probes = exact.select("word", "exact_n", F.posexplode(F.array(*cols)).alias("r", "c"))
    est = (
        probes.join(F.broadcast(merged), ["r", "c"])
        .groupBy("word", "exact_n")
        .agg(F.min("cnt").alias("est_merged"))
    )
    return est.select(
        "word",
        "exact_n",
        "est_merged",
        (F.col("est_merged") >= F.col("exact_n")).alias("dominates"),
    ).orderBy(F.col("exact_n").desc(), F.col("word").asc())


SKETCH_CMS_MERGE_SQL = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
cells AS (
  SELECT source, r, c, COUNT(*) AS cnt FROM (
    {" UNION ALL ".join(f"SELECT source, word, {r} AS r, {_cms_col_sql(r)} AS c FROM toks" for r in range(_CMS_DEPTH))}
  ) GROUP BY source, r, c
),
merged AS (
  SELECT r, c, CAST(SUM(cnt) AS BIGINT) AS cnt FROM cells GROUP BY r, c
),
exact AS (
  SELECT word, COUNT(*) AS exact_n FROM toks GROUP BY word
  ORDER BY exact_n DESC, word ASC LIMIT {_CMS_TOP}
),
probes AS (
  {" UNION ALL ".join(f"SELECT word, exact_n, {r} AS r, {_cms_col_sql(r)} AS c FROM exact" for r in range(_CMS_DEPTH))}
),
est AS (
  SELECT word, exact_n, CAST(MIN(cnt) AS BIGINT) AS est_merged
  FROM probes JOIN merged USING (r, c)
  GROUP BY word, exact_n
)
SELECT word, exact_n, est_merged, est_merged >= exact_n AS dominates
FROM est ORDER BY exact_n DESC, word ASC
"""


def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``EXECUTE IMMEDIATE``: a SQL string held in a session
    variable, executed with ``USING`` parameter binding — the injection-safe
    dynamic-SQL surface (templated jobs bind parameters instead of
    formatting strings). The oracle inlines the bound parameter; the plan
    under the dynamic shell is ordinary Catalyst."""
    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE stmt STRING DEFAULT "
        "'SELECT o_orderpriority, COUNT(*) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders WHERE o_orderstatus = ? "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority'"
    )
    return spark.sql("EXECUTE IMMEDIATE stmt USING 'F'")


SQL_EXECUTE_IMMEDIATE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "sql_recursive_cte": (sql_recursive_cte, SQL_RECURSIVE_CTE_SQL),
    "sketch_cms_estimate": (sketch_cms_estimate, SKETCH_CMS_SQL),
    "sql_session_variables": (sql_session_variables, SQL_SESSION_VARIABLES_SQL),
    "sql_execute_immediate": (sql_execute_immediate, SQL_EXECUTE_IMMEDIATE_SQL),
    "sketch_cms_merge": (sketch_cms_merge, SKETCH_CMS_MERGE_SQL),
    "sql_pipe_syntax": (sql_pipe_syntax, SQL_PIPE_SQL),
    "sql_scripting": (sql_scripting, SQL_SCRIPTING_SQL),
    "sql_udf_suite": (sql_udf_suite, SQL_UDF_SQL),
    "sql_sugar_suite": (sql_sugar_suite, SQL_SUGAR_TEXT),
    "sketch_bitmap_distinct": (sketch_bitmap_distinct, SKETCH_BITMAP_SQL),
    "sketch_distinct_hll": (sketch_distinct_hll, SKETCH_DISTINCT_HLL_SQL),
    "sketch_top_k": (sketch_top_k, SKETCH_TOP_K_SQL),
    "sketch_quantile_check": (sketch_quantile_check, SKETCH_QUANTILE_SQL),
    "sketch_rolling_wau": (sketch_rolling_wau, SKETCH_ROLLING_WAU_SQL),
    "sketch_theta_overlap": (sketch_theta_overlap, SKETCH_THETA_SQL),
    "j5b_binned_range_join": (j5b_binned_range_join, J5B_BINNED_RANGE_SQL),
}
