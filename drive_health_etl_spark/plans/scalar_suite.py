"""Scalar-function breadth suite (SURVEY.md §2.3 generalized): string, date,
math functions, subquery forms, and null semantics — each as one wide
oracle-checked query so the function surface is hash-verified, not assumed.

Engine-parity notes baked in:
- ``dayofweek`` origins differ (Spark 1=Sun, DuckDB 0=Sun) -> use Spark
  ``weekday`` (0=Mon) vs DuckDB ``isodow - 1``.
- Transcendentals (exp/ln/pow) agree through libm but outputs round to 6dp
  anyway under the global float policy.
- ``initcap`` doesn't exist in DuckDB -> not used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table, register_views


def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_caps_vowels"),
        F.levenshtein("p_brand", F.lit("Brand#00")).alias("brand_dist"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
    )


F_STRING_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name_head,
       trim('  x  ') AS trimmed,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       reverse(p_brand) AS brand_rev,
       translate(p_type, 'aeiou', 'AEIOU') AS type_caps_vowels,
       levenshtein(p_brand, 'Brand#00') AS brand_dist,
       p_brand || '|' || p_type AS brand_type,
       string_split(p_type, ' ')[1] AS type_first_word
FROM part
"""


def f_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.weekday(d).alias("wd"),
        F.quarter(d).alias("q"),
        F.date_add(d, 30).alias("plus30"),
        F.add_months(d, 2).alias("plus2m"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        # date_trunc returns TIMESTAMP in Spark but DATE in DuckDB — align
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )


F_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       dayofmonth(o_orderdate) AS dom,
       isodow(o_orderdate) - 1 AS wd,
       quarter(o_orderdate) AS q,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
FROM orders
"""


def f_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    x = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        F.abs(x * -1).alias("abs_price"),
        F.round(F.sqrt(x), 6).alias("sqrt_price"),
        F.round(F.log(x), 6).alias("ln_price"),
        F.round(F.log10(x), 6).alias("log10_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.round(F.pow(F.col("l_quantity"), F.lit(1.5)), 6).alias("qty_pow"),
        F.floor(x).cast("long").alias("floor_price"),
        F.ceil(x).cast("long").alias("ceil_price"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.greatest(F.col("l_discount"), F.col("l_tax")).alias("max_rate"),
        F.least(F.col("l_discount"), F.col("l_tax")).alias("min_rate"),
        F.sign(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


F_MATH_SQL = """
SELECT l_orderkey,
       abs(l_extendedprice * -1) AS abs_price,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(log10(l_extendedprice), 6) AS log10_price,
       round(exp(l_discount), 6) AS exp_disc,
       round(pow(l_quantity, 1.5), 6) AS qty_pow,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
       l_orderkey % 7 AS key_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
FROM lineitem WHERE l_linenumber = 1
"""


def t7_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator breadth beyond ``explode``/``posexplode`` (t6): ``stack``
    (n-column unpivot), ``inline`` (array-of-structs expansion), and
    ``posexplode_outer`` (NULL/empty arrays keep their parent row with null
    position — the left-outer contract every flatten pipeline needs when
    rows must never vanish). One labeled union; the oracle rebuilds each
    generator from first principles (UNION ALL / ordinality unnest /
    explicit empty-case branch)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH e AS (
          SELECT event_id, user_id, value,
                 CASE WHEN event_id % 5 = 0 THEN array()
                      WHEN event_id % 7 = 0 THEN CAST(NULL AS ARRAY<DOUBLE>)
                      ELSE array(value, CAST(user_id AS DOUBLE)) END AS arr
          FROM events WHERE event_id < 500
        )
        SELECT event_id, 'stack' AS gen, k, v
        FROM e LATERAL VIEW stack(2, 'value', value, 'uid', CAST(user_id AS DOUBLE)) AS k, v
        UNION ALL
        SELECT event_id, 'inline' AS gen, k, v FROM e
        LATERAL VIEW inline(array(named_struct('k', 'double_val', 'v', value * 2),
                                  named_struct('k', 'neg_uid', 'v', -CAST(user_id AS DOUBLE)))) AS k, v
        UNION ALL
        SELECT event_id, 'pexp' AS gen, CAST(pos AS STRING) AS k, val AS v
        FROM e LATERAL VIEW OUTER posexplode(arr) AS pos, val
        """
    )


T7_GENERATORS_SQL = """
WITH e AS (
  SELECT event_id, user_id, value,
         CASE WHEN event_id % 5 = 0 THEN []::DOUBLE[]
              WHEN event_id % 7 = 0 THEN NULL
              ELSE [value, CAST(user_id AS DOUBLE)] END AS arr
  FROM events WHERE event_id < 500
)
SELECT event_id, 'stack' AS gen, k, v FROM (
  SELECT event_id, 'value' AS k, value AS v FROM e
  UNION ALL
  SELECT event_id, 'uid' AS k, CAST(user_id AS DOUBLE) AS v FROM e
)
UNION ALL
SELECT event_id, 'inline' AS gen, k, v FROM (
  SELECT event_id, 'double_val' AS k, value * 2 AS v FROM e
  UNION ALL
  SELECT event_id, 'neg_uid' AS k, -CAST(user_id AS DOUBLE) AS v FROM e
)
UNION ALL
SELECT event_id, 'pexp' AS gen, k, v FROM (
  SELECT event_id, CAST(NULL AS VARCHAR) AS k, CAST(NULL AS DOUBLE) AS v
  FROM e WHERE arr IS NULL OR len(arr) = 0
  UNION ALL
  SELECT event_id, CAST(t.i - 1 AS VARCHAR) AS k, arr[t.i] AS v
  FROM e, UNNEST(generate_series(1, len(arr))) AS t(i)
  WHERE arr IS NOT NULL AND len(arr) > 0
)
"""


A9_AGG_FILTER_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total,
       MAX(o_orderdate) FILTER (WHERE o_orderstatus = 'P') AS last_pending
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def a9_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``FILTER (WHERE ...)`` aggregate clause — the standard spelling
    of conditional aggregation (clearer than CASE-in-SUM and pushed to the
    same partial-aggregate plan). IDENTICAL SQL text runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(A9_AGG_FILTER_SQL)


def sub_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via the SQL API: orders above the global mean price."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                           / COUNT(*), 6) FROM orders)
        """
    )


SUB_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                   / COUNT(*), 6) FROM orders)
"""


def sub_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated IN subquery via the SQL API."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        """
    )


SUB_IN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def sub_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (Spark 4 `... JOIN LATERAL (...)`):
    each nation pulls its own top customer by account balance from a
    dependent subquery — the 'top-1 per outer row' idiom that decorrelates
    into a window/aggregate under the hood. Identical SQL text runs on both
    engines (DuckDB supports LATERAL natively); ties pinned on custkey."""
    register_views(spark, sf_dir)
    return spark.sql(SUB_LATERAL_SQL)


SUB_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 1
) t
ORDER BY n.n_name
"""


def f_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-function breadth: AND/OR/XOR, NOT, shifts, bit_count,
    get/set-style masks — the ops the bloom/bitmap/fingerprint operators
    build on, exercised directly as a day-one function-parity suite.
    Integer-exact everywhere; identical SQL-level semantics pinned by the
    oracle (DuckDB shift/xor are functions, not operators — spelled per
    engine, same bits)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    k = F.col("event_id")
    u = F.col("user_id")
    return e.select(
        "event_id",
        k.bitwiseAND(u).alias("b_and"),
        k.bitwiseOR(u).alias("b_or"),
        k.bitwiseXOR(u).alias("b_xor"),
        F.bitwise_not(k).alias("b_not"),
        F.call_function("shiftleft", k.cast("int"), F.lit(3)).cast("long").alias("shl3"),
        F.call_function("shiftright", k.cast("int"), F.lit(2)).cast("long").alias("shr2"),
        F.bit_count(k).alias("popcnt"),
        (k.bitwiseAND(F.lit(0xFF))).alias("low_byte"),
    )


F_BITWISE_SQL = """
SELECT event_id,
       event_id & user_id AS b_and,
       event_id | user_id AS b_or,
       xor(event_id, user_id) AS b_xor,
       ~event_id AS b_not,
       CAST(CAST(event_id AS INTEGER) << 3 AS BIGINT) AS shl3,
       CAST(CAST(event_id AS INTEGER) >> 2 AS BIGINT) AS shr2,
       CAST(bit_count(event_id) AS INTEGER) AS popcnt,
       event_id & 255 AS low_byte
FROM events
"""


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling corners: COUNT(col) vs COUNT(*), null-safe equality,
    COALESCE/NULLIF, null grouping key — with nulls injected 1-in-5."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    t = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("event_type"))
    return (
        e.select(
            t.alias("t"),
            v.alias("v"),
            v.eqNullSafe(F.lit(None).cast("double")).alias("is_null_nullsafe"),
            F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        )
        .groupBy("t")
        .agg(
            F.count("*").alias("n_all"),
            F.count("v").alias("n_nonnull"),
            F.sum(F.col("is_null_nullsafe").cast("long")).alias("n_nullsafe_true"),
            F.count("type_or_null").alias("n_not_error"),
        )
    )


NULL_SEMANTICS_SQL = """
SELECT t, COUNT(*) AS n_all, COUNT(v) AS n_nonnull,
       CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_true,
       COUNT(type_or_null) AS n_not_error
FROM (
  SELECT CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS t,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v,
         NULLIF(event_type, 'error') AS type_or_null
  FROM events
)
GROUP BY t
"""


def a5_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: exact percentiles (linear interpolation in
    both engines), stddev/variance, correlation/covariance, skewness/
    kurtosis (rounded to 4 — accumulation formulas differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    return li.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
        F.round(F.stddev_samp(x), 4).alias("sd"),
        F.round(F.var_samp(x), 2).alias("var"),
        F.round(F.corr(x, y), 6).alias("price_qty_corr"),
        F.round(F.covar_samp(x, y), 2).alias("price_qty_cov"),
        F.round(F.skewness(x), 4).alias("skew"),
        F.round(F.kurtosis(x), 4).alias("kurt"),
    )


A5_STATS_SQL = """
SELECT round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
       round(stddev_samp(l_extendedprice), 4) AS sd,
       round(var_samp(l_extendedprice), 2) AS var,
       round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
       round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_cov,
       round(skewness(l_extendedprice), 4) AS skew,
       round(kurtosis(l_extendedprice), 4) AS kurt
FROM lineitem
"""


def f_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding vectors: slice, element
    access, sort, distinct count, position, sequence/zip arithmetic."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(F.element_at(e, 1), 6).alias("first"),
        F.round(F.element_at(e, -1), 6).alias("last"),
        F.round(F.array_max(e), 6).alias("vmax"),
        F.round(F.array_min(e), 6).alias("vmin"),
        F.round(F.element_at(F.slice(e, 1, 4), 2), 6).alias("slice_2nd"),
        F.round(F.element_at(F.sort_array(e), 3), 6).alias("third_smallest"),
        F.size(F.array_distinct(e)).alias("n_distinct"),
        F.round(
            F.aggregate(F.zip_with(e, e, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v),
            6,
        ).alias("self_dot"),
    )


F_ARRAY_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round((embedding::DOUBLE[])[1], 6) AS first,
       round((embedding::DOUBLE[])[-1], 6) AS last,
       round(list_max(embedding::DOUBLE[]), 6) AS vmax,
       round(list_min(embedding::DOUBLE[]), 6) AS vmin,
       round((embedding::DOUBLE[])[1:4][2], 6) AS slice_2nd,
       round(list_sort(embedding::DOUBLE[])[3], 6) AS third_smallest,
       len(list_distinct(embedding::DOUBLE[])) AS n_distinct,
       round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS self_dot
FROM embeddings
"""


def f_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-function surface over document text: group extraction, find-all
    (count + first/last match), boolean match — the engine-portable subset
    (Spark regexp_* / DuckDB regexp_*, both RE2-class syntax; no lookbehind,
    which DuckDB's RE2 rejects)."""
    d = load_table(spark, sf_dir, "documents")
    num = r"[0-9]+"
    word_up = r"\b[A-Z][a-z]+"
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)ing\b", 1).alias("first_ing_stem"),
        F.size(F.expr(f"regexp_extract_all(text, '{num}')")).alias("n_numbers"),
        F.try_element_at(F.expr(f"regexp_extract_all(text, '{num}')"), F.lit(1)).alias("first_num"),
        F.try_element_at(F.expr(f"regexp_extract_all(text, '{num}')"), F.lit(-1)).alias("last_num"),
        F.col("text").rlike(word_up).alias("has_capitalized"),
        F.size(F.expr(r"regexp_extract_all(text, '\\b[A-Z][a-z]+')")).alias("n_capitalized"),
    )


F_REGEX_SQL = r"""
SELECT doc_id,
       regexp_extract(text, '([a-z]+)ing\b', 1) AS first_ing_stem,
       len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
       regexp_extract_all(text, '[0-9]+')[1] AS first_num,
       regexp_extract_all(text, '[0-9]+')[-1] AS last_num,
       regexp_matches(text, '\b[A-Z][a-z]+') AS has_capitalized,
       len(regexp_extract_all(text, '\b[A-Z][a-z]+')) AS n_capitalized
FROM documents
"""


def f_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: UTF8_LCASE comparison and grouping semantics,
    asserted in-engine against the explicit lower() rewrite (collation is
    engine-specific surface — DuckDB's collations differ — so the oracle
    sees exact lower()-based values plus TRUE flags, the sketch_* pattern).

    Scale note: collated equality pushes into hash keys like any other
    binary comparison — grouping by a collated column is one shuffle, same
    as grouping by lower(col), but keeps the original bytes for output."""
    c = load_table(spark, sf_dir, "customer")
    mixed = F.concat(F.upper(F.substring("c_mktsegment", 1, 2)),
                     F.lower(F.substring("c_mktsegment", 3, 99)))
    lc = F.collate(mixed, "UTF8_LCASE")
    per = (
        c.select(
            mixed.alias("seg_mixed"),
            F.lower("c_mktsegment").alias("seg_lower"),
            (lc == F.collate(F.lower("c_mktsegment"), "UTF8_LCASE")).alias("ci_eq"),
        )
        .groupBy("seg_lower")
        .agg(
            F.count("*").alias("n"),
            F.min(F.col("ci_eq").cast("int")).alias("all_ci_eq"),
        )
    )
    return per.select(
        "seg_lower", "n",
        (F.col("all_ci_eq") == 1).alias("collation_ok"),
    )


F_COLLATION_SQL = """
SELECT lower(c_mktsegment) AS seg_lower, COUNT(*) AS n, TRUE AS collation_ok
FROM customer GROUP BY 1
"""


def f_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar record-parsing surface (``from_csv`` / ``from_xml``):
    serialize order fields to a CSV line and an XML fragment, parse both
    back, and assert field-level equality in-engine. DuckDB has no scalar
    XML parser, so the oracle reproduces the exact passthrough columns and
    TRUE flags (the engine-specific-surface pattern, like collations).

    The roundtrip is exact: double -> string -> double is value-preserving
    for Spark's shortest-repr formatting, and the parsers run as native
    expressions (no Python)."""
    o = load_table(spark, sf_dir, "orders")
    csv_line = F.concat_ws(",", "o_orderkey", "o_orderstatus", "o_totalprice")
    pc = F.from_csv(csv_line, F.lit("k LONG, s STRING, p DOUBLE"))
    xml_str = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey"), F.lit("</k><s>"),
        F.col("o_orderstatus"), F.lit("</s></o>"),
    )
    px = F.from_xml(xml_str, "k LONG, s STRING")
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        (
            (pc["k"] == F.col("o_orderkey"))
            & (pc["s"] == F.col("o_orderstatus"))
            & (pc["p"] == F.col("o_totalprice"))
        ).alias("csv_ok"),
        ((px["k"] == F.col("o_orderkey")) & (px["s"] == F.col("o_orderstatus"))).alias("xml_ok"),
    )


F_PARSE_SQL = """
SELECT o_orderkey, o_orderstatus AS status, TRUE AS csv_ok, TRUE AS xml_ok
FROM orders
"""


def f_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``try_*`` error-handling surface — the sanctioned escapes from Spark
    4's ANSI mode (where bare cast/divide/add THROW): failed casts, divide
    by zero, and bigint overflow all yield NULL instead of killing the
    1000-executor job at the one poison row. The oracle reproduces each
    NULL contract with CASE/NULLIF equivalents (DuckDB double division
    already yields NULL on zero)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),  # always NULL
        F.col("o_orderkey").cast("string").try_cast("long").alias("roundtrip_cast"),
        F.try_divide(F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("double")).alias(
            "div_or_null"
        ),
        F.try_add(F.lit(9223372036854775807), F.col("o_orderkey")).alias("overflow_add"),
    )


F_TRY_SQL = """
SELECT o_orderkey,
       try_cast(o_orderstatus AS INT) AS bad_cast,
       try_cast(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip_cast,
       o_totalprice / CAST(o_orderkey % 3 AS DOUBLE) AS div_or_null,
       CASE WHEN o_orderkey = 0 THEN 9223372036854775807 ELSE NULL END AS overflow_add
FROM orders
"""


def a8_misc_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function breadth: count_if, bool_and/bool_or, and
    deterministic argmax/argmin via max_by/min_by over a (value, key)
    struct (bare max_by ties are nondeterministic — the struct tiebreak is
    the portable fix; the oracle uses the equivalent ROW_NUMBER pick)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.expr("count_if(o_totalprice > 250000.0)").alias("n_big"),
        F.expr("bool_and(o_totalprice > 0.0)").alias("all_positive"),
        F.expr("bool_or(o_totalprice > 490000.0)").alias("any_jumbo"),
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("priciest_order"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("cheapest_order"),
    )


A8_MISC_AGGS_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice ASC, o_orderkey DESC) AS rn_min
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(count_if(o_totalprice > 250000.0) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0.0) AS all_positive,
       bool_or(o_totalprice > 490000.0) AS any_jumbo,
       MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order,
       MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order
FROM ranked GROUP BY o_orderpriority
"""


def a5_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact percentiles (grouped quantile_cont twin)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.count("*").alias("n"),
    )


A5_GROUP_PCTL_SQL = """
SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95, COUNT(*) AS n
FROM events GROUP BY event_type
"""


def a5_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (14 buckets over [0, 350)) —
    explicit floor arithmetic so both engines bucket identically."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25.0).cast("int")
    return (
        e.select(F.least(bucket, F.lit(13)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


A5_HISTOGRAM_SQL = """
SELECT LEAST(CAST(floor(value / 25.0) AS INTEGER), 13) AS bucket, COUNT(*) AS n
FROM events GROUP BY 1
"""


def a7_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (statistical preprocessing): clip event values to their
    exact [p01, p99] and report the clip counts + pre/post means — the
    outlier-robust normalization step before feeding a metric into training
    or monitoring. One exact-percentile aggregate (1 row) broadcast onto a
    narrow clamp map, then one global aggregate; two passes over the column,
    no per-group state."""
    e = load_table(spark, sf_dir, "events").select("value")
    bounds = e.agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    clipped = e.crossJoin(F.broadcast(bounds)).withColumn(
        "v_clip", F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    )
    return clipped.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("value") < F.col("p01"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("p99"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"), 6
        ).alias("mean_raw"),
        F.round(
            F.sum(F.col("v_clip").cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("mean_winsorized"),
    )


A7_WINSORIZE_SQL = """
WITH bounds AS (
  SELECT quantile_cont(value, 0.01) AS p01, quantile_cont(value, 0.99) AS p99
  FROM events
)
SELECT COUNT(*) AS n,
       CAST(SUM(CASE WHEN value < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN value > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(value, p01), p99) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_winsorized
FROM events, bounds
"""


def t5_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate cross join of two tiny dims (region x nation = 125 rows) —
    supported, but fenced: the plan-test whitelist marks this the ONLY
    operator allowed to plan a cartesian product."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


T5_CROSS_SQL = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def t6_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view) of document tokens — 0-based
    position parity with DuckDB's 1-based indexed list_transform."""
    from drive_health_etl_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select("doc_id", F.posexplode(tokens_col()).alias("pos", "token"))


T6_POSEXPLODE_SQL = """
SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.token FROM (
  SELECT doc_id,
         unnest(list_transform(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
                               (t, i) -> {'pos': i - 1, 'token': t})) AS u
  FROM documents WHERE doc_id < 50
)
"""


def f13_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface (F13, the attribute-hygiene ops of
    ``src/replay-dlq-job.js:29-47``): construct, merge, filter, extract,
    enumerate — emitted as scalars so the hash compare is representation-
    independent."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("id"), F.col("event_id").cast("string"),
        F.lit("googclient_delivery"), F.lit("x"),
    )
    merged = F.map_concat(m, F.create_map(F.lit("replay"), F.lit("1")))
    cleaned = F.map_filter(merged, lambda k, _v: ~k.startswith("googclient_"))
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(cleaned)), ",").alias("keys_sorted"),
        F.element_at(cleaned, "type").alias("type_val"),
        F.size(cleaned).alias("n_entries"),
        F.element_at(cleaned, "googclient_delivery").alias("dropped_is_null"),
    )


F13_SQL = """
SELECT event_id,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
       map_extract(m, 'type')[1] AS type_val,
       CAST(cardinality(m) AS INTEGER) AS n_entries,
       CASE WHEN len(map_extract(m, 'googclient_delivery')) = 0 THEN NULL
            ELSE map_extract(m, 'googclient_delivery')[1] END AS dropped_is_null
FROM (
  SELECT event_id,
         map_from_entries(list_filter(
           [{'k': 'type', 'v': event_type},
            {'k': 'id', 'v': CAST(event_id AS VARCHAR)},
            {'k': 'googclient_delivery', 'v': 'x'},
            {'k': 'replay', 'v': '1'}],
           e -> NOT starts_with(e.k, 'googclient_'))) AS m
  FROM events
)
"""


N_BINS = 10


def feat_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature binning: assign every event's ``value`` to one of
    ``N_BINS`` buckets bounded by exact percentiles, then per-bin stats —
    the feature-discretization step before tree models / embedding-table
    features.

    Plan: deliberately NOT ``ntile`` over a global ORDER BY (that is a
    single-partition sort at scale). Instead one 1-row exact-percentile
    aggregate computes the 9 interior bounds, broadcasts them back, and bin
    assignment is a narrow map counting bounds <= value; per-bin stats are
    a 10-group aggregate. Both engines use the same interpolated-percentile
    definition (Spark ``percentile`` = DuckDB ``quantile_cont``)."""
    e = load_table(spark, sf_dir, "events").select("value")
    pcts = ", ".join(str(k / N_BINS) for k in range(1, N_BINS))
    bounds = e.agg(F.expr(f"percentile(value, array({pcts}))").alias("bs"))
    binned = e.crossJoin(F.broadcast(bounds)).select(
        "value",
        F.size(F.filter(F.col("bs"), lambda b: b <= F.col("value"))).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"),
            6,
        ).alias("mean_value"),
    )


_PCTS_SQL = ", ".join(str(k / N_BINS) for k in range(1, N_BINS))

FEAT_BINS_SQL = f"""
WITH bounds AS (
  SELECT quantile_cont(value, [{_PCTS_SQL}]) AS bs FROM events
), binned AS (
  SELECT value, len(list_filter(bs, b -> b <= value)) AS bin
  FROM events, bounds
)
SELECT bin, COUNT(*) AS n, ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
         AS mean_value
FROM binned GROUP BY bin
"""


def stat_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample test per event type between deterministic A/B
    buckets (``user_id % 2``) — the experiment-analysis primitive. Sums of
    values and squares are decimal-exact (order-independent across any
    partitioning); the t statistic and Welch–Satterthwaite df are then pure
    double arithmetic on IDENTICAL inputs written as the same operation
    chain in both engines, so no rounding is needed. One shuffle with
    map-side partial aggregation; the per-type pivot is an enum-sized
    conditional aggregate, not a join."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.pmod(F.col("user_id"), F.lit(2)) == 0).alias("is_a"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("is_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("v"))).alias("s1a"),
        F.sum(F.when(~F.col("is_a"), F.col("v"))).alias("s1b"),
        F.sum(F.when(F.col("is_a"), F.col("v") * F.col("v"))).alias("s2a"),
        F.sum(F.when(~F.col("is_a"), F.col("v") * F.col("v"))).alias("s2b"),
    )
    s1a = F.col("s1a").cast("double")
    s1b = F.col("s1b").cast("double")
    s2a = F.col("s2a").cast("double")
    s2b = F.col("s2b").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    mean_a = s1a / na
    mean_b = s1b / nb
    var_a = (s2a - s1a * s1a / na) / (na - 1)
    var_b = (s2b - s1b * s1b / nb) / (nb - 1)
    se2a = var_a / na
    se2b = var_b / nb
    t = (mean_a - mean_b) / F.sqrt(se2a + se2b)
    df = (
        (se2a + se2b) * (se2a + se2b)
        / (se2a * se2a / (na - 1) + se2b * se2b / (nb - 1))
    )
    # t_stat and welch_df are the genuinely engine-divergent values here
    # (the long division/sqrt chains associate differently in DuckDB's
    # expression tree — observed 1-ULP drift), so they round; the exact-sum
    # means do not.
    return agg.select(
        "event_type", "n_a", "n_b",
        mean_a.alias("mean_a"), mean_b.alias("mean_b"),
        F.round(t, 6).alias("t_stat"), F.round(df, 6).alias("welch_df"),
    )


STAT_AB_WELCH_SQL = """
WITH e AS (
  SELECT event_type, (user_id % 2 = 0) AS is_a,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
agg AS (
  SELECT event_type,
         COUNT(CASE WHEN is_a THEN 1 END) AS n_a,
         COUNT(CASE WHEN NOT is_a THEN 1 END) AS n_b,
         CAST(SUM(CASE WHEN is_a THEN v END) AS DOUBLE) AS s1a,
         CAST(SUM(CASE WHEN NOT is_a THEN v END) AS DOUBLE) AS s1b,
         CAST(SUM(CASE WHEN is_a THEN v * v END) AS DOUBLE) AS s2a,
         CAST(SUM(CASE WHEN NOT is_a THEN v * v END) AS DOUBLE) AS s2b
  FROM e GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       s1a / n_a AS mean_a, s1b / n_b AS mean_b,
       ROUND(((s1a / n_a) - (s1b / n_b))
         / sqrt(((s2a - s1a * s1a / n_a) / (n_a - 1)) / n_a
                + ((s2b - s1b * s1b / n_b) / (n_b - 1)) / n_b), 6) AS t_stat,
       ROUND(
       (((s2a - s1a * s1a / n_a) / (n_a - 1)) / n_a
        + ((s2b - s1b * s1b / n_b) / (n_b - 1)) / n_b)
       * (((s2a - s1a * s1a / n_a) / (n_a - 1)) / n_a
          + ((s2b - s1b * s1b / n_b) / (n_b - 1)) / n_b)
       / ((((s2a - s1a * s1a / n_a) / (n_a - 1)) / n_a)
            * (((s2a - s1a * s1a / n_a) / (n_a - 1)) / n_a) / (n_a - 1)
          + (((s2b - s1b * s1b / n_b) / (n_b - 1)) / n_b)
            * (((s2b - s1b * s1b / n_b) / (n_b - 1)) / n_b) / (n_b - 1))
       , 6) AS welch_df
FROM agg
"""


def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume per type: the median of
    all pairwise slopes between daily counts — outlier-resistant where OLS
    is not. Daily counts first (one shuffle, calendar-bounded output), then
    the pairwise-slope expansion is over DAYS (≤ C(31,2) pairs per type —
    config-sized, never corpus-sized), then an exact median. Slopes are
    exact-integer ratios evaluated identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.n") - F.col("a.n")).cast("double")
            / F.datediff(F.col("b.d"), F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    return pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.median("slope").alias("ts_slope"),
    )


TS_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
)
SELECT event_type, COUNT(*) AS n_pairs, median(slope) AS ts_slope
FROM pairs GROUP BY event_type
"""


QUERIES: dict[str, tuple] = {
    "stat_ab_welch": (stat_ab_welch, STAT_AB_WELCH_SQL),
    "ts_theil_sen_trend": (ts_theil_sen_trend, TS_THEIL_SEN_SQL),
    "feat_equidepth_bins": (feat_equidepth_bins, FEAT_BINS_SQL),
    "a5_stats_suite": (a5_stats_suite, A5_STATS_SQL),
    "f13_map_functions": (f13_map_functions, F13_SQL),
    "a5_group_percentiles": (a5_group_percentiles, A5_GROUP_PCTL_SQL),
    "a5_histogram": (a5_histogram, A5_HISTOGRAM_SQL),
    "a7_winsorize": (a7_winsorize, A7_WINSORIZE_SQL),
    "t5_cross_join": (t5_cross_join, T5_CROSS_SQL),
    "t6_posexplode": (t6_posexplode, T6_POSEXPLODE_SQL),
    "f_array_suite": (f_array_suite, F_ARRAY_SQL),
    "f_string_suite": (f_string_suite, F_STRING_SQL),
    "f_regex_suite": (f_regex_suite, F_REGEX_SQL),
    "f_collation_suite": (f_collation_suite, F_COLLATION_SQL),
    "f_parse_suite": (f_parse_suite, F_PARSE_SQL),
    "f_try_suite": (f_try_suite, F_TRY_SQL),
    "a8_misc_aggs": (a8_misc_aggs, A8_MISC_AGGS_SQL),
    "a9_agg_filter": (a9_agg_filter, A9_AGG_FILTER_SQL),
    "t7_generators": (t7_generators, T7_GENERATORS_SQL),
    "f_date_suite": (f_date_suite, F_DATE_SQL),
    "f_math_suite": (f_math_suite, F_MATH_SQL),
    "sub_scalar_subquery": (sub_scalar_subquery, SUB_SCALAR_SQL),
    "sub_in_subquery": (sub_in_subquery, SUB_IN_SQL),
    "sub_lateral_join": (sub_lateral_join, SUB_LATERAL_SQL),
    "f_bitwise_suite": (f_bitwise_suite, F_BITWISE_SQL),
    "null_semantics": (null_semantics, NULL_SEMANTICS_SQL),
}
