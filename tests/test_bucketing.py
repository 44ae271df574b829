"""Bucketed co-located join (SURVEY.md §4 clustering row): writing both join
sides bucketed by the join key lets Spark join them with ZERO exchanges —
the shuffle-elimination pattern that matters most at 100 TB (pay the shuffle
once at write time, amortize over every subsequent join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh_dir = str(tmp_path_factory.mktemp("spark_wh"))
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{wh_dir}/orders_bucketed")
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{wh_dir}/customer_bucketed")
        .saveAsTable("customer_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast so the join strategy depends on bucketing alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bucketed")
        c = spark.table("customer_bucketed")
        joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself needs no Exchange: both sides pre-bucketed on the key
        join_section = plan.split("Join", 1)[1] if "Join" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        # and the result matches the unbucketed join
        expected = (
            spark.table("orders_bucketed")
            .join(spark.table("customer_bucketed"), F.col("o_custkey") == F.col("c_custkey"))
            .count()
        )
        assert joined.agg(F.sum("count")).collect()[0][0] == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
