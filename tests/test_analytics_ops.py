"""Invariant tests for the round-2 analytics/curation operators — the
properties an oracle hash can't express (structural guarantees that must
hold at ANY scale, not value equality at one scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_reservoir_exact_k_per_group(spark):
    """Every source yields exactly min(K, group size) docs, slots 1..K."""
    from drive_health_etl_spark.operators.corpus import (
        RESERVOIR_K,
        corpus_reservoir_per_source,
    )
    from drive_health_etl_spark.sources.tables import load_table

    out = corpus_reservoir_per_source(spark, SF_DIR)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {
        r["source"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per and all(n == min(RESERVOIR_K, sizes[s]) for s, n in per.items())
    assert out.filter((F.col("slot") < 1) | (F.col("slot") > RESERVOIR_K)).count() == 0


def test_retention_offset_zero_is_full_cohort(spark):
    """Week-0 retention is exactly 1.0 for every cohort (everyone is active
    in their own first week), and n_active never exceeds cohort_size."""
    from drive_health_etl_spark.operators.sessions import sess_retention_cohorts

    out = sess_retention_cohorts(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["n_active"] <= r["cohort_size"]
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"]


def test_pagerank_mass_conserved(spark):
    """Full rank vector sums to ~1 (damped PageRank conserves probability
    mass on a graph with no dangling nodes — every node here has degree
    >= 1 by construction)."""
    from drive_health_etl_spark.operators.graph import _pagerank_ranks

    total = _pagerank_ranks(spark, SF_DIR).agg(F.sum("r").alias("s")).collect()[0]["s"]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_gapfill_dense_and_consistent(spark):
    """The gap-filled grid is exactly |days| x |types| rows and its total
    equals the raw event count."""
    from drive_health_etl_spark.operators.sessions import sess_daily_gapfill
    from drive_health_etl_spark.sources.tables import load_table

    out = sess_daily_gapfill(spark, SF_DIR)
    e = load_table(spark, SF_DIR, "events")
    n_days = e.select(F.to_date("ts").alias("d")).agg(
        (F.datediff(F.max("d"), F.min("d")) + 1).alias("n")
    ).collect()[0]["n"]
    n_types = e.select("event_type").distinct().count()
    assert out.count() == n_days * n_types
    assert (
        out.agg(F.sum("n_events").alias("s")).collect()[0]["s"] == e.count()
    )


def test_scd2_ranges_partition_timeline(spark):
    """Per customer: exactly one open (is_current) run, version numbers are
    1..n_runs, and n_orders sums to the customer's order count."""
    from drive_health_etl_spark.plans.extended import scd2_order_status
    from drive_health_etl_spark.sources.tables import load_table

    hist = scd2_order_status(spark, SF_DIR)
    per = hist.groupBy("o_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.max("version").alias("vmax"),
        F.count("*").alias("n_runs"),
        F.sum("n_orders").alias("n_orders"),
    )
    assert per.filter(F.col("n_open") != 1).count() == 0
    assert per.filter(F.col("vmax") != F.col("n_runs")).count() == 0
    orders = load_table(spark, SF_DIR, "orders").groupBy("o_custkey").count()
    bad = per.join(orders, "o_custkey").filter(F.col("n_orders") != F.col("count"))
    assert bad.count() == 0


def test_keep_best_keeps_longest(spark):
    """dedup_keep_best output is one row per simhash cluster and each kept
    doc has the cluster's max n_chars."""
    from drive_health_etl_spark.operators.dedup import dedup_keep_best, dedup_simhash
    from drive_health_etl_spark.sources.tables import load_table

    kept = dedup_keep_best(spark, SF_DIR)
    assert kept.groupBy("simhash").count().filter(F.col("count") > 1).count() == 0
    codes = dedup_simhash(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    maxlen = (
        codes.join(docs, "doc_id")
        .groupBy("simhash")
        .agg(F.max("n_chars").alias("max_chars"))
    )
    bad = kept.join(maxlen, "simhash").filter(F.col("n_chars") != F.col("max_chars"))
    assert bad.count() == 0


def test_equidepth_bins_are_balanced(spark):
    """Equi-depth property: with N_BINS bins over n rows, every bin holds
    n/N_BINS rows within interpolation slack, and bins tile the value range
    (lo of bin k+1 >= hi of bin k)."""
    from drive_health_etl_spark.plans.scalar_suite import N_BINS, feat_equidepth_bins

    rows = sorted(feat_equidepth_bins(spark, SF_DIR).collect(), key=lambda r: r["bin"])
    n = sum(r["n"] for r in rows)
    for r in rows:
        assert abs(r["n"] - n / N_BINS) <= max(2, 0.02 * n / N_BINS)
    for a, b in zip(rows, rows[1:]):
        assert b["lo"] >= a["hi"]
