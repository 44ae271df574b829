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


def test_bh_fdr_matches_python_recompute(spark):
    """Independent reimplementation: from the query's own integer counts,
    recompute z (pooled two-proportion), p (A&S 7.1.26 erfc), and the BH
    step-up adjustment in pure Python; every output column must agree to
    the query's 6-dp rounding. Also pins the BH contracts: p_adj >= p,
    p_adj monotone along the p-ranking, and the rejection frontier is a
    prefix of that ranking."""
    from drive_health_etl_spark.plans.stats_suite import stat_bh_fdr

    rows = stat_bh_fdr(spark, SF).collect()
    assert len(rows) >= 20  # types x weekdays family, minus degenerate cells

    def p_from_z(z):
        x = abs(z) / 1.4142135623730951
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                 - 0.284496736) * t + 0.254829592) * t
        return round(poly * math.exp(-(x * x)), 6)

    recomputed = []
    for r in rows:
        na, nb, xa, xb = r["n_a"], r["n_b"], r["x_a"], r["x_b"]
        pp = (xa + xb) / (na + nb)
        z = round((xa / na - xb / nb)
                  / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb)), 6)
        assert z == r["z_stat"], (r, z)
        p = p_from_z(z)
        assert p == r["p_value"], (r, p)
        recomputed.append((p, r["event_type"], r["wd"], r))
    recomputed.sort(key=lambda t: t[:3])
    m = len(recomputed)
    run = None
    for i in range(m - 1, -1, -1):
        cand = min(1.0, (recomputed[i][0] * m) / (i + 1))
        run = cand if run is None else min(run, cand)
        r = recomputed[i][3]
        assert round(run, 6) == r["p_adj"], (r, run)
        assert r["p_adj"] >= r["p_value"] - 1e-12
        assert r["reject"] == (r["p_adj"] <= 0.05)
    adj_sorted = [t[3]["p_adj"] for t in recomputed]
    assert adj_sorted == sorted(adj_sorted)  # monotone along the ranking
    rejects = [t[3]["reject"] for t in recomputed]
    assert all(rejects[i] or not rejects[i + 1] for i in range(m - 1))  # prefix


def test_woe_iv_matches_python_recompute(spark):
    """Recompute WOE/IV in pure Python from the query's own integer counts
    (smoothed ratios + ln + decimal-summed IV) and pin the structural
    contracts: woe sign tracks the good/bad ratio and iv_total is constant
    across rows."""
    from drive_health_etl_spark.plans.stats_suite import load_table  # noqa: F401
    from drive_health_etl_spark.operators.featurize import feat_woe_iv

    rows = feat_woe_iv(spark, SF).collect()
    assert len(rows) == 5
    g_tot = sum(r["n_good"] for r in rows)
    b_tot = sum(r["n_bad"] for r in rows)
    k = len(rows)
    iv = 0.0
    for r in rows:
        pg = (r["n_good"] + 0.5) / (g_tot + 0.5 * k)
        pb = (r["n_bad"] + 0.5) / (b_tot + 0.5 * k)
        woe = math.log(pg / pb)
        assert round(woe, 6) == r["woe"]
        assert round((pg - pb) * woe, 6) == r["iv_contrib"]
        assert (r["woe"] > 0) == (pg > pb)
        iv += (pg - pb) * woe
    assert len({r["iv_total"] for r in rows}) == 1
    assert abs(rows[0]["iv_total"] - iv) < 1e-5
    assert iv >= 0  # IV is a sum of x*ln-ratio terms with matching signs


def _sax_py(series, paa_w=4, word=4):
    """Pure-Python SAX replica (population z, 4-day PAA, quartile alphabet,
    sliding words) — independent truth for the motif counts."""
    n = len(series)
    mean = sum(series) / n
    var = sum(v * v for v in series) / n - mean * mean
    std = math.sqrt(var)
    if std <= 0:
        return {}
    z = [(v - mean) / std for v in series]
    frames = [
        sum(z[i:i + paa_w]) / paa_w
        for i in range(0, n - n % paa_w, paa_w)
    ]
    def letter(p):
        if p < -0.6744897501960817:
            return "a"
        if p < 0.0:
            return "b"
        if p < 0.6744897501960817:
            return "c"
        return "d"
    ls = [letter(p) for p in frames]
    words = ["".join(ls[i:i + word]) for i in range(len(ls) - word + 1)]
    out = {}
    for w in words:
        out[w] = out.get(w, 0) + 1
    return out


def test_sax_motifs_known_answer(spark, tmp_path):
    """A square-wave series (4 low days, 4 high days, repeated) must SAX to
    alternating 'a'/'d' frames, so the only 4-frame words are adad/dada —
    and the engine's counts must equal the pure-Python replica exactly."""
    import datetime as dt

    from drive_health_etl_spark.plans.stats_suite import ts_sax_motifs

    base = dt.datetime(2024, 1, 1)
    vals = ([10.0] * 4 + [20.0] * 4) * 4  # 32 days -> 8 frames -> 5 words
    rows = [
        (i, base + dt.timedelta(days=i), 1, "square", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {(r["motif"], r["n_occ"]): r["rank"]
           for r in ts_sax_motifs(spark, str(tmp_path)).collect()}
    expect = _sax_py(vals)
    assert expect == {"adad": 3, "dada": 2}
    assert set(got) == {("adad", 3), ("dada", 2)}
    assert got[("adad", 3)] == 1 and got[("dada", 2)] == 2


def _median_interp(xs):
    xs = sorted(xs)
    n = len(xs)
    if n % 2:
        return float(xs[n // 2])
    return (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def test_cuped_matches_python_recompute(spark):
    """Recompute the whole CUPED chain in pure Python from the raw events
    parquet (median-day split, per-user integer micro-unit totals, moment
    sums, theta, naive/adjusted deltas, variance reduction) and require
    6-dp equality with the operator."""
    import duckdb

    from drive_health_etl_spark.plans.stats_suite import stat_cuped

    con = duckdb.connect()
    raw = con.execute(
        f"SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE),"
        f" CAST(value AS DECIMAL(18,6)) FROM '{SF}/events.parquet'"
        f" WHERE value IS NOT NULL"
    ).fetchall()
    mday = _median_interp([d for _, d, _ in raw])
    users = {}
    for uid, d, v in raw:
        x, y = users.get(uid, (0, 0))
        vi = int(v.scaleb(6))  # exact micro-units
        users[uid] = (x + vi, y) if d <= mday else (x, y + vi)
    n = len(users)
    sx = sum(x for x, _ in users.values())
    sy = sum(y for _, y in users.values())
    sxx = sum(x * x for x, _ in users.values())
    sxy = sum(x * y for x, y in users.values())
    n_a = sum(1 for u in users if u % 2 == 0)
    sx_a = sum(x for u, (x, _) in users.items() if u % 2 == 0)
    sy_a = sum(y for u, (_, y) in users.items() if u % 2 == 0)
    mx, my = sx / n, sy / n
    vx = sxx / n - mx * mx
    cxy = sxy / n - mx * my
    theta = cxy / vx
    mya, myb = sy_a / n_a, (sy - sy_a) / (n - n_a)
    mxa, mxb = sx_a / n_a, (sx - sx_a) / (n - n_a)

    row = stat_cuped(spark, SF).collect()[0]
    assert row["n"] == n and row["n_a"] == n_a
    assert row["theta"] == round(theta, 6)
    assert row["diff_naive"] == round((mya - myb) / 1e6, 6)
    assert row["diff_cuped"] == round(((mya - myb) - theta * (mxa - mxb)) / 1e6, 6)
    assert 0 <= row["var_reduction"] <= 1


def test_did_matches_python_recompute(spark):
    """Per-type difference-in-differences must equal a pure-Python replay
    of the four-cell means; the effect is exactly the double difference of
    the reported (rounded) cell means' unrounded parents."""
    import duckdb

    from drive_health_etl_spark.plans.stats_suite import stat_did

    con = duckdb.connect()
    raw = con.execute(
        f"SELECT event_type, user_id,"
        f" CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE),"
        f" CAST(value AS DECIMAL(18,6)) FROM '{SF}/events.parquet'"
        f" WHERE value IS NOT NULL"
    ).fetchall()
    mday = _median_interp([d for _, _, d, _ in raw])
    cells = {}
    for et, uid, d, v in raw:
        key = (et, uid % 2 == 0, d > mday)
        s, c = cells.get(key, (0, 0))
        cells[key] = (s + int(v.scaleb(6)), c + 1)

    rows = stat_did(spark, SF).collect()
    assert rows
    for r in rows:
        et = r["event_type"]
        m = {}
        for treat, post, tag in [(True, True, "tp"), (True, False, "tr"),
                                 (False, True, "cp"), (False, False, "cr")]:
            s, c = cells[(et, treat, post)]
            assert c == r[f"n_{tag}"]
            m[tag] = (s / 1e6) / c
        assert r["mean_treat_post"] == round(m["tp"], 6)
        assert r["did_effect"] == round((m["tp"] - m["tr"]) - (m["cp"] - m["cr"]), 6)


def test_srm_check_matches_python_recompute(spark):
    """Per-type distinct-user arm counts and the 1-df chi-square must equal
    a pure-Python replay; the synthetic user_id split is near-50/50 so no
    type may flag SRM on clean data."""
    import duckdb

    from drive_health_etl_spark.plans.stats_suite import stat_srm_check

    con = duckdb.connect()
    raw = con.execute(
        f"SELECT event_type, user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    arms = {}
    for et, uid in raw:
        a, b = arms.get(et, (set(), set()))
        (a if uid % 2 == 0 else b).add(uid)
        arms[et] = (a, b)
    rows = stat_srm_check(spark, SF).collect()
    assert rows
    for r in rows:
        na, nb = len(arms[r["event_type"]][0]), len(arms[r["event_type"]][1])
        assert (r["n_a"], r["n_b"]) == (na, nb)
        chi2 = (na - nb) ** 2 / (na + nb)
        assert r["chi2"] == round(chi2, 6)
        assert r["srm_flag"] == (chi2 > 9.0)
        assert not r["srm_flag"]  # clean synthetic assignment
