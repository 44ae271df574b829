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


def test_interval_concurrency_tie_rule(spark):
    """Half-open interval semantics: an interval ending exactly when another
    starts never overlaps it (ends sort before starts at the same instant),
    and true overlaps count. Crafted timeline, one event type."""
    import datetime as dt

    from drive_health_etl_spark.plans.relational import CONCURRENCY_HOLD_MIN

    hold = dt.timedelta(minutes=CONCURRENCY_HOLD_MIN)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # a: [t0, t0+hold); b starts exactly at a's end (no overlap);
    # c+d overlap b (3-deep would need c,d,b concurrent: c,d inside b's span)
    starts = [t0, t0 + hold, t0 + hold + dt.timedelta(minutes=1),
              t0 + hold + dt.timedelta(minutes=2)]
    df = spark.createDataFrame(
        [(i, "x", s) for i, s in enumerate(starts)], "event_id long, event_type string, ts timestamp"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("t", "delta").rowsBetween(W.unboundedPreceding, 0)
    pts = df.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        df.select("event_type", (F.col("ts") + F.expr(f"INTERVAL {CONCURRENCY_HOLD_MIN} MINUTES")).alias("t"), F.lit(-1).alias("delta"))
    )
    got = (
        pts.select("event_type", F.sum("delta").over(w).alias("cur"))
        .agg(F.max("cur").alias("mx"))
        .collect()[0]["mx"]
    )
    assert got == 3  # b, c, d concurrent; a never overlaps b


def test_cdc_apply_delete_and_ordering(spark):
    """A key whose LAST op is a delete disappears; a delete followed by a
    later upsert resurrects the key with the later value; ties on ts break
    by event_id (higher id wins)."""
    rows = [
        # user 1: upsert, then delete -> gone
        (1, 1, "2026-01-01 10:00:00", "click", 5.0),
        (2, 1, "2026-01-01 11:00:00", "error", 0.0),
        # user 2: delete, then upsert -> present with 7.0
        (3, 2, "2026-01-01 10:00:00", "error", 0.0),
        (4, 2, "2026-01-01 11:00:00", "purchase", 7.0),
        # user 3: two upserts at the SAME ts -> higher event_id wins
        (5, 3, "2026-01-01 12:00:00", "click", 1.0),
        (6, 3, "2026-01-01 12:00:00", "click", 2.0),
    ]
    src = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        src.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("event_type") != "error")
    )
    got = {r["user_id"]: r["value"] for r in latest.collect()}
    assert got == {2: 7.0, 3: 2.0}


def test_bloom_prefilter_no_false_negatives(spark):
    """Every true build-side key must pass the probe bloom test (no false
    negatives by construction) on a crafted key set including negatives."""
    from pyspark.sql import Row

    from drive_health_etl_spark.plans.relational import (
        BLOOM_K_HASHES,
        BLOOM_M_BITS,
        _BLOOM_WORDS,
    )

    build = spark.range(0, 1000).select(F.col("id").alias("l_orderkey"))
    seed = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K_HASHES - 1))).alias("seed")
    pos = F.pmod(F.xxhash64("l_orderkey", "seed"), F.lit(BLOOM_M_BITS))
    bits = (
        build.select("l_orderkey", seed)
        .select(
            (pos / 64).cast("int").alias("word"),
            F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    grid = spark.range(_BLOOM_WORDS).select(F.col("id").cast("int").alias("word"))
    bloom = (
        grid.join(F.broadcast(bits), "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("b"))
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("word", "b"))), lambda x: x["b"]).alias("words"))
    )
    probe = spark.range(0, 2000).select(F.col("id").alias("o_orderkey"))
    ppos = lambda s: F.pmod(F.xxhash64("o_orderkey", s), F.lit(BLOOM_M_BITS))  # noqa: E731
    hit = F.forall(
        F.sequence(F.lit(0), F.lit(BLOOM_K_HASHES - 1)),
        lambda s: (
            F.element_at("words", (ppos(s) / 64).cast("int") + 1).bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), (ppos(s) % 64).cast("int"))
            )
            != 0
        ),
    )
    passed = {r["o_orderkey"] for r in probe.join(F.broadcast(bloom)).filter(hit).collect()}
    assert set(range(1000)) <= passed  # zero false negatives
    fp = len(passed) - 1000
    assert fp < 200  # fp rate sane for m/n = 262144/1000


def test_label_propagation_histogram_covers_all_nodes(spark):
    """Community sizes must sum to the node count of the support graph."""
    from drive_health_etl_spark.operators.graph import (
        _support_edges,
        graph_label_propagation,
    )

    sf = "/root/testdata/sf0.001"
    n_nodes = _support_edges(spark, sf).select("src").distinct().count()
    hist = graph_label_propagation(spark, sf).collect()
    assert sum(r["community_size"] * r["n_communities"] for r in hist) == n_nodes


def test_scenecut_counts_bounded_by_frames(spark):
    from drive_health_etl_spark.operators.multimodal import (
        VID_FRAMES,
        multimodal_video_scenecut,
    )

    rows = multimodal_video_scenecut(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_cuts"] <= VID_FRAMES - 1
        assert r["first_cut"] == -1 or 1 <= r["first_cut"] < VID_FRAMES


def test_reconcile_orders_totals_positive(spark):
    from drive_health_etl_spark.operators.expectations import dq_reconcile_orders

    rows = dq_reconcile_orders(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_mismatch"] <= r["n_orders"]
        assert r["max_abs_diff"] >= 0


def test_zipf_fit_known_answers(spark, tmp_path, sf_dir):
    """A corpus with frequencies exactly N/rank is perfectly Zipfian: the
    log-log OLS must return slope -1, R^2 1 (12/6/4/3 occurrences of four
    distinct words). The driver's synthetic near-uniform vocabulary must be
    flagged as strongly NON-Zipfian (shallow slope, low R^2) — the signal
    this diagnostic exists to produce."""
    from drive_health_etl_spark.operators.text import text_zipf_fit

    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = text_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_vocab"] == 4
    assert row["zipf_slope"] == -1.0 and row["r2"] == 1.0

    synth = text_zipf_fit(spark, sf_dir).collect()[0]
    assert synth["zipf_slope"] > -0.5  # far shallower than natural language
    assert synth["r2"] < 0.3


def test_dp_counts_match_python_mechanism(spark, sf_dir):
    """Independent replay of the discrete-Laplace mechanism: the noise for
    each group must equal tz(md5('dpA|'+key)) - tz(md5('dpB|'+key)) where
    tz is the trailing-zero count of the 20-bit digest head, and the noisy
    count must clamp at 0. Also pins the mechanism's distribution contract
    on a wide synthetic key domain: trailing-zero counts are Geometric(1/2)
    (about half the mass at 0, monotone tail)."""
    import hashlib

    from drive_health_etl_spark.operators.expectations import dq_dp_counts

    def tz20(s: str) -> int:
        u = int(hashlib.md5(s.encode()).hexdigest()[:5], 16)
        n = 0
        while n < 20 and u % 2 == 0:
            n, u = n + 1, u // 2
        return n

    rows = dq_dp_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = tz20("dpA|" + r["event_type"]) - tz20("dpB|" + r["event_type"])
        assert r["noise"] == want
        assert r["n_noisy"] == max(0, r["n_true"] + want)
        assert r["epsilon_nominal"] == 0.6931471805599453

    # salted release: noise becomes a different (still deterministic)
    # draw keyed by the secret, and a bad salt is rejected up front
    import pytest as _pytest

    salted = {r["event_type"]: r["noise"] for r in dq_dp_counts(spark, sf_dir, salt="s3cr3t").collect()}
    for et, noise in salted.items():
        assert noise == tz20("dpA|s3cr3t" + et) - tz20("dpB|s3cr3t" + et)
    with _pytest.raises(ValueError):
        dq_dp_counts(spark, sf_dir, salt="x'y")

    # mechanism shape on 4096 synthetic keys: Geometric(1/2) masses
    counts = [0] * 21
    for i in range(4096):
        counts[tz20(f"dpA|k{i}")] += 1
    assert 0.44 < counts[0] / 4096 < 0.56
    assert 0.19 < counts[1] / 4096 < 0.31
    assert all(counts[j] >= counts[j + 3] for j in range(0, 9))


def test_adamic_adar_matches_python_recompute(spark, sf_dir):
    """Recompute Adamic-Adar end to end in pure Python (bipartite distinct,
    degree, hub cap, 12-dp weight, per-pair sum, top-20 with full
    tiebreak) from the raw parquet and require exact equality with the
    operator's rows — including the deterministic boundary at the LIMIT."""
    import duckdb
    import math

    from drive_health_etl_spark.operators.graph import (
        _AA_HUB_MAX, _AA_TOP_N, graph_adamic_adar,
    )

    con = duckdb.connect()
    cp = con.execute(
        f"SELECT DISTINCT o.o_custkey, l.l_partkey"
        f" FROM '{sf_dir}/lineitem.parquet' l"
        f" JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    by_part = {}
    for cust, part in cp:
        by_part.setdefault(part, []).append(cust)
    pair_w, pair_n = {}, {}
    for part, custs in by_part.items():
        deg = len(custs)
        if deg < 2 or deg > _AA_HUB_MAX:
            continue
        w = int(round(1.0e12 / math.log(deg)))  # engine's exact pico-unit weight
        custs = sorted(custs)
        for i in range(len(custs)):
            for j in range(i + 1, len(custs)):
                key = (custs[i], custs[j])
                pair_w[key] = pair_w.get(key, 0) + w  # exact int sum
                pair_n[key] = pair_n.get(key, 0) + 1
    # Rank by the 6-dp ROUNDED score (the engine's declared ordering), not
    # the exact integer weight: two weights differing by < 5e5 pico-units
    # tie after rounding and must fall back to the (cust_a, cust_b)
    # tiebreak on both sides or the LIMIT boundary can flake on other data.
    ranked = sorted(
        ((w, k) for k, w in pair_w.items()),
        key=lambda t: (-round(t[0] / 1e12, 6), t[1]),
    )[:_AA_TOP_N]
    expect = [
        (k[0], k[1], pair_n[k], round(w / 1e12, 6)) for w, k in ranked
    ]

    got = [
        (r["cust_a"], r["cust_b"], r["n_common"], r["aa_score"])
        for r in graph_adamic_adar(spark, sf_dir).collect()
    ]
    assert got == expect
