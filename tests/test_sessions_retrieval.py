"""Sessionization/funnel (operators/sessions.py) and lexical retrieval
(operators/retrieval.py) semantics + plan-shape tests. The DuckDB oracle
covers value equality; these pin the invariants and the scale-relevant plan
properties (single shuffle for sessionize->aggregate, bounded posting lists).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from drive_health_etl_spark.operators.retrieval import (
    BM25_QUERY,
    BM25_TOP,
    POSTINGS_CAP,
    text_bm25,
    text_inverted_index,
)
from drive_health_etl_spark.operators.sessions import (
    SESSION_GAP_MIN,
    sess_funnel,
    sess_stats,
    sessionized,
)
from drive_health_etl_spark.plans.registry import REGISTRY


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_sessionized_splits_on_gap(spark):
    # events at t=0, +10min (same session), +10min+31min (new session)
    rows = [
        (1, 10, _ts(0)),
        (2, 10, _ts(10)),
        (3, 10, _ts(10 + SESSION_GAP_MIN + 1)),
        (4, 20, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["sess_idx"] for r in sessionized(df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionized_boundary_is_exclusive(spark):
    # a gap of exactly SESSION_GAP_MIN does NOT start a new session (> not >=)
    rows = [(1, 10, _ts(0)), (2, 10, _ts(SESSION_GAP_MIN))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["sess_idx"] for r in sessionized(df).collect()}
    assert got == {1: 1, 2: 1}


def test_sess_stats_single_exchange(spark, sf_dir):
    # the (user_id, sess_idx) groupBy must reuse the window's user_id
    # partitioning — one shuffle total, or the operator doubles its cost at scale
    plan = sess_stats(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_is_monotonic(spark, sf_dir):
    row = sess_funnel(spark, sf_dir).collect()[0]
    assert row["n_users"] >= row["n_step1"] >= row["n_step2"] >= row["n_step3"]
    assert row["n_step3"] > 0  # corpus has full conversions at every SF


def test_funnel_requires_step_order(spark):
    # purchase BEFORE the first click must not count as step 3
    rows = [
        (1, 10, _ts(0), "signup"),
        (2, 10, _ts(1), "purchase"),
        (3, 10, _ts(2), "click"),
        (4, 20, _ts(0), "signup"),
        (5, 20, _ts(1), "click"),
        (6, 20, _ts(2), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    # same step-time construction as sess_funnel, on the fixture
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    e = df.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    e = e.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")), F.col("ts"))
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")), F.col("ts"))
        ).over(w),
    )
    done = e.groupBy("user_id").agg(F.max(F.col("t3").isNotNull()).alias("converted"))
    got = {r["user_id"]: r["converted"] for r in done.collect()}
    assert got == {10: False, 20: True}


def test_inverted_index_postings_bounded_and_sorted(spark, sf_dir):
    rows = text_inverted_index(spark, sf_dir).collect()
    assert rows, "index must not be empty"
    for r in rows:
        sample = r["postings_sample"]
        assert len(sample) <= POSTINGS_CAP
        assert sample == sorted(sample)
        assert r["doc_freq"] >= len(sample)
        assert r["term_freq"] >= r["doc_freq"]


def test_bm25_results_contain_query_terms(spark, sf_dir):
    from drive_health_etl_spark.operators.text import tokens_col
    from drive_health_etl_spark.sources.tables import load_table

    top = text_bm25(spark, sf_dir)
    rows = top.collect()
    assert 0 < len(rows) <= BM25_TOP
    assert all(1 <= r["n_terms_matched"] <= len(BM25_QUERY) for r in rows)
    # scores sorted descending
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every hit really contains at least one query term
    ids = [r["doc_id"] for r in rows]
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", tokens_col().alias("toks"))
        .collect()
    )
    for d in docs:
        assert set(d["toks"]) & set(BM25_QUERY), d["doc_id"]


def test_stratified_split_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["corpus_stratified_split"][0](spark, sf_dir).collect()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["share"]
    assert by_lang, "split report must not be empty"
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)


def test_sessionized_matches_python_reference_on_random_fixture(spark):
    """One Spark pass over a seeded random corpus vs a pure-Python reference
    sessionizer — catches window-frame/tiebreak drift that the fixed
    fixtures can't."""
    import random
    from collections import defaultdict

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(25):
        t = rng.randint(0, 60)
        for _ in range(rng.randint(1, 40)):
            t += rng.randint(0, 90)  # gaps straddle the 30-min threshold
            rows.append((eid, user, _ts(t)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["sess_idx"] for r in sessionized(df).collect()}

    per_user = defaultdict(list)
    for e, u, ts in rows:
        per_user[u].append((ts, e))
    expected = {}
    for _u, evs in per_user.items():
        evs.sort()
        idx = 0
        prev = None
        for ts, e in evs:
            if prev is None or (ts - prev).total_seconds() > SESSION_GAP_MIN * 60:
                idx += 1
            expected[e] = idx
            prev = ts
    assert got == expected
