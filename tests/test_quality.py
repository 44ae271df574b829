"""Quality-suite unit tests: edge cases the sf-corpus oracle sweep cannot
exercise (short docs, empty-after-filter, plan shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from drive_health_etl_spark.operators.corpus import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    corpus_chunk_windows,
)
from drive_health_etl_spark.operators.quality import (
    AD_MOD,
    DECON_NGRAM,
    SPAN_LEN,
    _grams_col,
    corpus_span_dedup,
    text_decontaminate,
    text_gopher_rules,
    text_unigram_logprob,
    text_url_filter,
)
from drive_health_etl_spark.operators.text import tokens_col

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_grams_col_short_doc_is_empty_not_descending(spark):
    """sequence(1, k<1) in Spark silently generates a DESCENDING range; the
    guard must yield zero n-grams for docs shorter than n, not a bogus
    2-element index range."""
    df = spark.createDataFrame(
        [("a b",), ("a b c d",), ("",)], "text string"
    ).select(_grams_col(tokens_col(), 3).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == []
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []


def test_gopher_rules_drop_reasons(spark, tmp_path):
    # too short -> dropped; no stopwords -> dropped; normal prose -> kept
    rows = [
        (1, "the cat sat on the mat and it is a fine day in town today ok", "en", "s", 0),
        (2, "xyzzy " * 12, "en", "s", 0),  # 12 words, zero stopwords
        (3, "short doc", "en", "s", 0),  # under MIN_WORDS
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["keep"] for r in text_gopher_rules(spark, str(tmp_path)).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    plan = text_decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_flags_planted_overlap(spark, tmp_path):
    shared = " ".join(f"w{i}" for i in range(DECON_NGRAM))
    rows = [
        (0, f"{shared} tail words here", "en", "s", 0),  # benchmark doc (0 % 97 == 0)
        (5, f"prefix {shared} suffix", "en", "s", 0),  # contaminated
        (6, "completely different content entirely", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, _DOC_SCHEMA)
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["n_hits"] for r in text_decontaminate(spark, str(tmp_path)).collect()}
    assert got == {5: 1}


def test_span_dedup_flags_planted_duplicate(spark, tmp_path):
    span = " ".join(f"s{i}" for i in range(SPAN_LEN))
    uniq1 = " ".join(f"a{i}" for i in range(SPAN_LEN))
    uniq2 = " ".join(f"b{i}" for i in range(SPAN_LEN))
    rows = [
        (1, f"{span} {uniq1}", "en", "s", 0),  # span 0 duplicated in doc 2
        (2, f"{span} {uniq2}", "en", "s", 0),
        (3, " ".join(f"c{i}" for i in range(SPAN_LEN)), "en", "s", 0),  # all unique
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in corpus_span_dedup(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 1), 2: (2, 1), 3: (1, 0)}


def test_unigram_logprob_ranks_rare_tokens_lower(spark, tmp_path):
    # doc 2 is all rare tokens -> lower avg_logprob (higher perplexity) than
    # doc 1, which repeats the corpus-dominant token
    rows = [
        (1, "common common common common", "en", "s", 0),
        (2, "rare1 rare2 rare3 common", "en", "s", 0),
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r["doc_id"]: r for r in text_unigram_logprob(spark, str(tmp_path)).collect()}
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"]
    assert got[1]["perplexity"] < got[2]["perplexity"]
    assert all(r["avg_logprob"] < 0 and r["perplexity"] >= 1 for r in got.values())


def test_url_filter_blocks_seeded_ad_domain(spark, sf_dir):
    out = {r["doc_id"]: r for r in text_url_filter(spark, sf_dir).collect()}
    for doc_id, r in out.items():
        if doc_id % AD_MOD == 0:
            assert r["n_blocked"] == 1 and not r["keep"]
        else:
            assert r["n_blocked"] == 0 and r["keep"]
        assert r["n_urls"] >= 1


def test_chunk_windows_cover_and_overlap(spark, tmp_path):
    n_tokens = CHUNK_LEN + CHUNK_STRIDE + 10  # 3 windows, last partial
    rows = [(1, " ".join(f"t{i}" for i in range(n_tokens)), "en", "s", 0)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    chunks = sorted(
        (r["chunk_idx"], r["n_tokens"]) for r in corpus_chunk_windows(spark, str(tmp_path)).collect()
    )
    # starts at 1, 1+stride, 1+2*stride; only the last is truncated
    # (2nd window: start 49 + 64 - 1 = 112 <= 122 tokens, still full)
    assert chunks == [
        (0, CHUNK_LEN),
        (1, CHUNK_LEN),
        (2, n_tokens - 2 * CHUNK_STRIDE),
    ]


def test_expectations_flag_injected_violations(spark, sf_dir):
    """Each expectation type must flip to failed on data violating it."""
    from pyspark.sql import functions as F

    from drive_health_etl_spark.operators.expectations import (
        accepted_values,
        between,
        not_null,
        row_count_at_least,
        unique,
        validate,
    )
    from drive_health_etl_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").limit(50)
    # inject: a duplicate key, a null custkey, a bad status, an out-of-range price
    bad = o.limit(1).select(
        F.col("o_orderkey"),  # duplicate of an existing key
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit("X").alias("o_orderstatus"),
        F.lit(2_000_000.0).alias("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    df = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ).unionByName(bad)
    spec = [
        not_null("o_custkey"),
        unique("o_orderkey"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        between("o_totalprice", 0.0, 1_000_000.0),
        row_count_at_least(1_000_000),
    ]
    res = {r["expectation"]: r["passed"] for r in validate(df, spec).collect()}
    assert res == {
        "not_null:o_custkey": False,
        "unique:o_orderkey": False,
        "accepted_values:o_orderstatus": False,
        "between:o_totalprice": False,
        "row_count_at_least:1000000": False,
    }
    # and the clean slice passes everything except the volume floor
    res_clean = {
        r["expectation"]: r["passed"]
        for r in validate(
            o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
            spec[:4],
        ).collect()
    }
    assert all(res_clean.values())


def test_char_entropy_known_answers(spark, tmp_path):
    # constant text -> H = 0; two equiprobable chars -> H = 1 bit
    rows = [
        (1, "aaaaaaaa", "en", "s", 8),
        (2, "abababab", "en", "s", 8),
        # empty text must DROP OUT, matching DuckDB's empty
        # generate_series(1, 0) — Spark's sequence(1, 0) is [1, 0] (step
        # defaults to -1), so this row pins the length guard
        (3, "", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from drive_health_etl_spark.operators.quality import text_char_entropy

    out = {r["doc_id"]: r.asDict() for r in text_char_entropy(spark, str(tmp_path)).collect()}
    assert out[1]["char_entropy"] == 0.0 and out[1]["n_distinct_chars"] == 1
    assert out[2]["char_entropy"] == 1.0 and out[2]["n_distinct_chars"] == 2
    assert out[1]["n_chars"] == out[2]["n_chars"] == 8
    assert 3 not in out


def test_dsir_prefers_target_like_documents(spark, tmp_path):
    # target (en) docs use one vocabulary, raw-only (de) docs another; a
    # fresh doc written in the target vocabulary must outscore one written
    # in the non-target vocabulary, and the target-vocab doc must be
    # selected (positive log-ratio) while the other is not.
    en = "alpha beta gamma delta " * 6
    de = "zulu yankee xray whiskey " * 6
    rows = (
        [(i, en, "en", "s", 0) for i in range(8)]
        + [(i + 8, de, "de", "s", 0) for i in range(8)]
        + [(100, "alpha beta gamma delta alpha beta", "de", "s", 0)]  # target-like
        + [(101, "zulu yankee xray whiskey zulu yankee", "en", "s", 0)]  # raw-like
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from drive_health_etl_spark.operators.corpus import corpus_dsir_select

    out = {r["doc_id"]: r.asDict() for r in corpus_dsir_select(spark, str(tmp_path)).collect()}
    assert out[100]["dsir_weight"] > out[101]["dsir_weight"]
    assert out[100]["selected"] is True
    assert out[101]["selected"] is False
