"""Quality-suite unit tests: edge cases the sf-corpus oracle sweep cannot
exercise (short docs, empty-after-filter, plan shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from drive_health_etl_spark.operators.quality import (
    DECON_NGRAM,
    _grams_col,
    text_decontaminate,
    text_gopher_rules,
)
from drive_health_etl_spark.operators.text import tokens_col


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
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["n_hits"] for r in text_decontaminate(spark, str(tmp_path)).collect()}
    assert got == {5: 1}
