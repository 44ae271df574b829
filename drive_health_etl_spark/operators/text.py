"""Text-analysis operators over ``documents`` (north-star extension; SURVEY.md
§2.9 U3): tokenization, token statistics, quality scoring, corpus word
frequency, language distribution, document fingerprinting.

All pure column expressions (split/filter/transform/aggregate/explode) — no
Python UDFs, so the hot path stays in whole-stage codegen. Tokenization is a
narrow map; word-frequency is one shuffle with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table

# Minimal English stopword list for quality scoring; fixed so the oracle can
# embed the same literal set.
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it")


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokens, empty strings dropped (handles trailing/multiple
    spaces identically in Spark and DuckDB)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting (whitespace tokenizer): total, distinct,
    character statistics."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x).alias(
            "total_token_chars"
        ),
    )


TEXT_TOKENS_SQL = f"""
SELECT doc_id,
       len({TOKENS_SQL}) AS n_tokens,
       len(list_distinct({TOKENS_SQL})) AS n_distinct_tokens,
       CAST(list_sum(list_transform({TOKENS_SQL}, x -> length(x))) AS INTEGER) AS total_token_chars
FROM documents
"""


def text_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide word frequency, top 20. Explode -> groupBy: Spark's partial
    aggregation combines per-partition counts before the single shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


TEXT_WORD_FREQ_SQL = f"""
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest({TOKENS_SQL}) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20
"""


def text_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language/source distribution with exact char statistics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("avg_chars"),
    )


TEXT_LANG_DIST_SQL = """
SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
       SUM(n_chars) AS total_chars,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
FROM documents GROUP BY lang
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts, stopword ratio, mean token
    length, and a boolean keep/drop verdict — the standard pre-training
    corpus filter shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    total_chars = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    stop_ratio = F.round(n_stop.cast("double") / n_tokens, 6)
    mean_len = F.round(total_chars.cast("double") / n_tokens, 6)
    keep = (n_tokens >= 5) & (stop_ratio < F.lit(0.5)) & (mean_len >= 2.0)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        keep.alias("keep"),
    )


_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

TEXT_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS n_stopwords,
       ROUND(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
       ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS mean_token_len,
       (len(toks) >= 5
        AND ROUND(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS DOUBLE) / len(toks), 6) < 0.5
        AND ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) >= 2.0) AS keep
FROM t
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized text — the
    content-defined identity used for exact dedup across shards."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.array_join(tokens_col(), " ")
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.substring(F.md5(normalized), 1, 8).alias("shard_key"),
    )


TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(array_to_string({TOKENS_SQL}, ' ')) AS fingerprint,
       substr(md5(array_to_string({TOKENS_SQL}, ' ')), 1, 8) AS shard_key
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "text_tokens": (text_tokens, TEXT_TOKENS_SQL),
    "text_word_freq": (text_word_freq, TEXT_WORD_FREQ_SQL),
    "text_lang_dist": (text_lang_dist, TEXT_LANG_DIST_SQL),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
}
