"""Distributed BPE-style merge training over the documents corpus.

The second iterative-algorithm showcase next to PageRank (`operators/
graph.py`): each round counts all adjacent token pairs corpus-wide, picks
the most frequent pair (deterministic tie-break), and rewrites the corpus
merging that pair into one token — exactly the training loop of byte-pair /
WordPiece tokenizers, run at word level over the whitespace tokens.

Merge semantics are pinned to LITERAL left-to-right non-overlapping string
replacement of ``" w1 w2 "`` with ``" w1~w2 "`` (the scan consumes the
matched text, so in a run like ``a b a b`` only the first occurrence merges
this round — the second merges next round if still the best pair). Spark's
``replace`` and DuckDB's ``replace`` share this semantics, which is what
makes the unrolled-CTE oracle exact.

Scale shape (per round, R = ``BPE_ROUNDS`` rounds total):
- pair counting: explode adjacent pairs -> ONE shuffle with map-side
  partial counts (pair cardinality is vocab^2-bounded, not corpus-bounded);
- best-pair selection: TakeOrdered(1) + a 1-row driver fetch (bounded
  metadata, the same pattern as the k-means centroid fetch);
- corpus rewrite: narrow map (string replace), ``localCheckpoint`` per
  round so the plan does not accumulate R rewrite stages of lineage —
  the same discipline as the connected-components loop.
Real tokenizer trainers (sentencepiece at corpus scale) run this exact
loop with the pair-count aggregation distributed; R is the vocab budget.

Reference parity: north-star extension (BASELINE.json "text analysis");
complements `text_bpe_token_count` (applying a tokenizer) with TRAINING one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.operators.text import TOKENS_SQL, tokens_col
from drive_health_etl_spark.sources.tables import load_table

BPE_ROUNDS = 3


def _pair_counts(s_df: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.trim("s"), r"\s+"), lambda x: x != F.lit(""))
    pairs = F.expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
    )
    return (
        s_df.select(toks.alias("toks"))
        .filter(F.size("toks") >= 2)  # sequence(0, -1) would run DESCENDING
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )


def _token_total(s_df: DataFrame) -> int:
    toks = F.filter(F.split(F.trim("s"), r"\s+"), lambda x: x != F.lit(""))
    return s_df.select(F.sum(F.size(toks)).alias("n")).collect()[0]["n"]


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train ``BPE_ROUNDS`` merges; emit one row per round: the merged pair,
    its corpus frequency when selected, and the corpus token total after
    applying the merge (which verifies every rewrite, not just the
    selection)."""
    docs = load_table(spark, sf_dir, "documents")
    s_df = docs.select(
        F.concat(F.lit(" "), F.concat_ws(" ", tokens_col()), F.lit(" ")).alias("s")
    ).localCheckpoint(eager=True)

    rows = []
    for rnd in range(1, BPE_ROUNDS + 1):
        top = (
            _pair_counts(s_df)
            .orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
            .limit(1)
            .collect()  # bounded: one row per round
        )
        if not top:  # corpus empty or no adjacent pairs left — nothing to merge
            break
        best = top[0]
        w1, w2, c = best["w1"], best["w2"], best["c"]
        s_df = s_df.select(
            F.replace(
                F.col("s"), F.lit(f" {w1} {w2} "), F.lit(f" {w1}~{w2} ")
            ).alias("s")
        ).localCheckpoint(eager=True)  # truncate lineage each round
        rows.append((rnd, w1, w2, c, _token_total(s_df)))

    return spark.createDataFrame(
        rows, "round int, w1 string, w2 string, pair_count long, tokens_after long"
    )


def _round_sql(prev: str, rnd: int) -> str:
    """One unrolled round: pair counts over ``prev``, best pair, rewrite."""
    return f"""
l{rnd} AS (
  SELECT list_filter(regexp_split_to_array(trim(s), '\\s+'), x -> x <> '') AS l
  FROM {prev}
),
p{rnd} AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c
  FROM (
    SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
    FROM l{rnd} WHERE len(l) >= 2
  )
  WHERE p[2] IS NOT NULL
  GROUP BY 1, 2
),
b{rnd} AS (SELECT w1, w2, c FROM p{rnd} ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 1),
t{rnd} AS (
  SELECT replace(s, ' ' || b.w1 || ' ' || b.w2 || ' ',
                    ' ' || b.w1 || '~' || b.w2 || ' ') AS s
  FROM {prev}, b{rnd} b
),
n{rnd} AS (
  SELECT CAST(SUM(len(list_filter(regexp_split_to_array(trim(s), '\\s+'),
                                  x -> x <> ''))) AS BIGINT) AS n
  FROM t{rnd}
)"""


def _bpe_train_sql() -> str:
    parts = [
        f"WITH t0 AS (SELECT ' ' || array_to_string({TOKENS_SQL}, ' ') || ' ' AS s FROM documents)"
    ]
    selects = []
    for rnd in range(1, BPE_ROUNDS + 1):
        parts.append(_round_sql(f"t{rnd - 1}", rnd))
        selects.append(
            f"SELECT CAST({rnd} AS INT) AS round, w1, w2, c AS pair_count, n AS tokens_after "
            f"FROM b{rnd}, n{rnd}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


TEXT_BPE_TRAIN_SQL = _bpe_train_sql()


QUERIES: dict[str, tuple] = {
    "text_bpe_train": (text_bpe_train, TEXT_BPE_TRAIN_SQL),
}
