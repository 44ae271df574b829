"""Lexical retrieval over ``documents`` (north-star extension; SURVEY.md §2.9
U3): inverted-index construction and BM25 ranking — the standard "find
near-duplicate / relevant documents for a query" primitives a training-data
pipeline runs next to dedup (e.g. decontamination lookups against benchmark
queries, quality-weighted corpus search).

All native column expressions. Scale shape:

- ``text_inverted_index``: explode -> one shuffle on ``term`` with map-side
  partial aggregation (counts + bounded ``collect_set``); posting lists are
  capped at ``POSTINGS_CAP`` ids so state per term is bounded no matter how
  common the term is (the full posting list of a stopword at 100 TB is a
  skew bomb; real systems cap or tier exactly like this).
- ``text_bm25``: term-frequency pairs for the *query terms only* are filtered
  before the groupBy (predicate on a literal array — pushed to the scan), so
  the shuffled volume is O(matching docs × query terms), not corpus size.
  Corpus constants (N, avgdl) and per-term document frequencies are one-row /
  few-row aggregates broadcast into the scoring join. Per-term scores are
  decimal-summed per doc (order-independent), then one TakeOrdered top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.operators.text import TOKENS_SQL, tokens_col
from drive_health_etl_spark.sources.tables import load_table

POSTINGS_CAP = 10  # ids kept per term in the index sample
INDEX_TOP = 50  # most-frequent terms reported

BM25_K1 = 1.2
BM25_B = 0.75
# Fixed query for the oracle-checked ranking (terms present in the corpus
# vocabulary at every SF).
BM25_QUERY = ("hash", "spark", "window")
BM25_TOP = 20


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``INDEX_TOP`` terms by document frequency with total term
    frequency and a bounded, sorted posting-list sample."""
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select("doc_id", F.explode(tokens_col()).alias("term"))
    return (
        exploded.groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("doc_freq"),
            F.count("*").alias("term_freq"),
            F.slice(
                F.sort_array(F.collect_set("doc_id")), 1, POSTINGS_CAP
            ).alias("postings_sample"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(INDEX_TOP)
    )


TEXT_INVERTED_INDEX_SQL = f"""
SELECT term,
       COUNT(DISTINCT doc_id) AS doc_freq,
       COUNT(*) AS term_freq,
       (list_sort(list(DISTINCT doc_id)))[1:{POSTINGS_CAP}] AS postings_sample
FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents)
GROUP BY term
ORDER BY doc_freq DESC, term ASC
LIMIT {INDEX_TOP}
"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every matched document's BM25 score for ``BM25_QUERY`` (un-ranked):
    the shared core of the top-k query and the RRF fusion leg.

    score(d) = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
               · tf_td (k1+1) / (tf_td + k1 (1 - b + b·dl_d/avgdl))
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))

    q = F.array(*[F.lit(t) for t in sorted(BM25_QUERY)])
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.array_contains(q, F.col("term")))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
                )
            ).cast("decimal(18,8)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("term_score").cast("double"), 6).alias("score"),
        F.count("*").alias("n_terms_matched"),
    )


def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-``BM25_TOP`` documents for the fixed query ``BM25_QUERY``."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP)
    )


_Q_LIST = "[" + ", ".join(f"'{t}'" for t in sorted(BM25_QUERY)) + "]"

TEXT_BM25_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
  WHERE list_contains({_Q_LIST}, term)
  GROUP BY doc_id, term
),
df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
corpus AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
scored AS (
  SELECT tf.doc_id,
         CAST(
           ln(1.0 + (corpus.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
           * (tf.tf * {BM25_K1 + 1.0})
           / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / corpus.avgdl))
         AS DECIMAL(18,8)) AS term_score
  FROM tf JOIN df_t USING (term) JOIN dl ON tf.doc_id = dl.doc_id, corpus
)
SELECT doc_id, ROUND(CAST(SUM(term_score) AS DOUBLE), 6) AS score,
       COUNT(*) AS n_terms_matched
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOP}
"""


RRF_K = 60   # the standard reciprocal-rank-fusion damping constant
RRF_TOP = 10


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: fuse the lexical BM25
    top-``BM25_TOP`` (query ``BM25_QUERY``) with a semantic top-``BM25_TOP``
    (cosine to the doc-0 embedding; documents and embeddings share ids) as

        rrf(d) = Σ_legs 1 / (RRF_K + rank_leg(d))

    — the list-based fusion every hybrid RAG stack runs, needing only ranks,
    never score calibration across legs. Scale shape: each leg is already a
    bounded top-k (TakeOrdered / WindowGroupLimit upstream), so the fusion
    itself is a full-outer join of two k-row lists — driver-trivial at any
    corpus size; the cost lives in the legs, which are independently
    shuffle-optimal. Ranks are integers and the reciprocal sums are IEEE
    doubles of integer inputs, so the oracle matches bit-exactly."""
    lex_w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex = (
        text_bm25(spark, sf_dir)
        .select("doc_id", F.row_number().over(lex_w).alias("lex_rank"))
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    sem_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (nrm(F.col("qe")) * nrm(F.col("e"))), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP)
    )
    sem_w = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    sem = sem_scored.select("doc_id", F.row_number().over(sem_w).alias("sem_rank"))

    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)),
                9,
            ).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(RRF_TOP)
    )
    return fused


RETRIEVAL_RRF_SQL = f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
  FROM ({TEXT_BM25_SQL}) bm
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
sem_scored AS (
  SELECT e.vec_id AS doc_id,
         ROUND(list_dot_product(q.qe, e.emb)
               / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cosine
  FROM e CROSS JOIN q WHERE e.vec_id <> 0
  ORDER BY cosine DESC, doc_id ASC LIMIT {BM25_TOP}
),
sem AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS sem_rank
  FROM sem_scored
)
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
       ROUND(COALESCE(1.0 / ({RRF_K} + lex_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + sem_rank), 0.0), 9) AS rrf_score
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {RRF_TOP}
"""


VOCAB_SIZE = 40


def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary builder + OOV audit: take the ``VOCAB_SIZE``
    most-frequent tokens as the vocab (deterministic tiebreak), then report
    each document's out-of-vocabulary rate distribution per language — the
    'will this tokenizer cover the corpus' check run before committing to a
    vocab. Two aggregates: corpus word-freq (one shuffle, map-side combined),
    then a broadcast semi-membership test via array_contains on the
    collected vocab (vocab is config-sized — VOCAB_SIZE entries — so
    collecting it to the driver is bounded, like k-means centroids)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab_rows = (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(VOCAB_SIZE)
        .collect()  # bounded: VOCAB_SIZE rows, a config-sized constant
    )
    vocab = F.array(*[F.lit(r["token"]) for r in vocab_rows])
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_oov = F.size(F.filter(toks, lambda x: ~F.array_contains(vocab, x)))
    per_doc = docs.select(
        "lang",
        n_tokens.alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.round(n_oov.cast("double") / n_tokens, 6).alias("oov_rate"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_oov").alias("total_oov"),
        F.round(
            F.sum(F.col("oov_rate").cast("decimal(18,6)")).cast("double") / F.count("*"),
            6,
        ).alias("mean_oov_rate"),
    )


TEXT_VOCAB_OOV_SQL = f"""
WITH freq AS (
  SELECT token, COUNT(*) AS cnt
  FROM (SELECT unnest({TOKENS_SQL}) AS token FROM documents)
  GROUP BY token ORDER BY cnt DESC, token ASC LIMIT {VOCAB_SIZE}
), vocab AS (SELECT list(token ORDER BY cnt DESC, token ASC) AS v FROM freq),
per_doc AS (
  SELECT lang, len({TOKENS_SQL}) AS n_tokens,
         len(list_filter({TOKENS_SQL}, x -> NOT list_contains(vocab.v, x))) AS n_oov,
         ROUND(CAST(len(list_filter({TOKENS_SQL}, x -> NOT list_contains(vocab.v, x))) AS DOUBLE)
               / len({TOKENS_SQL}), 6) AS oov_rate
  FROM documents, vocab
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_oov) AS BIGINT) AS total_oov,
       ROUND(CAST(SUM(CAST(oov_rate AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_oov_rate
FROM per_doc GROUP BY lang
"""


NDCG_K = 10  # ranking-quality cutoff


def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the BM25 retriever — MRR and NDCG@10
    against a graded term-coverage relevance label (rel(d) = number of
    distinct ``BM25_QUERY`` terms present in d; rel = 3 means "contains the
    whole query" and counts as relevant for MRR). The eval harness a RAG /
    retrieval pipeline runs after every index or scorer change.

    Scale shape: the system ranking is ``BM25_TOP`` rows (config-sized);
    relevance labels are one narrow corpus scan with no shuffle wider than
    the label aggregation; DCG/IDCG/MRR are 1-row aggregates joined by
    broadcast. Per-position gains are decimal-cast before summing so the
    ±ULP of log2 on different engines is absorbed (same rule as BM25's
    term_score). Tie-breaks are pinned on doc_id everywhere so the ranking
    is engine-deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")

    from pyspark.sql import Window

    # Config-sized (BM25_TOP rows) global ranking; the lit(0) partition key
    # pins the single-partition window explicitly (it IS tiny by design).
    ranking = text_bm25(spark, sf_dir).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
        ),
    )

    toks = tokens_col()
    rel = sum(
        F.array_contains(toks, F.lit(t)).cast("int") for t in sorted(BM25_QUERY)
    )
    rels = docs.select("doc_id", rel.alias("rel"))

    # gain(pos, rel) = (2^rel - 1) / log2(pos + 1), decimal-cast per term
    def gain(rel_col, pos_col):
        return (
            (F.pow(F.lit(2.0), rel_col) - F.lit(1.0))
            / F.log2(pos_col.cast("double") + F.lit(1.0))
        ).cast("decimal(18,12)")

    # One pass over the judged ranking for DCG + MRR (the ranking subtree —
    # a full BM25 evaluation — would otherwise re-execute per 1-row agg).
    judged = rels.join(F.broadcast(ranking), "doc_id")
    dcg = judged.agg(
        F.sum(
            F.when(F.col("rank") <= NDCG_K, gain(F.col("rel"), F.col("rank")))
        ).alias("dcg_dec"),
        F.min(F.when(F.col("rel") == 3, F.col("rank"))).alias("best_rank"),
        F.count(F.when(F.col("rel") == 3, F.lit(1))).alias("n_relevant_ranked"),
    )

    pos_w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        rels.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
        .limit(NDCG_K)
        .withColumn("pos", F.row_number().over(pos_w))
    )
    idcg = ideal.agg(F.sum(gain(F.col("rel"), F.col("pos"))).alias("idcg_dec"))

    n_rel = rels.agg(
        F.count(F.when(F.col("rel") == 3, F.lit(1))).alias("n_relevant_corpus")
    )

    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(n_rel))
        .select(
            F.lit(NDCG_K).cast("int").alias("k"),
            "n_relevant_corpus",
            "n_relevant_ranked",
            "best_rank",
            F.coalesce(
                F.lit(1.0) / F.col("best_rank").cast("double"), F.lit(0.0)
            ).alias("mrr"),
            F.round(F.col("dcg_dec").cast("double"), 9).alias("dcg_at_k"),
            F.round(F.col("idcg_dec").cast("double"), 9).alias("idcg_at_k"),
            F.round(
                F.col("dcg_dec").cast("double") / F.col("idcg_dec").cast("double"),
                9,
            ).alias("ndcg_at_k"),
        )
    )


_REL_SQL = " + ".join(
    f"CAST(list_contains({TOKENS_SQL}, '{t}') AS INT)" for t in sorted(BM25_QUERY)
)

RETRIEVAL_EVAL_NDCG_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
  WHERE list_contains({_Q_LIST}, term)
  GROUP BY doc_id, term
),
df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
corpus AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
scored AS (
  SELECT tf.doc_id,
         CAST(
           ln(1.0 + (corpus.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
           * (tf.tf * {BM25_K1 + 1.0})
           / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / corpus.avgdl))
         AS DECIMAL(18,8)) AS term_score
  FROM tf JOIN df_t USING (term) JOIN dl ON tf.doc_id = dl.doc_id, corpus
),
bm25 AS (
  SELECT doc_id, ROUND(CAST(SUM(term_score) AS DOUBLE), 6) AS score
  FROM scored GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC
  LIMIT {BM25_TOP}
),
ranking AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM bm25
),
rels AS (SELECT doc_id, {_REL_SQL} AS rel FROM documents),
judged AS (SELECT r.rank, l.rel FROM ranking r JOIN rels l USING (doc_id)),
dcg AS (
  SELECT SUM(CAST((power(2.0, rel) - 1.0) / log2(CAST(rank AS DOUBLE) + 1.0)
             AS DECIMAL(18,12))) AS dcg_dec
  FROM judged WHERE rank <= {NDCG_K}
),
ideal AS (
  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id ASC) AS pos
  FROM rels ORDER BY rel DESC, doc_id ASC LIMIT {NDCG_K}
),
idcg AS (
  SELECT SUM(CAST((power(2.0, rel) - 1.0) / log2(CAST(pos AS DOUBLE) + 1.0)
             AS DECIMAL(18,12))) AS idcg_dec
  FROM ideal
),
mrr AS (
  SELECT MIN(CASE WHEN rel = 3 THEN rank END) AS best_rank,
         COUNT(CASE WHEN rel = 3 THEN 1 END) AS n_relevant_ranked
  FROM judged
),
nrel AS (SELECT COUNT(CASE WHEN rel = 3 THEN 1 END) AS n_relevant_corpus FROM rels)
SELECT CAST({NDCG_K} AS INT) AS k,
       n_relevant_corpus, n_relevant_ranked, best_rank,
       COALESCE(1.0 / CAST(best_rank AS DOUBLE), 0.0) AS mrr,
       ROUND(CAST(dcg_dec AS DOUBLE), 9) AS dcg_at_k,
       ROUND(CAST(idcg_dec AS DOUBLE), 9) AS idcg_at_k,
       ROUND(CAST(dcg_dec AS DOUBLE) / CAST(idcg_dec AS DOUBLE), 9) AS ndcg_at_k
FROM dcg, idcg, mrr, nrel
"""


QUERIES: dict[str, tuple] = {
    "text_inverted_index": (text_inverted_index, TEXT_INVERTED_INDEX_SQL),
    "text_bm25": (text_bm25, TEXT_BM25_SQL),
    "retrieval_rrf_fusion": (retrieval_rrf_fusion, RETRIEVAL_RRF_SQL),
    "text_vocab_oov": (text_vocab_oov, TEXT_VOCAB_OOV_SQL),
    "retrieval_eval_ndcg": (retrieval_eval_ndcg, RETRIEVAL_EVAL_NDCG_SQL),
}
