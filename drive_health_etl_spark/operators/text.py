"""Text-analysis operators over ``documents`` (north-star extension; SURVEY.md
§2.9 U3): tokenization, token statistics, quality scoring, corpus word
frequency, language distribution, document fingerprinting.

All pure column expressions (split/filter/transform/aggregate/explode) — no
Python UDFs, so the hot path stays in whole-stage codegen. Tokenization is a
narrow map; word-frequency is one shuffle with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


def text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (split on terminal-punctuation runs — RE2-safe,
    no lookbehind, so the identical pattern runs in both engines) with
    per-document sentence statistics: count, mean length in tokens (exact
    int/int division), and the longest sentence's token count — the
    chunking precursor for context-window packing.

    Pure column expressions (split -> transform -> filter -> array aggs);
    narrow map, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    tok_counts = F.transform(
        sents, lambda s: F.size(F.filter(F.split(s, r"\s+"), lambda x: x != F.lit("")))
    )
    total_toks = F.aggregate(tok_counts, F.lit(0), lambda acc, x: acc + x)
    return docs.select(
        "doc_id",
        F.size(sents).alias("n_sentences"),
        F.round(
            total_toks.cast("double") / F.size(sents).cast("double"), 6
        ).alias("mean_sentence_tokens"),
        F.array_max(tok_counts).alias("max_sentence_tokens"),
    ).filter(F.col("n_sentences") > 0)


TEXT_SENTENCES_SQL = """
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                    x -> trim(x)), x -> x <> '') AS sents
  FROM documents
),
t AS (
  SELECT doc_id, sents,
         list_transform(sents,
           x -> len(list_filter(regexp_split_to_array(x, '\\s+'), y -> y <> ''))) AS tc
  FROM s
)
SELECT doc_id,
       len(sents) AS n_sentences,
       ROUND(CAST(list_sum(tc) AS DOUBLE) / CAST(len(sents) AS DOUBLE), 6)
         AS mean_sentence_tokens,
       CAST(list_max(tc) AS INTEGER) AS max_sentence_tokens
FROM t WHERE len(sents) > 0
"""


_RAKE_TOP = 15
_RAKE_MAX_LEN = 4


def text_keyphrases_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction — the classic unsupervised keyword miner:
    candidate phrases are maximal stopword-free token runs (gaps-and-islands
    over token positions), each word scores deg/freq (deg = co-occurring
    phrase mass), and a phrase scores the sum of its word scores. Returns
    the top corpus-wide phrases (score desc, phrase asc).

    Plan: one explode + two aggregates (phrase table, then word stats) and
    a rejoin keyed on the word — all map-side combinable; phrase
    cardinality is vocabulary-bounded. deg/freq are exact ints; the score
    division is an identical double chain summed per-term decimal-cast,
    rounded 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "tok")
    ).filter(~F.lower("tok").isin(*STOPWORDS))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = toks.withColumn("run", F.col("pos") - F.row_number().over(w))
    phrases = (
        runs.groupBy("doc_id", "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda r: r["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_LEN)
    )
    members = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("tok")
    )
    word_stats = members.groupBy("tok").agg(
        F.count("*").alias("freq"), F.sum(F.col("plen") - 1).alias("deg")
    )
    scored = (
        members.join(word_stats, "tok")
        .groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.round(
                F.sum(
                    (
                        F.col("deg").cast("double") / F.col("freq").cast("double")
                        + F.lit(1.0)
                    ).cast("decimal(38,18)")
                ).cast("double"),
                6,
            ).alias("rake_score_sum"),
        )
    )
    # per-occurrence word-score sums accumulate across duplicate phrase
    # occurrences; normalize to the per-phrase score
    return (
        scored.select(
            "phrase",
            (F.col("n_occurrences") / F.size(F.split("phrase", " "))).alias("n_phrase"),
            F.round(
                F.col("rake_score_sum") / (F.col("n_occurrences") / F.size(F.split("phrase", " "))).cast("double"),
                6,
            ).alias("rake_score"),
        )
        .select("phrase", F.col("n_phrase").cast("long").alias("n_phrase"), "rake_score")
        .orderBy(F.col("rake_score").desc(), F.col("phrase").asc())
        .limit(_RAKE_TOP)
    )


def _rake_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, t.i - 1 AS pos, toks[t.i] AS tok
  FROM (SELECT doc_id, {TOKENS_SQL} AS toks FROM documents),
       UNNEST(generate_series(1, len(toks))) AS t(i)
  WHERE lower(toks[t.i]) NOT IN ({stop_list})
),
runs AS (
  SELECT doc_id, tok, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS run
  FROM toks
),
phrases AS (
  SELECT doc_id, run, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM runs GROUP BY doc_id, run
  HAVING COUNT(*) <= {_RAKE_MAX_LEN}
),
members AS (
  SELECT phrase, plen, unnest(string_split(phrase, ' ')) AS tok FROM phrases
),
word_stats AS (
  SELECT tok, COUNT(*) AS freq, CAST(SUM(plen - 1) AS BIGINT) AS deg
  FROM members GROUP BY tok
),
scored AS (
  SELECT m.phrase, COUNT(*) AS n_occurrences,
         ROUND(CAST(SUM(CAST(CAST(w.deg AS DOUBLE) / CAST(w.freq AS DOUBLE)
                             + 1.0 AS DECIMAL(38,18))) AS DOUBLE), 6)
           AS rake_score_sum
  FROM members m JOIN word_stats w USING (tok)
  GROUP BY m.phrase
)
SELECT phrase,
       CAST(n_occurrences / len(string_split(phrase, ' ')) AS BIGINT) AS n_phrase,
       ROUND(rake_score_sum
             / CAST(n_occurrences / len(string_split(phrase, ' ')) AS DOUBLE), 6)
         AS rake_score
FROM scored
ORDER BY rake_score DESC, phrase ASC LIMIT {_RAKE_TOP}
"""


TEXT_RAKE_SQL = _rake_sql()


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per document: words/sentence and a vowel-
    group syllable heuristic feed the standard 206.835 - 1.015*(W/S) -
    84.6*(Syl/W) formula — the grade-level proxy quality filters bucket
    corpora by.

    Syllables = count of vowel runs per word (regexp_extract_all — the
    identical RE2 pattern in both engines); sentences from the terminal-
    punctuation splitter (`text_sentences`). Pure column expressions;
    integer counts feed one double chain, rounded 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n_words = F.size(toks)
    n_sents = F.size(
        F.filter(
            F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
            lambda s: s != F.lit(""),
        )
    )
    n_syll = F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(score, 6).alias("flesch_score"),
    ).filter((F.col("n_words") > 0) & (F.col("n_sentences") > 0))


TEXT_READABILITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len({TOKENS_SQL}) AS n_words,
         len(list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                        x -> trim(x)), x -> x <> '')) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
         AS flesch_score
FROM t WHERE n_words > 0 AND n_sentences > 0
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
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
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


# Marker-word profiles for the n-gram/stopword language-ID heuristic. On this
# synthetic corpus (shared English-ish vocab across lang labels) predictions
# are uniform — the operator's value is the deterministic, oracle-checkable
# scoring machinery, which transfers unchanged to real corpora.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: score = |doc tokens ∩ marker words| per
    language; argmax via reverse struct-sort (score desc, lang desc on ties
    — struct comparison is field-by-field in both engines, so the oracle
    tiebreak matches). Pure array expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens_col())
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ms in sorted(LANG_MARKERS.items())
        ]
    )
    # argmax: sort by (-score, lang) and take the head
    best = F.sort_array(scores, asc=False).getItem(0)
    return docs.select(
        "doc_id",
        best.getField("lang").alias("predicted_lang"),
        best.getField("score").alias("marker_hits"),
    )


def _langid_sql() -> str:
    structs = ", ".join(
        f"{{'score': len(list_intersect(toks, {list(ms)!r})), 'lang': '{lang}'}}"
        for lang, ms in sorted(LANG_MARKERS.items())
    )
    return f"""
WITH t AS (SELECT doc_id, list_distinct({TOKENS_SQL}) AS toks FROM documents),
scored AS (SELECT doc_id, list_reverse_sort([{structs}]) AS s FROM t)
SELECT doc_id, s[1].lang AS predicted_lang, CAST(s[1].score AS INTEGER) AS marker_hits
FROM scored
"""


def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured language-ID quality: the confusion matrix of the heuristic
    classifier (`text_langid`) against the corpus's ground-truth ``lang``
    column, plus per-cell share of the true language — the evaluation loop
    that decides whether a cheap heuristic suffices before paying for a
    model. Classifier and truth are both in-engine; counts exact; the
    share division rounds 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens_col())
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ms in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.sort_array(scores, asc=False).getItem(0)
    pred = docs.select(
        F.col("lang").alias("true_lang"), best.getField("lang").alias("predicted_lang")
    )
    cells = pred.groupBy("true_lang", "predicted_lang").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("true_lang")
    return (
        cells.select(
            "true_lang",
            "predicted_lang",
            "n",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
            ).alias("share_of_true"),
        )
        .orderBy("true_lang", "predicted_lang")
    )


def _langid_eval_sql() -> str:
    structs = ", ".join(
        f"{{'score': len(list_intersect(toks, {list(ms)!r})), 'lang': '{lang}'}}"
        for lang, ms in sorted(LANG_MARKERS.items())
    )
    return f"""
WITH t AS (SELECT doc_id, lang AS true_lang, list_distinct({TOKENS_SQL}) AS toks
           FROM documents),
pred AS (
  SELECT true_lang, list_reverse_sort([{structs}])[1].lang AS predicted_lang FROM t
),
cells AS (
  SELECT true_lang, predicted_lang, COUNT(*) AS n
  FROM pred GROUP BY true_lang, predicted_lang
)
SELECT true_lang, predicted_lang, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY true_lang) AS DOUBLE), 6)
         AS share_of_true
FROM cells ORDER BY true_lang, predicted_lang
"""


TEXT_LANGID_EVAL_SQL = _langid_eval_sql()


BPE_ISH_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-cost estimation with a GPT-2-style regex pre-tokenizer
    (letters / digits / punctuation runs with leading-space affinity) —
    the standard 'how many tokens is this corpus' pipeline stage."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.expr(f"regexp_extract_all(text, '{BPE_ISH_REGEX}', 0)")
    n_pieces = F.size(pieces)
    return docs.select(
        "doc_id",
        n_pieces.alias("n_bpe_pieces"),
        F.length("text").alias("n_chars"),
        F.round(F.length("text").cast("double") / n_pieces, 6).alias("chars_per_piece"),
    )


TEXT_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS n_bpe_pieces,
       length(text) AS n_chars,
       ROUND(CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '{BPE_ISH_REGEX}')), 6) AS chars_per_piece
FROM documents
"""


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus frequency spectrum: OLS of ln(freq) on
    ln(rank) — natural language sits near slope -1; strong deviation flags
    synthetic, templated, or boilerplate-heavy corpora, making this the
    corpus-level health check run before committing a source to a
    training mix.

    Exactness (the stat_ols_trend recipe): each ln term is 9dp-rounded and
    decimal(15,9)-cast so all five OLS moments are EXACT decimal sums
    (products stay under the 38-digit cap at (31,18)); slope/intercept/R^2
    are then identical double chains, rounded 6dp.

    Scale shape: the word-count aggregate is map-side combinable over the
    corpus scan; everything after operates on the VOCAB-sized spectrum,
    where the global rank window's single-partition sort is exactly as
    large as the vocabulary. At an open 100 TB vocabulary, pre-filter the
    spectrum head (freq above a cutoff) before ranking — the fit only
    needs the head; the tie order (freq desc, token asc) is a total order
    both engines replay."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_col()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    r = F.row_number().over(Window.orderBy(F.col("f").desc(), F.col("w").asc()))
    pts = freq.select(
        F.round(F.log(r.cast("double")), 9).cast("decimal(15,9)").alias("x"),
        F.round(F.log(F.col("f").cast("double")), 9).cast("decimal(15,9)").alias("y"),
    )
    mom = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, sxy = F.col("sy").cast("double"), F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    slope = num / den_x
    intercept = (sy - slope * sx) / n
    r2 = num * num / (den_x * den_y)
    return mom.select(
        F.col("n").alias("n_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


TEXT_ZIPF_FIT_SQL = f"""
WITH freq AS (
  SELECT w, COUNT(*) AS f
  FROM (SELECT unnest({TOKENS_SQL}) AS w FROM documents)
  GROUP BY w
),
pts AS (
  SELECT ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS DOUBLE)), 9)::DECIMAL(15,9) AS x,
         ROUND(ln(CAST(f AS DOUBLE)), 9)::DECIMAL(15,9) AS y
  FROM freq
),
mom AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
         SUM(y) AS sy, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_vocab,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM mom
"""


QUERIES: dict[str, tuple] = {
    "text_langid": (text_langid, _langid_sql()),
    "text_bpe_token_count": (text_bpe_token_count, TEXT_BPE_SQL),
    "text_tokens": (text_tokens, TEXT_TOKENS_SQL),
    "text_sentences": (text_sentences, TEXT_SENTENCES_SQL),
    "text_keyphrases_rake": (text_keyphrases_rake, TEXT_RAKE_SQL),
    "text_readability": (text_readability, TEXT_READABILITY_SQL),
    "text_langid_eval": (text_langid_eval, TEXT_LANGID_EVAL_SQL),
    "text_word_freq": (text_word_freq, TEXT_WORD_FREQ_SQL),
    "text_zipf_fit": (text_zipf_fit, TEXT_ZIPF_FIT_SQL),
    "text_lang_dist": (text_lang_dist, TEXT_LANG_DIST_SQL),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
}
