"""Corpus-construction operators over ``documents`` (north-star extension;
SURVEY.md §2.9 U3 family): training-mix resampling and sequence packing —
the two steps that turn a filtered corpus into what a trainer actually
consumes (a source mix at target proportions, batched into fixed token
budgets).

Both are pure column expressions. The mix resample needs per-source counts
on the driver — that collect is bounded by the number of SOURCES (a config-
sized dimension, like Spark MLlib collecting per-class counts), never by
corpus size; the accept/reject decision itself is the same deterministic
sha256-ratio filter the ingest sampler uses, evaluated distributed. Packing
is one window cumsum per source partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.functions.sampling import sample_hash_ratio, sample_hash_ratio_sql
from drive_health_etl_spark.operators.text import STOPWORDS, TOKENS_SQL, tokens_col
from drive_health_etl_spark.sources.tables import load_table

# --- Training-mix resampling -------------------------------------------------


def corpus_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every source to the smallest source's size (uniform target
    mix) with the deterministic hash filter: rate_s = min_count / count_s,
    keep iff sha256-ratio(doc key) < rate_s. Emits per-source before/after
    counts plus the achieved rate. Only the #sources-row count table ever
    reaches the driver; the corpus-side filter is a narrow map behind a
    broadcast join of the tiny rates table."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_before"))
    rows = counts.collect()  # bounded: one row per SOURCE, not per doc
    min_n = min(r["n_before"] for r in rows)
    rates = spark.createDataFrame(
        [(r["source"], r["n_before"], min_n / r["n_before"]) for r in rows],
        "source string, n_before long, rate double",
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(sample_hash_ratio(F.concat(F.lit("mix-"), F.col("doc_id"))) < F.col("rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_after"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
            F.round("rate", 6).alias("rate"),
        )
        .orderBy("source")
    )


CORPUS_MIX_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_before FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_before,
         CAST((SELECT MIN(n_before) FROM counts) AS DOUBLE) / n_before AS rate
  FROM counts
),
kept AS (
  SELECT d.source, COUNT(*) AS n_after
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE {sample_hash_ratio_sql("'mix-' || CAST(d.doc_id AS VARCHAR)")} < r.rate
  GROUP BY d.source
)
SELECT r.source, r.n_before, COALESCE(k.n_after, 0) AS n_after,
       ROUND(r.rate, 6) AS rate
FROM rates r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
"""


# --- Sequence packing --------------------------------------------------------

SEQ_LEN = 2048


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order sequence packing: within each source (ordered by
    doc_id), documents fill fixed SEQ_LEN-token bins by cumulative token
    count — bin = floor((cumsum - n_tokens) / SEQ_LEN), i.e. a document
    lands in the bin its first token falls into (documents spanning a
    boundary are charged to the earlier bin; real packers split or pad —
    this is the deterministic whole-document variant). One window cumsum
    per source partition; per-bin stats aggregate with map-side combine.
    Sources partition the window, so parallelism = #sources at this step —
    at 100 TB pack per (source, shard) with a second hash key."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens_col()).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    binned = docs.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(SEQ_LEN)),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("n_tokens") / F.lit(float(SEQ_LEN)), 6))
        .orderBy("source", "bin")
    )


CORPUS_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, source, len({TOKENS_SQL}) AS n_tokens FROM documents
),
b AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                     - n_tokens) / {SEQ_LEN}.0) AS BIGINT) AS bin
  FROM t
)
SELECT source, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / {SEQ_LEN}.0, 6) AS fill_ratio
FROM b GROUP BY source, bin ORDER BY source, bin
"""


# --- Token-window chunking ---------------------------------------------------

# Long-document splitting for a fixed-context trainer: overlapping token
# windows (stride < window so boundaries are covered twice), the standard
# chunking step before tokenized examples are packed/shuffled.
CHUNK_LEN = 64
CHUNK_STRIDE = 48


def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into CHUNK_LEN-token windows at CHUNK_STRIDE
    spacing (trailing partial window kept). Emits one row per chunk with its
    token count and content md5 — the id a downstream exact-dedup or shard
    writer keys on. Pure array math (sequence/slice/transform) + one
    posexplode: a narrow map at any corpus size; output partitioning follows
    the input, so the downstream shuffle (if any) is the consumer's."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = tokens_col()
    starts = F.when(
        F.size(ws) >= 1, F.sequence(F.lit(1), F.size(ws), F.lit(CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            F.size(F.slice(ws, i, CHUNK_LEN)).alias("n_tokens"),
            F.md5(F.array_join(F.slice(ws, i, CHUNK_LEN), " ")).alias("chunk_md5"),
        ),
    )
    return docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c")).select(
        "doc_id", "chunk_idx", F.col("c.n_tokens").alias("n_tokens"), F.col("c.chunk_md5").alias("chunk_md5")
    )


CORPUS_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS ws FROM documents),
c AS (
  SELECT doc_id,
         CAST((i - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
         len(ws[i:i+{CHUNK_LEN - 1}]) AS n_tokens,
         md5(array_to_string(ws[i:i+{CHUNK_LEN - 1}], ' ')) AS chunk_md5
  FROM t, UNNEST(generate_series(1, len(ws), {CHUNK_STRIDE})) AS _u(i)
)
SELECT doc_id, chunk_idx, n_tokens, chunk_md5 FROM c
"""


# --- Composed corpus-prep pipeline ------------------------------------------


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed document-prep chain a training pipeline actually runs,
    as ONE declarative plan: tokenize -> quality gate (length bounds + mean
    token length, Gopher-style) -> exact dedup (first doc_id per content
    hash wins) -> per-(lang, source) corpus stats. Composition matters:
    because every stage is a column expression or a single window, Catalyst
    fuses the tokenize+filter into the scan stage and the whole chain costs
    exactly ONE shuffle (the dedup window on the 32-hex hash) plus the
    final partial+final aggregation — no stage materializes an intermediate
    corpus. At 100 TB each stage stays narrow over the same partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    staged = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
        F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x).alias("tok_chars"),
        F.md5(F.col("text")).alias("content_hash"),
    )
    gated = staged.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("n_tokens") <= 5000)
        & ((F.col("tok_chars") / F.col("n_tokens")) >= 2.0)
        & ((F.col("tok_chars") / F.col("n_tokens")) <= 12.0)
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang", "source")
    )


CORPUS_PREP_SQL = f"""
WITH staged AS (
  SELECT doc_id, lang, source,
         len({TOKENS_SQL}) AS n_tokens,
         CAST(list_sum(list_transform({TOKENS_SQL}, x -> length(x))) AS INTEGER) AS tok_chars,
         md5(text) AS content_hash
  FROM documents
),
gated AS (
  SELECT * FROM staged
  WHERE n_tokens BETWEEN 5 AND 5000
    AND tok_chars / n_tokens >= 2.0 AND tok_chars / n_tokens <= 12.0
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
FROM deduped GROUP BY lang, source ORDER BY lang, source
"""


# --- Quality-weighted importance sampling ------------------------------------


def corpus_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus downsampling: keep each document with
    probability proportional to a quality score (stopword-ratio-based,
    squashed to [0.1, 1.0]), decided by the same deterministic sha256-ratio
    the ingest sampler uses — reproducible across runs and shards, no RNG
    state. The up/down-weighting step of corpus curation (high-quality docs
    survive at ~10x the rate of boilerplate). Narrow map + one small
    aggregate: keep-rate report per language."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = tokens_col()
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    # weight: 1 - stopword_ratio, clamped to [0.1, 1.0]
    weight = F.least(
        F.greatest(
            F.lit(1.0) - F.round(n_stop.cast("double") / n_tokens, 6), F.lit(0.1)
        ),
        F.lit(1.0),
    )
    r = sample_hash_ratio(F.concat(F.lit("imp-"), F.col("doc_id").cast("string")))
    tagged = docs.select("doc_id", "lang", weight.alias("w"), (r < weight).alias("keep"))
    return tagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        # decimal-cast sum before the divide: weights are 6-decimal multiples,
        # so a double accumulation-order difference could flip the rounding
        F.round(
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("avg_weight"),
        F.round(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double") / F.count("*"), 6
        ).alias("keep_rate"),
    )


_IMP_R = sample_hash_ratio_sql("'imp-' || CAST(doc_id AS VARCHAR)")
_IMP_STOPS = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

CORPUS_IMPORTANCE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         LEAST(GREATEST(1.0 - ROUND(
             CAST(len(list_filter({TOKENS_SQL}, x -> list_contains({_IMP_STOPS}, x))) AS DOUBLE)
             / len({TOKENS_SQL}), 6), 0.1), 1.0) AS w
  FROM documents
), tagged AS (
  SELECT doc_id, lang, w, ({_IMP_R}) < w AS keep FROM t
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_weight,
       ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS keep_rate
FROM tagged GROUP BY lang
"""


# --- Stratified train/val/test split ----------------------------------------

SPLIT_TRAIN, SPLIT_VAL = 0.8, 0.9  # cumulative hash-ratio thresholds


def corpus_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10 by content-independent
    doc-id hash) reported per language stratum — the reproducible-split
    primitive every training pipeline needs: membership is a pure function of
    the id, so re-running on a grown corpus never reshuffles old docs between
    splits. Narrow map (sha256 ratio) + one groupBy; the per-stratum share is
    a window over ≤ |langs| × 3 aggregate rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    r = sample_hash_ratio(F.concat(F.lit("split-"), F.col("doc_id").cast("string")))
    split = (
        F.when(r < SPLIT_TRAIN, "train").when(r < SPLIT_VAL, "val").otherwise("test")
    )
    agg = docs.groupBy("lang", split.alias("split")).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("lang")
    return agg.select(
        "lang",
        "split",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6).alias(
            "share"
        ),
    )


_SPLIT_R = sample_hash_ratio_sql("'split-' || CAST(doc_id AS VARCHAR)")

CORPUS_SPLIT_SQL = f"""
WITH tagged AS (
  SELECT lang,
         CASE WHEN {_SPLIT_R} < {SPLIT_TRAIN} THEN 'train'
              WHEN {_SPLIT_R} < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), agg AS (
  SELECT lang, split, COUNT(*) AS n_docs FROM tagged GROUP BY lang, split
)
SELECT lang, split, n_docs,
       ROUND(CAST(n_docs AS DOUBLE) /
             CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
FROM agg
"""


# --- Per-group reservoir sample ----------------------------------------------

RESERVOIR_K = 10


def corpus_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample WITHOUT replacement, ``RESERVOIR_K``
    docs per source: hash-as-priority (the exponential-sort / A-ES trick
    with md5 as the random key) + one row_number window per stratum. The
    bounded 'show me 10 random docs from every source' sampler — unlike a
    rate-based filter, the output size per group is exact.

    Plan: one shuffle on ``source`` (the window), no global sort; the
    priority key is computed in the scan projection."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    key = F.md5(F.concat(F.lit("rsv-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key.alias("k"), F.col("doc_id"))
    return (
        docs.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= RESERVOIR_K)
        .select("source", "slot", "doc_id")
    )


CORPUS_RESERVOIR_SQL = f"""
SELECT source, slot, doc_id FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5('rsv-' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS slot
  FROM documents
) WHERE slot <= {RESERVOIR_K}
"""


# --- Token-distribution drift ------------------------------------------------


def corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between two corpus halves (even vs odd
    doc_id — stand-in for 'yesterday's crawl vs today's'): KL divergence in
    both directions over add-one-smoothed unigram distributions on the
    union vocabulary. The drift monitor a training-data pipeline runs
    before accepting a new ingest batch.

    Plan: one explode + one groupBy(token) computing both sides' counts as
    conditional aggregates (single shuffle, map-side combinable), a 1-row
    totals aggregate broadcast back, and a final single-row reduce. Each
    vocab term's contribution decimal-casts before summing so accumulation
    order cannot diverge between engines."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("in_a"), F.explode(tokens_col()).alias("w")
    )
    freq = toks.groupBy("w").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("cb"),
    )
    totals = freq.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count("*").alias("v")
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v"))
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v"))
    per = freq.crossJoin(F.broadcast(totals)).select(
        "na",
        "nb",
        (p * F.log(p / q)).cast("decimal(28,12)").alias("kab"),
        (q * F.log(q / p)).cast("decimal(28,12)").alias("kba"),
    )
    return per.agg(
        F.count("*").alias("n_vocab"),
        F.max("na").alias("n_tokens_a"),
        F.max("nb").alias("n_tokens_b"),
        F.round(F.sum("kab").cast("double"), 6).alias("kl_ab"),
        F.round(F.sum("kba").cast("double"), 6).alias("kl_ba"),
    )


CORPUS_KL_DRIFT_SQL = f"""
WITH toks AS (
  SELECT doc_id % 2 = 0 AS in_a, unnest({TOKENS_SQL}) AS w FROM documents
),
freq AS (
  SELECT w, SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS cb
  FROM toks GROUP BY w
),
totals AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         COUNT(*) AS v
  FROM freq
),
per AS (
  SELECT na, nb,
         CAST((CAST(ca + 1 AS DOUBLE) / (na + v))
              * ln((CAST(ca + 1 AS DOUBLE) / (na + v))
                   / (CAST(cb + 1 AS DOUBLE) / (nb + v))) AS DECIMAL(28,12)) AS kab,
         CAST((CAST(cb + 1 AS DOUBLE) / (nb + v))
              * ln((CAST(cb + 1 AS DOUBLE) / (nb + v))
                   / (CAST(ca + 1 AS DOUBLE) / (na + v))) AS DECIMAL(28,12)) AS kba
  FROM freq, totals
)
SELECT COUNT(*) AS n_vocab, MAX(na) AS n_tokens_a, MAX(nb) AS n_tokens_b,
       ROUND(CAST(SUM(kab) AS DOUBLE), 6) AS kl_ab,
       ROUND(CAST(SUM(kba) AS DOUBLE), 6) AS kl_ba
FROM per
"""


def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between corpus sources: shared distinct
    3-gram shingles and the shingle-set Jaccard per source pair — the
    curation matrix that tells you which crawl/source combinations are
    near-copies of each other (and should be down-weighted in the training
    mix) before any per-document dedup runs.

    Scale: ONE shuffle on the shingle — groupBy(shingle).collect_set(source)
    collapses the corpus to a vocab-sized (shingle, source-set) relation
    (the set is bounded by n_sources, config-scale), and the pair expansion
    is an in-row transform over the sorted set (<= C(n_sources, 2) structs
    per shingle), never a join. r11 (guide §2.4): the previous shape —
    DISTINCT (source, shingle), then a self-JOIN on shingle, then the pair
    aggregate — shuffled the vocab three more times (distinct, both join
    sides re-keyed by shingle, pair agg) for the identical counts
    (measured 2.21 -> 1.05 s isolated). Output is n_sources^2 rows —
    driver-tiny at any SF."""
    from drive_health_etl_spark.operators.dedup import _shingle_sets  # noqa: PLC0415

    # r11: per-source shingles from the shared cached shingle-set relation
    # (empty-set docs contribute no shingles either way); collect_set both
    # dedups (source, shingle) and groups in the same exchange.
    srcsets = (
        _shingle_sets(spark, sf_dir)
        .select("source", F.explode("sh_set").alias("shingle"))
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    counts = srcsets.select(F.explode("srcs").alias("source")).groupBy("source").agg(
        F.count("*").alias("n")
    )
    # All (src_a < src_b) pairs of the sorted per-shingle source set, as one
    # nested transform + flatten — pure in-row expressions, no self-join.
    pair_structs = F.expr(
        "flatten(transform(srcs, (s1, i) ->"
        " transform(slice(srcs, i + 2, size(srcs)), s2 -> struct(s1 AS src_a, s2 AS src_b))))"
    )
    shared = (
        srcsets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    na = counts.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = counts.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


def _corpus_overlap_sql() -> str:
    from drive_health_etl_spark.operators.dedup import SHINGLES_SQL  # noqa: PLC0415

    return f"""
WITH ss AS (
  SELECT DISTINCT source, shingle
  FROM (SELECT source, unnest({SHINGLES_SQL}) AS shingle FROM documents)
),
counts AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared, ca.n AS n_a, cb.n AS n_b,
       CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) AS jaccard
FROM shared
JOIN counts ca ON ca.source = src_a
JOIN counts cb ON cb.source = src_b
"""


_CURRICULUM_BUCKETS = 4


def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering: documents are quartile-bucketed by
    length (short -> long, the classic easy-first curriculum) and hash-
    shuffled WITHIN each bucket — the epoch ordering a trainer consumes so
    early steps see short documents while intra-bucket order stays unbiased
    and reproducible across runs/partitionings.

    Bucketing uses ntile over a total order ((n_chars, doc_id) — the tie
    key makes ntile engine-deterministic); intra-bucket order is md5 of a
    salted doc id. One window sort each — at 100 TB the bucket assignment
    comes from pre-aggregated length percentiles (the feat_equidepth_bins
    broadcast pattern) instead of a global sort; semantics identical."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wb = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    wpos = Window.partitionBy("bucket").orderBy(
        F.md5(F.concat(F.lit("curriculum:"), F.col("doc_id").cast("string"))).asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.select(
            "doc_id", "n_chars", F.ntile(_CURRICULUM_BUCKETS).over(wb).alias("bucket")
        )
        .select("doc_id", "n_chars", "bucket", F.row_number().over(wpos).alias("pos"))
        .orderBy("bucket", "pos")
    )


CORPUS_CURRICULUM_SQL = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         CAST(NTILE({_CURRICULUM_BUCKETS}) OVER (ORDER BY n_chars ASC, doc_id ASC) AS INT) AS bucket
  FROM documents
)
SELECT doc_id, n_chars, bucket,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY bucket
         ORDER BY md5('curriculum:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
       ) AS INT) AS pos
FROM b
ORDER BY bucket, pos
"""


_N_SHARDS = 16


def corpus_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding + balance audit: every document hashes
    to one of ``_N_SHARDS`` shards (md5-based, reproducible across runs and
    engines — the writer layout for a training corpus), and the audit
    reports per-shard document and byte counts plus each shard's deviation
    from the ideal 1/N byte share — the skew check run before shipping
    shards to trainers. All counts exact; the share math rounds 6 dp."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _N_SHARDS
        ).alias("shard"),
    )
    per = docs.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_bytes")
    )
    tot = per.agg(F.sum("n_bytes").alias("total_bytes"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "n_bytes",
            F.round(
                F.col("n_bytes").cast("double") / F.col("total_bytes").cast("double")
                - F.lit(1.0 / _N_SHARDS),
                6,
            ).alias("share_deviation"),
        )
        .orderBy("shard")
    )


CORPUS_SHARD_SQL = f"""
WITH d AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_N_SHARDS} AS shard
  FROM documents
),
per AS (
  SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_bytes
  FROM d GROUP BY shard
),
tot AS (SELECT CAST(SUM(n_bytes) AS BIGINT) AS total_bytes FROM per)
SELECT shard, n_docs, n_bytes,
       ROUND(CAST(n_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE)
             - {1.0 / _N_SHARDS!r}, 6) AS share_deviation
FROM per CROSS JOIN tot ORDER BY shard
"""


_TEMP_T = 2.0   # mixing temperature (1 = natural, inf = uniform)
_TEMP_FRAC = 0.5  # fraction of the corpus the mixed sample targets


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing — THE standard multi-source LLM
    data recipe (e.g. multilingual sampling): source weights
    w_s = exp(ln(tokens_s) / T) flatten the natural token-mass distribution
    toward uniform as T grows; per-source keep rates then hash-sample each
    source to its target share of ``_TEMP_FRAC`` of the corpus.

    Weighting is by TOKEN mass, not document count (what LLM mixing
    actually balances). w_s is written as exp(ln(n)/T) with identical op
    order in both engines (libm parity per the LM-query precedent); the
    weight normalizer decimal-casts each w_s so the few-source sum is
    order-free; targets use floor (round-half diverges between engines).
    The rates relation is #sources-sized and broadcast; the corpus-side
    filter is the same narrow sha256 map as `corpus_mix_resample`."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens_col()).alias("n_tok")
    )
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    w = F.exp(F.log(F.col("n_tokens").cast("double")) / F.lit(_TEMP_T))
    weighted = counts.select("source", "n_docs", "n_tokens", w.alias("w"))
    tot = weighted.agg(
        F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("sum_w"),
        F.sum("n_docs").alias("total_docs"),
    )
    rates = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.least(
                F.col("n_docs"),
                F.floor(
                    F.lit(_TEMP_FRAC) * F.col("total_docs") * F.col("w") / F.col("sum_w")
                ).cast("long"),
            ).alias("n_target"),
        )
        .withColumn(
            "rate", F.col("n_target").cast("double") / F.col("n_docs")
        )
    )
    kept = (
        docs.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(
            sample_hash_ratio(F.concat(F.lit("tmix-"), F.col("doc_id"))) < F.col("rate")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_target",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
        .orderBy("source")
    )


CORPUS_TEMPERATURE_MIX_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tok
  FROM documents
),
counts AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens FROM d GROUP BY source
),
weighted AS (
  SELECT source, n_docs, n_tokens,
         exp(ln(CAST(n_tokens AS DOUBLE)) / {_TEMP_T!r}) AS w
  FROM counts
),
tot AS (
  SELECT CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS sum_w,
         SUM(n_docs) AS total_docs
  FROM weighted
),
rates AS (
  SELECT source, n_docs, n_tokens,
         LEAST(n_docs, CAST(FLOOR({_TEMP_FRAC!r} * total_docs * w / sum_w) AS BIGINT)) AS n_target
  FROM weighted CROSS JOIN tot
),
r2 AS (SELECT *, CAST(n_target AS DOUBLE) / n_docs AS rate FROM rates),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM d JOIN r2 USING (source)
  WHERE {sample_hash_ratio_sql("'tmix-' || CAST(doc_id AS VARCHAR)")} < r2.rate
  GROUP BY d.source
)
SELECT r2.source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, n_target,
       COALESCE(n_kept, 0) AS n_kept, ROUND(rate, 6) AS rate
FROM r2 LEFT JOIN kept ON r2.source = kept.source
ORDER BY r2.source
"""


_DSIR_BUCKETS = 128  # hashed-feature dimensionality (the method's knob)
_DSIR_TARGET_LANG = "en"  # target distribution = the English slice


def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Data Selection via Importance Resampling,
    Xie et al. 2023 — public method): learn per-feature log importance
    ratios between a TARGET distribution (here the `en` slice) and the RAW
    corpus over hashed unigram features, score every document by the sum of
    its tokens' ratios, and select documents that look more target-like
    than raw-like (positive log-ratio — the deterministic analog of the
    paper's resampling step, chosen so the oracle is exact rather than
    RNG-dependent).

    Float policy: bucket counts are exact integers aggregated ONCE
    (map-side combinable, with the target slice counted via a conditional
    sum in the same pass — one shuffle); each bucket's add-1-smoothed
    log-ratio is computed from those integers and rounded to 9dp; per-doc
    scores are DECIMAL sums of those fixed terms (order-independent in
    both engines); only the reported weight rounds to 6dp.

    Scale shape: ONE token-explode scan folded immediately into compact
    per-(doc, bucket) counts (map-side combinable; <= 128 rows per doc),
    localCheckpointed because both the feature-ratio fit and the scoring
    pass consume it; the 128-row λ table rides back as a BROADCAST join.
    No data-sized join sides, no windows; at 100 TB the λ table is still
    128 rows and the corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 7), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    db = (
        docs.select("doc_id", "lang", F.explode(tokens_col()).alias("token"))
        .select("doc_id", "lang", bucket.alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # one explode scan, two consumers
    )
    counts = db.groupBy("b").agg(
        F.sum("n").alias("r"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("n")).otherwise(F.lit(0))
        ).alias("t"),
    )
    totals = counts.agg(
        (F.sum("r") + F.lit(_DSIR_BUCKETS)).alias("rt"),
        (F.sum("t") + F.lit(_DSIR_BUCKETS)).alias("tt"),
    )
    lam = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log((F.col("t") + 1).cast("double") / F.col("tt").cast("double"))
                - F.log((F.col("r") + 1).cast("double") / F.col("rt").cast("double")),
                9,
            )
            .cast("decimal(16,9)")  # sized so the n*lam product stays under
            # Spark's 38-digit cap (decimal(12,0) x decimal(16,9) ->
            # precision 29, scale 9 — exact in both engines); 12 digits of
            # count headroom before Spark's silent overflow-to-NULL
            .alias("lam"),
        )
    )
    scored = (
        db.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n").cast("decimal(12,0)") * F.col("lam")).alias("s"),
        )
    )
    # No final round: `s` is an exact decimal identical in both engines
    # (the ROADMAP round-on-double gotcha — rounding a tie like
    # -0.9396465 to 6dp diverges across engines; casting the identical
    # decimal to double cannot).
    return scored.select(
        "doc_id",
        "n_tokens",
        F.col("s").cast("double").alias("dsir_weight"),
        (F.col("s") > 0).alias("selected"),
    )


CORPUS_DSIR_SQL = f"""
WITH db AS MATERIALIZED (
  SELECT doc_id, lang, b, COUNT(*) AS n FROM (
    SELECT doc_id, lang,
           ('0x' || substr(md5(token), 1, 7))::BIGINT % {_DSIR_BUCKETS} AS b
    FROM (SELECT doc_id, lang, unnest({TOKENS_SQL}) AS token FROM documents)
  ) GROUP BY doc_id, lang, b
),
counts AS (
  SELECT b, SUM(n) AS r,
         SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN n ELSE 0 END) AS t
  FROM db GROUP BY b
),
totals AS (
  SELECT SUM(r) + {_DSIR_BUCKETS} AS rt, SUM(t) + {_DSIR_BUCKETS} AS tt FROM counts
),
lam AS (
  SELECT b,
         CAST(ROUND(ln(CAST(t + 1 AS DOUBLE) / CAST(tt AS DOUBLE))
                    - ln(CAST(r + 1 AS DOUBLE) / CAST(rt AS DOUBLE)), 9)
              AS DECIMAL(16,9)) AS lam
  FROM counts, totals
),
scored AS (
  SELECT doc_id, SUM(n) AS n_tokens, SUM(CAST(n AS DECIMAL(12,0)) * lam) AS s
  FROM db JOIN lam USING (b) GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(s AS DOUBLE) AS dsir_weight,
       s > 0 AS selected
FROM scored
"""


# --- weighted sampling without replacement -----------------------------------

ES_K = 100  # sample size


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one pass, no RNG state:
    Efraimidis & Spirakis 2006 (A-ES) — each doc gets the key
    ``ln(u) / w`` with u a deterministic hash uniform and w the doc's byte
    mass (``n_chars``); the K largest keys are EXACTLY a weight-
    proportional sample without replacement. This is how "subsample the
    corpus to M tokens, proportional to document mass" runs at 100 TB:
    the key is computed in the scan projection, selection is a single
    top-K (``TakeOrderedAndProject`` — per-partition heaps + one K-row
    merge, no global sort, no per-round passes like sequential reservoir
    algorithms), and the same (key, rate) always yields the same sample
    across runs and shards.

    Parity: u is the repo's sha256-ratio (bit-identical expressions both
    engines); keys are ln terms rounded to 9dp — the established ln-parity
    discipline — with doc_id as the deterministic tiebreak. u is clamped
    away from 0 (ln(0) = -inf) at 1e-12."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = F.greatest(
        sample_hash_ratio(F.concat(F.lit("es-"), F.col("doc_id").cast("string"))),
        F.lit(1e-12),
    )
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    top = (
        docs.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(ES_K)
    )
    # slot assignment runs on the K-row result only — the unpartitioned
    # window is bounded by ES_K, never by the corpus
    w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return top.withColumn("slot", F.row_number().over(w)).select(
        "slot", "doc_id", "n_chars", "es_key"
    )


_ES_U = sample_hash_ratio_sql("'es-' || CAST(doc_id AS VARCHAR)")

CORPUS_WEIGHTED_SAMPLE_SQL = f"""
SELECT slot, doc_id, n_chars, es_key FROM (
  SELECT doc_id, n_chars, es_key,
         ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS slot
  FROM (
    SELECT doc_id, n_chars,
           ROUND(ln(GREATEST({_ES_U}, 1e-12)) / n_chars, 9) AS es_key
    FROM documents
  )
) WHERE slot <= {ES_K}
"""


QUERIES: dict[str, tuple] = {
    "corpus_weighted_sample": (corpus_weighted_sample, CORPUS_WEIGHTED_SAMPLE_SQL),
    "corpus_dsir_select": (corpus_dsir_select, CORPUS_DSIR_SQL),
    "corpus_temperature_mix": (corpus_temperature_mix, CORPUS_TEMPERATURE_MIX_SQL),
    "corpus_shard_balance": (corpus_shard_balance, CORPUS_SHARD_SQL),
    "corpus_curriculum_order": (corpus_curriculum_order, CORPUS_CURRICULUM_SQL),
    "corpus_source_overlap": (corpus_source_overlap, _corpus_overlap_sql()),
    "corpus_kl_drift": (corpus_kl_drift, CORPUS_KL_DRIFT_SQL),
    "corpus_reservoir_per_source": (corpus_reservoir_per_source, CORPUS_RESERVOIR_SQL),
    "corpus_importance_sample": (corpus_importance_sample, CORPUS_IMPORTANCE_SQL),
    "corpus_stratified_split": (corpus_stratified_split, CORPUS_SPLIT_SQL),
    "corpus_mix_resample": (corpus_mix_resample, CORPUS_MIX_SQL),
    "corpus_pack_sequences": (corpus_pack_sequences, CORPUS_PACK_SQL),
    "corpus_chunk_windows": (corpus_chunk_windows, CORPUS_CHUNK_SQL),
    "corpus_prep_pipeline": (corpus_prep_pipeline, CORPUS_PREP_SQL),
}
