"""Central query registry: name -> (spark_callable, oracle_sql | None).

Every SURVEY.md §2 inventory row that is SQL-expressible appears here with a
DuckDB oracle twin; rows-only entries (oracle_sql=None) are the genuinely
non-SQL ops (full envelope pipeline on generated fixtures, streaming).
``__spark_entry__.py`` is a thin view over this dict.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from drive_health_etl_spark.operators import asof as _asof
from drive_health_etl_spark.operators import corpus as _corpus
from drive_health_etl_spark.operators import dedup as _dedup
from drive_health_etl_spark.operators import grouped_pandas as _grouped
from drive_health_etl_spark.operators import multimodal as _multimodal
from drive_health_etl_spark.operators import quality as _quality
from drive_health_etl_spark.operators import retrieval as _retrieval
from drive_health_etl_spark.operators import sessions as _sessions
from drive_health_etl_spark.operators import similarity as _similarity
from drive_health_etl_spark.operators import udtfs as _udtfs
from drive_health_etl_spark.operators import text as _text
from drive_health_etl_spark.plans import extended as _extended
from drive_health_etl_spark.plans import pipeline_queries as _pipeline
from drive_health_etl_spark.plans import relational as _relational
from drive_health_etl_spark.plans import scalar_suite as _scalar
from drive_health_etl_spark.plans import tpch_suite as _tpch


def pipeline_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: full ingest chain (decode -> validate -> sample ->
    dedup -> warehouse rows) over envelopes derived from the events table,
    then the reference's verification aggregate (A1). Not SQL-expressible
    (base64/JSON fixture generation + pandas UDF inside)."""
    from pyspark.sql import functions as F

    from drive_health_etl_spark.operators.ingest import ingest
    from drive_health_etl_spark.sources.envelopes import messages_from_events

    raw = messages_from_events(spark, sf_dir)
    res = ingest(raw, audit_rate=0.75, normalize_phones=False)
    return (
        res.warehouse.groupBy("tenant_id", "event_type")
        .agg(F.count("*").alias("event_count"))
        .orderBy("tenant_id", "event_type")
    )


from drive_health_etl_spark.session import shuffle_partitions as _shuffle_partitions


def st_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming (applyInPandasWithState) driven to
    completion: per-user running counters accumulated across TWO micro-batches
    (maxFilesPerTrigger=1), final snapshot per user. The oracle is the plain
    batch aggregate — state accumulation across batches must converge to it."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from drive_health_etl_spark.sources.tables import load_table
    from drive_health_etl_spark.streaming.stateful import stateful_user_counters

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    src = tempfile.mkdtemp(prefix="dhe_stateful_src_")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    sink = f"stateful_out_{uuid.uuid4().hex[:8]}"
    # 8 shuffle partitions: stateful-streaming cost at this scale is per-
    # partition state-store + Python-worker setup, not data volume (32
    # partitions measured 10-15x slower on a cold session); results are
    # partitioning-independent.
    with _shuffle_partitions(spark, 8):
        q = (
            stateful_user_counters(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(src, ignore_errors=True)  # snapshots live in the memory sink now
    return spark.sql(
        f"""
        SELECT user_id, n_events, ROUND(total_value, 6) AS total_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM {sink}
        ) WHERE rn = 1
        """
    )


def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join driven to completion: click->purchase attribution
    (same user, purchase within 30 min after the click) with both sides as
    watermarked streams. One availableNow batch so no row is beyond the
    watermark when matched; the oracle is the equivalent batch range join."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from drive_health_etl_spark.sources.tables import load_table
    from drive_health_etl_spark.streaming.joins import purchase_attribution

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    src = tempfile.mkdtemp(prefix="dhe_ssj_src_")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).format("parquet").load(src)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    sink = f"ssj_out_{uuid.uuid4().hex[:8]}"
    # 8 shuffle partitions: stateful-streaming cost at this scale is per-
    # partition state-store + Python-worker setup, not data volume (32
    # partitions measured 10-15x slower on a cold session); results are
    # partitioning-independent.
    with _shuffle_partitions(spark, 8):
        q = (
            purchase_attribution(clicks, purchases)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(src, ignore_errors=True)
    return spark.sql(f"SELECT click_id, purchase_id, user_id, lag_us FROM {sink}")


ST_STREAM_STREAM_SQL = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


ST_STATEFUL_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_value
FROM events GROUP BY user_id
"""


REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "st_stateful_counters": (st_stateful_counters, ST_STATEFUL_SQL),
    "st_stream_stream_join": (st_stream_stream_join, ST_STREAM_STREAM_SQL),
    **_relational.QUERIES,
    **_tpch.QUERIES,
    **_pipeline.QUERIES,
    **_extended.QUERIES,
    **_scalar.QUERIES,
    **_text.QUERIES,
    **_quality.QUERIES,
    **_corpus.QUERIES,
    **_dedup.QUERIES,
    **_similarity.QUERIES,
    **_multimodal.QUERIES,
    **_grouped.QUERIES,
    **_asof.QUERIES,
    **_sessions.QUERIES,
    **_retrieval.QUERIES,
    **_udtfs.QUERIES,
    "pipeline_ingest_e2e": (pipeline_ingest_e2e, None),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
