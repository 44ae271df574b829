"""Central query registry: name -> (spark_callable, oracle_sql | None).

Every SURVEY.md §2 inventory row that is SQL-expressible appears here with a
DuckDB oracle twin; rows-only entries (oracle_sql=None) are the genuinely
non-SQL ops (full envelope pipeline on generated fixtures, streaming).
``__spark_entry__.py`` is a thin view over this dict.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from drive_health_etl_spark.operators import dedup as _dedup
from drive_health_etl_spark.operators import multimodal as _multimodal
from drive_health_etl_spark.operators import similarity as _similarity
from drive_health_etl_spark.operators import text as _text
from drive_health_etl_spark.plans import extended as _extended
from drive_health_etl_spark.plans import pipeline_queries as _pipeline
from drive_health_etl_spark.plans import relational as _relational


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


REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    **_relational.QUERIES,
    **_pipeline.QUERIES,
    **_extended.QUERIES,
    **_text.QUERIES,
    **_dedup.QUERIES,
    **_similarity.QUERIES,
    **_multimodal.QUERIES,
    "pipeline_ingest_e2e": (pipeline_ingest_e2e, None),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
