"""Keyed upsert into a parquet warehouse (MERGE emulation).

The reference's sink gets idempotent-upsert semantics from BigQuery insertIds
(``src/bq.js:49``); parquet has no MERGE, so the engine emulates Delta's
``MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` with the classic
anti-join + union rewrite, scoped to only the partitions the update batch
touches:

1. partition-prune the target to the update batch's ``event_date`` range,
2. anti-join those partitions against the update keys (drop stale rows),
3. union the fresh rows, rewrite ONLY those partitions (dynamic overwrite).

At 100 TB this is the standard pattern: cost is proportional to touched
partitions, not table size. (With Delta/Iceberg on the classpath you'd call
MERGE INTO and get the same plan plus ACID.)

Contract: ``updates`` is materialized internally before any file mutation,
so deriving it from the target itself (read-modify-write) is safe WITHIN a
call. A DataFrame handle kept across calls goes stale once its underlying
files are rewritten — re-derive updates per call (snapshot isolation across
calls is exactly what Delta/Iceberg add).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.session import spark_conf


def _is_missing_path(e: AnalysisException) -> bool:
    cls = ""
    try:
        cls = e.getCondition() or ""
    except Exception:
        pass
    return "PATH_NOT_FOUND" in cls or "PATH_NOT_FOUND" in str(e)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str = "idempotency_key",
    partition_col: str = "event_date",
) -> None:
    """Upsert ``updates`` into the partitioned parquet table at
    ``target_path``: last-write-wins per key within touched partitions."""
    updates = updates.withColumn(partition_col, F.to_date("occurred_at")) if partition_col not in updates.columns else updates
    # Materialize updates FIRST: callers routinely derive the update batch
    # from the target itself (read-modify-write), and a lazy plan would read
    # the very files the overwrite below replaces.
    updates = updates.localCheckpoint(eager=True)
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not touched:
        return

    try:
        target = spark.read.parquet(target_path)
    except AnalysisException as e:
        # ONLY a missing target means "first write". Any other failure
        # (corrupt footer, permission, schema) must propagate — treating it
        # as first-write would overwrite touched partitions with update rows
        # alone, silently dropping every pre-existing unmatched row.
        if not _is_missing_path(e):
            raise
        merged = updates
    else:
        existing = target.filter(F.col(partition_col).isin(touched))
        keep = existing.join(updates.select(key).distinct(), key, "left_anti")
        merged = keep.unionByName(updates.select(*keep.columns))
        # The merged plan reads the very files the overwrite will replace —
        # materialize it (break lineage) before writing, else the scan races
        # the delete (FAILED_READ_FILE). Cost: the touched partitions only.
        merged = merged.localCheckpoint(eager=True)
    with spark_conf(spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}):
        (
            merged.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
