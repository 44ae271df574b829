"""Small-file compaction for the partitioned warehouse (100 TB ops tooling).

Streaming ingest appends a few files per micro-batch; after a day a hot
partition holds thousands of small files and scan cost is dominated by
footer reads and task scheduling. Compaction rewrites only the partitions
whose file count exceeds a threshold, coalescing each to
``ceil(bytes / target_file_bytes)`` files, preserving the
(tenant_id, event_type) sort that gives row-group skipping (S5 clustering).

Dynamic partition overwrite keeps untouched partitions byte-identical —
same mechanics as ``operators.upsert``.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.session import spark_conf


@dataclass
class CompactionStats:
    partitions_compacted: int
    files_before: int
    files_after: int


def _partition_files(path: str, partition_col: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for entry in os.listdir(path):
        if entry.startswith(f"{partition_col}="):
            pdir = os.path.join(path, entry)
            out[entry.split("=", 1)[1]] = [
                os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
            ]
    return out


def compact_warehouse(
    spark: SparkSession,
    path: str,
    partition_col: str = "event_date",
    max_files_per_partition: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: tuple[str, ...] = ("tenant_id", "event_type"),
) -> CompactionStats:
    parts = _partition_files(path, partition_col)
    todo = {p: fs for p, fs in parts.items() if len(fs) > max_files_per_partition}
    if not todo:
        return CompactionStats(0, sum(map(len, parts.values())), sum(map(len, parts.values())))

    files_before = sum(map(len, parts.values()))
    from drive_health_etl_spark.operators.upsert import warehouse_write_lock

    with warehouse_write_lock(path):
        return _compact_locked(
            spark, path, partition_col, target_file_bytes, sort_cols, parts, todo, files_before
        )


def _compact_locked(
    spark, path, partition_col, target_file_bytes, sort_cols, parts, todo, files_before
):
    df = spark.read.parquet(path).filter(F.col(partition_col).isin(list(todo)))
    sizes = {p: sum(os.path.getsize(f) for f in fs) for p, fs in todo.items()}
    # one file-count target for the batch: partitions are day-sized and
    # similar; per-partition exactness would need one write per partition
    n_out = max(1, math.ceil(max(sizes.values()) / target_file_bytes))
    if n_out == 1:
        compacted = df.repartition(partition_col).sortWithinPartitions(*sort_cols)
    else:
        # hashing by partition_col alone puts each date in ONE task = one
        # output file regardless of n_out; add a bounded salt so each date
        # spreads over ~n_out files
        compacted = (
            df.withColumn("_fb", F.pmod(F.hash(*sort_cols), F.lit(n_out)))
            .repartition(n_out * len(todo), F.col(partition_col), F.col("_fb"))
            .drop("_fb")
            .sortWithinPartitions(*sort_cols)
        )
    compacted = compacted.localCheckpoint(eager=True)  # about to overwrite the same files
    with spark_conf(spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}):
        compacted.write.mode("overwrite").partitionBy(partition_col).parquet(path)

    files_after = sum(map(len, _partition_files(path, partition_col).values()))
    return CompactionStats(len(todo), files_before, files_after)
