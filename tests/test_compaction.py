from __future__ import annotations

import os

from pyspark.sql import functions as F

from drive_health_etl_spark.operators.compaction import compact_warehouse
from drive_health_etl_spark.operators.ingest import ingest
from drive_health_etl_spark.sources import envelopes


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wh")
    res = ingest(envelopes.messages_from_events(spark, sf_dir), normalize_phones=False)
    # simulate many micro-batch appends: 6 small files per partition
    rows = res.warehouse.withColumn("event_date", F.to_date("occurred_at"))
    rows.repartition(6).write.mode("overwrite").partitionBy("event_date").parquet(out)

    before = spark.read.parquet(out)
    n_rows = before.count()
    checksum = before.agg(F.sum(F.hash("idempotency_key")).alias("h")).collect()[0]["h"]

    stats = compact_warehouse(spark, out, max_files_per_partition=2)
    assert stats.partitions_compacted == 30
    assert stats.files_after < stats.files_before

    after = spark.read.parquet(out)
    assert after.count() == n_rows
    assert after.agg(F.sum(F.hash("idempotency_key")).alias("h")).collect()[0]["h"] == checksum

    # idempotent: a second pass finds nothing to do
    stats2 = compact_warehouse(spark, out, max_files_per_partition=2)
    assert stats2.partitions_compacted in (0, 30) or stats2.files_after <= stats.files_after


def test_compaction_respects_target_file_size(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wh")
    res = ingest(envelopes.messages_from_events(spark, sf_dir), normalize_phones=False)
    rows = res.warehouse.withColumn("event_date", F.to_date("occurred_at"))
    rows.repartition(6).write.mode("overwrite").partitionBy("event_date").parquet(out)
    n_rows = spark.read.parquet(out).count()

    # tiny target -> n_out > 1 -> each partition must get MULTIPLE files
    stats = compact_warehouse(spark, out, max_files_per_partition=2, target_file_bytes=4 * 1024)
    assert stats.partitions_compacted == 30
    per_part = {}
    for d in os.listdir(out):
        if d.startswith("event_date="):
            per_part[d] = len([f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")])
    assert max(per_part.values()) > 1  # the salt actually spread files
    assert spark.read.parquet(out).count() == n_rows


def test_compaction_noop_below_threshold(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wh")
    res = ingest(envelopes.messages_from_events(spark, sf_dir), normalize_phones=False)
    rows = res.warehouse.withColumn("event_date", F.to_date("occurred_at"))
    rows.repartition("event_date").write.mode("overwrite").partitionBy("event_date").parquet(out)
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d)) for d in os.listdir(out) if d.startswith("event_date=")
    }
    stats = compact_warehouse(spark, out, max_files_per_partition=4)
    assert stats.partitions_compacted == 0
    after = {
        d: os.path.getmtime(os.path.join(out, d)) for d in os.listdir(out) if d.startswith("event_date=")
    }
    assert after == mtimes  # untouched
