from __future__ import annotations

from pyspark.sql import functions as F

from drive_health_etl_spark import schemas
from drive_health_etl_spark.operators.ingest import decode_messages, validate_envelopes
from drive_health_etl_spark.operators.metrics import observe_ingest, status_breakdown
from drive_health_etl_spark.sources import envelopes


def test_observe_ingest_counts(spark):
    raw = envelopes.fixture_df(spark)  # 3 smoke + 15 dup + 5 malformed = 23
    validated = validate_envelopes(decode_messages(raw))
    observed, obs = observe_ingest(validated)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_total"] == 23
    assert m["n_valid"] == 18
    assert m["n_format_error"] == 1
    assert m["n_validation_error"] == 4


def test_status_breakdown(spark):
    raw = envelopes.fixture_df(spark)
    validated = validate_envelopes(decode_messages(raw))
    rows = {r["status"]: r["n"] for r in status_breakdown(validated).collect()}
    assert rows[schemas.STATUS_OK] == 18
    assert rows[schemas.STATUS_FORMAT_ERROR] == 1
    assert rows[schemas.STATUS_VALIDATION_ERROR] == 4


def test_batch_progress_listener_records_micro_batches(spark, sf_dir, tmp_path):
    """The streaming listener must see every micro-batch (2 files,
    maxFilesPerTrigger=1 -> >=2 progress events) and account for every
    input row exactly once."""
    import time
    import uuid

    from drive_health_etl_spark.operators.metrics import attach_progress_listener
    from drive_health_etl_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    n_expected = events.count()

    sink = attach_progress_listener(spark)
    try:
        name = f"listener_sink_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(src)
            .writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is async on the event bus — drain briefly
        deadline = time.time() + 30
        while time.time() < deadline:
            if sum(b["num_input_rows"] for b in sink.batches) >= n_expected:
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(sink.listener)

    assert len(sink.batches) >= 2
    assert sum(b["num_input_rows"] for b in sink.batches) == n_expected
    assert all(b["duration_ms"] is not None for b in sink.batches)
