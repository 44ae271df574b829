"""Custom envelope DataSource (S1 as a first-class Spark 4 Python source):
batch reads distribute per spool file; streaming offsets advance per file and
survive checkpoint restarts; the rows feed the unchanged ingest chain."""

from __future__ import annotations

from drive_health_etl_spark.sources import envelopes
from drive_health_etl_spark.sources.envelope_source import (
    register_envelope_source,
    write_spool_file,
)


def test_batch_read_distributes_per_file(spark, tmp_path):
    spool = str(tmp_path / "spool")
    write_spool_file(spool, envelopes.smoke_messages(), "000001.jsonl")
    write_spool_file(spool, envelopes.malformed_messages(), "000002.jsonl")
    register_envelope_source(spark)

    df = spark.read.format("envelope").option("path", spool).load()
    assert df.columns == ["data", "attributes", "message_id", "ordering_key"]
    assert df.count() == len(envelopes.smoke_messages()) + len(envelopes.malformed_messages())
    assert df.rdd.getNumPartitions() == 2  # one partition per spool file
    got = {r["message_id"] for r in df.collect()}
    assert "m-smoke-1" in got and "m-bad-json" in got


def test_batch_rows_feed_ingest_chain(spark, tmp_path):
    from drive_health_etl_spark.operators.ingest import ingest

    spool = str(tmp_path / "spool")
    write_spool_file(spool, envelopes.fixture_messages(), "000001.jsonl")
    register_envelope_source(spark)
    raw = spark.read.format("envelope").option("path", spool).load()
    res = ingest(raw, audit_rate=1.0)
    # same expectations as the parquet-shaped fixture: 3 smoke + 3 deduped
    # duplicate groups pass; 5 malformed route to DLQ
    assert res.warehouse.count() == 6
    assert res.dlq.count() == 5


def test_stream_offsets_advance_per_file(spark, tmp_path):
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_spool_file(spool, envelopes.smoke_messages(), "000001.jsonl")
    register_envelope_source(spark)

    def drain():
        q = (
            spark.readStream.format("envelope")
            .option("path", spool)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 3

    # new spool file after the first drain: restart from the checkpoint
    # processes ONLY the new file (offset = consumed-file count)
    write_spool_file(spool, envelopes.duplicate_messages(copies=2), "000002.jsonl")
    drain()
    ids = [r["message_id"] for r in spark.read.parquet(out).collect()]
    assert len(ids) == 3 + 6
    assert len(ids) == len(set(ids))  # no re-delivery of file 1
