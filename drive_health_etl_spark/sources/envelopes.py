"""Deterministic envelope/message fixture generation (FIXTURES.md §A).

Builds Pub/Sub-push-shaped raw messages two ways:

- :func:`fixture_messages` — the reference's own test corpus (smoke trio with
  phone golden pairs, duplicate batches, malformed cases, replay attempts),
  used by pytest to assert pipeline semantics.
- :func:`messages_from_events` — derives a large envelope stream from the
  driver's ``events`` table *inside Spark* (base64/JSON built with native
  column expressions, no driver-side loop), so the flagship ingest run and
  the bench scale with SF instead of being a fixed tiny corpus.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.schemas import RAW_MESSAGE_SCHEMA


def _msg(envelope: dict | str, message_id: str, attributes: dict | None = None, ordering_key: str | None = None):
    data = envelope if isinstance(envelope, str) else json.dumps(envelope)
    return {
        "data": base64.b64encode(data.encode()).decode(),
        "attributes": attributes or {},
        "message_id": message_id,
        "ordering_key": ordering_key,
    }


def _envelope(
    tenant_id="org-demo",
    event_type="call.metadata",
    occurred_at="2024-03-01T10:00:00.000Z",
    payload=None,
    trace_id=None,
    source="smoke-test",
    envelope_version="1",
    schema_version="1",
    **overrides,
):
    env = {
        "envelope_version": envelope_version,
        "event_type": event_type,
        "schema_version": schema_version,
        "tenant_id": tenant_id,
        "occurred_at": occurred_at,
        "trace_id": trace_id,
        "source": source,
        "payload": payload or {},
    }
    env.update(overrides)
    return {k: v for k, v in env.items() if v is not None}


def smoke_messages() -> list[dict]:
    """The three smoke envelopes (``scripts/01_smoke_publish.js:22-81``):
    US phones, international, chat.message with from/to_phone."""
    return [
        _msg(
            _envelope(
                payload={
                    "call_id": "call-smoke-1",
                    "caller": "(415) 555-0001",
                    "callee": "415-555-0002",
                    "duration": 120,
                    "status": "completed",
                }
            ),
            "m-smoke-1",
        ),
        _msg(
            _envelope(
                payload={
                    "call_id": "call-smoke-2",
                    "caller": "+44 20 7123 4567",
                    "callee": "555.123.4567",
                    "duration": 300,
                    "status": "completed",
                }
            ),
            "m-smoke-2",
        ),
        _msg(
            _envelope(
                event_type="chat.message",
                payload={
                    "message_id": "msg-smoke-1",
                    "from_phone": "+1-555-987-6543",
                    "to_phone": "not-a-phone",
                    "channel": "sms",
                    "text_length": 42,
                },
            ),
            "m-smoke-3",
        ),
    ]


def duplicate_messages(copies: int = 5) -> list[dict]:
    """Identical envelopes per key for the three key kinds
    (``scripts/02_idempotency_test.js:87-119``) — expect 1 row each."""
    out = []
    kinds = [
        ({"call_id": "dup-call-1"}, None),
        ({"message_id": "dup-msg-1"}, None),
        ({}, "dup-trace-1"),
    ]
    for i, (payload, trace) in enumerate(kinds):
        for c in range(copies):
            out.append(
                _msg(
                    _envelope(payload=payload, trace_id=trace, source="idempotency-test"),
                    f"m-dup-{i}-{c}",
                )
            )
    return out


def malformed_messages() -> list[dict]:
    """Terminal-error corpus (FIXTURES.md A3.4)."""
    return [
        # missing tenant_id (scripts/03_dlq_and_replay.js:15-29)
        _msg(_envelope(tenant_id=None, payload={"call_id": "bad-1"}), "m-bad-tenant"),
        # bad timestamp (src/unit.test.js:26-29)
        _msg(_envelope(occurred_at="not-a-date", payload={"call_id": "bad-2"}), "m-bad-ts"),
        # no idempotency key anywhere (src/unit.test.js:59-62)
        _msg(_envelope(payload={"other": "x"}), "m-bad-nokey"),
        # non-JSON data (src/app.test.js:67-75)
        _msg("this is not json", "m-bad-json"),
        # empty-string required field (truthiness check, src/validation.js:14)
        _msg(_envelope(event_type="", payload={"call_id": "bad-3"}), "m-bad-empty"),
    ]


def fixture_messages() -> list[dict]:
    return smoke_messages() + duplicate_messages() + malformed_messages()


def fixture_df(spark: SparkSession, msgs: list[dict] | None = None) -> DataFrame:
    msgs = msgs if msgs is not None else fixture_messages()
    return spark.createDataFrame(
        [(m["data"], m["attributes"], m["message_id"], m.get("ordering_key")) for m in msgs],
        schema=RAW_MESSAGE_SCHEMA,
    )


def messages_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table -> raw Pub/Sub-shaped messages, built fully JVM-side.

    Each event becomes an envelope whose payload carries a call_id (so the
    idempotency key resolves) plus the event's props JSON value; base64 and
    JSON assembly use native ``to_json``/``base64`` so generation itself is a
    scale-safe narrow map.
    """
    from drive_health_etl_spark.sources.tables import load_table

    # Testdata is one single-row-group parquet file -> one scan partition;
    # spread the (CPU-bound) JSON/base64 assembly across cores. At production
    # scale the source arrives in many splits and this repartition goes away.
    events = load_table(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    envelope = F.to_json(
        F.struct(
            F.lit("1").alias("envelope_version"),
            F.col("event_type"),
            F.lit("1").alias("schema_version"),
            F.concat(F.lit("org-"), (F.col("user_id") % 5).cast("string")).alias("tenant_id"),
            F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("occurred_at"),
            F.concat(F.lit("trace-"), F.col("event_id").cast("string")).alias("trace_id"),
            F.lit("events-replay").alias("source"),
            F.struct(
                F.concat(F.lit("call-"), F.col("event_id").cast("string")).alias("call_id"),
                F.col("value").alias("duration"),
                F.col("props").alias("props_json"),
            ).alias("payload"),
        )
    )
    return events.select(
        F.base64(envelope.cast("binary")).alias("data"),
        F.create_map(F.lit("origin"), F.lit("events")).alias("attributes"),
        F.concat(F.lit("m-"), F.col("event_id").cast("string")).alias("message_id"),
        F.lit(None).cast("string").alias("ordering_key"),
    )
