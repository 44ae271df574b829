"""Schemas for the pipeline layer (SURVEY.md §1, FIXTURES.md §A).

Envelope spec: reference ``src/validation.js:13``, ``README.md:148-157``.
Warehouse row: reference ``src/bq.js:20-35``, DDL ``README.md:86-92``.
Raw message shape: reference ``src/handler.js:43-44``, ``src/replay-dlq-job.js:27-53``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Pub/Sub-push-shaped raw message (FIXTURES.md A1). `data` is base64 JSON.
RAW_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("message_id", T.StringType(), True),
        T.StructField("ordering_key", T.StringType(), True),
    ]
)

# Decoded envelope (FIXTURES.md A2). Everything lands as parsed-but-untyped
# first (strings for versions) because the reference validates *presence*
# (truthiness) then casts at the sink (`src/bq.js:24-25`); payload stays a JSON
# string (open-world, per-event_type schema).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("envelope_version", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("schema_version", T.StringType(), True),
        T.StructField("tenant_id", T.StringType(), True),
        T.StructField("occurred_at", T.StringType(), True),
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),  # kept as JSON text
    ]
)

# Warehouse fact-table row (FIXTURES.md A4): flat, typed, append-only.
WAREHOUSE_SCHEMA = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("schema_version", T.LongType(), True),
        T.StructField("envelope_version", T.LongType(), True),
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("occurred_at", T.TimestampType(), False),
        T.StructField("received_at", T.TimestampType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("sampled", T.BooleanType(), False),
        T.StructField("idempotency_key", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
    ]
)

REQUIRED_ENVELOPE_FIELDS = [
    "envelope_version",
    "event_type",
    "schema_version",
    "tenant_id",
    "occurred_at",
    "payload",
]

# Per-row processing status — the reference's HTTP status codes become data
# (SURVEY.md §2.10; `src/handler.js:102-107`): control flow -> a column.
STATUS_OK = "OK"  # 204
STATUS_SAMPLED_OUT = "SAMPLED_OUT"  # 204, not persisted
STATUS_DUPLICATE = "DUPLICATE"  # 204 via insertId dedup
STATUS_FORMAT_ERROR = "FORMAT_ERROR"  # 422 — undecodable message
STATUS_VALIDATION_ERROR = "VALIDATION_ERROR"  # 400 — missing/invalid fields
STATUS_TRANSIENT_ERROR = "TRANSIENT_ERROR"  # 503 — retryable

TERMINAL_STATUSES = (STATUS_FORMAT_ERROR, STATUS_VALIDATION_ERROR)
