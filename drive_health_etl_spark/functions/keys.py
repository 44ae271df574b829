"""Idempotency-key computation (reference ``src/validation.js:33-42``).

Precedence: payload.call_id > payload.message_id > trace_id; all-null is a
validation error (routed to DLQ by the caller, not raised). Pure column
expression over the JSON payload string — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def idempotency_key(payload_json: Column | str = "payload", trace_id: Column | str = "trace_id") -> Column:
    payload_json = F.col(payload_json) if isinstance(payload_json, str) else payload_json
    trace_id = F.col(trace_id) if isinstance(trace_id, str) else trace_id
    # The reference falls through on JS-falsy components
    # (`payload.call_id || payload.message_id || traceId`,
    # src/validation.js:33-42): an empty-string call_id is "missing", not a
    # valid key — nullif('') mirrors that, and an all-empty row coalesces to
    # NULL so the caller's validation-error routing fires.
    return F.coalesce(
        F.nullif(F.get_json_object(payload_json, "$.call_id"), F.lit("")),
        F.nullif(F.get_json_object(payload_json, "$.message_id"), F.lit("")),
        F.nullif(trace_id, F.lit("")),
    )
