"""Schema-versioning parity (SURVEY.md §1.1): the reference stores
envelope_version/schema_version but never branches on them — unknown
versions and extra payload fields must flow through untouched, not error."""

from __future__ import annotations

import json

from drive_health_etl_spark.operators.ingest import ingest
from drive_health_etl_spark.sources import envelopes


def test_future_version_and_extra_fields_pass_through(spark):
    msgs = [
        envelopes._msg(
            envelopes._envelope(
                envelope_version="2",
                schema_version="9",
                payload={"call_id": "v2-call", "new_v2_field": {"deep": [1, 2]}},
            ),
            "m-v2",
        )
    ]
    res = ingest(envelopes.fixture_df(spark, msgs), normalize_phones=True)
    rows = res.warehouse.collect()
    assert len(rows) == 1 and res.dlq.count() == 0
    row = rows[0]
    assert row["envelope_version"] == 2 and row["schema_version"] == 9
    payload = json.loads(row["payload"])
    assert payload["new_v2_field"] == {"deep": [1, 2]}  # unknown fields survive


def test_unknown_envelope_field_ignored(spark):
    # an extra top-level envelope key must not break decoding
    import base64

    extra = {
        "envelope_version": "1",
        "event_type": "call.metadata",
        "schema_version": "1",
        "tenant_id": "org-x",
        "occurred_at": "2024-03-01T10:00:00.000Z",
        "payload": {"call_id": "c-extra"},
        "totally_new_header": "ignored",
    }
    msg = {
        "data": base64.b64encode(json.dumps(extra).encode()).decode(),
        "attributes": {},
        "message_id": "m-extra",
        "ordering_key": None,
    }
    res = ingest(envelopes.fixture_df(spark, [msg]), normalize_phones=False)
    assert res.warehouse.count() == 1 and res.dlq.count() == 0
