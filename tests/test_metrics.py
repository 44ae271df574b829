from __future__ import annotations

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
