from drive_health_etl_spark.operators.ingest import (
    decode_messages,
    ingest,
    normalize_payload_phones,
    to_warehouse_rows,
    validate_envelopes,
)

__all__ = [
    "decode_messages",
    "ingest",
    "normalize_payload_phones",
    "to_warehouse_rows",
    "validate_envelopes",
]
