"""Scalar-function layer (SURVEY.md §2.3).

Everything here is a native Column expression except phone normalization,
which is the one genuine UDF (needs libphonenumber-class parsing).
"""

from drive_health_etl_spark.functions.keys import idempotency_key
from drive_health_etl_spark.functions.phone import normalize_phone_udf, normalize_phone_py
from drive_health_etl_spark.functions.sampling import sample_hash_ratio, should_sample

__all__ = [
    "idempotency_key",
    "normalize_phone_udf",
    "normalize_phone_py",
    "sample_hash_ratio",
    "should_sample",
]
