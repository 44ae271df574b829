"""Unit tests for the scalar-function layer — mirrors the reference's
pure-function tests (``src/unit.test.js``) and phone golden pairs
(``scripts/01_smoke_publish.js:156-161``)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from drive_health_etl_spark.functions.keys import idempotency_key
from drive_health_etl_spark.functions.phone import normalize_phone_py, process_payload_py
from drive_health_etl_spark.functions.sampling import sample_hash_ratio, should_sample

GOLDEN_PHONES = [
    ("(415) 555-0001", "+14155550001"),
    ("415-555-0002", "+14155550002"),
    ("+44 20 7123 4567", "+442071234567"),
    ("555.123.4567", "+15551234567"),
    ("+1-555-987-6543", "+15559876543"),
    ("not-a-phone", None),
    ("", None),
    (None, None),
]


@pytest.mark.parametrize("raw,expected", GOLDEN_PHONES)
def test_phone_golden_pairs(raw, expected):
    assert normalize_phone_py(raw) == expected


def test_process_payload_preserves_structure():
    src = '{"call_id":"c1","caller":"(415) 555-0001","duration":120,"metadata":{"test":true,"batch":2}}'
    out = process_payload_py(src)
    import json

    obj = json.loads(out)
    assert obj["caller"] == "+14155550001"
    assert obj["duration"] == 120
    assert obj["metadata"] == {"test": True, "batch": 2}
    # payloads without phone fields pass through byte-identical
    assert process_payload_py('{"message_id":"m1"}') == '{"message_id":"m1"}'
    assert process_payload_py("not json") == "not json"


def test_process_payload_skips_falsy_fields():
    """Reference guards with JS truthiness (src/phone.js:40): ''/0/null/false
    phone fields are left untouched, not normalized to null."""
    import json

    src = '{"caller":"","callee":null,"from_phone":0,"to_phone":"415-555-0002"}'
    obj = json.loads(process_payload_py(src))
    assert obj["caller"] == ""
    assert obj["callee"] is None
    assert obj["from_phone"] == 0
    assert obj["to_phone"] == "+14155550002"


def reference_should_sample(key: str, rate: float) -> bool:
    """Direct port of src/sampling.js:15-24 for parity checking only."""
    if rate >= 1.0:
        return True
    if rate <= 0.0:
        return False
    h = hashlib.sha256(key.encode()).hexdigest()
    return int(h[:8], 16) / 0xFFFFFFFF < rate


def test_sampling_bit_exact_parity(spark):
    keys = [f"key-{i}" for i in range(500)] + ["call-123", "msg-abc", "trace-xyz"]
    rate = 0.5
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    rows = df.select(
        "key",
        should_sample("key", rate).alias("keep"),
        sample_hash_ratio("key").alias("ratio"),
    ).collect()
    for r in rows:
        assert r["keep"] == reference_should_sample(r["key"], rate), r["key"]
        expected_ratio = int(hashlib.sha256(r["key"].encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
        assert abs(r["ratio"] - expected_ratio) < 1e-12


def test_sampling_fast_paths(spark):
    df = spark.createDataFrame([("k1",), ("k2",)], "key string")
    assert df.filter(should_sample("key", 1.0)).count() == 2
    assert df.filter(should_sample("key", 0.0)).count() == 0
    # determinism: same key+rate -> same outcome across evaluations
    a = df.select(should_sample("key", 0.5).alias("s")).collect()
    b = df.select(should_sample("key", 0.5).alias("s")).collect()
    assert a == b


def test_idempotency_key_precedence(spark):
    rows = [
        ('{"call_id":"c1","message_id":"m1"}', "t1", "c1"),
        ('{"message_id":"m1"}', "t1", "m1"),
        ("{}", "t1", "t1"),
        ("{}", None, None),
        # JS-falsy fallthrough: empty-string components are "missing"
        ('{"call_id":"","message_id":"m2"}', "t1", "m2"),
        ('{"call_id":"","message_id":""}', "t2", "t2"),
        ('{"call_id":"","message_id":""}', "", None),
    ]
    df = spark.createDataFrame([(p, t) for p, t, _ in rows], "payload string, trace_id string")
    got = df.select(idempotency_key().alias("k")).collect()
    assert [r["k"] for r in got] == [e for _, _, e in rows]
