"""Property-based tests (hypothesis) for the parity-critical pure functions —
the layer-1 unit tests of SURVEY.md §5 strengthened with generated inputs."""

from __future__ import annotations

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from drive_health_etl_spark.functions.phone import normalize_phone_py, process_payload_py


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_phone_normalizer_total_and_shaped(s):
    """Never raises; output is None or '+' + 8..15 digits."""
    out = normalize_phone_py(s)
    if out is not None:
        assert out.startswith("+")
        digits = out[1:]
        assert digits.isdigit() and 8 <= len(digits) <= 16


@given(
    st.dictionaries(
        st.sampled_from(["call_id", "caller", "callee", "duration", "nested", "x"]),
        st.one_of(
            st.text(max_size=20),
            st.integers(),
            st.none(),
            st.dictionaries(st.text(max_size=5), st.integers(), max_size=3),
        ),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_process_payload_preserves_non_phone_fields(payload):
    out = process_payload_py(json.dumps(payload))
    obj = json.loads(out)
    for k, v in payload.items():
        if k not in ("caller", "callee"):
            assert obj[k] == v
    assert set(obj) == set(payload)


@given(st.text(min_size=1, max_size=64), st.floats(min_value=0.01, max_value=0.99))
@settings(max_examples=200, deadline=None)
def test_sampling_reference_algorithm_deterministic(key, rate):
    """The reference algorithm (src/sampling.js:15-24) is a pure function of
    (key, rate); the Spark expression's bit-exactness vs this is asserted in
    test_functions.py — here we pin the reference implementation itself."""
    h = hashlib.sha256(key.encode()).hexdigest()
    ratio = int(h[:8], 16) / 0xFFFFFFFF
    assert 0.0 <= ratio <= 1.0
    assert (ratio < rate) == (int(h[:8], 16) < rate * 0xFFFFFFFF)
