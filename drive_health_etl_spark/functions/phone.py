"""E.164 phone normalization (reference ``src/phone.js:15-29``) — the one real UDF.

The reference uses libphonenumber-js with default region US: parse, and if
valid, format E.164; anything unparseable/invalid becomes NULL (never an
error). We use the `phonenumbers` PyPI port when present; this container
doesn't ship it, so the fallback is a small deterministic normalizer that
covers the reference's golden corpus exactly
(``scripts/01_smoke_publish.js:156-161``, ``src/unit.test.js:32-40``):

    '(415) 555-0001'  -> '+14155550001'
    '415-555-0002'    -> '+14155550002'
    '+44 20 7123 4567'-> '+442071234567'
    '555.123.4567'    -> '+15551234567'
    '+1-555-987-6543' -> '+15559876543'
    'not-a-phone'     -> NULL

Implemented as an Arrow-vectorized pandas_udf: at 100 TB this is the only
Python-boundary crossing in the ingest chain, amortized over Arrow batches.
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover — not installed in this container
    import phonenumbers as _phonenumbers
except ImportError:
    _phonenumbers = None

DEFAULT_PHONE_REGION = os.environ.get("DEFAULT_PHONE_REGION", "US")

_NON_DIALABLE = re.compile(r"[^\d+]")
_HAS_LETTER = re.compile(r"[a-zA-Z]")


def normalize_phone_py(phone: object, region: str = DEFAULT_PHONE_REGION) -> str | None:
    """Pure-Python normalizer (driver-side / test use; UDF wraps the same logic)."""
    if phone is None or not isinstance(phone, str) or not phone.strip():
        return None
    if _phonenumbers is not None:
        try:
            parsed = _phonenumbers.parse(phone, region)
            if _phonenumbers.is_valid_number(parsed):
                return _phonenumbers.format_number(parsed, _phonenumbers.PhoneNumberFormat.E164)
            return None
        except Exception:
            return None
    return _fallback_normalize(phone, region)


def _fallback_normalize(phone: str, region: str) -> str | None:
    if _HAS_LETTER.search(phone):
        return None
    s = phone.strip()
    plus = s.startswith("+")
    digits = _NON_DIALABLE.sub("", s).lstrip("+")
    if not digits.isdigit():
        return None
    if plus:
        # International format: country code + subscriber, 8-15 digits total.
        if 8 <= len(digits) <= 15 and digits[0] != "0":
            return "+" + digits
        return None
    if region == "US":
        if len(digits) == 11 and digits[0] == "1":
            digits = digits[1:]
        # NANP: 10 digits, area code cannot start with 0/1. (libphonenumber-js,
        # which the reference uses, accepts exchanges starting with 1 — e.g.
        # the golden pair '555.123.4567' — so we don't check the exchange.)
        if len(digits) == 10 and digits[0] not in "01":
            return "+1" + digits
        return None
    return None


@F.pandas_udf(T.StringType())
def normalize_phone_udf(phones: pd.Series) -> pd.Series:
    return phones.map(normalize_phone_py)


PHONE_FIELDS = ("caller", "callee", "from_phone", "to_phone")  # src/phone.js:38


def process_payload_py(payload_json: object) -> object:
    """Rewrite present phone fields inside a JSON payload (``src/phone.js:36-56``).

    Shallow-copy semantics: only the four phone fields are touched; nested
    objects, numbers, and key order survive the round-trip. Unparseable
    payloads pass through untouched (validation already flagged them).
    """
    import json

    if payload_json is None or not isinstance(payload_json, str):
        return payload_json
    try:
        obj = json.loads(payload_json)
    except (ValueError, TypeError):
        return payload_json
    if not isinstance(obj, dict):
        return payload_json
    changed = False
    for field in PHONE_FIELDS:
        v = obj.get(field)
        # Reference guards with JS truthiness (`if (processed.caller)`,
        # src/phone.js:40): ''/0/null/false stay untouched. ([]/{} are truthy
        # in JS but falsy in Python — handled explicitly.)
        if v or isinstance(v, (list, dict)):
            obj[field] = normalize_phone_py(v)
            changed = True
    return json.dumps(obj, separators=(",", ":")) if changed else payload_json


@F.pandas_udf(T.StringType())
def process_payload_udf(payloads: pd.Series) -> pd.Series:
    return payloads.map(process_payload_py)
