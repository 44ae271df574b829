"""Deterministic hash sampling (reference ``src/sampling.js:15-24``).

Algorithm (bit-exact parity with the reference — SURVEY.md §7 hard part (a)):

    ratio = parseInt(first 8 hex chars of sha256(key), 16) / 0xffffffff
    keep  = ratio < rate

Note the divisor is 2^32 - 1 (0xffffffff), not 2^32. Rates <= 0 keep nothing,
>= 1 keep everything (fast-path constants, ``src/sampling.js:16-17`` — Catalyst
constant-folds the literal comparison so the fast path is free).

Entirely JVM-side: sha2 + conv + cast, no Python boundary. At 100 TB this is a
pure narrow map — no shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UINT32_MAX = float(0xFFFFFFFF)  # 4294967295.0 — divisor is 2^32 - 1, per reference


def sample_hash_ratio(key: Column | str) -> Column:
    """[0, 1] deterministic ratio from sha256 of the key (string column)."""
    key = F.col(key) if isinstance(key, str) else key
    first8 = F.substring(F.sha2(key, 256), 1, 8)
    return F.conv(first8, 16, 10).cast("double") / F.lit(UINT32_MAX)


def should_sample(key: Column | str, rate: float) -> Column:
    """Boolean keep/drop column; same key + rate always gives the same answer."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return sample_hash_ratio(key) < F.lit(float(rate))


def sample_hash_ratio_sql(key_sql: str) -> str:
    """DuckDB-oracle twin of :func:`sample_hash_ratio` (same bits)."""
    return f"(('0x' || substr(sha256({key_sql}), 1, 8))::UBIGINT / 4294967295.0)"
