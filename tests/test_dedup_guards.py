"""Scale guards on the MinHash-LSH dedup path: the pathological all-identical
corpus (one LSH bucket holding everything) must stay bounded via BUCKET_CAP,
with the dropped tail observable through minhash_bucket_stats."""

from __future__ import annotations

import pytest

from drive_health_etl_spark.operators import dedup


@pytest.fixture()
def identical_corpus(spark, tmp_path):
    """3000 byte-identical documents -> every band hashes them into ONE
    bucket; uncapped pair expansion would be ~4.5M pairs per band."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, text, "en", "synthetic", len(text)) for i in range(1, 3001)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bucket_cap_bounds_pathological_corpus(spark, identical_corpus, monkeypatch):
    monkeypatch.setattr(dedup, "BUCKET_CAP", 50)
    pairs = dedup._build_minhash_pairs(spark, identical_corpus)
    # capped: C(50, 2) pairs, not C(3000, 2)
    assert pairs.count() == 50 * 49 // 2

    stats = dedup.minhash_bucket_stats(spark, identical_corpus, cap=50).collect()[0]
    assert stats["max_bucket"] == 3000
    # 4 bands x (3000 - 50) docs dropped — the "logged drop-count"
    assert stats["docs_dropped"] == 4 * (3000 - 50)


def test_bucket_cap_never_binds_on_testdata(spark, sf_dir):
    """On the real corpus the cap must be far above every bucket — capped and
    uncapped candidate sets are identical (oracle parity depends on this)."""
    stats = dedup.minhash_bucket_stats(spark, sf_dir).collect()[0]
    assert stats["docs_dropped"] == 0
    assert stats["max_bucket"] < dedup.BUCKET_CAP
