"""Invariant tests for the embedding ML-pipeline operators (kNN eval, int8
quantization). Value equality is the DuckDB oracle's job; these pin the
mathematical invariants that hold at any scale."""

from __future__ import annotations

from drive_health_etl_spark.operators.similarity import (
    KNN_EVAL_N,
    emb_quantize_stats,
    sim_knn_classify,
)


def test_knn_accuracy_bounds(spark, sf_dir):
    rows = sim_knn_classify(spark, sf_dir).collect()
    assert rows, "eval report must not be empty"
    assert sum(r["n_eval"] for r in rows) == KNN_EVAL_N
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_eval"]
        assert 0.0 <= r["accuracy"] <= 1.0


def test_quantization_error_bounded(spark, sf_dir):
    rows = emb_quantize_stats(spark, sf_dir).collect()
    assert rows, "quantization report must not be empty"
    for r in rows:
        assert r["mse"] >= 0.0
        # per-element |x - round(x·s)/s| <= 0.5/s = max_abs/254, so the MSE
        # cannot exceed that bound squared
        bound = (r["max_abs"] / 254.0) ** 2
        assert r["mse"] <= bound + 1e-9, (r["vec_id"], r["mse"], bound)


def test_semdedup_scaled_matches_fixed_k_at_small_n(spark, sf_dir):
    """dedup_semantic_scaled's k = max(N_CELLS, n/256) collapses to N_CELLS
    at test scale, so the production-scaled variant must reproduce the
    oracle-checked fixed-k results exactly (same fit, same pairs)."""
    from drive_health_etl_spark.operators.similarity import (
        dedup_semantic,
        dedup_semantic_scaled,
    )

    a = sorted(map(tuple, dedup_semantic(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_semantic_scaled(spark, sf_dir).collect()))
    assert a == b
