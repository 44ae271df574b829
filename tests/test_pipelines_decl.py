"""Spark Declarative Pipelines (pyspark.pipelines) authoring + local-runner
tests. The full `spark-pipelines` runner needs Spark Connect (grpcio, absent
here — honestly gated); these pin the parts that ARE exercised: decorator
registration, graph metadata, declaration-order execution, and
materialization semantics."""

from __future__ import annotations

from pyspark.pipelines.output import MaterializedView, Table, TemporaryView

from drive_health_etl_spark.pipelines_decl import (
    define_warehouse_pipeline,
    run_local,
)
from tests.conftest import SF_DIR


def test_graph_registers_outputs_and_flows(spark):
    reg = define_warehouse_pipeline(spark, SF_DIR)
    assert set(reg.outputs) == {"raw_events", "cleaned_events", "daily_rollup"}
    assert isinstance(reg.outputs["raw_events"], TemporaryView)
    assert isinstance(reg.outputs["cleaned_events"], MaterializedView)
    assert isinstance(reg.outputs["daily_rollup"], Table)
    assert reg.outputs["daily_rollup"].partition_cols == ["event_date"]
    assert reg.outputs["daily_rollup"].format == "parquet"
    # one flow per output, declaration order = dependency order
    assert [f.target for f in reg.flows] == [
        "raw_events",
        "cleaned_events",
        "daily_rollup",
    ]
    # declaration must not execute anything: flows carry thunks
    assert all(callable(f.func) for f in reg.flows)


def test_local_runner_materializes_and_orders(spark, tmp_path):
    reg = define_warehouse_pipeline(spark, SF_DIR)
    results = run_local(spark, reg, str(tmp_path))
    # materialized outputs exist on disk, partitioned as declared
    rollup_dir = tmp_path / "daily_rollup"
    assert any(p.name.startswith("event_date=") for p in rollup_dir.iterdir())
    # downstream read the MATERIALIZED upstream (row counts consistent)
    n_clean = results["cleaned_events"].count()
    n_raw = results["raw_events"].count()
    assert 0 < n_clean <= n_raw
    total_from_rollup = (
        results["daily_rollup"].groupBy().sum("n_events").collect()[0][0]
    )
    assert total_from_rollup == n_clean


def test_runner_is_rerunnable(spark, tmp_path):
    reg = define_warehouse_pipeline(spark, SF_DIR)
    a = run_local(spark, reg, str(tmp_path))["daily_rollup"].count()
    b = run_local(spark, reg, str(tmp_path))["daily_rollup"].count()
    assert a == b  # overwrite semantics: idempotent re-run
