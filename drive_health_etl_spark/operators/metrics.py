"""Observability operators (SURVEY.md §2.10).

The reference emits structured JSON logs per record (``src/logger.js:7-9``)
and derives metrics from them (``docs/monitoring.md:36-86``): insert-status
counts, observed sampling rate, batch throughput. Spark-first, these are
``observe()`` metrics attached to the flowing DataFrame — computed inside
the existing job (zero extra passes, aggregated on the driver via
accumulator semantics) — plus a status-count breakdown DataFrame for
dashboarding.

Status taxonomy: the reference's HTTP codes as data (schemas.STATUS_*);
insert_status ∈ {BATCHED, BATCH_SUCCESS, ...} collapses to the same set in
a single-engine world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from drive_health_etl_spark import schemas


def observe_ingest(validated: DataFrame, name: str = "ingest_metrics") -> tuple[DataFrame, Observation]:
    """Attach an Observation to a validated (status-bearing) DataFrame.

    After the consuming action completes, ``observation.get`` yields
    ``n_total / n_valid / n_format_error / n_validation_error`` — the
    monitoring counters of ``docs/monitoring.md`` — for free, computed
    during the same pass."""
    obs = Observation(name)
    observed = validated.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("status").isNull(), 1).otherwise(0)).alias("n_valid"),
        F.sum(
            F.when(F.col("status") == schemas.STATUS_FORMAT_ERROR, 1).otherwise(0)
        ).alias("n_format_error"),
        F.sum(
            F.when(F.col("status") == schemas.STATUS_VALIDATION_ERROR, 1).otherwise(0)
        ).alias("n_validation_error"),
    )
    return observed, obs


def status_breakdown(validated: DataFrame) -> DataFrame:
    """Dashboard query: rows per status (null status = OK)."""
    return (
        validated.withColumn("status", F.coalesce(F.col("status"), F.lit(schemas.STATUS_OK)))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


def observed_sampling_rate(warehouse: DataFrame) -> DataFrame:
    """A4: sampled-fraction per tenant over the warehouse table
    (``docs/monitoring.md:36-86``)."""
    return warehouse.groupBy("tenant_id").agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.col("sampled").cast("double")), 6).alias("observed_rate"),
    )


class BatchProgressListener:
    """Streaming observability (``docs/monitoring.md``'s batch-throughput
    counters, Spark-native): a ``StreamingQueryListener`` that records one
    summary dict per micro-batch — input rows, processed rows/sec, batch
    duration, and state-store row counts for stateful queries.

    Listener callbacks run on the driver off the hot path (event-bus
    delivery), so collection costs nothing per-record; this is the
    mechanism a production deployment bridges to its metrics system, and
    the in-memory list here is the test/dashboard seam. Instantiate via
    :func:`attach_progress_listener` (the concrete class subclasses the
    PySpark listener ABC at call time so importing this module never
    requires a live streaming context)."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def _record(self, progress) -> None:
        if progress is None:
            return
        self.batches.append(
            {
                "batch_id": progress.batchId,
                "num_input_rows": progress.numInputRows,
                "rows_per_sec": progress.processedRowsPerSecond,
                "duration_ms": (progress.durationMs or {}).get("triggerExecution"),
                "state_rows": sum(
                    s.numRowsTotal for s in (progress.stateOperators or [])
                ),
            }
        )


def attach_progress_listener(spark):
    """Create, register and return a :class:`BatchProgressListener` bound to
    ``spark``'s streaming event bus. Caller is responsible for
    ``spark.streams.removeListener(listener)`` when done (tests do)."""
    from pyspark.sql.streaming import StreamingQueryListener

    sink = BatchProgressListener()

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:  # noqa: D102
            pass

        def onQueryProgress(self, event) -> None:  # noqa: D102
            sink._record(event.progress)

        def onQueryIdle(self, event) -> None:  # noqa: D102
            pass

        def onQueryTerminated(self, event) -> None:  # noqa: D102
            pass

    listener = _Listener()
    spark.streams.addListener(listener)
    sink.listener = listener
    return sink
