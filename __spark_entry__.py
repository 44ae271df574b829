"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with DuckDB oracle twins
(see ``drive_health_etl_spark/plans/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drive_health_etl_spark.plans import registry as _registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full ingest pipeline (decode -> validate -> sample ->
    normalize -> dedup -> warehouse rows) over envelopes derived from the
    sf0.001 events table, finished with the reference's verification
    aggregate (GROUP BY tenant, event_type COUNT(*))."""
    # The driver may pass a session without our nanos/timezone configs; apply
    # the ones that matter for reading the testdata.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _registry.pipeline_ingest_e2e(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
