"""Source/sink format coverage (SURVEY.md §2.1): the engine reads and writes
parquet (primary), ORC, JSON, and CSV with schema preservation — the Spark
counterparts of the reference's Pub/Sub-in / BigQuery-out boundary. JDBC is
config-only here (no database in the container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").limit(200).cache()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, events, tmp_path, fmt):
    out = str(tmp_path / fmt)
    # text formats need an explicit micro-precision timestamp format — the
    # default SSS (millis) silently truncates microseconds on write. NTZ
    # columns (our session default timestampType) read a *separate* option,
    # timestampNTZFormat; set both so the test is type-agnostic.
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    writer = events.write.mode("overwrite").format(fmt)
    if fmt in ("csv", "json"):
        writer = (writer.option("header", True)
                  .option("timestampFormat", ts_fmt)
                  .option("timestampNTZFormat", ts_fmt))
    writer.save(out)

    reader = spark.read.format(fmt).schema(events.schema)
    if fmt in ("csv", "json"):
        reader = (reader.option("header", True)
                  .option("timestampFormat", ts_fmt)
                  .option("timestampNTZFormat", ts_fmt))
    back = reader.load(out)

    assert back.schema == events.schema
    a = sorted(map(tuple, events.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_without_schema_needs_inference_flag(spark, events, tmp_path):
    # documents the prod rule: explicit schema on text formats, no inference
    out = str(tmp_path / "csv_raw")
    events.write.mode("overwrite").option("header", True).csv(out)
    inferred = spark.read.option("header", True).csv(out)
    assert all(t == "string" for _c, t in inferred.dtypes)  # no schema -> all strings
