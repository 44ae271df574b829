"""DLQ replay + parking lot (SURVEY.md §3.3; reference ``src/replay-dlq-job.js``).

The reference's replay job pulls DLQ messages, increments a per-message
attempt counter carried in attributes, republisches to the main topic, and
parks messages that exceed ``MAX_REPLAY_ATTEMPTS`` (3). Spark-first this is a
batch routing job: one narrow pass, two outputs, no shuffle.

Attribute hygiene (F13): drop ``googclient_*`` and the old counter, then add
tracking attrs — ``map_filter`` + ``map_concat``, all JVM-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_REPLAY_ATTEMPTS = 3  # src/replay-dlq-job.js:14


def _attempts(df: DataFrame) -> F.Column:
    """Current attempt count: explicit column, else the ``x-replay-attempts``
    attribute, else 0 (``src/replay-dlq-job.js:23``)."""
    if "attempts" in df.columns:
        return F.coalesce(F.col("attempts"), F.lit(0))
    return F.coalesce(F.col("attributes").getItem("x-replay-attempts").cast("int"), F.lit(0))


def clean_attributes(attrs: F.Column) -> F.Column:
    """Drop googclient_* delivery metadata and the old counter (F13,
    ``src/replay-dlq-job.js:29-39``)."""
    return F.map_filter(
        attrs,
        lambda k, _v: (~k.startswith("googclient_")) & (k != F.lit("x-replay-attempts")),
    )


@dataclass
class ReplayResult:
    replay: DataFrame  # attempts+1, back to the ingest input
    parked: DataFrame  # attempts >= MAX -> parking lot with reason attrs


def route_dlq(dlq: DataFrame, max_attempts: int = MAX_REPLAY_ATTEMPTS) -> ReplayResult:
    """Split DLQ into replayable vs parked (``src/replay-dlq-job.js:81-92``).

    Ordering keys are carried through untouched (ST7). Replayed messages get
    ``x-replay-attempts`` incremented (F14); parked messages get
    ``x-parked-reason``/``x-original-attempts`` tracking attributes
    (``src/replay-dlq-job.js:42-47``).
    """
    attempts = _attempts(df=dlq)
    base = dlq.withColumn("_attempts", attempts)
    cleaned = clean_attributes(F.coalesce(F.col("attributes"), F.create_map().cast("map<string,string>")))

    replay = (
        base.filter(F.col("_attempts") < max_attempts)
        .withColumn(
            "attributes",
            F.map_concat(
                cleaned,
                F.create_map(
                    F.lit("x-replay-attempts"), (F.col("_attempts") + 1).cast("string")
                ),
            ),
        )
        .withColumn("attempts", (F.col("_attempts") + 1))
        .drop("_attempts")
    )
    parked = (
        base.filter(F.col("_attempts") >= max_attempts)
        .withColumn(
            "attributes",
            F.map_concat(
                cleaned,
                F.create_map(
                    F.lit("x-parked-reason"), F.lit("max-replay-attempts-exceeded"),
                    F.lit("x-original-attempts"), F.col("_attempts").cast("string"),
                ),
            ),
        )
        .withColumn("attempts", F.col("_attempts"))
        .drop("_attempts")
    )
    return ReplayResult(replay=replay, parked=parked)
