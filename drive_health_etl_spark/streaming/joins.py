"""Stream-stream join (Structured Streaming's hardest primitive, ST [ext]).

Purchase attribution: each click joined to purchases by the same user within
30 minutes AFTER the click. Both sides are streams; Spark buffers each side
in watermark-bounded state and emits matches as they arrive. The time-range
predicate is what bounds state: rows age out once the other side's watermark
passes their join window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment: join a stream against a static dimension
    snapshot (the lookup-table pattern — user profile, tenant config). The
    static side is broadcast per micro-batch, so the streaming side stays a
    stateless narrow map: no watermark, no join state, unlike the
    stream-stream path below. Left join preserves stream rows with no dim
    match (late-provisioned keys)."""
    return stream.join(F.broadcast(dim), key, "left")


def purchase_attribution(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """clicks/purchases: streaming DataFrames with (event_id, user_id, ts).
    Returns (click_id, purchase_id, user_id, lag_us) for purchases within
    30 min after the click."""
    c = (
        clicks.withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return c.join(p, cond, "inner").select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
