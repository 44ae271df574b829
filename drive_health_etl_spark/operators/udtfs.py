"""Python UDTF surface (Spark 4, SURVEY.md §2.9 family): the one user-function
API the engine exposes that isn't covered by scalar pandas_udf (U1),
grouped-map/cogroup (``operators/grouped_pandas.py``) or mapInPandas
(``operators/multimodal.py``). Like those modules, this is a deliberate
API-surface exercise: the chunker's SEMANTICS are identical to the native
``corpus_chunk_windows`` (same oracle SQL), so the correctness gate checks the
UDTF machinery itself — per-row table emission through a SQL ``LATERAL`` join.

Scale shape: a UDTF is a narrow per-partition map (no shuffle); rows stream
through the Python worker in Arrow batches. The native expression variant
remains the hot-path recommendation — this surface exists for logic that
genuinely needs imperative per-row expansion (tokenizers with carried state,
generators with data-dependent fan-out).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from drive_health_etl_spark.operators.corpus import CHUNK_LEN, CHUNK_STRIDE, CORPUS_CHUNK_SQL
from drive_health_etl_spark.sources.tables import load_table


class ChunkWindowsUDTF:
    """Sliding token-window chunker: one output row per CHUNK_LEN-token
    window at CHUNK_STRIDE spacing (trailing partial window kept) — the
    imperative twin of ``corpus_chunk_windows``' sequence/slice expression."""

    def eval(self, text):  # noqa: D102 — UDTF contract method
        toks = [t for t in re.split(r"\s+", text or "") if t]
        for idx, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            piece = toks[start : start + CHUNK_LEN]
            digest = hashlib.md5(" ".join(piece).encode("utf-8")).hexdigest()
            yield idx, len(piece), digest


def u4_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document via the Python UDTF through SQL ``LATERAL``."""
    from pyspark.sql.functions import udtf

    # Arrow-batched UDTF execution: row-pickled transfer is the same
    # per-row-Python trap the engine bans for scalar UDFs.
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs.createOrReplaceTempView("_udtf_docs")
    # decorate at call time: parsing the DDL return type needs a live session
    chunker = udtf(
        ChunkWindowsUDTF,
        returnType="chunk_idx int, n_tokens int, chunk_md5 string",
    )
    spark.udtf.register("chunk_windows_udtf", chunker)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5
        FROM _udtf_docs d, LATERAL chunk_windows_udtf(d.text) c
        """
    )


def _base36(n: int) -> str:
    digits = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(digits[r])
    return "".join(reversed(out))


def u6_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``): encode
    order keys to base-36 short codes in Python, then count codes per
    leading digit. The oracle recomputes the same encoding natively in
    DuckDB (``to_base``), so the gate verifies the Arrow UDF transport +
    execution path bit-for-bit.

    Surface exercise like u4/u5: Arrow batching removes the pickle
    serialization tax of classic Python UDFs, but the code still runs
    row-at-a-time in Python — native ``conv(key, 10, 36)`` is the hot-path
    twin; this path exists for logic with no native equivalent."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    b36 = udf(_base36, "string", useArrow=True)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(b36(F.col("o_orderkey")).alias("code"))
        .groupBy(F.substring("code", 1, 1).alias("lead"))
        .agg(F.count("*").alias("n"), F.max("code").alias("max_code"))
    )


U6_ARROW_UDF_SQL = """
SELECT substr(to_base(o_orderkey, 36), 1, 1) AS lead, COUNT(*) AS n,
       MAX(to_base(o_orderkey, 36)) AS max_code
FROM orders GROUP BY 1
"""


def u7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface: per-batch blob statistics computed ZERO-COPY
    on the Arrow RecordBatch (no pandas materialization — the lowest-
    overhead Python batch API, right for byte-wrangling over binary
    columns). Each batch emits per-modality partials; a JVM-side groupBy
    folds them — the partial-aggregate shape that keeps Python work
    embarrassingly parallel and the shuffle tiny.

    Semantics are deliberately reproducible natively (octet lengths), so
    the oracle checks the Arrow transport + batch iteration machinery."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    from drive_health_etl_spark.operators.multimodal import attach_media

    def op(batches):
        for batch in batches:
            t = pa.table(batch)
            lens = pc.binary_length(t.column("content"))
            grouped = (
                t.append_column("blen", lens)
                .group_by("modality")
                .aggregate([("blen", "sum"), ("blen", "max"), ("blen", "count")])
            )
            out = grouped.rename_columns(["modality", "bytes_part", "max_part", "n_part"])
            # binary_length is int32; the declared Spark schema is long —
            # cast explicitly, Arrow-to-JVM transfer does not coerce widths
            yield from out.cast(
                pa.schema(
                    [
                        ("modality", pa.string()),
                        ("bytes_part", pa.int64()),
                        ("max_part", pa.int64()),
                        ("n_part", pa.int64()),
                    ]
                )
            ).to_batches()

    media = attach_media(spark, sf_dir).select("modality", "content")
    partials = media.mapInArrow(
        op, "modality string, bytes_part long, max_part long, n_part long"
    )
    return partials.groupBy("modality").agg(
        F.sum("bytes_part").alias("total_bytes"),
        F.max("max_part").alias("max_bytes"),
        F.sum("n_part").alias("n_blobs"),
    )


U7_MAP_IN_ARROW_SQL = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       MAX(strlen(text)) AS max_bytes,
       COUNT(*) AS n_blobs
FROM documents GROUP BY 1
"""


class TopTokensUDTF:
    """Polymorphic UDTF (Spark 4 ``analyze`` static method): output schema is
    computed AT ANALYSIS TIME from the constant argument — here, ``k`` token
    columns plus a count. The dynamic-schema surface static UDTFs (u4) can't
    express."""

    @staticmethod
    def analyze(text, k):  # noqa: D102 — UDTF analysis contract
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import IntegerType, StringType, StructType

        schema = StructType()
        for i in range(k.value):
            schema = schema.add(f"tok{i}", StringType())
        return AnalyzeResult(schema.add("n_tokens", IntegerType()))

    def eval(self, text, k):  # noqa: D102 — UDTF contract method
        # in eval the argument is the plain value (analyze sees the
        # AnalyzeArgument wrapper with .value)
        toks = [t for t in re.split(r"\s+", text or "") if t]
        head = toks[:k]
        head += [None] * (k - len(head))
        yield (*head, len(toks))


def u9_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-tokens + count per document via a polymorphic UDTF whose
    column list is derived in ``analyze()`` from the literal ``k`` — the
    Spark 4 dynamic-schema UDTF surface, oracle-checked against plain
    array indexing."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs.createOrReplaceTempView("_udtf_docs9")
    spark.udtf.register("top_tokens_udtf", udtf(TopTokensUDTF))
    return spark.sql(
        """
        SELECT d.doc_id, t.tok0, t.tok1, t.tok2, t.n_tokens
        FROM _udtf_docs9 d, LATERAL top_tokens_udtf(d.text, 3) t
        """
    )


U9_UDTF_POLY_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id, toks[1] AS tok0, toks[2] AS tok1, toks[3] AS tok2,
       CAST(len(toks) AS INTEGER) AS n_tokens
FROM t
"""


def u8_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().applyInArrow`` surface (Spark 4's zero-copy grouped-map):
    per event type, the top-3 events by (value desc, event_id asc), ranked —
    computed with pyarrow.compute sort+slice on the group's RecordBatch, no
    pandas materialization. The deliberate semantics twin of a ROW_NUMBER
    window so the oracle checks the grouped-Arrow transport end to end.

    Scale: one shuffle on the (enum-sized) group key; each group streams
    through Python as Arrow buffers. For high-cardinality keys this is the
    API for per-key logic Catalyst can't express; for THIS query a window
    is the native plan — the point here is exercising the surface."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    from drive_health_etl_spark.sources.tables import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )

    def top3(table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            table,
            sort_keys=[("value", "descending"), ("event_id", "ascending")],
        )[:3]
        picked = table.take(idx)
        return picked.append_column(
            "rnk", pa.array(range(1, picked.num_rows + 1), pa.int32())
        )

    return events.groupBy("event_type").applyInArrow(
        top3, "event_type string, event_id long, value double, rnk int"
    )


U8_APPLY_IN_ARROW_SQL = """
SELECT event_type, event_id, value, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
  FROM events WHERE value IS NOT NULL
) WHERE rnk <= 3
"""


QUERIES: dict[str, tuple] = {
    # identical semantics to the native operator -> identical oracle
    "u4_udtf_chunks": (u4_udtf_chunks, CORPUS_CHUNK_SQL),
    "u6_arrow_udf": (u6_arrow_udf, U6_ARROW_UDF_SQL),
    "u7_map_in_arrow": (u7_map_in_arrow, U7_MAP_IN_ARROW_SQL),
    "u8_apply_in_arrow": (u8_apply_in_arrow, U8_APPLY_IN_ARROW_SQL),
    "u9_udtf_polymorphic": (u9_udtf_polymorphic, U9_UDTF_POLY_SQL),
}
