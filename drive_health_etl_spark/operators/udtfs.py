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


QUERIES: dict[str, tuple] = {
    # identical semantics to the native operator -> identical oracle
    "u4_udtf_chunks": (u4_udtf_chunks, CORPUS_CHUNK_SQL),
}
