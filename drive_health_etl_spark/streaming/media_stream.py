"""Streaming media decode-on-arrival: Python codecs inside a micro-batch.

A multimodal training corpus arrives continuously; the decode/feature pass
must run per micro-batch, not as a nightly O(corpus) job. This operator is
the streaming composition of the batch codec suite: a file-source stream of
GIF blobs flows through the SAME Arrow-batched ``mapInPandas`` decode used
by the batch query (real LZW, ``gif_codec.py``), then into a streaming
aggregation by image geometry. ``mapInPandas`` on an unbounded DataFrame is
exactly the pattern's point — the decode is a stateless narrow map, so
Structured Streaming runs it per micro-batch with no state store, and the
downstream groupBy is the only stateful operator.

Driven to completion with availableNow + two source files (two
micro-batches); complete-mode output makes the final aggregate equal the
batch answer, which is what the DuckDB oracle recomputes from the raster
construction rule. Output values are exact integers (pixel-sum, not float
means), so the value-hash gate is solid.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.session import shuffle_partitions


def st_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the GIF fixture corpus (two parquet spool files -> two
    micro-batches), decode every blob with the real LZW codec inside the
    stream, and aggregate (width, height) -> (n_images, total_gray)."""
    from drive_health_etl_spark.operators.multimodal import attach_gif_images

    media = attach_gif_images(spark, sf_dir)

    src = tempfile.mkdtemp(prefix="dhe_media_src_")
    media.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    media.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, content binary")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drive_health_etl_spark.operators.gif_codec import decode_gif

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "gray_sum": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                idx, pal = decode_gif(bytes(blob))  # REAL LZW decode, in-stream
                h, w = idx.shape
                out["doc_id"].append(int(doc_id))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["gray_sum"].append(int(pal[idx][:, :, 0].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    decoded = stream.mapInPandas(op, schema="doc_id long, width int, height int, gray_sum long")
    agg = decoded.groupBy("width", "height").agg(
        F.count("*").alias("n_images"),
        F.sum("gray_sum").alias("total_gray"),
    )

    sink = f"media_out_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(src, ignore_errors=True)
    return spark.sql(f"SELECT width, height, n_images, total_gray FROM {sink}")


ST_MEDIA_DECODE_SQL = """
WITH img AS (
  SELECT doc_id,
         CAST(doc_id % 16 + 4 AS INTEGER) AS w,
         CAST(doc_id % 12 + 4 AS INTEGER) AS h,
         rpad(text || ' ', CAST((doc_id % 16 + 4) * (doc_id % 12 + 4) AS INTEGER),
              text || ' ') AS payload
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT doc_id, w, h, CAST(SUM(ord(substr(payload, u.i, 1))) AS BIGINT) AS gray_sum
  FROM img, UNNEST(generate_series(1, w * h)) AS u(i)
  GROUP BY doc_id, w, h
)
SELECT w AS width, h AS height, COUNT(*) AS n_images,
       CAST(SUM(gray_sum) AS BIGINT) AS total_gray
FROM px GROUP BY w, h
"""
