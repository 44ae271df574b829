"""Multimodal-column operators (north-star extension).

Design: media is an opaque ``binary`` column + a typed metadata struct
(modality, byte length, declared dims/duration). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` so each Python
worker touches a whole batch of blobs at once — the only viable shape at
100 TB (per-row UDFs would serialize per blob).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` unless a deterministic fake
is requested; everything around it — schema, batching, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_health_etl_spark.sources.tables import load_table

MEDIA_SCHEMA = (
    "doc_id long, modality string, content binary, byte_len long, "
    "width int, height int"
)

FEATURE_SCHEMA = (
    "doc_id long, modality string, byte_len long, n_frames int, feature array<double>"
)


def attach_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from documents: text bytes stand in for an opaque
    blob (deterministic; real pipelines read image/audio bytes the same way —
    as parquet/file binary columns)."""
    docs = load_table(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("byte_len"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
    )


def decode_image(blob: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an image blob. Real decode needs PIL/cv2 (not in container) —
    STUB. ``fake=True`` returns a deterministic pseudo-image derived from the
    blob bytes so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2, not available in this container; "
            "pass fake=True for the deterministic test double"
        )
    arr = np.frombuffer(blob[:64].ljust(64, b"\0"), dtype=np.uint8)
    return np.tile(arr, (8, 1))  # (8, 64) deterministic "image"


def extract_features(media: DataFrame, frame_stride: int = 64, fake_decode: bool = True) -> DataFrame:
    """Frame-sample + feature-extract via mapInPandas: per Arrow batch, decode
    each blob (stubbed), sample every ``frame_stride`` bytes as 'frames', emit
    an 8-dim feature vector (byte-histogram moments). Batch-shaped Python —
    the pattern scales: one Python roundtrip per ~10k rows, not per row."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, n_frames = [], []
            for blob in pdf["content"]:
                img = decode_image(bytes(blob), fake=fake_decode)
                frames = img.reshape(-1)[::frame_stride]
                n_frames.append(int(len(frames)))
                hist = np.bincount(frames % 8, minlength=8).astype("float64")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["byte_len"],
                    "n_frames": n_frames,
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the media pipeline: modality routing, byte
    lengths, simulated frame counts — everything up to the decode boundary."""
    media = attach_media(spark, sf_dir)
    return media.select(
        "doc_id",
        "modality",
        "byte_len",
        F.floor(F.col("byte_len") / 64).cast("int").alias("n_sampled_frames"),
        F.ceil(F.col("byte_len") / 256).cast("long").alias("n_chunks"),
    )


MULTIMODAL_BYTES_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(floor(octet_length(encode(text)) / 64.0) AS INTEGER) AS n_sampled_frames,
       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "multimodal_bytes": (multimodal_bytes, MULTIMODAL_BYTES_SQL),
}
