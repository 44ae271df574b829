from __future__ import annotations

import pytest

from drive_health_etl_spark.operators.multimodal import (
    attach_media,
    decode_image,
    extract_features,
)


def test_decode_refuses_unknown_format_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n...")  # compressed formats need PIL


def test_decode_netpbm_real():
    import numpy as np

    # P6 RGB 2x2 with a header comment
    p6 = b"P6\n# test\n2 2\n255\n" + bytes(range(12))
    img = decode_image(p6)
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] == 0 and img[1, 1, 2] == 11
    # P5 grayscale 3x2
    p5 = b"P5\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    g = decode_image(p5)
    assert g.shape == (2, 3) and g[1, 2] == 60
    assert isinstance(img, np.ndarray)


def test_ppm_roundtrip_through_spark(spark, sf_dir):
    from drive_health_etl_spark.operators.multimodal import attach_ppm_images

    blob = bytes(attach_ppm_images(spark, sf_dir).first()["content"])
    img = decode_image(blob)  # real decode of the Spark-built blob
    assert img.ndim == 3 and img.shape[2] == 3


def test_decode_fake_deterministic():
    a = decode_image(b"hello world", fake=True)
    b = decode_image(b"hello world", fake=True)
    assert a.shape == (8, 64) and (a == b).all()


def test_media_schema_and_feature_plumbing(spark, sf_dir):
    media = attach_media(spark, sf_dir)
    row = media.first()
    assert isinstance(row["content"], bytearray | bytes)
    assert row["byte_len"] == len(row["content"])
    assert row["modality"] in ("image", "audio", "video")

    feats = extract_features(media.limit(20))
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized histogram
        assert r["n_frames"] >= 1


def test_feature_extraction_deterministic(spark, sf_dir):
    media = attach_media(spark, sf_dir).limit(10)
    a = sorted(map(tuple, extract_features(media).select("doc_id", "feature").collect()))
    b = sorted(map(tuple, extract_features(media).select("doc_id", "feature").collect()))
    assert [(d, tuple(f)) for d, f in a] == [(d, tuple(f)) for d, f in b]


def test_decode_wav_real():
    from drive_health_etl_spark.operators.multimodal import (
        WAV_RATE,
        _wav_header,
        decode_audio,
    )

    blob = _wav_header() + bytes(range(256))
    rate, samples = decode_audio(blob)
    assert rate == WAV_RATE
    assert len(samples) == 256 and samples[255] == 255
    import pytest

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3data....")


def test_decode_video_frame_walk():
    from drive_health_etl_spark.operators.multimodal import decode_video

    frame = b"P6\n2 2\n255\n" + bytes(range(12))
    frames = decode_video(frame * 3)
    assert len(frames) == 3
    assert all(f.shape == (2, 2, 3) for f in frames)
    assert frames[2][1, 1, 2] == 11
    import pytest

    with pytest.raises(ValueError):
        decode_video(frame + b"garbage")


def test_resize_nearest_neighbor():
    import numpy as np

    from drive_health_etl_spark.operators.multimodal import resize_image

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    small = resize_image(img)
    assert small.shape == (3, 2, 3)  # ceil(5/2) x ceil(4/2)
    assert (small[0, 0] == img[0, 0]).all()
    assert (small[1, 1] == img[2, 2]).all()


def test_binary_file_source_feeds_real_decode(spark, sf_dir, tmp_path):
    """End-to-end real-file path: PPM blobs written as FILES on disk, read
    back through Spark's binaryFile source (path/length/content columns),
    decoded with the numpy NetPBM codec — the exact ingestion shape a
    production image corpus uses (files in object storage, opaque binary
    column + metadata in the DataFrame)."""
    import os

    from pyspark.sql import functions as F

    from drive_health_etl_spark.operators.multimodal import attach_ppm_images, decode_image

    blobs = attach_ppm_images(spark, sf_dir).limit(20).collect()
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    for r in blobs:
        (img_dir / f"doc_{r['doc_id']:06d}.ppm").write_bytes(bytes(r["content"]))

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(str(img_dir))
        .select("path", "length", "content")
    )
    rows = df.collect()
    assert len(rows) == len(blobs)
    # binaryFile's length metadata matches the real file bytes
    assert all(r["length"] == len(bytes(r["content"])) for r in rows)
    # every file decodes through the REAL codec with the right raster shape
    by_id = {r["doc_id"]: bytes(r["content"]) for r in blobs}
    for r in rows:
        doc_id = int(os.path.basename(r["path"]).split("_")[1].split(".")[0])
        img = decode_image(bytes(r["content"]))
        assert img.shape == (doc_id % 12 + 4, doc_id % 16 + 4, 3)
        assert bytes(r["content"]) == by_id[doc_id]


def test_dhash_bands_known_answers():
    """dHash bit rule on crafted rasters: a left-to-right dark->bright
    gradient sets every comparable bit 0 (right cell brighter), the reverse
    gradient sets them 1, and a constant image sets none."""
    import numpy as np

    from drive_health_etl_spark.operators.multimodal import _dhash_bands

    h, w = 16, 18  # every one of the 8x9 cells populated
    ramp = np.tile(np.arange(w, dtype=np.uint8) * 10, (h, 1))
    img_up = np.stack([ramp] * 3, axis=2)
    assert _dhash_bands(img_up) == [0, 0, 0, 0]
    img_down = img_up[:, ::-1, :]
    assert _dhash_bands(img_down) == [0xFFFF] * 4
    const = np.full((h, w, 3), 7, dtype=np.uint8)
    assert _dhash_bands(const) == [0, 0, 0, 0]


def test_dhash_empty_cells_are_zero_bits():
    """A 4x4 image leaves grid cells empty; empty-cell comparisons must be
    bit 0, never an exception or NaN-dependent."""
    import numpy as np

    from drive_health_etl_spark.operators.multimodal import _dhash_bands

    img = np.random.default_rng(7).integers(0, 255, (4, 4, 3), dtype=np.uint8)
    bands = _dhash_bands(img)
    assert len(bands) == 4 and all(0 <= b <= 0xFFFF for b in bands)
