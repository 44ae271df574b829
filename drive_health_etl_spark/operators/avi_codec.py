"""Motion-JPEG AVI container codec in pure Python/numpy.

A REAL video wire format on top of the in-repo baseline JPEG codec
(``jpeg_codec.py``): frames are entropy-coded JPEG, wrapped in the RIFF AVI
1.0 container per the public Microsoft Video-for-Windows layout (RIFF('AVI ')
-> LIST hdrl (avih, LIST strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER)) ->
LIST movi ('00dc' chunks) -> idx1). Files produced here open in any
standards-compliant MJPEG player; the decoder accepts third-party MJPEG AVIs
within the JPEG decoder's baseline-profile limits.

Why MJPEG and not H.264/mp3: MJPEG is intra-frame only — every frame is an
independent JPEG, which is exactly the property that makes distributed video
decode shard cleanly (any frame range decodes without reference frames; the
idx1 index gives byte offsets to split on). Inter-frame codecs need a
licensed/bitstream-heavy toolchain and still raise honestly in
``multimodal.decode_image``.

Extends the reference's opaque-media handling (the reference stores payloads
as JSON text only — ``src/bq.js:20-35``); this module is part of the
LLM-training-data multimodal suite, not a reference port.
"""

from __future__ import annotations

import struct

import numpy as np

from drive_health_etl_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + payload + even padding."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10, quality_444: bool = True) -> bytes:
    """Encode RGB uint8 frames (all same HxWx3) as an MJPEG AVI."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all MJPEG frames must share dimensions")
    jpegs = [
        encode_jpeg(f) if quality_444 else encode_jpeg(f, subsampling="420", restart_interval=2)
        for f in frames
    ]
    max_jpeg = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_jpeg * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        AVIF_HASINDEX,  # dwFlags
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_jpeg,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4h",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(jpegs),  # dwLength (frames)
            max_jpeg,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (driver default)
            0,  # dwSampleSize (0 = variable, one sample per chunk)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage (uncompressed bound; informative for MJPG)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )

    movi_payload = b""
    index_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position: the first
        # chunk sits at offset 4 (right after the list-type fourcc)
        index_entries.append((4 + len(movi_payload), len(j)))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, size)
            for off, size in index_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


# --- Lossless P-frame mode (conditional replenishment) -----------------------
#
# The honest middle step between intra-only MJPEG and motion-compensated
# codecs (H.264-class, which still refuse without ffmpeg): inter-frame
# coding WITHOUT motion search. Each P-frame carries, per 8x8 block, a skip
# flag (block unchanged since the previous frame) and, for changed blocks,
# raw mod-256 deltas — "conditional replenishment", the classic pre-motion-
# compensation interframe scheme (Mounts, Bell System Technical Journal 48,
# 1969). Everything is lossless, so the whole clip reconstructs BYTE-EXACT:
# the keyframe is a standard BI_RGB bottom-up DIB in a '00db' chunk (the
# stock uncompressed-AVI frame encoding), P-frames are '00dc' chunks with a
# private 'LP01' fourcc payload. Exactness is what buys the oracle: skip
# counts and delta sums are reproducible in SQL from the raster rule.

LP_FOURCC = b"LP01"
LP_BLOCK = 8


def _dib_encode(frame: np.ndarray) -> bytes:
    """BI_RGB DIB raster: bottom-up rows, BGR order, 4-byte row stride."""
    h, w = frame.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h - 1, -1, -1):
        row = frame[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    return b"".join(rows)


def _dib_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < stride * h:
        raise ValueError("DIB keyframe shorter than geometry requires")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(payload[i * stride : i * stride + w * 3], dtype=np.uint8)
        out[h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def _block_grid(w: int, h: int) -> list[tuple[int, int, int, int]]:
    """Raster-order (y0, y1, x0, x1) spans of the 8x8 grid (edges cropped)."""
    return [
        (y, min(y + LP_BLOCK, h), x, min(x + LP_BLOCK, w))
        for y in range(0, h, LP_BLOCK)
        for x in range(0, w, LP_BLOCK)
    ]


def _lp_encode_pframe(prev: np.ndarray, cur: np.ndarray) -> bytes:
    """'LP01' P-frame payload: header, LSB-first skip bitmap (bit set =
    block PRESENT), then mod-256 delta bytes for present blocks in raster
    order (cropped block region, row-major, 3 channels)."""
    h, w = cur.shape[:2]
    grid = _block_grid(w, h)
    bitmap = bytearray((len(grid) + 7) // 8)
    deltas = []
    for b, (y0, y1, x0, x1) in enumerate(grid):
        d = (cur[y0:y1, x0:x1].astype(np.int16) - prev[y0:y1, x0:x1].astype(np.int16)) % 256
        if d.any():
            bitmap[b // 8] |= 1 << (b % 8)
            deltas.append(d.astype(np.uint8).tobytes())
    return (
        LP_FOURCC
        + struct.pack("<HHBB", w, h, LP_BLOCK, 0)
        + bytes(bitmap)
        + b"".join(deltas)
    )


def _lp_decode_pframe(payload: bytes, prev: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Reconstruct a P-frame; returns (frame, n_skipped_blocks, sum_delta)."""
    if payload[:4] != LP_FOURCC:
        raise ValueError("P-frame chunk missing LP01 magic")
    w, h, blk, _ = struct.unpack("<HHBB", payload[4:10])
    if blk != LP_BLOCK:
        raise NotImplementedError(f"LP01 block size {blk} (only {LP_BLOCK} supported)")
    if prev.shape[:2] != (h, w):
        raise ValueError("P-frame geometry disagrees with reference frame")
    grid = _block_grid(w, h)
    nbm = (len(grid) + 7) // 8
    bitmap = payload[10 : 10 + nbm]
    if len(bitmap) != nbm:
        raise ValueError("P-frame skip bitmap truncated")
    pos = 10 + nbm
    cur = prev.copy()
    n_skip, sum_delta = 0, 0
    for b, (y0, y1, x0, x1) in enumerate(grid):
        if not (bitmap[b // 8] >> (b % 8)) & 1:
            n_skip += 1
            continue
        n = (y1 - y0) * (x1 - x0) * 3
        d = np.frombuffer(payload[pos : pos + n], dtype=np.uint8)
        if len(d) != n:
            raise ValueError("P-frame delta payload truncated")
        pos += n
        sum_delta += int(d.sum())
        cur[y0:y1, x0:x1] = (
            cur[y0:y1, x0:x1].astype(np.int16) + d.reshape(y1 - y0, x1 - x0, 3)
        ).astype(np.uint8)  # int16 + uint8 wraps mod 256 on the cast back
    return cur, n_skip, sum_delta


def encode_avi_lossless_p(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode RGB uint8 frames as an AVI with a DIB keyframe ('00db',
    BI_RGB) and LP01 conditional-replenishment P-frames ('00dc') — the same
    RIFF layout as ``encode_avi_mjpeg`` with biCompression 'LP01'."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    payloads = [(b"00db", _dib_encode(frames[0]))]
    for i in range(1, len(frames)):
        payloads.append((b"00dc", _lp_encode_pframe(frames[i - 1], frames[i])))
    max_size = max(len(p) for _, p in payloads)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_size * fps, 0, AVIF_HASINDEX,
        len(payloads), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + LP_FOURCC
        + struct.pack(
            "<IHHIIIIIIIi4h",
            0, 0, 0, 0, 1, fps, 0, len(payloads), max_size, 0xFFFFFFFF, 0,
            0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, LP_FOURCC, w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    index_entries = []
    for fourcc, p in payloads:
        index_entries.append((fourcc, 4 + len(movi_payload), len(p)))
        movi_payload += _chunk(fourcc, p)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            fourcc + struct.pack("<III", AVIIF_KEYFRAME if fourcc == b"00db" else 0, off, size)
            for fourcc, off, size in index_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode_avi_lossless_p(blob: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode a DIB+LP01 AVI. Returns (frames, meta) with meta carrying the
    container geometry plus per-clip P-frame accounting:
    ``n_skipped_blocks`` (skip flags honored across all P-frames) and
    ``sum_delta`` (sum of all transmitted delta bytes)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    end = min(8 + riff_size, len(blob))
    meta: dict = {}
    frames: list[np.ndarray] = []
    n_skip_total, sum_delta_total, n_indexed = 0, 0, None
    for fourcc, p, size in _walk_chunks(blob, 12, end):
        if fourcc == b"LIST":
            list_type = blob[p : p + 4]
            if list_type == b"hdrl":
                for f2, p2, s2 in _walk_chunks(blob, p + 4, p + size):
                    if f2 == b"avih":
                        vals = struct.unpack("<14I", blob[p2 : p2 + 56])
                        meta = {
                            "n_frames": vals[4],
                            "width": vals[8],
                            "height": vals[9],
                            "usec_per_frame": vals[0],
                        }
            elif list_type == b"movi":
                for f2, p2, s2 in _walk_chunks(blob, p + 4, p + size):
                    if f2 == b"00db":
                        if not meta:
                            raise ValueError("DIB keyframe before avih header")
                        frames.append(_dib_decode(blob[p2 : p2 + s2], meta["width"], meta["height"]))
                    elif f2 == b"00dc":
                        if not frames:
                            raise ValueError("P-frame with no reference frame")
                        cur, n_skip, sd = _lp_decode_pframe(blob[p2 : p2 + s2], frames[-1])
                        frames.append(cur)
                        n_skip_total += n_skip
                        sum_delta_total += sd
        elif fourcc == b"idx1":
            n_indexed = size // 16
    if not meta:
        raise ValueError("AVI missing avih header")
    if meta["n_frames"] != len(frames):
        raise ValueError(f"avih declares {meta['n_frames']} frames, movi has {len(frames)}")
    if n_indexed is not None and n_indexed != len(frames):
        raise ValueError(f"idx1 has {n_indexed} entries for {len(frames)} frames")
    meta["n_skipped_blocks"] = n_skip_total
    meta["sum_delta"] = sum_delta_total
    return frames, meta


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) honoring even padding."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi_mjpeg(blob: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode an MJPEG AVI to its frames plus container metadata.

    Walks the RIFF tree (tolerating JUNK chunks and padding), reads avih for
    the declared geometry, decodes every '00dc'/'00db' chunk in movi through
    the baseline JPEG decoder, and cross-checks the idx1 entry count — a
    container whose index disagrees with its stream fails loudly.
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    end = min(8 + riff_size, len(blob))

    meta: dict = {}
    frames: list[np.ndarray] = []
    n_indexed = None
    for fourcc, p, size in _walk_chunks(blob, 12, end):
        if fourcc == b"LIST":
            list_type = blob[p : p + 4]
            if list_type == b"hdrl":
                for f2, p2, s2 in _walk_chunks(blob, p + 4, p + size):
                    if f2 == b"avih":
                        vals = struct.unpack("<14I", blob[p2 : p2 + 56])
                        meta = {
                            "n_frames": vals[4],
                            "width": vals[8],
                            "height": vals[9],
                            "usec_per_frame": vals[0],
                        }
            elif list_type == b"movi":
                for f2, p2, s2 in _walk_chunks(blob, p + 4, p + size):
                    if f2 in (b"00dc", b"00db"):
                        frames.append(decode_jpeg(blob[p2 : p2 + s2]))
        elif fourcc == b"idx1":
            n_indexed = size // 16
    if not meta:
        raise ValueError("AVI missing avih header")
    if meta["n_frames"] != len(frames):
        raise ValueError(f"avih declares {meta['n_frames']} frames, movi has {len(frames)}")
    if n_indexed is not None and n_indexed != len(frames):
        raise ValueError(f"idx1 has {n_indexed} entries for {len(frames)} frames")
    return frames, meta
