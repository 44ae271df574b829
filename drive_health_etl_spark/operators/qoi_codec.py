"""QOI ("Quite OK Image") codec — pure Python/numpy, no PIL.

QOI (qoiformat.org, public spec) is the modern lossless interchange format
photo pipelines use when PNG's DEFLATE cost is the bottleneck: byte-aligned
single-pass encoding with an O(1) per-pixel state machine — 20-50x faster
than PNG at similar ratios, which is exactly the codec profile a 100 TB
multimodal ingest wants for intermediate storage. This implements the full
RGB subset of the spec:

  QOI_OP_RUN   11xxxxxx            run of 1..62 repeats of the previous pixel
  QOI_OP_INDEX 00xxxxxx            one of 64 recently-seen colors
                                   (hash = (3r + 5g + 7b + 11a) % 64)
  QOI_OP_DIFF  01drdgdb            channel deltas in [-2, 1] (bias +2)
  QOI_OP_LUMA  10dddddd 0xxxxyyyy  dg in [-32, 31], dr-dg / db-dg in [-8, 7]
  QOI_OP_RGB   0xFE r g b          literal pixel

The encoder is the spec's canonical greedy priority (run > index > diff >
luma > rgb), so output bytes are deterministic; decode is exact, giving the
same EXACT per-channel-mean oracle as the PNG/NetPBM queries. The stream
ends with the spec's 7x00 + 0x01 marker, verified on decode.

Deltas are computed with wrapping uint8 arithmetic per the spec (the
difference ops wrap around 255 -> 0).
"""

from __future__ import annotations

import struct

import numpy as np

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _hash_rgb(r: int, g: int, b: int) -> int:
    return (r * 3 + g * 5 + b * 7 + 255 * 11) % 64


def encode_qoi(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image. Deterministic: the canonical
    greedy op priority means same pixels -> same bytes."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    out = bytearray()
    out += _QOI_MAGIC
    out += struct.pack(">IIBB", w, h, 3, 0)  # channels=3, colorspace=sRGB

    index = [(0, 0, 0)] * 64
    pr, pg, pb = 0, 0, 0
    run = 0
    flat = img.reshape(-1, 3)
    for px in flat:
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _hash_rgb(r, g, b)
        if index[idx] == (r, g, b):
            out.append(idx)
        else:
            index[idx] = (r, g, b)
            dr = (r - pr + 128) % 256 - 128  # wrapping int8 delta per spec
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else:
                dr_dg = dr - dg
                db_dg = db - dg
                if -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def decode_qoi(blob: bytes) -> np.ndarray:
    """Decode an RGB QOI stream to (h, w, 3) uint8; verifies the magic, the
    declared channel count, and the end marker."""
    if blob[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI stream (missing qoif magic)")
    w, h, channels, _colorspace = struct.unpack(">IIBB", blob[4:14])
    if channels != 3:
        raise NotImplementedError("only 3-channel (RGB) QOI is supported")
    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    index = [(0, 0, 0)] * 64
    r, g, b = 0, 0, 0
    pos = 14
    i = 0
    while i < n:
        if pos >= len(blob) - 8:
            raise ValueError("QOI stream truncated before all pixels decoded")
        op = blob[pos]
        pos += 1
        if op == 0xFE:  # RGB
            r, g, b = blob[pos], blob[pos + 1], blob[pos + 2]
            pos += 3
        elif op == 0xFF:
            raise NotImplementedError("QOI_OP_RGBA in a 3-channel stream")
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                r, g, b = index[op & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((op >> 4) & 3) - 2) % 256
                g = (g + ((op >> 2) & 3) - 2) % 256
                b = (b + (op & 3) - 2) % 256
            elif tag == 2:  # LUMA
                dg = (op & 0x3F) - 32
                nxt = blob[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0xF) - 8) % 256
            else:  # RUN
                run = (op & 0x3F) + 1
                out[i : i + run] = (r, g, b)
                i += run
                continue
        index[_hash_rgb(r, g, b)] = (r, g, b)
        out[i] = (r, g, b)
        i += 1
    if blob[pos : pos + 8] != _QOI_END:
        raise ValueError("QOI end marker missing or misplaced")
    return out.reshape(h, w, 3)
