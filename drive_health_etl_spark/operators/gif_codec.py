"""GIF87a codec in pure Python: hand-written variable-width LZW.

The third real compression algorithm in the multimodal suite — PNG rides
stdlib zlib (DEFLATE), JPEG is the in-repo DCT/Huffman pipeline, and GIF's
LZW is implemented here from the public GIF87a specification: logical screen
descriptor, global color table, image descriptor, LZW-compressed index
stream with variable code width (min+1 .. 12 bits), CLEAR/EOI codes,
255-byte sub-block framing, trailer. Files produced here open in any
standards-compliant GIF viewer; the decoder accepts third-party baseline
(non-interlaced, global-palette) GIF87a/89a streams and skips 89a extension
blocks.

Palette images are index-exact: a round-trip through encode/decode returns
the original index raster bit-for-bit (LZW is lossless), which is what makes
the Spark-side oracle EXACT rather than bounded like JPEG's.

Part of the LLM-training-data multimodal suite (the reference stores media
opaquely; ``src/bq.js:20-35``), not a reference port.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = (b"GIF87a", b"GIF89a")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Variable-width LZW per GIF87a appendix: codes start at
    min_code_size+1 bits, dictionary grows to 4095, CLEAR resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for v in indices.tolist():
        nxt = prefix + bytes([v])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([v])
    if prefix:
        emit(table[prefix])
    # The decoder appends one more table entry after consuming that final
    # code and widens when its table reaches 2^width — mirror that here or
    # EOI gets written one bit narrower than the decoder will read it
    # (fires exactly when the table size lands on a power of two at stream
    # end; found by hypothesis on an 18-pixel 2-color raster).
    if next_code >= (1 << width) and width < 12:
        width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code} (table size {len(table)})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # GIF widens when the NEXT code would not fit (early-change
            # convention matches the encoder above)
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(f"LZW decoded {len(out)} pixels, descriptor says {n_expected}")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 index raster + (n, 3) uint8 palette -> GIF87a bytes.
    Palette is padded to the next power of two (min 2)."""
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    if indices.max(initial=0) >= size:
        raise ValueError("index raster exceeds palette size")

    lsd = struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = max(2, bits)
    lzw = _lzw_encode(indices.reshape(-1), min_code)
    return (
        b"GIF87a"
        + lsd
        + pal.tobytes()
        + img_desc
        + bytes([min_code])
        + _sub_blocks(lzw)
        + b"\x3b"
    )


def decode_gif(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes -> ((h, w) uint8 index raster, (size, 3) palette).

    Baseline scope: global color table, non-interlaced, first image block;
    89a extension blocks (graphics control, comments, application) are
    skipped per spec; interlace and local palettes refuse loudly."""
    if blob[:6] not in GIF_MAGIC:
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    if not flags & 0x80:
        raise ValueError("GIF without global color table not supported")
    gct_size = 2 << (flags & 0x07)
    pos = 13
    palette = np.frombuffer(blob[pos : pos + 3 * gct_size], dtype=np.uint8).reshape(-1, 3)
    pos += 3 * gct_size

    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # 89a extension: label + sub-blocks, skip
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block {b0:#x} at {pos}")
        _x, _y, iw, ih, iflags = struct.unpack("<HHHHB", blob[pos + 1 : pos + 10])
        if iflags & 0x80:
            raise NotImplementedError("GIF local color tables not supported")
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        pos += 10
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos]:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, iw * ih)
        return idx.reshape(ih, iw), palette
    raise ValueError("GIF contains no image block")
