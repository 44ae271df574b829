"""Baseline JPEG (JFIF, SOF0) codec in pure numpy + stdlib — no PIL/ffmpeg.

Closes the compressed-image coverage hole left after PNG (multimodal.py):
JPEG is THE wire format for real-world photo corpora, and a 100 TB
multimodal pipeline must at least decode baseline JFIF. This implements the
full baseline pipeline:

  decode: marker walk -> DQT/DHT/SOF0/SOS parse -> entropy decode (Huffman,
  byte unstuffing, DC prediction, AC run-length/ZRL/EOB) -> dezigzag ->
  dequantize -> 8x8 IDCT -> level shift -> (YCbCr -> RGB for 3-component)

  encode: (RGB -> YCbCr) -> 8x8 block DCT -> quantize -> zigzag -> DC-diff/
  AC run-length symbols -> Huffman -> stuffed bitstream, with the tables
  EMBEDDED in DQT/DHT segments.

Table strategy: JPEG carries its quantization AND Huffman tables in the
file, so the encoder uses deterministic custom tables — a frequency-ramp
quant table and fixed-length canonical Huffman codes (counts vector with
all codes at one length; spec-legal, just less compressed than Annex K's) —
while the decoder is fully general and reads whatever tables the stream
declares. This keeps every byte reproducible without transcribing Annex K.

Supported subset: baseline sequential (SOF0), 8-bit, 1 or 3 components,
4:4:4 AND 4:2:0 sampling (the real-world default: 2x2-mean chroma
downsample on encode, MCUs of four Y blocks + Cb + Cr, nearest-neighbor
upsample on decode), and restart intervals (DRI/RSTm with DC reset and
marker-sequence verification — restart intervals are also what makes
distributed JPEG decode possible: each interval is an independently
decodable, byte-aligned split). Progressive (SOF2), other samplings, and
arithmetic-coded streams raise NotImplementedError honestly.

Correctness evidence (tests/test_multimodal.py): the DCT matrix is checked
against a direct O(n^4) transcription of the DCT-II definition, Huffman
round-trips are checked at the bitstream level, constant blocks decode
within +/-1, and random-image round-trips meet the quantization error
bound. Lossiness is why the Spark-level oracle (multimodal_jpeg_stats)
asserts dims exactly and reconstruction error as a boolean bound rather
than exact channel means (the PNG/NetPBM queries cover exact-decode).

Reference behavior parity: the reference ETL (see SURVEY.md §2 multimodal
north-star) treats media as opaque blobs; this codec makes the decode stage
real for the dominant compressed format.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT ----------------------------------------------------------------

_DCT_N = 8


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix C: (C @ block @ C.T) is the 2-D DCT."""
    n = _DCT_N
    C = np.zeros((n, n))
    for u in range(n):
        for x in range(n):
            C[u, x] = np.cos((2 * x + 1) * u * np.pi / (2 * n))
    C *= np.sqrt(2.0 / n)
    C[0, :] *= np.sqrt(0.5)
    return C


_C = _dct_matrix()


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# --- zigzag -----------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Indices that map an 8x8 block (row-major) to the ITU T.81 zigzag:
    odd anti-diagonals walk row-ascending ((0,1) before (1,0)), even ones
    row-descending — the sequence 0, 1, 8, 16, 9, 2, 3, 10, ... that every
    JPEG codec shares. (An earlier draft sorted the transpose, which
    round-trips against itself but mis-renders against real codecs.)"""
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )
    return np.array([r * 8 + c for r, c in order])


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# --- deterministic encoder tables ------------------------------------------

# Frequency-ramp quantization: DC quant 4, growing with spatial frequency.
# Coarse enough to actually compress, fine enough that the round-trip error
# bound stays tight even for ASCII-byte rasters (near-worst-case
# high-frequency content: measured corpus max MSE ~57 vs the 150 bound;
# a steeper ramp put the max at 230 and broke the bound).
_QTABLE = (4 + (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(np.uint16)


def _fixed_length_huffman(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A spec-legal Huffman table giving every symbol the same code length
    L = ceil(log2(n+1)) (the +1 keeps the all-ones code unused, as the JPEG
    convention expects). Returns (counts[1..16], symbols) for DHT."""
    n = len(symbols)
    length = max(1, (n + 1 - 1).bit_length())  # 2^L >= n+1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, list(symbols)


_DC_SYMBOLS = list(range(12))  # categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]  # EOB, ZRL, and every (run, size)


def _huff_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment per the JPEG spec: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- bit IO -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)

    def emit_marker(self, code: int) -> None:
        """Byte-align (1-padding) and append a raw RSTm marker — marker
        bytes are NOT stuffed; they are what the decoder resyncs on."""
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, code])


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_restart(self) -> int:
        """Discard partial-byte bits and consume an RSTm marker, returning
        m — the byte-aligned resync point a parallel decoder splits on.

        T.81 B.1.1.2 permits any number of 0xFF fill bytes before the marker
        byte; third-party encoders emit them at restart boundaries, so skip
        consecutive 0xFF until the last one before a non-0xFF byte."""
        self._nbits = 0
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] == 0xFF:
            p += 1  # fill byte
        if p + 1 < len(self.data) and self.data[p] == 0xFF and 0xD0 <= self.data[p + 1] <= 0xD7:
            m = self.data[p + 1] & 7
            self.pos = p + 2
            return m
        raise ValueError(f"expected restart marker at entropy offset {self.pos}")


def _decode_huff_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(value: int, size: int) -> int:
    """JPEG EXTEND: map the `size`-bit raw value to its signed coefficient."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(value: int) -> int:
    return int(abs(value)).bit_length()


# --- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _encode_block(writer: _BitWriter, block: np.ndarray, prev_dc: int, q, dc_codes, ac_codes) -> int:
    """DCT + quantize + entropy-encode one 8x8 block; returns its DC value
    (the caller threads per-component DC prediction through)."""
    coef = _dct2(block - 128.0)
    quant = np.round(coef / q).astype(np.int32)
    zz = quant.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a plane up to (ph, pw) — T.81's recommended pad."""
    return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")


def encode_jpeg(img: np.ndarray, *, subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Encode an (h, w) gray or (h, w, 3) RGB uint8 image as baseline JFIF
    with custom embedded tables. Deterministic: same inputs -> same bytes.

    ``subsampling``: "444" (every component full resolution) or "420" (the
    real-world default: chroma downsampled 2x2 by exact mean, MCUs of four
    Y blocks + Cb + Cr). ``restart_interval``: if > 0, a DRI segment is
    emitted and every N MCUs the entropy stream byte-aligns, emits RSTm,
    and resets DC prediction — restart intervals are what make JPEG decode
    PARALLELIZABLE (each interval is an independently decodable split, the
    property a distributed decoder shards on)."""
    if subsampling not in ("444", "420"):
        raise NotImplementedError(f"subsampling {subsampling!r}: only 444/420")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if gray:
        comp_planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        assert img.ndim == 3 and img.shape[2] == 3, "encode_jpeg takes gray or RGB"
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "420":
            ce = np.pad(ycc[..., 1:], ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
            chroma = (ce[0::2, 0::2] + ce[1::2, 0::2] + ce[0::2, 1::2] + ce[1::2, 1::2]) / 4.0
            comp_planes = [ycc[..., 0], chroma[..., 0], chroma[..., 1]]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            comp_planes = [ycc[..., c] for c in range(3)]
            samp = [(1, 1)] * 3
    n_comp = len(comp_planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to(p, mcus_y * 8 * vi, mcus_x * 8 * hi)
        for p, (hi, vi) in zip(comp_planes, samp)
    ]

    q = _QTABLE.astype(np.float64)
    dc_codes = _huff_codes(*_fixed_length_huffman(_DC_SYMBOLS))
    ac_codes = _huff_codes(*_fixed_length_huffman(_AC_SYMBOLS))

    writer = _BitWriter()
    prev_dc = [0] * n_comp
    mcu_idx = 0
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.emit_marker(0xD0 + (n_rst % 8))
                n_rst += 1
                prev_dc = [0] * n_comp
            for ci, (plane, (hi, vi)) in enumerate(zip(padded, samp)):
                for r in range(vi):
                    for c in range(hi):
                        by, bx = my * vi + r, mx * hi + c
                        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                        prev_dc[ci] = _encode_block(writer, block, prev_dc[ci], q, dc_codes, ac_codes)
            mcu_idx += 1
    entropy = writer.flush()

    # --- container ---
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, bytes([0]) + bytes(_QTABLE.reshape(-1)[_ZIGZAG].astype(np.uint8)))  # DQT id 0
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])  # id, sampling, qtable 0
    out += seg(0xFFC0, sof)  # SOF0
    dc_counts, dc_syms = _fixed_length_huffman(_DC_SYMBOLS)
    ac_counts, ac_syms = _fixed_length_huffman(_AC_SYMBOLS)
    out += seg(0xFFC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))  # DHT DC 0
    out += seg(0xFFC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))  # DHT AC 0
    sos = bytes([n_comp]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(n_comp))
    sos += bytes([0, 63, 0])  # full spectral selection, no approximation
    out += seg(0xFFDA, sos)  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode baseline JFIF (SOF0, 8-bit, 1 or 3 components; 4:4:4 or the
    real-world-default 4:2:0 sampling; restart intervals honored with DC
    reset + marker-sequence verification). Returns (h, w) for grayscale,
    (h, w, 3) RGB otherwise. General over in-stream tables; refuses
    progressive/arithmetic/other-sampling streams honestly."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    restart_interval = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtable_id)
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_table, ac_table)
    entropy_start = -1
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = (blob[pos] << 8) | blob[pos + 1]
        if marker == 0xFFD9:
            break
        # T.81 B.1.1.3-4: TEM and RSTm are standalone (no length field) —
        # reading image bytes as a segment length would corrupt the walk.
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        payload = blob[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables not supported")
                zzq = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                qtables[prec_id & 0xF] = zzq[_UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG is supported")
        elif marker == 0xFFC0:  # SOF0
            precision, h, w, n_comp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            for ci in range(n_comp):
                cid, sampling, qid = payload[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sampling, qid))
            samplings = [((s >> 4), (s & 0xF)) for _, s, _ in comps]
            if not (
                all(s == (1, 1) for s in samplings)
                or (len(samplings) == 3 and samplings == [(2, 2), (1, 1), (1, 1)])
            ):
                raise NotImplementedError(
                    f"sampling factors {samplings}: only 4:4:4 and 4:2:0 decode"
                )
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tclass, tid = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1 : p + 17])
                nsym = sum(counts)
                syms = list(payload[p + 17 : p + 17 + nsym])
                codes = _huff_codes(counts, syms)
                huff[(tclass, tid)] = {(c, l): s for s, (c, l) in codes.items()}
                p += 17 + nsym
        elif marker == 0xFFDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xFFDA:  # SOS
            ns = payload[0]
            for si in range(ns):
                cid, tables = payload[1 + 2 * si], payload[2 + 2 * si]
                comp_idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan.append((comp_idx, tables >> 4, tables & 0xF))
            entropy_start = pos + 2 + length
            break
        pos += 2 + length
    if entropy_start < 0 or not comps:
        raise ValueError("JPEG missing SOS/SOF0")

    # find entropy end: the next real marker, skipping stuffed FF00, RSTm
    # (restart markers are part of the entropy-coded segment), and 0xFF fill
    # bytes (T.81 B.1.1.2 — an FF FF run is padding, not a marker).
    end = entropy_start
    while end + 1 < len(blob):
        if blob[end] == 0xFF:
            nxt = blob[end + 1]
            if nxt == 0xFF:
                end += 1  # fill byte
            elif nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                end += 2  # stuffed zero / restart marker
            else:
                break  # real terminating marker (EOI or next segment)
        else:
            end += 1
    reader = _BitReader(blob[entropy_start:end])

    n_comp = len(comps)
    samp = [((s >> 4), (s & 0xF)) for _, s, _ in comps]
    hmax = max(hi for hi, _ in samp)
    vmax = max(vi for _, vi in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * 8 * vi, mcus_x * 8 * hi)) for hi, vi in samp
    ]
    prev_dc = [0] * n_comp

    def decode_block(comp_idx: int, dc_id: int, ac_id: int, by: int, bx: int) -> None:
        dc_tab = huff[(0, dc_id)]
        ac_tab = huff[(1, ac_id)]
        zz = np.zeros(64, dtype=np.float64)
        t = _decode_huff_symbol(reader, dc_tab)
        diff = _extend(reader.read_bits(t), t)
        prev_dc[comp_idx] += diff
        zz[0] = prev_dc[comp_idx]
        i = 1
        while i < 64:
            sym = _decode_huff_symbol(reader, ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0xF
            i += run
            if i >= 64:
                raise ValueError("AC run past end of block")
            zz[i] = _extend(reader.read_bits(size), size)
            i += 1
        q = qtables[comps[comp_idx][2]]
        coef = (zz[_UNZIGZAG].reshape(8, 8)) * q
        block = _idct2(coef) + 128.0
        planes[comp_idx][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    mcu_idx = 0
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                m = reader.read_restart()
                if m != n_rst % 8:
                    raise ValueError(f"restart sequence broken: RST{m}, expected RST{n_rst % 8}")
                n_rst += 1
                prev_dc = [0] * n_comp
            for comp_idx, dc_id, ac_id in scan:
                hi, vi = samp[comp_idx]
                for r in range(vi):
                    for c in range(hi):
                        decode_block(comp_idx, dc_id, ac_id, my * vi + r, mx * hi + c)
            mcu_idx += 1

    # upsample subsampled components (nearest-neighbor replication, the
    # standard simple upsampler), then crop to the declared dimensions
    full = []
    for p, (hi, vi) in zip(planes, samp):
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        full.append(p[:h, :w])
    if n_comp == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
