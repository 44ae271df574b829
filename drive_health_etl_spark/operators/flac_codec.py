"""Subset-FLAC lossless audio codec in pure Python/numpy.

The fourth real compression algorithm in the multimodal suite — PNG rides
zlib DEFLATE, JPEG is DCT/Huffman, GIF is LZW, and FLAC is fixed-order
linear prediction + Rice-coded residuals, implemented here from the public
FLAC format specification (xiph.org): fLaC marker, STREAMINFO metadata
block (with the decoded-PCM MD5 the spec mandates), frame headers with
CRC-8, CONSTANT / VERBATIM / FIXED subframes (prediction orders 0-4),
Rice partitions, frame CRC-16. Lossless: decode(encode(x)) == x bit for
bit, which is what makes the Spark-side oracle EXACT.

Scope: mono, 16-bit, one frame per stream section of BLOCK samples —
the "subset FLAC" profile streaming decoders require. Arbitrary-order
LPC (non-fixed) and stereo decorrelation are not emitted; the decoder
rejects what it cannot decode rather than mis-decoding.

Part of the LLM-training-data multimodal suite (the reference stores media
opaquely; ``src/bq.js:20-35``), not a reference port.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# Fixed-prediction coefficients per order (FLAC spec §fixed subframe):
# residual_o(n) = o-th difference of the signal.
_FIXED_ORDERS = 5  # orders 0..4


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bitpos = pos * 8

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            byte = self.data[self.bitpos >> 3]
            bit = (byte >> (7 - (self.bitpos & 7))) & 1
            self.bitpos += 1
            if bit:
                return q
            q += 1

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        assert self.bitpos % 8 == 0
        return self.bitpos >> 3


_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _best_fixed_order(block: np.ndarray) -> tuple[int, np.ndarray]:
    """Pick the fixed prediction order with the smallest residual magnitude
    sum (the standard estimator); return (order, residual)."""
    best_order, best_res, best_cost = 0, block.astype(np.int64), None
    res = block.astype(np.int64)
    for order in range(_FIXED_ORDERS):
        if order > 0:
            if len(block) <= order:
                break
            res = np.diff(block.astype(np.int64), n=order)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if best_order > 0:
        best_res = np.diff(block.astype(np.int64), n=best_order)
    return best_order, best_res


def _rice_k(res: np.ndarray) -> int:
    """Rice parameter from mean magnitude (standard estimator)."""
    if len(res) == 0:
        return 0
    mean = float(np.abs(res).mean())
    k = 0
    # cap at 14: k=15 is the 4-bit ESCAPE code, not a Rice parameter
    while (1 << k) < mean and k < 14:
        k += 1
    return k


BLOCK = 4096  # samples per frame (subset-FLAC max at <=48 kHz)


def encode_flac(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> subset-FLAC bytes (STREAMINFO + frames)."""
    samples = samples.astype(np.int16)
    n = len(samples)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    frames = bytearray()
    for frame_no, start in enumerate(range(0, n, BLOCK)):
        block = samples[start : start + BLOCK].astype(np.int64)
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        hdr.write(0b0111, 4)  # blocksize: get 16 bit (blocksize-1) at end
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # channels: mono
        hdr.write(0b100, 3)  # sample size: 16 bit
        hdr.write(0, 1)  # reserved
        # frame number, UTF-8 coded (subset: < 2^31 frames)
        fn = frame_no
        if fn < 0x80:
            hdr.write(fn, 8)
        elif fn < 0x800:
            hdr.write(0xC0 | (fn >> 6), 8)
            hdr.write(0x80 | (fn & 0x3F), 8)
        else:
            hdr.write(0xE0 | (fn >> 12), 8)
            hdr.write(0x80 | ((fn >> 6) & 0x3F), 8)
            hdr.write(0x80 | (fn & 0x3F), 8)
        hdr.write(bs - 1, 16)
        hdr.align()
        hdr_bytes = hdr.bytes()
        frame = bytearray(hdr_bytes)
        frame.append(_crc8(bytes(frame)))

        body = _BitWriter()
        if bs and (block == block[0]).all():
            body.write(0, 1)  # subframe header: zero pad bit
            body.write(0b000000, 6)  # CONSTANT
            body.write(0, 1)  # no wasted bits
            body.write(int(block[0]) & 0xFFFF, 16)
        else:
            order, res = _best_fixed_order(block)
            body.write(0, 1)
            body.write(0b001000 | order, 6)  # FIXED, order
            body.write(0, 1)
            for v in block[:order]:
                body.write(int(v) & 0xFFFF, 16)  # warmup verbatim
            # one Rice partition (partition order 0)
            body.write(0b00, 2)  # residual coding method: RICE (4-bit params)
            body.write(0, 4)  # partition order 0
            k = _rice_k(res)
            body.write(k, 4)
            for u in _zigzag(res).tolist():
                body.write_unary(u >> k)
                body.write(u, k)
        body.align()
        frame += body.bytes()
        frame += struct.pack(">H", _crc16(bytes(frame)))
        frames += frame

    streaminfo = (
        struct.pack(">HH", BLOCK, BLOCK)
        + b"\x00\x00\x00" * 2  # min/max framesize unknown
        + bytes(
            [
                (rate >> 12) & 0xFF,
                (rate >> 4) & 0xFF,
                ((rate & 0xF) << 4) | (0 << 1) | (((16 - 1) >> 4) & 1),  # ch-1=0
                (((16 - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
                (n >> 24) & 0xFF,
                (n >> 16) & 0xFF,
                (n >> 8) & 0xFF,
                n & 0xFF,
            ]
        )
        + md5
    )
    meta = b"\x80" + struct.pack(">I", len(streaminfo))[1:] + streaminfo  # last-block flag
    return b"fLaC" + meta + bytes(frames)


def decode_flac(blob: bytes) -> tuple[np.ndarray, int]:
    """Subset-FLAC bytes -> (int16 mono samples, sample rate). Verifies the
    frame-header CRC-8, frame CRC-16, and the STREAMINFO PCM MD5 — three
    independent integrity gates; any requantization or Rice bug trips at
    least the MD5."""
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    rate = n_total = None
    md5_expect = b""
    while True:
        hdr = blob[pos : pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        data = blob[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            rate = (data[10] << 12) | (data[11] << 4) | (data[12] >> 4)
            channels = ((data[12] >> 1) & 0x7) + 1
            bps = (((data[12] & 1) << 4) | (data[13] >> 4)) + 1
            if channels != 1 or bps != 16:
                raise NotImplementedError(f"only mono/16-bit FLAC (got ch={channels}, bps={bps})")
            n_total = ((data[13] & 0xF) << 32) | struct.unpack(">I", data[14:18])[0]
            md5_expect = data[18:34]
        pos += 4 + ln
        if last:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    out: list[int] = []
    while pos < len(blob) and len(out) < n_total:
        r = _BitReader(blob, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {pos}")
        r.read(2)  # reserved + blocking strategy
        bs_code = r.read(4)
        r.read(4)  # sample rate code
        ch_code = r.read(4)
        if ch_code != 0:
            raise NotImplementedError("only mono frames decode")
        r.read(3 + 1)  # sample size + reserved
        first = r.read(8)  # UTF-8 frame number
        if first >= 0xC0:
            extra = 1 if first < 0xE0 else (2 if first < 0xF0 else 3)
            for _ in range(extra):
                r.read(8)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        else:
            bs = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}[bs_code]
        r.align()
        hdr_end = r.byte_pos()
        if _crc8(blob[pos:hdr_end]) != blob[hdr_end]:
            raise ValueError(f"frame header CRC-8 mismatch at byte {pos}")
        r.read(8)  # consume the CRC byte

        if r.read(1):
            raise ValueError("subframe padding bit set")
        sf_type = r.read(6)
        if r.read(1):
            raise NotImplementedError("wasted-bits subframes not emitted by this encoder")
        if sf_type == 0:  # CONSTANT
            v = r.read(16)
            v = v - 0x10000 if v & 0x8000 else v
            block = [v] * bs
        elif 8 <= sf_type <= 12:  # FIXED order 0-4
            order = sf_type - 8
            warm = []
            for _ in range(order):
                v = r.read(16)
                warm.append(v - 0x10000 if v & 0x8000 else v)
            if r.read(2) != 0:
                raise NotImplementedError("only 4-bit Rice partitions decode")
            part_order = r.read(4)
            res: list[int] = []
            n_res = bs - order
            for p in range(1 << part_order):
                k = r.read(4)
                if k == 0xF:
                    raise NotImplementedError("escaped Rice partitions not supported")
                cnt = (bs >> part_order) - (order if p == 0 else 0)
                for _ in range(cnt):
                    q = r.read_unary()
                    u = (q << k) | (r.read(k) if k else 0)
                    res.append(_unzigzag(u))
            if len(res) != n_res:
                raise ValueError("Rice residual count mismatch")
            if order == 0:
                block = res
            else:
                # reconstruct from the o-th-order difference: sample =
                # residual + fixed-predictor over the previous o samples
                coeffs = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
                block = warm[:]
                for e in res:
                    pred = sum(c * block[-i - 1] for i, c in enumerate(coeffs))
                    block.append(e + pred)
        else:
            raise NotImplementedError(f"subframe type {sf_type} not supported")
        r.align()
        crc_pos = r.byte_pos()
        if struct.unpack(">H", blob[crc_pos : crc_pos + 2])[0] != _crc16(blob[pos:crc_pos]):
            raise ValueError(f"frame CRC-16 mismatch at byte {pos}")
        pos = crc_pos + 2
        out.extend(block)

    pcm = np.array(out[:n_total], dtype=np.int16)
    if md5_expect != b"\x00" * 16 and hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("decoded PCM fails the STREAMINFO MD5")
    return pcm, rate
