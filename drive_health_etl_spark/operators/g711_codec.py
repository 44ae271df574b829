"""G.711 mu-law audio codec — the 8-bit companded PCM format of telephony.

The reference ETL ingests call records (SURVEY.md §1); the audio those calls
would carry on a real trunk is G.711 mu-law, so this is the domain-native
audio wire format. Unlike the DCT/LPC codecs, companding is PURE INTEGER
arithmetic (ITU-T G.711 table 2a/2b):

  encode(x):  sign <- x < 0; m <- min(|x|, 8158... clamp) + 132 (bias)
              e <- exponent = floor(log2(m)) - 7  in 0..7
              q <- (m >> (e + 3)) & 0xF            (4-bit mantissa)
              byte <- ~(sign<<7 | e<<4 | q) & 0xFF (ones-complement per spec)

  decode(b):  invert: m <- ((q<<3 | 0x84) << e) ... - 132, apply sign

Because every step is integer shifts/masks, the DuckDB oracle REIMPLEMENTS
the companding law per sample in SQL and checks the Spark-side decode
end to end — a full independent second implementation, a stronger gate
than the digest pins the lossy DCT codecs need.

decode(encode(x)) is the standard quantization: exact for values that are
representable quantization levels, error bounded by half a step (2^e * 4)
otherwise; decode(encode(decode(b))) == decode(b) for every byte b
(idempotent on the code lattice — asserted in tests over all 256 codes).
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84  # 132
_CLIP = 32635  # G.711 clamp before bias keeps m + bias < 2^15


def encode_ulaw(pcm: np.ndarray) -> bytes:
    """Encode int16 linear PCM to 8-bit mu-law (one byte per sample)."""
    assert pcm.dtype == np.int16
    x = pcm.astype(np.int32)
    sign = (x < 0).astype(np.uint8)
    m = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent: index of the highest set bit above bit 7 (m is in
    # [132, 32767], so bit_length is 8..15 and e is 0..7)
    e = np.zeros(len(m), dtype=np.int32)
    for k in range(1, 8):  # e = bit_length(m) - 8
        e += (m >= (1 << (k + 7))).astype(np.int32)
    q = (m >> (e + 3)) & 0xF
    byte = ~((sign << 7) | (e.astype(np.uint8) << 4) | q.astype(np.uint8)) & 0xFF
    return bytes(byte.astype(np.uint8).tobytes())


def decode_ulaw(blob: bytes) -> np.ndarray:
    """Decode 8-bit mu-law bytes to int16 linear PCM."""
    b = np.frombuffer(blob, dtype=np.uint8).astype(np.int32)
    c = (~b) & 0xFF
    sign = (c >> 7) & 1
    e = (c >> 4) & 7
    q = c & 0xF
    # canonical reconstruction ((q*8 + 132) << e) - 132 — algebraically
    # (2q + 33) * 2^(e+2) - 132, the CENTER of the encoder's quantization
    # cell, so |decode(encode(x)) - x| <= 2^(e+2) (half a step)
    m = (((q << 3) + _BIAS) << e) - _BIAS
    out = np.where(sign == 1, -m, m)
    return out.astype(np.int16)
