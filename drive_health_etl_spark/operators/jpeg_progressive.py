"""Progressive JPEG (SOF2) codec — spectral selection + successive
approximation, pure numpy + stdlib. Closes the one JPEG-family hole the
baseline codec (jpeg_codec.py) refuses: multi-scan progressive streams, the
layout large photo sites actually serve (progressive is the default for
mozjpeg/ImageMagick web output, so a 100 TB crawl corpus is FULL of it).

Encode pipeline: the SAME per-block quantized coefficients as the baseline
encoder (shared DCT / zigzag / quant table), then the ITU T.81 Annex G
progressive entropy coding over a libjpeg-style standard scan script:

  1. DC first scan     (interleaved, point transform Al=1)
  2. AC first scans    (per component, spectral bands, Al>0, EOB-run coded)
  3. DC refinement     (one raw bit per block)
  4. AC refinement     (correction bits + newly-significant coefficients,
                        the buffered-bit/EOB-run machinery of T.81 G.1.2.3)

Because encode derives progressive scans from the IDENTICAL quantized
coefficient array the baseline encoder writes, a correct decoder must
reconstruct EXACTLY the same coefficients — so the Spark-level query
(multimodal_jpeg_prog_stats) asserts progressive decode == baseline decode
per pixel, bit-exact, no lossy error bound needed for the parity check.

Decode is general over in-stream tables and scan scripts (any spectral
bands / successive-approximation ladder a compliant encoder emits, 4:4:4
or grayscale); 4:2:0 progressive, DRI-in-progressive, and arithmetic
coding raise NotImplementedError honestly.

The scan-script validator (_validate_scans) enforces the T.81 G.1.1.1.1
no-gap/no-overlap rules (every coefficient of every component refined from
its first Ah=0 scan down a contiguous Al ladder to 0). Lesson from the
Adam7 bug this round (ROADMAP): symmetric encode/decode bugs pass
round-trip tests, so interop grids/scripts get validated independently.

Reference behavior parity: the reference ETL (SURVEY.md §2 multimodal
north star) treats media as opaque blobs; this makes decode real for the
progressive half of the dominant compressed image format.
"""

from __future__ import annotations

import struct

import numpy as np

from drive_health_etl_spark.operators.jpeg_codec import (
    _QTABLE,
    _UNZIGZAG,
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _category,
    _dct2,
    _decode_huff_symbol,
    _extend,
    _fixed_length_huffman,
    _huff_codes,
    _idct2,
    _pad_to,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
)

_DC_SYMBOLS = list(range(12))
# Progressive AC alphabet: (run, size) for size 1..10 plus ZRL (0xF0) AND the
# EOBn symbols (r << 4 | 0 for r < 15) that baseline JPEG has no use for.
_AC_PROG_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(11)]

# (component_indices, Ss, Se, Ah, Al) — libjpeg's standard progressive
# script (jcparam.c shape): coarse DC, banded coarse AC, then one-bit
# refinements down to full precision.
_SCANS_RGB: list[tuple[list[int], int, int, int, int]] = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_SCANS_GRAY: list[tuple[list[int], int, int, int, int]] = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]

_MAX_EOBRUN = 0x7FFF  # T.81 G.1.2.2: EOBn codes span runs up to 2^15 - 1


def _validate_scans(scans, n_comp: int) -> None:
    """T.81 G.1.1.1.1 legality: per (component, coefficient), scans must
    start with an Ah=0 first pass and chain Ah == previous Al down to Al=0,
    with no gaps, no overlaps, DC before AC, and single-component AC scans.
    Validated independently of encode/decode so a symmetric script bug
    cannot hide behind a passing round-trip."""
    # state[ci][k] = Al reached so far, or None before the first pass
    state: list[list[int | None]] = [[None] * 64 for _ in range(n_comp)]
    for comps, Ss, Se, Ah, Al in scans:
        if not 0 <= Ss <= Se <= 63:
            raise ValueError(f"bad spectral band {Ss}..{Se}")
        if (Ss == 0) != (Se == 0):
            raise ValueError("DC and AC may not share a scan in progressive")
        if Ss > 0 and len(comps) != 1:
            raise ValueError("AC scans must be single-component")
        for ci in comps:
            if Ss > 0 and state[ci][0] is None:
                raise ValueError(f"comp {ci}: AC scan before its DC scan")
            for k in range(Ss, Se + 1):
                prev = state[ci][k]
                if Ah == 0:
                    if prev is not None:
                        raise ValueError(f"comp {ci} coef {k}: duplicate first pass")
                else:
                    if prev != Ah:
                        raise ValueError(
                            f"comp {ci} coef {k}: refinement Ah={Ah} but reached Al={prev}"
                        )
                state[ci][k] = Al
    for ci in range(n_comp):
        for k in range(64):
            if state[ci][k] != 0:
                raise ValueError(f"comp {ci} coef {k}: never refined to Al=0")


def _coef_blocks(img: np.ndarray) -> tuple[list[np.ndarray], int, int]:
    """Quantized zigzag coefficients per component: (nby, nbx, 64) int32.
    EXACTLY the values the baseline encoder entropy-codes (shared DCT /
    quant / round), which is what makes progressive-vs-baseline decode
    parity a bit-exact assertion."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., c] for c in range(3)]
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    q = _QTABLE.astype(np.float64)
    out = []
    for plane in planes:
        padded = _pad_to(plane, nby * 8, nbx * 8)
        coefs = np.zeros((nby, nbx, 64), dtype=np.int32)
        for by in range(nby):
            for bx in range(nbx):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                quant = np.round(_dct2(block - 128.0) / q).astype(np.int32)
                coefs[by, bx] = quant.reshape(-1)[_ZIGZAG]
        out.append(coefs)
    return out, nby, nbx


# --- per-scan encoders (T.81 G.1.2) -----------------------------------------


def _emit_eobrun(writer: _BitWriter, ac_codes, eobrun: int, carried: list[int]) -> int:
    """Emit a pending EOBn symbol, its length bits, and THEN the buffered
    correction bits gathered while the run grew (G.1.2.3 ordering)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(eobrun - (1 << nbits), nbits)
        for b in carried:
            writer.write(b, 1)
        carried.clear()
    return 0


def _enc_dc_scan(writer, coefs, comps, Ah, Al, dc_codes, nby, nbx) -> None:
    if Ah == 0:  # first pass: DPCM over the point-transformed DC
        prev = {ci: 0 for ci in comps}
        for by in range(nby):
            for bx in range(nbx):
                for ci in comps:
                    t = int(coefs[ci][by, bx, 0]) >> Al  # arithmetic shift (G.1.2.1)
                    diff = t - prev[ci]
                    prev[ci] = t
                    s = _category(diff)
                    code, ln = dc_codes[s]
                    writer.write(code, ln)
                    if s:
                        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    else:  # refinement: one raw bit per block, no entropy coding
        for by in range(nby):
            for bx in range(nbx):
                for ci in comps:
                    writer.write((int(coefs[ci][by, bx, 0]) >> Al) & 1, 1)


def _enc_ac_first_block(writer, ac_codes, zz, Ss, Se, Al, eobrun, carried) -> int:
    r = 0
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> Al  # magnitude point transform (G.1.2.2)
        if t == 0:
            r += 1
            continue
        eobrun = _emit_eobrun(writer, ac_codes, eobrun, carried)
        while r > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = ac_codes[(r << 4) | s]
        writer.write(code, ln)
        writer.write(t if v >= 0 else -t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == _MAX_EOBRUN:
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, carried)
    return eobrun


def _enc_ac_refine_block(writer, ac_codes, zz, Ss, Se, Al, eobrun, carried) -> int:
    """T.81 G.1.2.3: newly-significant coefficients get (run,1)+sign;
    already-significant ones contribute one buffered correction bit whose
    emission point (after the next symbol in this block, or after the EOBn
    that closes the run) must match the decoder's read order exactly."""
    absvals = [((-int(zz[k]) if zz[k] < 0 else int(zz[k])) >> Al) for k in range(Ss, Se + 1)]
    eob = 0  # index AFTER which only zero/correction history remains
    for i, t in enumerate(absvals):
        if t == 1:
            eob = Ss + i
    br: list[int] = []  # this block's correction bits, pending a symbol
    r = 0
    for k in range(Ss, Se + 1):
        t = absvals[k - Ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, carried)
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br.clear()
        if t > 1:  # history coefficient: correction bit, run unaffected
            br.append(t & 1)
            continue
        eobrun = _emit_eobrun(writer, ac_codes, eobrun, carried)
        code, ln = ac_codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            writer.write(b, 1)
        br.clear()
        r = 0
    if r > 0 or br:
        eobrun += 1
        carried.extend(br)
        if eobrun == _MAX_EOBRUN:
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, carried)
    return eobrun


def encode_jpeg_progressive(img: np.ndarray) -> bytes:
    """Encode an (h, w) gray or (h, w, 3) RGB uint8 image as progressive
    JFIF (SOF2, 4:4:4) using the standard coarse-to-fine scan script.
    Deterministic: same input -> same bytes. The quantized coefficients are
    identical to the baseline encoder's, so decode parity is bit-exact."""
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if not gray:
        assert img.ndim == 3 and img.shape[2] == 3, "encode takes gray or RGB"
    scans = _SCANS_GRAY if gray else _SCANS_RGB
    n_comp = 1 if gray else 3
    _validate_scans(scans, n_comp)
    coefs, nby, nbx = _coef_blocks(img)

    dc_counts, dc_syms = _fixed_length_huffman(_DC_SYMBOLS)
    ac_counts, ac_syms = _fixed_length_huffman(_AC_PROG_SYMBOLS)
    dc_codes = _huff_codes(dc_counts, dc_syms)
    ac_codes = _huff_codes(ac_counts, ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(_QTABLE.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT, Huffman
    out += seg(0xFFC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xFFC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))

    for comps, Ss, Se, Ah, Al in scans:
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += seg(0xFFDA, sos)
        writer = _BitWriter()
        if Ss == 0:
            _enc_dc_scan(writer, coefs, comps, Ah, Al, dc_codes, nby, nbx)
        else:
            (ci,) = comps
            eobrun = 0
            carried: list[int] = []
            for by in range(nby):
                for bx in range(nbx):
                    zz = coefs[ci][by, bx]
                    if Ah == 0:
                        eobrun = _enc_ac_first_block(
                            writer, ac_codes, zz, Ss, Se, Al, eobrun, carried
                        )
                    else:
                        eobrun = _enc_ac_refine_block(
                            writer, ac_codes, zz, Ss, Se, Al, eobrun, carried
                        )
            _emit_eobrun(writer, ac_codes, eobrun, carried)
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --- per-scan decoders (T.81 G.2) -------------------------------------------


def _dec_dc_scan(reader, coefs, comps, Ah, Al, dc_tab, nby, nbx) -> None:
    if Ah == 0:
        prev = {ci: 0 for ci in comps}
        for by in range(nby):
            for bx in range(nbx):
                for ci in comps:
                    t = _decode_huff_symbol(reader, dc_tab)
                    diff = _extend(reader.read_bits(t), t)
                    prev[ci] += diff
                    coefs[ci][by, bx, 0] = prev[ci] << Al
    else:
        p1 = 1 << Al
        for by in range(nby):
            for bx in range(nbx):
                for ci in comps:
                    if reader.read_bit():
                        coefs[ci][by, bx, 0] = int(coefs[ci][by, bx, 0]) | p1


def _dec_ac_first_block(reader, ac_tab, zz, Ss, Se, Al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        sym = _decode_huff_symbol(reader, ac_tab)
        r, s = sym >> 4, sym & 15
        if s:
            k += r
            if k > Se:
                raise ValueError("AC run past spectral band")
            zz[k] = _extend(reader.read_bits(s), s) << Al
            k += 1
        else:
            if r != 15:  # EOBn: run of blocks whose band is done
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
    return 0


def _dec_ac_refine_block(reader, ac_tab, zz, Ss, Se, Al, eobrun) -> int:
    """T.81 G.2: while traversing, every already-nonzero coefficient costs
    one correction bit — including those inside the run that positions a
    newly-significant coefficient, and every one left when an EOB run
    covers the block."""
    p1, m1 = 1 << Al, -1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = _decode_huff_symbol(reader, ac_tab)
            r, s = sym >> 4, sym & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("refinement scan with size > 1")
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # remaining coefficients handled in EOB sweep
                # r == 15: ZRL — skip 16 zero-history positions
            while k <= Se:
                v = int(zz[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        zz[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= Se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            v = int(zz[k])
            if v != 0 and reader.read_bit() and (v & p1) == 0:
                zz[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg_progressive(blob: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JFIF stream: accumulate coefficients
    across every scan (any legal spectral-selection / successive-
    approximation script), then dequantize + IDCT once at the end. 8-bit,
    1 or 3 components, 4:4:4 only; refuses subsampled progressive, DRI,
    and arithmetic coding honestly."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []
    coefs: list[np.ndarray] = []
    nby = nbx = 0
    seen_sof = False
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 2 <= len(blob) and blob[pos + 1] == 0xFF:
            pos += 1  # fill bytes (B.1.1.2)
        marker = (blob[pos] << 8) | blob[pos + 1]
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        payload = blob[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables not supported")
                zzq = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                qtables[prec_id & 0xF] = zzq[_UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tclass, tid = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1 : p + 17])
                nsym = sum(counts)
                syms = list(payload[p + 17 : p + 17 + nsym])
                codes = _huff_codes(counts, syms)
                huff[(tclass, tid)] = {(c, l): s for s, (c, l) in codes.items()}
                p += 17 + nsym
        elif marker == 0xFFC0 or marker in (0xFFC1, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError("decode_jpeg_progressive handles SOF2 only")
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals in progressive streams")
        elif marker == 0xFFC2:
            precision, h, w, n_comp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            for ci in range(n_comp):
                cid, sampling, qid = payload[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError("progressive decode is 4:4:4 only")
                comps.append((cid, sampling, qid))
            nby, nbx = (h + 7) // 8, (w + 7) // 8
            coefs = [np.zeros((nby, nbx, 64), dtype=np.int32) for _ in comps]
            seen_sof = True
        elif marker == 0xFFDA:
            if not seen_sof:
                raise ValueError("SOS before SOF2")
            ns = payload[0]
            scan_comps: list[tuple[int, int, int]] = []
            for si in range(ns):
                cid, tables = payload[1 + 2 * si], payload[2 + 2 * si]
                comp_idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((comp_idx, tables >> 4, tables & 0xF))
            Ss, Se, AhAl = payload[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 0xF
            # entropy segment: up to the next real marker
            end = pos
            while end + 1 < len(blob):
                if blob[end] == 0xFF:
                    nxt = blob[end + 1]
                    if nxt == 0xFF:
                        end += 1
                    elif nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        end += 2
                    else:
                        break
                else:
                    end += 1
            reader = _BitReader(blob[pos:end])
            if Ss == 0:
                if Se != 0:
                    raise ValueError("interleaved DC+AC scan in progressive stream")
                dc_tab = huff[(0, scan_comps[0][1])]
                _dec_dc_scan(
                    reader, coefs, [c[0] for c in scan_comps], Ah, Al, dc_tab, nby, nbx
                )
            else:
                if ns != 1:
                    raise ValueError("AC scans must be single-component")
                comp_idx, _, ac_id = scan_comps[0]
                ac_tab = huff[(1, ac_id)]
                eobrun = 0
                for by in range(nby):
                    for bx in range(nbx):
                        zz = coefs[comp_idx][by, bx]
                        if Ah == 0:
                            eobrun = _dec_ac_first_block(reader, ac_tab, zz, Ss, Se, Al, eobrun)
                        else:
                            eobrun = _dec_ac_refine_block(reader, ac_tab, zz, Ss, Se, Al, eobrun)
            pos = end
    if not seen_sof or not coefs:
        raise ValueError("JPEG missing SOF2/SOS")

    planes = []
    for ci, (_, _, qid) in enumerate(comps):
        q = qtables[qid]
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                coef = coefs[ci][by, bx][_UNZIGZAG].astype(np.float64).reshape(8, 8) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct2(coef) + 128.0
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
