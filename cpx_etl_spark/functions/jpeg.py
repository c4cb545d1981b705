"""Baseline-sequential JPEG codec, pure stdlib (ITU-T T.81 / JFIF).

The decode half completes the image-container family (VERDICT r15
item 5): a real image crawl is overwhelmingly JPEG, and the PNG/BMP
decoders (operators/multimodal.py) covered only the formats the repo
synthesizes. Scope is the baseline-sequential process every camera and
thumbnail pipeline emits: 8-bit samples, Huffman entropy coding,
grayscale / 4:4:4 / 4:2:0 YCbCr, DRI/RST restart intervals. Progressive
(SOF2), arithmetic coding, 12-bit, and hierarchical modes raise
ValueError — fail-loud, per the decode_image contract.

The encode half exists for fixture synthesis and round-trip tests (the
container has no image libraries, so test JPEGs must be built here).
Encoder and decoder share the Annex-K example tables but communicate
ONLY through the byte stream — the decoder reads every table from the
file's own DQT/DHT/SOF0 segments, so a table bug cannot silently
self-cancel (pinned by the coefficient-level round-trip pytest, which
also replays the IDCT with an independent direct cosine-sum).

Everything here is deterministic integer/IEEE-double arithmetic: the
same bytes decode to the same pixels on every executor.
"""

from __future__ import annotations

import math
import struct

# zigzag scan: value at zigzag position i lives at natural index ZZ[i]
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 example quantization tables (quality-50 reference)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# separable DCT-II basis: COS[u][x] = cos((2x+1)*u*pi/16)
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7  # c(0)=1/sqrt2, else 1


def _canonical_codes(bits: list[int], vals: list[int]):
    """(value -> (code, length)) map from the canonical BITS/HUFFVAL
    construction of T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Length-bucketed canonical Huffman decoder: per code length, the
    [min_code, max_code] window plus the value offset — O(1) per bit
    of lookahead, the Annex F DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            if length >= 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | br.read_bit()
            length += 1
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; RST markers surface via at_restart()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            else:
                raise ValueError("marker inside JPEG entropy stream")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker (T.81 E.2.4)."""
        self.buf = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to the signed
    coefficient value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_2d(coef: list[float]) -> list[int]:
    """Direct separable 2-D inverse DCT of one dequantized 8x8 block
    (natural order), +128 level shift, clamped to [0, 255]."""
    tmp = [0.0] * 64
    for y in range(8):  # rows of the intermediate: IDCT over u per x
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * coef[y * 8 + u] * _COS[u][x]
            tmp[y * 8 + x] = s / 2
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[v][y]
            val = int(s / 2 + 128.5 - 1e-9)  # nudged round, then clamp
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def _fdct_2d(block: list[int]) -> list[float]:
    """Forward 2-D DCT of one 8x8 sample block (level-shifted by
    -128), natural-order float coefficients."""
    shifted = [s - 128 for s in block]
    tmp = [0.0] * 64
    for v in range(8):
        for x in range(8):
            s = 0.0
            for y in range(8):
                s += shifted[y * 8 + x] * _COS[v][y]
            tmp[v * 8 + x] = s
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += tmp[v * 8 + x] * _COS[u][x]
            out[v * 8 + u] = s * _C[u] * _C[v] / 4
    return out


def _quantize(coef: list[float], q: list[int]) -> list[int]:
    """Round half away from zero with the house 1e-9 boundary nudge:
    DC coefficients of structured blocks are EXACTLY representable
    (integer sums over /8), so .5 ties are common and a last-ulp
    difference in summation order would flip them between
    implementations — the nudge moves the boundary off the
    representable point (ties round toward zero), same as every
    cross-engine ROUND in the query layer."""
    out = []
    for c, qq in zip(coef, q):
        r = c / qq
        out.append(int(r + 0.5 - 1e-9) if r >= 0 else int(r - 0.5 + 1e-9))
    return out


def decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential JPEG to (width, height, channels,
    pixels) — row-major top-down, gray (1ch) or RGB (3ch), matching
    decode_image's layout contract. Raises ValueError on progressive /
    arithmetic / 12-bit / unsupported-sampling streams and on corrupt
    data (decode_image wraps residual struct/IndexError too)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, hs, vs, tq)])
    while True:
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG: no SOS/EOI")
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        m = b[pos + 1]
        if m == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if m in (0x01,) or 0xD0 <= m <= 0xD9:  # standalone markers
            if m == 0xD9:
                raise ValueError("JPEG EOI before SOS")
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack(">H", b[pos:pos + 2])
        data = b[pos + 2:pos + seg_len]
        if len(data) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        pos += seg_len
        if m == 0xDB:  # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tbl = [0] * 64
                for z in range(64):
                    tbl[ZIGZAG[z]] = data[i + 1 + z]
                qt[tq] = tbl
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1:i + 17])
                n = sum(bits)
                vals = list(data[i + 17:i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{m - 0xC0}): baseline "
                "sequential (SOF0) only"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ncomp_s = data[0]
            scan = {}
            for c in range(ncomp_s):
                cid, tt = data[1 + 2 * c], data[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                b, pos, frame, qt, huff, scan, restart_interval
            )
        # else: APPn/COM/other — skipped
    raise ValueError("unreachable")


def _decode_scan(b, pos, frame, qt, huff, scan, restart_interval):
    w, h, comps = frame
    if w <= 0 or h <= 0:
        raise ValueError(f"corrupt JPEG dimensions {w}x{h}")
    if len(comps) not in (1, 3):
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    if len(scan) != len(comps):
        # a baseline frame MAY split components across several scans;
        # this decoder handles the single-scan layout every common
        # encoder emits — fail loud, never a partial decode
        raise ValueError(
            "unsupported multi-scan baseline JPEG (scan covers "
            f"{len(scan)} of {len(comps)} components)"
        )
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is ONE data unit and blocks walk the component's own
        # ceil(w/8) x ceil(h/8) grid in raster order, whatever the
        # SOF sampling factors say (they only matter against other
        # components). Treating it as interleaved shuffles blocks for
        # any grayscale file with sampling != 1x1 (code-review r16).
        cid, _hs, _vs, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    for _, hs, vs, _ in comps:
        if hs not in (1, 2) or vs not in (1, 2):
            raise ValueError(f"unsupported JPEG sampling {hs}x{vs}")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # allocation guard (code-review r16): plane sizes come from the
    # SOF header, so a ~300-byte payload claiming 65000x65000 would
    # allocate gigabytes before any decode error surfaces. Every 8x8
    # block costs >= 2 entropy bits (DC code + EOB), so a payload of
    # B remaining bytes cannot encode more than 4*B blocks — reject
    # anything beyond it as corrupt, bounding allocation by payload
    # size like the PNG/BMP branches do.
    blocks_per_mcu = sum(hs * vs for _, hs, vs, _ in comps)
    if mcux * mcuy * blocks_per_mcu > 4 * max(0, len(b) - pos):
        raise ValueError(
            f"JPEG dimensions {w}x{h} implausible for "
            f"{len(b) - pos}-byte entropy payload"
        )
    br = _BitReader(b, pos)
    planes = []
    pw = []
    for _, hs, vs, _ in comps:
        bw, bh = mcux * hs, mcuy * vs  # blocks per axis
        planes.append(bytearray(bw * 8 * bh * 8))
        pw.append(bw * 8)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                if cid not in scan:
                    raise ValueError("JPEG scan missing a frame component")
                td, ta = scan[cid]
                if (0, td) not in huff or (1, ta) not in huff or tq not in qt:
                    raise ValueError("JPEG scan references missing tables")
                dch, ach, q = huff[(0, td)], huff[(1, ta)], qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coef = [0.0] * 64
                        s = dch.decode(br)
                        diff = _extend(br.receive(s), s)
                        preds[ci] += diff
                        coef[0] = preds[ci] * q[0]
                        z = 1
                        while z < 64:
                            rs = ach.decode(br)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL
                                    z += 16
                                    continue
                                break  # EOB
                            z += r
                            if z > 63:
                                raise ValueError("JPEG AC run overflow")
                            nat = ZIGZAG[z]
                            coef[nat] = _extend(br.receive(size), size) \
                                * q[nat]
                            z += 1
                        px = _idct_2d(coef)
                        row0 = (my * vs + by) * 8
                        col0 = (mx * hs + bx) * 8
                        width_p = pw[ci]
                        plane = planes[ci]
                        for yy in range(8):
                            base = (row0 + yy) * width_p + col0
                            plane[base:base + 8] = bytes(
                                px[yy * 8:yy * 8 + 8]
                            )
    if len(comps) == 1:
        plane, width_p = planes[0], pw[0]
        out = bytearray(w * h)
        for y in range(h):
            out[y * w:(y + 1) * w] = plane[y * width_p:y * width_p + w]
        return (w, h, 1, bytes(out))
    # upsample chroma by replication and convert JFIF YCbCr -> RGB
    out = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            samples = []
            for ci, (_, hs, vs, _) in enumerate(comps):
                sy = y * vs // vmax
                sx = x * hs // hmax
                samples.append(planes[ci][sy * pw[ci] + sx])
            yy, cb, cr = samples
            r = yy + 1.402 * (cr - 128)
            g = yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            bl = yy + 1.772 * (cb - 128)
            o = (y * w + x) * 3
            for k, val in enumerate((r, g, bl)):
                iv = int(val + 0.5 - 1e-9)  # negatives clamp at 0 anyway
                out[o + k] = 0 if iv < 0 else (255 if iv > 255 else iv)
    return (w, h, 3, bytes(out))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec F.1.2.3)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    bw: _BitWriter, coef: list[int], pred: int,
    dc_codes, ac_codes,
) -> int:
    """Entropy-encode one quantized natural-order block; returns the
    new DC predictor."""
    diff = coef[0] - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    zz = [coef[ZIGZAG[z]] for z in range(64)]
    run = 0
    last_nz = 0
    for z in range(63, 0, -1):
        if zz[z]:
            last_nz = z
            break
    for z in range(1, last_nz + 1):
        v = zz[z]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return coef[0]


def _plane_blocks(plane: list[int], pw: int, ph: int, bx: int, by: int):
    """One 8x8 block at block coords (bx, by), edge-replicated past
    the plane bounds."""
    out = []
    for y in range(8):
        sy = min(by * 8 + y, ph - 1)
        row = plane[sy * pw:(sy + 1) * pw]
        for x in range(8):
            out.append(row[min(bx * 8 + x, pw - 1)])
    return out


def encode_jpeg(
    pixels: bytes, width: int, height: int, channels: int,
    subsample: str = "444",
) -> bytes:
    """Baseline-sequential JPEG encoder (fixture/synthesis side):
    grayscale (channels=1) or RGB (channels=3) with 4:4:4 or 4:2:0
    chroma (``subsample``). Annex-K tables, JFIF color space,
    deterministic rounding throughout."""
    if channels not in (1, 3):
        raise ValueError(f"encode_jpeg: channels must be 1 or 3, got {channels}")
    if subsample not in ("444", "420"):
        raise ValueError(f"encode_jpeg: unsupported subsample {subsample!r}")
    if len(pixels) != width * height * channels:
        raise ValueError("encode_jpeg: pixel buffer does not match dims")

    # --- color transform + (optional) subsampling -> component planes
    if channels == 1:
        comps = [(1, 1, 1, 0)]  # (id, hs, vs, tq)
        planes = [(list(pixels), width, height)]
    else:
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            r, g, bl = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * bl
            cbv = 128 - 0.168736 * r - 0.331264 * g + 0.5 * bl
            crv = 128 + 0.5 * r - 0.418688 * g - 0.081312 * bl
            for lst, v in ((ys, yv), (cbs, cbv), (crs, crv)):
                iv = int(v + 0.5 - 1e-9)
                lst.append(0 if iv < 0 else (255 if iv > 255 else iv))
        if subsample == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [(ys, width, height), (cbs, width, height),
                      (crs, width, height)]
        else:  # 4:2:0 — 2x2 box mean, floor
            cw, ch = -(-width // 2), -(-height // 2)

            def sub(plane):
                out = []
                for y in range(ch):
                    for x in range(cw):
                        acc = 0
                        for dy in (0, 1):
                            for dx in (0, 1):
                                sy = min(2 * y + dy, height - 1)
                                sx = min(2 * x + dx, width - 1)
                                acc += plane[sy * width + sx]
                        out.append(acc // 4)
                return out

            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [(ys, width, height), (sub(cbs), cw, ch),
                      (sub(crs), cw, ch)]

    # --- headers
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    qts = [QUANT_LUMA] if channels == 1 else [QUANT_LUMA, QUANT_CHROMA]
    for tq, tbl in enumerate(qts):
        zz = bytes(tbl[ZIGZAG[z]] for z in range(64))
        out += seg(0xDB, bytes([tq]) + zz)
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    tables = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
              (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if channels == 3:
        tables += [(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, th, bits, vals in tables:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([len(comps)])
    for cid, _hs, _vs, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # huff ids mirror quant ids
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    # --- entropy-coded data, interleaved MCU order
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                plane, pww, phh = planes[ci]
                q = qts[tq]
                for by in range(vs):
                    for bx in range(hs):
                        block = _plane_blocks(
                            plane, pww, phh, mx * hs + bx, my * vs + by
                        )
                        coef = _quantize(_fdct_2d(block), q)
                        preds[ci] = _encode_block(
                            bw, coef, preds[ci],
                            dc_codes[min(tq, 1)], ac_codes[min(tq, 1)],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
