"""Baseline JPEG pixel codec — pure python, stdlib only.

The last compressed-image seam: a real baseline-sequential (SOF0, 8-bit)
JPEG decoder and a matching 4:4:4 encoder, implemented from the public
ITU-T T.81 spec (Annex F entropy coding, Annex K reference tables). The
reference's Tika reads image metadata via its parsers; this engine now
DECODES baseline JPEG pixels too, so the multimodal resize/embed kernels
run real pixel work on every image format the corpus carries.

Scope (declared): baseline sequential DCT, 8-bit, 1 or 3 components,
4:4:4 or 2x1/1x2/2x2 chroma subsampling, restart markers. Progressive
(SOF2), arithmetic coding, and 12-bit streams return None — the caller's
stub path, same contract as the other pixel codecs in core/media.py.

Everything is deterministic: the DCT/IDCT are fixed IEEE-double float
paths with explicit rounding, so decode(encode(rgb)) is stable across
runs and platforms (CPython floats are IEEE 754).
"""

from __future__ import annotations

import math
import struct

# Annex K.1 luminance / K.2 chrominance quantization tables (quality ~50)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# zigzag order: index i of the scan -> natural position
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

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# precomputed DCT basis: cos((2x+1) u pi / 16) with the 1/2 C(u) scale
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    """8x8 forward DCT (spec A.3.3), separable row-column form: 1D DCT on
    every row, then on every column — 8x fewer multiplies than the naive
    quadruple loop, identical IEEE result ordering per axis."""
    tmp = [0.0] * 64
    for y in range(8):
        row = y * 8
        for u in range(8):
            cu = _COS[u]
            s = 0.0
            for x in range(8):
                s += block[row + x] * cu[x]
            tmp[row + u] = 0.5 * _C[u] * s
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            cv = _COS[v]
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * cv[y]
            out[v * 8 + u] = 0.5 * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for v in range(8):
        row = v * 8
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * coef[row + u] * _COS[u][x]
            tmp[row + x] = 0.5 * s
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[v][y]
            out[y * 8 + x] = 0.5 * s
    return out


def _build_huff_encode(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per spec Annex C."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_decode(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for DC/AC value coding (spec F.1.2.1)."""
    if v == 0:
        return (0, 0)
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return (size, bits)


def _encode_block(
    w: _BitWriter,
    coefs: list[int],
    pred_dc: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    dc = coefs[0]
    size, bits = _magnitude(dc - pred_dc)
    c, ln = dc_tab[size]
    w.put(c, ln)
    if size:
        w.put(bits, size)
    run = 0
    for i in range(1, 64):
        v = coefs[ZIGZAG[i]]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_tab[(run << 4) | size]
        w.put(c, ln)
        w.put(bits, size)
        run = 0
    if run:
        c, ln = ac_tab[0x00]  # EOB
        w.put(c, ln)
    return dc


def build_jpeg_pixels(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down RGB as a real baseline JPEG: JFIF APP0, Annex-K
    quant + Huffman tables, 4:4:4 YCbCr, one interleaved scan."""
    # plane extraction with edge replication to 8-multiple
    bw = (width + 7) // 8 * 8
    bh = (height + 7) // 8 * 8
    planes: list[list[float]] = [[0.0] * (bw * bh) for _ in range(3)]
    for y in range(bh):
        sy = min(y, height - 1)
        for x in range(bw):
            sx = min(x, width - 1)
            p = (sy * width + sx) * 3
            r, g, b = rgb[p], rgb[p + 1], rgb[p + 2]
            i = y * bw + x
            planes[0][i] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            planes[1][i] = -0.168736 * r - 0.331264 * g + 0.5 * b
            planes[2][i] = 0.5 * r - 0.418688 * g - 0.081312 * b

    dc_l = _build_huff_encode(*HT_DC_LUMA)
    ac_l = _build_huff_encode(*HT_AC_LUMA)
    dc_c = _build_huff_encode(*HT_DC_CHROMA)
    ac_c = _build_huff_encode(*HT_AC_CHROMA)
    w = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            for comp in range(3):
                qt = QT_LUMA if comp == 0 else QT_CHROMA
                block = [
                    planes[comp][(by + yy) * bw + bx + xx]
                    for yy in range(8)
                    for xx in range(8)
                ]
                coefs = _fdct(block)
                quant = [
                    int(round(coefs[i] / qt[i])) for i in range(64)
                ]
                pred[comp] = _encode_block(
                    w,
                    quant,
                    pred[comp],
                    dc_l if comp == 0 else dc_c,
                    ac_l if comp == 0 else ac_c,
                )
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xFFDB, b"\x00" + bytes(QT_LUMA[ZIGZAG[i]] for i in range(64)))
    dqt += seg(0xFFDB, b"\x01" + bytes(QT_CHROMA[ZIGZAG[i]] for i in range(64)))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )

    def dht(cls: int, tid: int, bits: list[int], values: list[int]) -> bytes:
        return seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(bits[1:]) + bytes(values),
        )

    dhts = (
        dht(0, 0, *HT_DC_LUMA)
        + dht(1, 0, *HT_AC_LUMA)
        + dht(0, 1, *HT_DC_CHROMA)
        + dht(1, 1, *HT_AC_CHROMA)
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8" + app0 + dqt + sof + dhts + sos + bytes(w.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        while self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: byte-align, skip
                    self.pos += 2
                    self.acc = 0
                    self.n = 0
                    continue
                else:
                    return False  # EOI or another marker
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
            return True
        return False

    def bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int | None:
        v = 0
        for _ in range(k):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        b = r.bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_pixels(data: bytes) -> tuple[int, int, bytes] | None:  # noqa: PLR0912, PLR0915
    """Decode a baseline-sequential JPEG to (w, h, top-down rgb). Supports
    1/3 components, 4:4:4 and 2x-subsampled chroma, restart markers. None
    for progressive/arithmetic/12-bit or malformed streams."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, list[int]] = {}
    dcs: dict[int, dict[tuple[int, int], int]] = {}
    acs: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, qt)
    width = height = 0
    scan: bytes | None = None
    scomp: list[tuple[int, int, int]] = []  # (comp idx, dc tab, ac tab)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec = body[b] >> 4
                tid = body[b] & 0x0F
                if prec != 0:
                    return None  # 16-bit tables: out of scope
                raw = body[b + 1 : b + 65]
                qts[tid] = [0] * 64
                for i in range(64):
                    qts[tid][ZIGZAG[i]] = raw[i]
                b += 65
        elif marker == 0xC0 or marker == 0xC1:
            if body[0] != 8:
                return None
            height, width = struct.unpack_from(">HH", body, 1)
            n = body[5]
            comps = []
            for c in range(n):
                cid, hv, qt = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, qt))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                cls = body[b] >> 4
                tid = body[b] & 0x0F
                bits = [0] + list(body[b + 1 : b + 17])
                nval = sum(bits)
                values = list(body[b + 17 : b + 17 + nval])
                tab = _build_huff_decode(bits, values)
                (dcs if cls == 0 else acs)[tid] = tab
                b += 17 + nval
        elif marker == 0xDA:
            n = body[0]
            scomp = []
            for c in range(n):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next((i for i, cc in enumerate(comps) if cc[0] == cid), None)
                if idx is None:
                    return None
                scomp.append((idx, tabs >> 4, tabs & 0x0F))
            scan = data[pos + 2 + ln :]
            break
        pos += 2 + ln
    if scan is None or not comps or width == 0 or height == 0:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        return None
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component pixel planes at full MCU-padded resolution
    pw = [mcux * 8 * c[1] for c in comps]
    ph = [mcuy * 8 * c[2] for c in comps]
    planes = [bytearray(pw[i] * ph[i]) for i in range(len(comps))]
    r = _BitReader(scan)
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, dct, act in scomp:
                _, hs, vs, qtid = comps[ci]
                qt = qts.get(qtid)
                dc_tab = dcs.get(dct)
                ac_tab = acs.get(act)
                if qt is None or dc_tab is None or ac_tab is None:
                    return None
                for by in range(vs):
                    for bx in range(hs):
                        sym = _decode_huff(r, dc_tab)
                        if sym is None:
                            return None
                        bits = r.bits(sym)
                        if bits is None:
                            return None
                        pred[ci] += _extend(bits, sym)
                        coefs = [0.0] * 64
                        coefs[0] = pred[ci] * qt[0]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(r, ac_tab)
                            if sym is None:
                                return None
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            bits = r.bits(size)
                            if bits is None or k > 63:
                                return None
                            coefs[ZIGZAG[k]] = _extend(bits, size) * qt[ZIGZAG[k]]
                            k += 1
                        pix = _idct(coefs)
                        px0 = (mx * hs + bx) * 8
                        py0 = (my * vs + by) * 8
                        plane = planes[ci]
                        rowlen = pw[ci]
                        for yy in range(8):
                            base = (py0 + yy) * rowlen + px0
                            for xx in range(8):
                                v = int(round(pix[yy * 8 + xx])) + 128
                                plane[base + xx] = 0 if v < 0 else (255 if v > 255 else v)
    # upsample + color convert
    out = bytearray(width * height * 3)
    if len(comps) == 1:
        for y in range(height):
            for x in range(width):
                g = planes[0][y * pw[0] + x]
                p = (y * width + x) * 3
                out[p] = out[p + 1] = out[p + 2] = g
        return (width, height, bytes(out))
    if len(comps) != 3:
        return None
    for y in range(height):
        for x in range(width):
            yv = planes[0][(y * comps[0][2] // vmax) * pw[0] + (x * comps[0][1] // hmax)]
            cb = planes[1][(y * comps[1][2] // vmax) * pw[1] + (x * comps[1][1] // hmax)] - 128
            cr = planes[2][(y * comps[2][2] // vmax) * pw[2] + (x * comps[2][1] // hmax)] - 128
            rr = int(round(yv + 1.402 * cr))
            gg = int(round(yv - 0.344136 * cb - 0.714136 * cr))
            bb = int(round(yv + 1.772 * cb))
            p = (y * width + x) * 3
            out[p] = 0 if rr < 0 else (255 if rr > 255 else rr)
            out[p + 1] = 0 if gg < 0 else (255 if gg > 255 else gg)
            out[p + 2] = 0 if bb < 0 else (255 if bb > 255 else bb)
    return (width, height, bytes(out))
