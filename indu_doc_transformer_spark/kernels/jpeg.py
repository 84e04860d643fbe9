"""Pure-Python baseline JPEG codec (public-knowledge algorithm,
ITU-T T.81 / ISO 10918-1 sequential DCT, Huffman entropy coding).

Decoder (`decode_jpeg`) supports the baseline feature set that covers
real-world JFIF files: 8-bit precision SOF0/SOF1, 1- or 3-component
scans, arbitrary 1-2x sampling factors (4:4:4, 4:2:2, 4:2:0),
multiple DQT/DHT segments, 16-bit quantizers, restart markers
(DRI/RSTn), APPn/COM skip. Progressive (SOF2) and arithmetic coding
raise ValueError — honestly unsupported, not silently wrong.

Encoder (`encode_jpeg`) produces valid baseline streams (Annex K
quantization tables scaled by the libjpeg quality formula; fixed-length
canonical Huffman tables — legal, simpler than the Annex K defaults —
written as DHT so any decoder reads them) for the synthetic corpus and
tests; optional 4:2:0 subsampling and restart intervals exercise the
decoder's harder paths. Both directions are deterministic pure Python —
correctness/plumbing path, not a throughput codec (the 100-TB decode
story is the mapInPandas kernel shape in operators/multimodal.py, where
a native codec slots into the same signature).

Replaces the round-4 NotImplementedError stub for compressed images
(reference analog: the PDF raster handling in
/root/reference/src/indu_doc/plugins/eplan_pdfs/, which delegates to a
native library; here the algorithm itself is implemented).
"""

from __future__ import annotations

import math
import struct

# decode bound: a pure-Python correctness decoder has no business with
# gigapixel frames, and an unvalidated SOF must never drive allocation
MAX_PIXELS = 1 << 24  # 16.7 MP (a full camera frame; planes stay sub-GB)

# zigzag position k -> natural (row-major) coefficient index
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

# Annex K example quantization tables (luminance / chrominance)
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

# separable DCT basis: _COS[u][x] = a(u) * cos((2x+1) u pi / 16)
_COS = [
    [
        (math.sqrt(0.125) if u == 0 else 0.5)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _idct2(coefs: list[float]) -> list[int]:
    """64 natural-order coefficients -> 64 clamped pixel values."""
    # rows: for each vertical frequency v, IDCT across u
    tmp = [0.0] * 64
    for v in range(8):
        base = v * 8
        row = coefs[base : base + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                c = row[u]
                if c:
                    s += c * _COS[u][x]
            tmp[base + x] = s
    out = [0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                c = col[v]
                if c:
                    s += c * _COS[v][y]
            p = int(round(s)) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def _fdct2(pix: list[int]) -> list[float]:
    """64 pixel values -> 64 natural-order DCT coefficients."""
    shifted = [p - 128 for p in pix]
    tmp = [0.0] * 64
    for y in range(8):
        row = shifted[y * 8 : y * 8 + 8]
        for u in range(8):
            cu = _COS[u]
            tmp[y * 8 + u] = sum(row[x] * cu[x] for x in range(8))
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            cv = _COS[v]
            out[v * 8 + u] = sum(col[y] * cv[y] for y in range(8))
    return out


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(BITS counts per length 1..16, HUFFVAL) -> {(length, code): value}
    via the canonical code assignment of T.81 Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(values):
                raise ValueError("bad Huffman table: counts exceed values")
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Inverse mapping for the encoder: value -> (code, length)."""
    return {v: (c, l) for (l, c), v in _build_huffman(bits, values).items()}


class _EndOfData(ValueError):
    pass


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops (raises) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise _EndOfData("truncated entropy-coded data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise _EndOfData("truncated entropy-coded data")
            nb = d[self.pos + 1]
            if nb == 0x00:
                self.pos += 2
                return 0xFF
            raise _EndOfData("marker inside entropy-coded data")
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.cnt == 0:
            self.buf = self._next_byte()
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.cnt = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("missing restart marker")
        m = d[self.pos + 1]
        if m != 0xD0 + (n & 7):
            raise ValueError(f"unexpected marker 0xFF{m:02X} at restart point")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the `size`-bit magnitude to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "plane", "bw", "bh")


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG. Returns (width, height, planes, comps)
    where planes[i] is component i's pixel list at its own resolution
    (bw*8 x bh*8 blocks) and comps carries sampling factors. Raises
    ValueError on anything unsupported or malformed (totality: short
    segments surface as struct/index errors inside, normalized here)."""
    try:
        return _decode_jpeg_impl(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg_impl(payload: bytes):
    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    planes: list[list[int]] = []

    while True:
        if pos + 4 > len(d):
            raise ValueError("truncated JPEG (no EOI)")
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: optional fill bytes (repeated 0xFF) may precede
        # any marker code
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        seg_len = struct.unpack_from(">H", d, pos)[0]
        if seg_len < 2 or pos + seg_len > len(d):
            raise ValueError("bad segment length")
        seg = d[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq_id = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(seg):
                    raise ValueError("truncated DQT")
                raw = (
                    list(struct.unpack_from(f">{64}H", seg, i))
                    if pq
                    else list(seg[i : i + 64])
                )
                if min(raw) < 1:
                    raise ValueError("zero quantizer value (illegal table)")
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = raw[k]
                qt[tq_id] = tbl
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT")
                (huff_ac if tc else huff_dc)[th] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline+extended sequential
            prec, height, width, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if width == 0 or height == 0:
                raise ValueError("zero dimensions")
            if width * height > MAX_PIXELS:
                # a <200-byte crafted SOF can declare 65535x65535 and
                # would otherwise force a ~34 GB plane allocation
                # (MemoryError escapes the ValueError-totality
                # contract); bound BEFORE allocating
                raise ValueError(
                    f"image too large: {width}x{height} > {MAX_PIXELS} px"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq_id = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comp = _Component()
                comp.cid, comp.h, comp.v, comp.tq = cid, hv >> 4, hv & 15, tq_id
                if not (1 <= comp.h <= 4 and 1 <= comp.v <= 4):
                    raise ValueError("bad sampling factors")
                comps.append(comp)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG flavor (SOF marker 0xFF{marker:02X}: "
                "progressive/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("partial scans unsupported (baseline only)")
            by_id = {c.cid: c for c in comps}
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
                if cs not in by_id:
                    raise ValueError("scan references unknown component")
                by_id[cs].td, by_id[cs].ta = tdta >> 4, tdta & 15
            planes = _decode_scan(d, pos, comps, qt, huff_dc, huff_ac,
                                  width, height, restart_interval)
            break
        # APPn / COM / DNL etc.: skipped

    return width, height, planes, comps


def _decode_scan(d, pos, comps, qt, huff_dc, huff_ac, width, height,
                 restart_interval):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    single = len(comps) == 1
    if single:
        # non-interleaved: MCU is one block of the lone component
        comps[0].h = comps[0].v = hmax = vmax = 1
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.plane = [0] * (c.bw * 8 * c.bh * 8)
        c.pred = 0
        if c.tq not in qt:
            raise ValueError("missing quantization table")
        if c.td not in huff_dc or c.ta not in huff_ac:
            raise ValueError("missing Huffman table")

    reader = _BitReader(d, pos)
    rst_n = 0
    since_rst = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and since_rst == restart_interval:
                    reader.sync_restart(rst_n)
                    rst_n = (rst_n + 1) & 7
                    since_rst = 0
                    for c in comps:
                        c.pred = 0
                for c in comps:
                    for by in range(c.v):
                        for bx in range(c.h):
                            _decode_block(
                                reader, c, qt[c.tq], huff_dc[c.td],
                                huff_ac[c.ta],
                                mx * c.h + bx, my * c.v + by,
                            )
                since_rst += 1
    except _EndOfData as e:
        raise ValueError(str(e)) from e
    return [c.plane for c in comps]


def _decode_block(reader, c, q, hdc, hac, bx, by):
    coefs = [0.0] * 64
    size = reader.decode_symbol(hdc)
    if size > 11:
        raise ValueError("bad DC size")
    diff = _extend(reader.read_bits(size), size)
    c.pred += diff
    coefs[0] = c.pred * q[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(hac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        nat = ZIGZAG[k]
        coefs[nat] = _extend(reader.read_bits(s), s) * q[nat]
        k += 1
    pix = _idct2(coefs)
    row0 = by * 8
    col0 = bx * 8
    stride = c.bw * 8
    plane = c.plane
    for y in range(8):
        dst = (row0 + y) * stride + col0
        src = y * 8
        plane[dst : dst + 8] = pix[src : src + 8]


def decode_jpeg_stats(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode and reduce to the multimodal feature contract:
    (width, height, [mean_r, mean_g, mean_b, mean_luma]) in 0..1 —
    the same shape decode_bmp returns, so decode_image treats BMP and
    JPEG uniformly. Chroma is upsampled by sample replication (the
    JFIF box default); YCbCr -> RGB per the JFIF full-range BT.601
    matrix."""
    width, height, planes, comps = decode_jpeg(bytes(payload))
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if len(comps) == 1:
        plane = planes[0]
        stride = comps[0].bw * 8
        tot = 0
        for y in range(height):
            base = y * stride
            tot += sum(plane[base : base + width])
        m = tot / (width * height * 255.0)
        return width, height, [m, m, m, m]
    strides = [c.bw * 8 for c in comps]
    sy, scb, scr = planes
    cy, ccb, ccr = comps
    tr = tg = tb = 0.0
    for y in range(height):
        ybase = y * strides[0]
        cbb = (y * ccb.v // vmax) * strides[1]
        crb = (y * ccr.v // vmax) * strides[2]
        for x in range(width):
            Y = sy[ybase + x]
            Cb = scb[cbb + (x * ccb.h // hmax)] - 128
            Cr = scr[crb + (x * ccr.h // hmax)] - 128
            r = Y + 1.402 * Cr
            g = Y - 0.344136 * Cb - 0.714136 * Cr
            b = Y + 1.772 * Cb
            tr += min(max(r, 0.0), 255.0)
            tg += min(max(g, 0.0), 255.0)
            tb += min(max(b, 0.0), 255.0)
    n = width * height * 255.0
    mr, mg, mb = tr / n, tg / n, tb / n
    luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
    return width, height, [mr, mg, mb, luma]


# ---------------------------------------------------------------------------
# encoder (synthetic corpus + tests)
# ---------------------------------------------------------------------------

# fixed-length canonical Huffman tables: 12 DC size symbols at 4 bits,
# the 162 baseline AC symbols at 8 bits (both leave the all-ones code
# unused, as T.81 Annex C requires)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.cnt = 0

    def flush(self) -> None:
        while self.cnt:
            self.write(1, 1)  # pad with 1-bits per T.81

    def marker(self, m: int) -> None:
        self.flush()
        self.out += bytes((0xFF, m))


def _quality_scale(tbl: list[int], quality: int) -> list[int]:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((t * scale + 50) // 100, 1), 255) for t in tbl]


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (size, size-bit magnitude code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _encode_block(w, pix, q, dc_tab, ac_tab, pred):
    coefs = _fdct2(pix)
    zz = [int(round(coefs[ZIGZAG[k]] / q[ZIGZAG[k]])) for k in range(64)]
    diff = zz[0] - pred
    size, mag = _magnitude(diff)
    code, length = dc_tab[size]
    w.write(code, length)
    if size:
        w.write(mag, size)
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]  # ZRL
            w.write(c, l)
            run -= 16
        size, mag = _magnitude(zz[k])
        c, l = ac_tab[(run << 4) | size]
        w.write(c, l)
        w.write(mag, size)
        run = 0
    if last < 63:
        c, l = ac_tab[0x00]  # EOB
        w.write(c, l)
    return zz[0]


def _get_block(plane, pw, ph, x0, y0):
    """8x8 block with edge replication."""
    out = [0] * 64
    for y in range(8):
        sy = min(y0 + y, ph - 1)
        base = sy * pw
        for x in range(8):
            out[y * 8 + x] = plane[base + min(x0 + x, pw - 1)]
    return out


def encode_jpeg(
    width: int,
    height: int,
    pixel_fn,
    quality: int = 90,
    subsample: bool = False,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF stream from ``pixel_fn(x, y) -> (r, g, b)``.
    ``subsample`` emits 4:2:0 (box-averaged chroma), ``grayscale`` a
    single-component scan, ``restart_interval`` DRI/RSTn markers."""
    yp, cb, cr = [], [], []
    for y in range(height):
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            yp.append(int(round(min(max(yy, 0), 255))))
            if not grayscale:
                cb.append(int(round(min(max(128 - 0.168736 * r - 0.331264 * g + 0.5 * b, 0), 255))))
                cr.append(int(round(min(max(128 + 0.5 * r - 0.418688 * g - 0.081312 * b, 0), 255))))

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    dc_tab = _encode_huffman(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _encode_huffman(_ENC_AC_BITS, _ENC_AC_VALS)

    w = _BitWriter()
    w.out += b"\xff\xd8"  # SOI
    for tid, q in ((0, ql),) + (() if grayscale else ((1, qc),)):
        seg = bytes([tid]) + bytes(q[ZIGZAG[k]] for k in range(64))
        w.out += b"\xff\xdb" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        w.out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    nc = 1 if grayscale else 3
    sof = struct.pack(">BHHB", 8, height, width, nc)
    if grayscale:
        sof += bytes((1, 0x11, 0))
    else:
        hv = 0x22 if subsample else 0x11
        sof += bytes((1, hv, 0, 2, 0x11, 1, 3, 0x11, 1))
    w.out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS),
                           (1, _ENC_AC_BITS, _ENC_AC_VALS)):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        w.out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes((cid, 0x00))
    sos += bytes((0, 63, 0))
    w.out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    if grayscale:
        mcux, mcuy = (width + 7) // 8, (height + 7) // 8
        comps = [(yp, width, height, ql, 1, 1)]
    elif subsample:
        cw, ch = (width + 1) // 2, (height + 1) // 2
        cbs = [0] * (cw * ch)
        crs = [0] * (cw * ch)
        for y in range(ch):
            for x in range(cw):
                acc_b = acc_r = n = 0
                for dy in range(2):
                    for dx in range(2):
                        sy_, sx_ = 2 * y + dy, 2 * x + dx
                        if sy_ < height and sx_ < width:
                            acc_b += cb[sy_ * width + sx_]
                            acc_r += cr[sy_ * width + sx_]
                            n += 1
                cbs[y * cw + x] = (acc_b + n // 2) // n
                crs[y * cw + x] = (acc_r + n // 2) // n
        mcux, mcuy = (width + 15) // 16, (height + 15) // 16
        comps = [
            (yp, width, height, ql, 2, 2),
            (cbs, cw, ch, qc, 1, 1),
            (crs, cw, ch, qc, 1, 1),
        ]
    else:
        mcux, mcuy = (width + 7) // 8, (height + 7) // 8
        comps = [
            (yp, width, height, ql, 1, 1),
            (cb, width, height, qc, 1, 1),
            (cr, width, height, qc, 1, 1),
        ]

    preds = [0] * len(comps)
    rst_n = 0
    since = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since == restart_interval:
                w.marker(0xD0 + (rst_n & 7))
                rst_n += 1
                since = 0
                preds = [0] * len(comps)
            for ci, (plane, pw, ph, q, ch_, cv_) in enumerate(comps):
                for by in range(cv_):
                    for bx in range(ch_):
                        block = _get_block(
                            plane, pw, ph,
                            (mx * ch_ + bx) * 8, (my * cv_ + by) * 8,
                        )
                        preds[ci] = _encode_block(
                            w, block, q, dc_tab, ac_tab, preds[ci]
                        )
            since += 1
    w.marker(0xD9)  # EOI
    return bytes(w.out)
