"""Baseline JPEG codec (kernels/jpeg.py): round-trip vs BMP ground
truth, hand-assembled byte-stream anchors (decoder correctness
independent of our encoder), and totality."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from indu_doc_transformer_spark.kernels import jpeg as J
from indu_doc_transformer_spark.operators.multimodal import (decode_bmp,
                                                             encode_bmp)


def _pix(x, y):
    return ((x * 13 + y * 5) % 256, (y * 9 + 30) % 256, (x * 3 + y * 17 + 100) % 256)


@pytest.mark.parametrize(
    "w,h,kw",
    [
        (16, 16, {}),
        (24, 17, {}),  # dims not multiples of 8 (edge-padded blocks)
        (13, 9, {}),
        (32, 24, {"subsample": True}),  # 4:2:0
        (19, 22, {"subsample": True}),  # 4:2:0 + odd dims
        (16, 16, {"grayscale": True}),
        (40, 40, {"restart_interval": 2}),  # DRI/RSTn path
        (33, 18, {"subsample": True, "restart_interval": 1}),
    ],
)
def test_roundtrip_matches_bmp_truth(w, h, kw):
    """encode_jpeg -> decode_jpeg_stats must reproduce the channel
    means the INDEPENDENT BMP path computes for the same pixels, within
    lossy-compression tolerance; dimensions exactly."""
    data = J.encode_jpeg(w, h, _pix, quality=92, **kw)
    W, H, means = J.decode_jpeg_stats(data)
    assert (W, H) == (w, h)
    _, _, truth = decode_bmp(encode_bmp(w, h, _pix))
    if kw.get("grayscale"):
        assert abs(means[3] - truth[3]) < 0.02
    else:
        assert max(abs(a - b) for a, b in zip(means, truth)) < 0.02
    # determinism: byte-identical re-encode, identical re-decode
    assert J.encode_jpeg(w, h, _pix, quality=92, **kw) == data
    assert J.decode_jpeg_stats(data) == (W, H, means)


class _W:
    """Minimal independent bit/byte writer for hand-built streams (NOT
    the encoder's _BitWriter — the point is decoder anchors that do not
    share encoder code)."""

    def __init__(self):
        self.out = bytearray()
        self.bits = ""

    def seg(self, marker, body):
        self.out += bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    def put(self, value, n):
        self.bits += format(value, f"0{n}b")

    def flush_scan(self):
        b = self.bits + "1" * (-len(self.bits) % 8)
        for i in range(0, len(b), 8):
            byte = int(b[i : i + 8], 2)
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)


def _hand_stream(ncomp, dc_values):
    """A hand-assembled 8x8 baseline JPEG with flat quant=1 tables and
    4-bit DC / 8-bit AC fixed-length Huffman tables; each component is
    one block holding only the given DC coefficient (solid color)."""
    w = _W()
    w.out += b"\xff\xd8"
    w.seg(0xDB, bytes([0]) + bytes([1] * 64))  # quant table 0: all ones
    sof = struct.pack(">BHHB", 8, 8, 8, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes((cid, 0x11, 0))
    w.seg(0xC0, sof)
    # DC table 0: twelve 4-bit codes (sizes 0..11); AC table 0: 162
    # 8-bit codes with EOB first (code 0b00000000)
    w.seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12)))
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    w.seg(0xC4, bytes([0x10]) + bytes([0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8)
          + bytes(ac_vals))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes((cid, 0x00))
    sos += bytes((0, 63, 0))
    w.seg(0xDA, sos)
    for dc in dc_values:
        size = abs(dc).bit_length()
        w.put(size, 4)  # DC Huffman: size s has canonical 4-bit code s
        if size:
            w.put(dc if dc > 0 else dc + (1 << size) - 1, size)
        w.put(0, 8)  # AC EOB
    w.flush_scan()
    w.out += b"\xff\xd9"
    return bytes(w.out)


def test_hand_built_grayscale_anchor():
    """Solid gray: DC coefficient 8*(c-128) with quant 1 must decode to
    pixel value c exactly (pins dequant + IDCT DC scaling + marker
    parsing against a stream our encoder never touched)."""
    for c in (200, 128, 37):
        data = _hand_stream(1, [8 * (c - 128)])
        W, H, means = J.decode_jpeg_stats(data)
        assert (W, H) == (8, 8)
        assert abs(means[0] - c / 255.0) < 1e-6, (c, means)


def test_hand_built_color_anchor():
    """Solid YCbCr (120, 150, 100) -> the BT.601 full-range RGB the
    JFIF spec gives; pins component order and the color matrix."""
    y, cb, cr = 120, 150, 100
    data = _hand_stream(3, [8 * (y - 128), 8 * (cb - 128), 8 * (cr - 128)])
    W, H, means = J.decode_jpeg_stats(data)
    r = min(max(y + 1.402 * (cr - 128), 0), 255)
    g = min(max(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128), 0), 255)
    b = min(max(y + 1.772 * (cb - 128), 0), 255)
    assert abs(means[0] - r / 255) < 1e-6
    assert abs(means[1] - g / 255) < 1e-6
    assert abs(means[2] - b / 255) < 1e-6


def test_unsupported_and_corrupt_raise_valueerror():
    data = J.encode_jpeg(16, 16, _pix)
    # progressive SOF2 flagged honestly
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        J.decode_jpeg_stats(prog)
    for bad in (b"", b"\xff\xd8", data[:40], data[:-20],
                data[:30] + b"\x00" * 10 + data[40:]):
        with pytest.raises(ValueError):
            J.decode_jpeg_stats(bad)


@given(st.binary(max_size=512), st.integers(0, 3))
@settings(max_examples=200, deadline=None)
def test_decoder_total_on_garbage(payload, mode):
    """Totality: arbitrary bytes (optionally wrapped in real JPEG
    prefixes/suffixes) either decode or raise ValueError — no other
    exception type, no hang (the E2 rule for the media kernel)."""
    if mode == 1:
        payload = b"\xff\xd8" + payload
    elif mode == 2:
        valid = J.encode_jpeg(8, 8, _pix)
        payload = valid[: len(valid) // 2] + payload
    elif mode == 3:
        payload = b"\xff\xd8\xff\xdb" + payload
    try:
        J.decode_jpeg_stats(payload)
    except ValueError:
        pass


def test_decode_image_routes_jpeg():
    """multimodal.decode_image: JPEG magic routes to the real codec
    (same feature contract as BMP); a corrupt JPEG raises (decode_ok
    False path), never falls back to the md5 fake."""
    from indu_doc_transformer_spark.operators.multimodal import decode_image

    w, h = 24, 16
    feats_j = decode_image(J.encode_jpeg(w, h, _pix, quality=95))
    feats_b = decode_image(encode_bmp(w, h, _pix))
    assert feats_j[:2] == feats_b[:2]  # exact dims features
    assert max(abs(a - b) for a, b in zip(feats_j, feats_b)) < 0.02
    with pytest.raises(ValueError):
        decode_image(J.encode_jpeg(w, h, _pix)[:-10], fake=True)


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 3),
       st.integers(40, 98))
@settings(max_examples=30, deadline=None)
def test_roundtrip_fuzz(w, h, mode, quality):
    """Random dims x mode x quality: dims always exact, means within
    lossy tolerance of the independent BMP truth (tolerance widens at
    low quality)."""
    kw = [{}, {"subsample": True}, {"grayscale": True},
          {"restart_interval": 1}][mode]

    def pix(x, y):
        return ((x * 41 + y * 7 + w) % 256, (y * 23 + h) % 256,
                (x * 11 + y * 29 + 13) % 256)

    data = J.encode_jpeg(w, h, pix, quality=quality, **kw)
    W, H, means = J.decode_jpeg_stats(data)
    assert (W, H) == (w, h)
    _, _, truth = decode_bmp(encode_bmp(w, h, pix))
    tol = 0.02 if quality >= 80 else 0.06
    if kw.get("grayscale"):
        assert abs(means[3] - truth[3]) < tol
    else:
        assert max(abs(a - b) for a, b in zip(means, truth)) < tol


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: repeated 0xFF fill bytes before a marker code are
    legal padding — the parser must skip them, not misread 0xFF as a
    marker id."""
    data = J.encode_jpeg(16, 16, _pix)
    # inject fill bytes before the DQT and SOF markers
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xc0", b"\xff\xff\xff\xff\xc0", 1)
    assert J.decode_jpeg_stats(padded) == J.decode_jpeg_stats(data)


def test_dimension_bomb_is_valueerror():
    """A <200-byte SOF declaring 65535x65535 must raise ValueError
    BEFORE any plane allocation — MemoryError would escape the
    decoder's totality contract and kill the Spark task."""
    data = J.encode_jpeg(8, 8, _pix)
    sof_at = data.find(b"\xff\xc0")
    # patch height/width fields inside SOF0 (offsets: marker+2 len+1 prec)
    bomb = bytearray(data)
    struct.pack_into(">HH", bomb, sof_at + 5, 65535, 65535)
    with pytest.raises(ValueError, match="too large"):
        J.decode_jpeg_stats(bytes(bomb))
