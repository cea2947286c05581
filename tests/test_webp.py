"""VP8L (lossless WebP) codec tests.

Round-trips cover the encoder+decoder pair; the hand-assembled
bitstreams cover the decoder paths the minimal encoder never emits
(LZ77 backward references, color cache, all four transforms,
repeat/zero-run code-length codes, the max_symbol short form,
meta-prefix segmentation), each checked against independently computed
expected pixels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import ImageFormatError
from image_matadata_batchprocessing_aws_spark.multimodal.webp import (
    _NUM_LENGTH_CODES,
    _BitWriter,
    _write_prefix_code,
    decode_webp,
    encode_webp_lossless,
)


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)


def _plain_books(bw: _BitWriter, argb_pixels):
    """No cache, no meta; emit the 5 prefix codes for a literal body."""
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta prefix image

    def freq(shift):
        out = {}
        for p in argb_pixels:
            v = (p >> shift) & 0xFF
            out[v] = out.get(v, 0) + 1
        return out

    g = _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, freq(8))
    r = _write_prefix_code(bw, 256, freq(16))
    b = _write_prefix_code(bw, 256, freq(0))
    a = _write_prefix_code(bw, 256, freq(24))
    _write_prefix_code(bw, 40, {0: 1})
    return g, r, b, a


def _emit_literals(bw: _BitWriter, books, argb_pixels) -> None:
    g, r, b, a = books
    for p in argb_pixels:
        for book, shift in ((g, 8), (r, 16), (b, 0), (a, 24)):
            code, ln = book[(p >> shift) & 0xFF]
            bw.write_code(code, ln)


def _argb(rgb_rows) -> list[int]:
    return [
        (255 << 24) | (r << 16) | (g << 8) | b
        for row in rgb_rows
        for (r, g, b) in row
    ]


# --- round-trips -----------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (7, 13), (64, 1), (1, 64), (33, 17)])
def test_roundtrip_random(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_roundtrip_solid_and_two_tone():
    img = np.full((56, 32, 3), (200, 5, 99), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)
    two = np.zeros((16, 16, 3), np.uint8)
    two[::2] = (10, 250, 3)
    assert np.array_equal(decode_webp(encode_webp_lossless(two)), two)


def test_roundtrip_gradient():
    y, x = np.mgrid[0:40, 0:30]
    img = np.stack([(x * 8) % 256, (y * 7) % 256, (x + y) % 256], -1).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


# --- hand-assembled decoder-path streams -----------------------------------


def test_lz77_copy_and_2d_distance():
    """Literal then a length-5 copy at distance 1 (via the 2D map entry
    (1,0) = distance code 2), on a 3x2 image; second row starts with a
    copy at distance w (map entry (0,1) = distance code 1)."""
    w, h = 3, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    # green code: symbols {5 (literal), 256+3 (length code 3 -> len 4),
    # 256+0 (len 1)}; normal codes via the helper
    g = _write_prefix_code(
        bw, 256 + _NUM_LENGTH_CODES, {5: 1, 256 + 3: 1, 256 + 0: 1}
    )
    r = _write_prefix_code(bw, 256, {77: 1})
    b = _write_prefix_code(bw, 256, {9: 1})
    a = _write_prefix_code(bw, 256, {255: 1})
    d = _write_prefix_code(bw, 40, {0: 1, 1: 1})  # dist codes 1 and 2
    # pixel 0: literal (77, 5, 9)
    for book, sym in ((g, 5), (r, 77), (b, 9), (a, 255)):
        bw.write_code(*book[sym])
    # copy length 4 (length prefix code 3), distance code 2 -> (1,0) -> 1
    bw.write_code(*g[256 + 3])
    bw.write_code(*d[1])
    # copy length 1 (length prefix code 0), distance code 1 -> (0,1) -> w
    bw.write_code(*g[256 + 0])
    bw.write_code(*d[0])
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    assert np.array_equal(out, np.full((h, w, 3), (77, 5, 9), np.uint8))


def test_color_cache_symbol():
    """cache_bits=4: a literal pixel then its cache symbol."""
    w, h = 2, 1
    px = (255 << 24) | (10 << 16) | (20 << 8) | 30
    idx = ((px * 0x1E35A7BD) & 0xFFFFFFFF) >> 28
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(1, 1)  # color cache
    bw.write_bits(4, 4)  # cache_bits = 4
    bw.write_bits(0, 1)  # no meta
    cache_sym = 256 + _NUM_LENGTH_CODES + idx
    g = _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES + 16, {20: 1, cache_sym: 1})
    r = _write_prefix_code(bw, 256, {10: 1})
    b = _write_prefix_code(bw, 256, {30: 1})
    a = _write_prefix_code(bw, 256, {255: 1})
    _write_prefix_code(bw, 40, {0: 1})
    for book, sym in ((g, 20), (r, 10), (b, 30), (a, 255)):
        bw.write_code(*book[sym])
    bw.write_code(*g[cache_sym])
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    assert np.array_equal(out, np.full((1, 2, 3), (10, 20, 30), np.uint8))


def test_subtract_green_transform():
    w, h = 4, 3
    rng = np.random.default_rng(3)
    coded = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pixels = _argb([[tuple(int(v) for v in coded[y, x]) for x in range(w)] for y in range(h)])
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(1, 1)  # a transform
    bw.write_bits(2, 2)  # subtract green
    bw.write_bits(0, 1)  # no more transforms
    books = _plain_books(bw, pixels)
    _emit_literals(bw, books, pixels)
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    exp = coded.astype(np.int32)
    exp[:, :, 0] = (exp[:, :, 0] + exp[:, :, 1]) % 256  # r += g
    exp[:, :, 2] = (exp[:, :, 2] + exp[:, :, 1]) % 256  # b += g
    assert np.array_equal(out, exp.astype(np.uint8))


def _predictor_stream(w, h, mode, residuals):
    """Stream with a predictor transform using one mode for the whole
    image (block size 256 >= dims, sub-image = 1 pixel whose green
    holds the mode)."""
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(1, 1)
    bw.write_bits(0, 2)  # predictor transform
    bw.write_bits(6, 3)  # size_bits = 8 -> 256x256 blocks
    mode_px = [(255 << 24) | (mode << 8)]
    bw.write_bits(0, 1)  # sub-image: no cache
    books = (
        _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, {mode: 1}),
        _write_prefix_code(bw, 256, {0: 1}),
        _write_prefix_code(bw, 256, {0: 1}),
        _write_prefix_code(bw, 256, {255: 1}),
        _write_prefix_code(bw, 40, {0: 1}),
    )
    _emit_literals(bw, books[:4], mode_px)
    bw.write_bits(0, 1)  # main image: no more transforms
    main_books = _plain_books(bw, residuals)
    _emit_literals(bw, main_books, residuals)
    return _wrap(bytes([0x2F]) + bw.flush())


def test_predictor_mode_top():
    """Mode 2 (T): row 0 uses forced L prediction, later rows add the
    pixel above; expected image computable by cumulative sums."""
    w, h = 4, 3
    rng = np.random.default_rng(9)
    res = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
    pixels = _argb([[tuple(int(v) for v in res[y, x]) for x in range(w)] for y in range(h)])
    out = decode_webp(_predictor_stream(w, h, 2, pixels))
    exp = np.zeros((h, w, 3), dtype=np.int64)
    # (0,0): pred ARGB 0xff000000 -> rgb (0,0,0)
    exp[0, 0] = res[0, 0] % 256
    for x in range(1, w):  # row 0: forced L
        exp[0, x] = (exp[0, x - 1] + res[0, x]) % 256
    for y in range(1, h):  # mode T everywhere (x==0 forced T too)
        exp[y] = (exp[y - 1] + res[y]) % 256
    assert np.array_equal(out, exp.astype(np.uint8))


def test_predictor_mode_clamp_add_subtract_full():
    """Mode 12 on a 2x2 image: only pixel (1,1) uses the mode (others
    are forced edges); clamp(L + T - TL) per channel."""
    res = [[(10, 20, 30), (100, 120, 140)], [(7, 8, 9), (200, 50, 250)]]
    pixels = _argb(res)
    out = decode_webp(_predictor_stream(2, 2, 12, pixels))
    p00 = np.array([10, 20, 30])
    p01 = (p00 + [100, 120, 140]) % 256
    p10 = (p00 + [7, 8, 9]) % 256
    pred = np.clip(p10 + p01 - p00, 0, 255)  # L + T - TL
    p11 = (pred + [200, 50, 250]) % 256
    exp = np.array([[p00, p01], [p10, p11]], dtype=np.uint8)
    assert np.array_equal(out, exp)


def test_color_transform_inverse():
    """One color-transform block with known deltas; verify against the
    spec formula computed independently."""
    w, h = 2, 1
    g2r, g2b, r2b = 16, 240, 8  # 16, -16, 8 as int8
    coded = [(50, 100, 200), (255, 3, 7)]
    pixels = _argb([coded])
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(1, 1)
    bw.write_bits(1, 2)  # color transform
    bw.write_bits(6, 3)  # 256x256 blocks
    cte = [(255 << 24) | (r2b << 16) | (g2b << 8) | g2r]
    bw.write_bits(0, 1)
    books = (
        _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, {g2b: 1}),
        _write_prefix_code(bw, 256, {r2b: 1}),
        _write_prefix_code(bw, 256, {g2r: 1}),
        _write_prefix_code(bw, 256, {255: 1}),
        _write_prefix_code(bw, 40, {0: 1}),
    )
    _emit_literals(bw, books[:4], cte)
    bw.write_bits(0, 1)
    main_books = _plain_books(bw, pixels)
    _emit_literals(bw, main_books, pixels)
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))

    def s8(v):
        return v - 256 if v >= 128 else v

    exp = []
    for r0, g0, b0 in coded:
        r1 = (r0 + ((s8(g2r) * s8(g0)) >> 5)) & 0xFF
        b1 = (b0 + ((s8(g2b) * s8(g0)) >> 5) + ((s8(r2b) * s8(r1)) >> 5)) & 0xFF
        exp.append((r1, g0, b1))
    assert np.array_equal(out, np.array([exp], dtype=np.uint8))


def test_color_indexing_packed():
    """4-color palette -> 2-bit bundled indices (2 packed pixels per
    row of width 7, 4 indices per green byte)."""
    w, h = 7, 2
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = [[0, 1, 2, 3, 3, 2, 1], [1, 1, 0, 2, 3, 0, 0]]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(1, 1)
    bw.write_bits(3, 2)  # color indexing
    bw.write_bits(3, 8)  # palette size - 1
    # palette image (4x1), delta-coded
    deltas = []
    prev = (0, 0, 0)
    for p in palette:
        deltas.append(((255 if not deltas else 0) << 24)  # alpha delta: first 255, then 0
                      | (((p[0] - prev[0]) % 256) << 16)
                      | (((p[1] - prev[1]) % 256) << 8)
                      | ((p[2] - prev[2]) % 256))
        prev = p
    bw.write_bits(0, 1)  # palette stream: no cache
    books = (
        _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, _freq(deltas, 8)),
        _write_prefix_code(bw, 256, _freq(deltas, 16)),
        _write_prefix_code(bw, 256, _freq(deltas, 0)),
        _write_prefix_code(bw, 256, _freq(deltas, 24)),
        _write_prefix_code(bw, 40, {0: 1}),
    )
    _emit_literals(bw, books[:4], deltas)
    bw.write_bits(0, 1)  # no more transforms
    # packed main image: width ceil(7/4) = 2
    packed = []
    for row in idx:
        for base in range(0, w, 4):
            g = 0
            for k, v in enumerate(row[base : base + 4]):
                g |= v << (2 * k)
            packed.append((255 << 24) | (g << 8))
    main_books = _plain_books(bw, packed)
    _emit_literals(bw, main_books, packed)
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    exp = np.array([[palette[v] for v in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out, exp)


def _freq(pixels, shift):
    out = {}
    for p in pixels:
        v = (p >> shift) & 0xFF
        out[v] = out.get(v, 0) + 1
    return out


def test_rle_code_lengths_and_max_symbol():
    """Green code transmitted with zero-run symbols (18) and the
    max_symbol short form; symbols 0 and 255 get 1-bit codes."""
    w, h = 4, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    # green code, hand-written normal form
    bw.write_bits(0, 1)  # not simple
    # cl code: symbols {1: len1, 18: len1}; order = 17,18,0,1 -> n=4
    bw.write_bits(0, 4)  # num_code_lengths - 4 = 0
    for v in (0, 1, 0, 1):  # lengths for order slots 17, 18, 0, 1
        bw.write_bits(v, 3)
    # canonical: sym 1 -> code 0, sym 18 -> code 1
    bw.write_bits(1, 1)  # use max_symbol short form
    bw.write_bits(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write_bits(2, 8)  # max_symbol = 2 + 2 = 4 reads
    bw.write_code(0, 1)  # sym 0: length 1
    bw.write_code(1, 1)  # 18: zero-run
    bw.write_bits(127, 7)  # run 11 + 127 = 138 (symbols 1..138)
    bw.write_code(1, 1)  # 18: zero-run
    bw.write_bits(105, 7)  # run 116 (symbols 139..254)
    bw.write_code(0, 1)  # sym 255: length 1
    # remaining green symbols (256..279): zero via early stop
    r = _write_prefix_code(bw, 256, {128: 1})
    b = _write_prefix_code(bw, 256, {64: 1})
    a = _write_prefix_code(bw, 256, {255: 1})
    _write_prefix_code(bw, 40, {0: 1})
    for gsym in (0, 255, 255, 0):
        bw.write_code(0 if gsym == 0 else 1, 1)  # canonical: 0 -> 0, 255 -> 1
        bw.write_code(*r[128])
        bw.write_code(*b[64])
        bw.write_code(*a[255])
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    exp = np.array([[(128, 0, 64), (128, 255, 64), (128, 255, 64), (128, 0, 64)]], np.uint8)
    assert np.array_equal(out, exp)


def test_repeat_previous_len16():
    """Symbol 16 (repeat previous nonzero length), complete 8-symbol
    length-3 code built with literal + two 16-runs (4 cl reads)."""
    w, h = 8, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)  # green: not simple
    order_vals = {18: 1, 3: 2, 16: 2}
    # kCodeLengthCodeOrder (RFC 9649): 16 sits between 5 and 6 — the r06
    # _CL_ORDER fix corrected the same symmetric mistake here
    slots = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    bw.write_bits(len(slots) - 4, 4)
    for s in slots:
        bw.write_bits(order_vals.get(s, 0), 3)
    cl = {18: (0, 1), 3: (0b10, 2), 16: (0b11, 2)}
    bw.write_bits(1, 1)
    bw.write_bits(1, 3)  # nbits = 4
    bw.write_bits(1, 4)  # max_symbol = 3 reads (exactly the reads below)
    bw.write_code(*cl[3])  # sym 0: len 3
    bw.write_code(*cl[16])
    bw.write_bits(1, 2)  # repeat 4 (syms 1..4)
    bw.write_code(*cl[16])
    bw.write_bits(0, 2)  # repeat 3 (syms 5..7)
    r = _write_prefix_code(bw, 256, {1: 1})
    b = _write_prefix_code(bw, 256, {2: 1})
    a = _write_prefix_code(bw, 256, {255: 1})
    _write_prefix_code(bw, 40, {0: 1})
    # greens 0..7, canonical len-3 codes are 000..111 in symbol order
    for gsym in range(8):
        bw.write_code(gsym, 3)
        bw.write_code(*r[1])
        bw.write_code(*b[2])
        bw.write_code(*a[255])
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    exp = np.array([[(1, gq, 2) for gq in range(8)]], np.uint8)
    assert np.array_equal(out, exp)


def test_meta_prefix_groups():
    """Two meta-prefix groups on a 5x1 image (4x4 tiles, the minimum):
    pixels x0..3 decode through group 0, pixel x4 through group 1."""
    w, h = 5, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(1, 1)  # meta prefix image present
    bw.write_bits(0, 3)  # meta_bits = 2 -> 4x4 tiles
    # meta image (2x1): pixels encode meta code in (r<<8)|g
    meta_px = [(255 << 24) | 0 << 8, (255 << 24) | (1 << 8)]
    bw.write_bits(0, 1)  # meta stream: no cache
    meta_books = (
        _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, _freq(meta_px, 8)),
        _write_prefix_code(bw, 256, _freq(meta_px, 16)),
        _write_prefix_code(bw, 256, _freq(meta_px, 0)),
        _write_prefix_code(bw, 256, _freq(meta_px, 24)),
        _write_prefix_code(bw, 40, {0: 1}),
    )
    _emit_literals(bw, meta_books[:4], meta_px)
    # group 0 codes: green always 11; group 1: green always 99
    g0 = (
        _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, {11: 1}),
        _write_prefix_code(bw, 256, {1: 1}),
        _write_prefix_code(bw, 256, {2: 1}),
        _write_prefix_code(bw, 256, {255: 1}),
        _write_prefix_code(bw, 40, {0: 1}),
    )
    g1 = (
        _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, {99: 1}),
        _write_prefix_code(bw, 256, {3: 1}),
        _write_prefix_code(bw, 256, {4: 1}),
        _write_prefix_code(bw, 256, {255: 1}),
        _write_prefix_code(bw, 40, {0: 1}),
    )
    _emit_literals(bw, g0[:4], [(255 << 24) | (1 << 16) | (11 << 8) | 2] * 4)
    _emit_literals(bw, g1[:4], [(255 << 24) | (3 << 16) | (99 << 8) | 4])
    out = decode_webp(_wrap(bytes([0x2F]) + bw.flush()))
    exp = np.array([[(1, 11, 2)] * 4 + [(3, 99, 4)]], np.uint8)
    assert np.array_equal(out, exp)


# --- error contract --------------------------------------------------------


def test_error_contract():
    with pytest.raises(ImageFormatError, match="RIFF"):
        decode_webp(b"NOTRIFF_")
    img = np.zeros((4, 4, 3), np.uint8)
    good = encode_webp_lossless(img)
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_webp(good[:-3])
    # a fake (empty) lossy container reaches the pure VP8 decoder and
    # reports ITS parse error (r05: no more PIL routing for stills)
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ImageFormatError, match="VP8"):
        decode_webp(lossy)


def test_dispatch_from_decode_image_auto():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_image_auto,
    )

    img = np.full((9, 5, 3), (4, 200, 17), dtype=np.uint8)
    out = decode_image_auto("x.webp", encode_webp_lossless(img))
    assert np.array_equal(out, img)


# --- property tests ----------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    palette=st.integers(2, 256),
)
def test_vp8l_roundtrip_property(h, w, seed, palette):
    """Lossless round-trip over arbitrary dims x entropy levels: low
    palettes force simple codes, high ones force normal length-limited
    Huffman; every image decodes back bit-exactly."""
    rng = np.random.default_rng(seed)
    img = (rng.integers(0, palette, size=(h, w, 3)) * (256 // palette)).astype(
        np.uint8
    )
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)
