"""Unit tests for the pure numpy+stdlib image decoders: every PNG
filter type inverted against a reference forward-filter, every
supported color type, BMP row orders/padding/palettes, PPM/PGM headers,
and malformed-input errors."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    ImageFormatError,
    decode_bmp,
    decode_image_auto,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
)

rng = np.random.default_rng(42)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    body = ctype + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _png_from_raw(w, h, color_type, filtered_rows, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(b"".join(filtered_rows)))
        + _chunk(b"IEND", b"")
    )


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(img2d: np.ndarray, bpp: int, ftype: int) -> list[bytes]:
    """Reference PNG forward filter (the spec's encoder side) — the
    decoder must invert this exactly."""
    h, stride = img2d.shape
    rows = []
    for y in range(h):
        raw = img2d[y].astype(int)
        prior = img2d[y - 1].astype(int) if y > 0 else np.zeros(stride, dtype=int)
        out = np.zeros(stride, dtype=int)
        for x in range(stride):
            left = raw[x - bpp] if x >= bpp else 0
            ul = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                out[x] = raw[x]
            elif ftype == 1:
                out[x] = raw[x] - left
            elif ftype == 2:
                out[x] = raw[x] - prior[x]
            elif ftype == 3:
                out[x] = raw[x] - ((left + prior[x]) >> 1)
            else:
                out[x] = raw[x] - _paeth_ref(left, prior[x], ul)
        rows.append(bytes([ftype]) + bytes((out & 0xFF).astype(np.uint8)))
    return rows


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_filters_invert(ftype):
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    raw = img.reshape(7, 15)
    data = _png_from_raw(5, 7, 2, _forward_filter(raw, 3, ftype))
    assert np.array_equal(decode_png(data), img)


def test_png_mixed_filters_and_multiple_idat():
    img = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    raw = img.reshape(6, 12)
    rows = []
    for y, ft in enumerate([0, 1, 2, 3, 4, 2]):
        rows.append(_forward_filter(raw[: y + 1], 3, ft)[y])
    # split the compressed stream across two IDAT chunks
    comp = zlib.compress(b"".join(rows))
    ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:10])
        + _chunk(b"IDAT", comp[10:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_color_types():
    gray = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    d = decode_png(_png_from_raw(4, 3, 0, _forward_filter(gray, 1, 0)))
    assert np.array_equal(d, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = rng.integers(0, 256, (3, 2, 4), dtype=np.uint8)
    d = decode_png(_png_from_raw(2, 3, 6, _forward_filter(rgba.reshape(3, 8), 4, 0)))
    assert np.array_equal(d, rgba[:, :, :3])

    ga = rng.integers(0, 256, (2, 2, 2), dtype=np.uint8)
    d = decode_png(_png_from_raw(2, 2, 4, _forward_filter(ga.reshape(2, 4), 2, 0)))
    assert np.array_equal(d, np.repeat(ga[:, :, :1], 3, axis=2))

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    data = _png_from_raw(
        2, 2, 3, _forward_filter(idx, 1, 0), extra=_chunk(b"PLTE", palette.tobytes())
    )
    assert np.array_equal(decode_png(data), palette[idx])


def test_png_roundtrip_with_own_encoder():
    img = rng.integers(0, 256, (16, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_rejects_malformed():
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ImageFormatError, match="magic"):
        decode_png(b"nope" + good)
    interlaced = _png_from_raw(
        4, 4, 2, _forward_filter(img.reshape(4, 12), 3, 0)
    ).replace(
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1),
    )
    with pytest.raises(ImageFormatError, match="interlaced"):
        decode_png(interlaced)
    # truncated pixel data
    short = _png_from_raw(4, 8, 2, _forward_filter(img.reshape(4, 12), 3, 0))
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_png(short)


def test_bmp_roundtrip_and_padding():
    # width 3 -> 9 bytes/row, padded to 12: exercises the pad path
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_top_down_and_32bpp():
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    # hand-build a top-down 32bpp BMP
    h, w = 2, 2
    body = b""
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            body += bytes([b, g, r, 0])
    pixel_off = 54
    data = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0)
        + body
    )
    assert np.array_equal(decode_bmp(data), img)


def test_bmp_8bit_palette():
    table = b""
    for i in range(256):
        table += bytes([i, 0, 255 - i, 0])  # BGRX
    idx = np.array([[0, 255], [128, 1]], dtype=np.uint8)
    row_bytes = 4  # width 2 padded to 4
    body = b""
    for y in (1, 0):  # bottom-up
        body += bytes(idx[y]) + b"\x00\x00"
    pixel_off = 14 + 40 + len(table)
    data = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(body), 0, 0, 256, 0)
        + table
        + body
    )
    out = decode_bmp(data)
    # palette entry i is BGRX=(i,0,255-i) -> RGB=(255-i, 0, i)
    expect = np.stack(
        [np.stack([np.array([255 - v, 0, v], dtype=np.uint8) for v in row]) for row in idx]
    )
    assert np.array_equal(out, expect)

    # ADVICE r3: truncated palette-BMP pixel data must raise the typed
    # error (the documented contract), not a raw numpy ValueError
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_bmp(data[:-3])
    with pytest.raises(ImageFormatError, match="color table truncated"):
        decode_bmp(data[: 14 + 40 + 100])


def test_ppm_and_pgm_with_comments():
    img = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    data = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)
    gray = rng.integers(0, 256, (2, 2), dtype=np.uint8)
    data = b"P5 2 2 255\n" + gray.tobytes()
    assert np.array_equal(decode_ppm(data), np.repeat(gray[:, :, None], 3, axis=2))
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_ppm(b"P6\n4 3\n255\n" + img.tobytes()[:-2])


def test_auto_dispatch():
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image_auto("a.png", encode_png(img)), img)
    assert np.array_equal(decode_image_auto("a.bmp", encode_bmp(img)), img)
    with pytest.raises(ImageFormatError, match="PIL"):
        decode_image_auto("a.jpg", b"\xff\xd8\xff\xe0x")
    with pytest.raises(ImageFormatError, match="empty"):
        decode_image_auto("a.jpg", b"")
