"""Baseline-TIFF codec tests (multimodal/tiff.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    ImageFormatError,
    decode_image_auto,
)
from image_matadata_batchprocessing_aws_spark.multimodal.tiff import (
    decode_tiff,
    encode_tiff,
)


@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("predictor", [1, 2])
def test_roundtrip_rgb(compression, predictor):
    rng = np.random.default_rng(compression * 10 + predictor)
    for shape in [(1, 1, 3), (7, 13, 3), (64, 1, 3), (33, 17, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = encode_tiff(img, compression=compression, predictor=predictor)
        assert np.array_equal(decode_tiff(enc), img), shape


def test_gray_replicates_and_both_endians():
    gray = np.arange(110, dtype=np.uint8).reshape(10, 11)
    for be in (False, True):
        enc = encode_tiff(gray, compression=5, big_endian=be)
        got = decode_tiff(enc)
        assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))


def test_multi_strip_and_deep_lzw_table():
    """Strips smaller than the image + low-entropy data that grows the
    LZW table through all width changes (9->12 bits) and a clear."""
    rng = np.random.default_rng(3)
    base = np.tile(rng.integers(0, 8, 200, dtype=np.uint8), 120).reshape(120, 200)
    img = np.repeat(base[:, :, None], 3, axis=2).astype(np.uint8)
    enc = encode_tiff(img, compression=5, rows_per_strip=16)
    assert np.array_equal(decode_tiff(enc), img)
    assert len(enc) < img.size // 2  # really compressed


def test_white_is_zero_inverts():
    """photometric=0: a hand-patched photometric tag flips the values."""
    gray = np.full((4, 4), 40, dtype=np.uint8)
    enc = bytearray(encode_tiff(gray))
    # patch the photometric entry (tag 262, little-endian) value 1 -> 0
    idx = enc.find(struct.pack("<HH", 262, 3))
    assert idx > 0
    enc[idx + 8 : idx + 10] = struct.pack("<H", 0)
    got = decode_tiff(bytes(enc))
    assert np.array_equal(got, np.full((4, 4, 3), 215, dtype=np.uint8))


def test_rgba_alpha_dropped():
    """Hand-built spp=4 uncompressed TIFF: alpha channel is dropped."""
    h, w = 2, 3
    pix = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (x * 10, y * 20, 7, 255)  # r g b a
    )
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8, 8]),
        (259, 3, [1]), (262, 3, [2]), (273, 4, [0]),  # offset patched below
        (277, 3, [4]), (278, 4, [h]), (279, 4, [len(pix)]),
    ]
    ifd = struct.pack("<H", len(entries))
    overflow = b""
    data_off = 8 + 2 + 12 * len(entries) + 4 + 8  # + 8 for the 258 overflow
    for tag, typ, vals in entries:
        if tag == 273:
            vals = [data_off]
        size = {3: 2, 4: 4}[typ] * len(vals)
        packed = struct.pack("<" + {3: "H", 4: "I"}[typ] * len(vals), *vals)
        if size <= 4:
            ifd += struct.pack("<HHI", tag, typ, len(vals)) + packed.ljust(4, b"\x00")
        else:
            off = 8 + 2 + 12 * len(entries) + 4 + len(overflow)
            ifd += struct.pack("<HHI", tag, typ, len(vals)) + struct.pack("<I", off)
            overflow += packed
    blob = b"II*\x00" + struct.pack("<I", 8) + ifd + struct.pack("<I", 0) + overflow + pix
    got = decode_tiff(blob)
    exp = np.array(
        [[(x * 10, y * 20, 7) for x in range(w)] for y in range(h)], dtype=np.uint8
    )
    assert np.array_equal(got, exp)


def test_error_contract():
    img = np.zeros((4, 4, 3), np.uint8)
    good = encode_tiff(img)
    with pytest.raises(ImageFormatError, match="not a TIFF"):
        decode_tiff(b"XXXX" + good[4:])
    with pytest.raises(ImageFormatError, match="out of range|truncated"):
        decode_tiff(good[:20])
    # 16-bit samples refused cleanly
    enc = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    idx = enc.find(struct.pack("<HH", 258, 3))
    enc[idx + 8 : idx + 10] = struct.pack("<H", 16)
    with pytest.raises(ImageFormatError, match="8-bit"):
        decode_tiff(bytes(enc))


def test_dispatch_from_decode_image_auto():
    img = np.full((5, 9, 3), (1, 128, 255), dtype=np.uint8)
    out = decode_image_auto("x.tiff", encode_tiff(img, compression=32773))
    assert np.array_equal(out, img)


# --- property tests ----------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    compression=st.sampled_from([1, 5, 32773]),
    predictor=st.sampled_from([1, 2]),
    rps=st.integers(1, 41),
    be=st.booleans(),
)
def test_tiff_roundtrip_property(h, w, seed, compression, predictor, rps, be):
    """Round-trip over arbitrary dims x strip sizes x codecs x
    predictors x byte orders."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    enc = encode_tiff(
        img,
        compression=compression,
        predictor=predictor,
        rows_per_strip=rps,
        big_endian=be,
    )
    assert np.array_equal(decode_tiff(enc), img)
