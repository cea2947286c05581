"""Sub-byte and 16-bit PNG decode — ImageIO parity + spec round-trips.

Ground truth: the JVM's javax.imageio PNG encoder (an independent
implementation, reached through the test session's py4j gateway) mints
16-bit grayscale and 1-bit grayscale files; the pure decoder must
reproduce them exactly (16-bit reduces to the high byte — the PIL
I;16 -> L rule the docstring pins).  The remaining combinations
(2/4-bit gray, 1/2/4-bit palette, 16-bit RGB/RGBA, filtered rows) ride
spec-following streams from ``encode_png_raw``.
"""

from __future__ import annotations

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    ImageFormatError,
    decode_png,
    encode_png_raw,
)


def _imageio_png(spark, kind: str, w: int, h: int, setter):
    jvm = spark._jvm
    BufferedImage = jvm.java.awt.image.BufferedImage
    img = BufferedImage(w, h, getattr(BufferedImage, kind))
    r = img.getRaster()
    for y in range(h):
        for x in range(w):
            r.setSample(x, y, 0, setter(x, y))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    return bytes(baos.toByteArray())


def test_16bit_gray_matches_imageio(spark):
    vals = lambda x, y: (x * 13 + y * 577) * 97 % 65536  # noqa: E731
    data = _imageio_png(spark, "TYPE_USHORT_GRAY", 5, 4, vals)
    img = decode_png(data)
    exp = np.array([[vals(x, y) >> 8 for x in range(5)] for y in range(4)], np.uint8)
    assert img.shape == (4, 5, 3)
    assert np.array_equal(img[:, :, 0], exp)
    assert np.array_equal(img[:, :, 0], img[:, :, 1])


def test_1bit_gray_matches_imageio(spark):
    data = _imageio_png(spark, "TYPE_BYTE_BINARY", 9, 3, lambda x, y: (x + y) % 2)
    img = decode_png(data)
    exp = np.array([[(x + y) % 2 * 255 for x in range(9)] for y in range(3)], np.uint8)
    assert np.array_equal(img[:, :, 0], exp)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_round_trip(depth):
    rng = np.random.default_rng(depth)
    g = rng.integers(0, 1 << depth, (6, 13)).astype(np.uint32)
    img = decode_png(encode_png_raw(g, depth, 0))
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(img[:, :, 0], (g * scale).astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_round_trip(depth):
    rng = np.random.default_rng(10 + depth)
    n = 1 << depth
    pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    idx = rng.integers(0, n, (8, 11)).astype(np.uint32)
    img = decode_png(encode_png_raw(idx, depth, 3, palette=pal))
    assert np.array_equal(img, pal[idx])


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_16bit_round_trip_all_color_types(ctype, ch):
    rng = np.random.default_rng(20 + ctype)
    s = rng.integers(0, 65536, (5, 9, ch)).astype(np.uint32)
    img = decode_png(encode_png_raw(s, 16, ctype))
    hi = (s >> 8).astype(np.uint8)
    if ctype == 0:
        assert np.array_equal(img[:, :, 0], hi[:, :, 0])
    elif ctype == 4:
        assert np.array_equal(img[:, :, 0], hi[:, :, 0])  # alpha dropped
    else:
        assert np.array_equal(img, hi[:, :, :3])


def test_16bit_palette_rejected():
    with pytest.raises(ImageFormatError, match="not a legal combination"):
        decode_png(encode_png_raw(np.zeros((2, 2), np.uint32), 16, 3,
                                  palette=np.zeros((2, 3), np.uint8)))


def test_subbyte_rgb_rejected():
    with pytest.raises(ImageFormatError, match="needs gray/palette"):
        decode_png(encode_png_raw(np.zeros((2, 2, 3), np.uint32), 4, 2))
