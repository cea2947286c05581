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
    decode_jpeg,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_jpeg,
    encode_png,
    jpeg_reference_pipeline,
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
    # interlace=1 is SUPPORTED now; a non-interlaced stream relabeled
    # as Adam7 underruns the pass layout and raises the typed error
    relabeled = _png_from_raw(
        4, 4, 2, _forward_filter(img.reshape(4, 12), 3, 0)
    ).replace(
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1),
    )
    with pytest.raises(
        ImageFormatError, match="interlaced PNG pixel data|filter type"
    ):
        decode_png(relabeled)
    bad_method = _png_from_raw(
        4, 4, 2, _forward_filter(img.reshape(4, 12), 3, 0)
    ).replace(
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2),
    )
    with pytest.raises(ImageFormatError, match="interlace method"):
        decode_png(bad_method)
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
    # JPEG magic now routes to the real decoder: a malformed JPEG
    # reports its parse error instead of "needs PIL"
    with pytest.raises(ImageFormatError, match="truncated|segment|no scan"):
        decode_image_auto("a.jpg", b"\xff\xd8\xff\xe0x")
    # GIF magic now routes to the real LZW decoder: a malformed GIF
    # reports its parse error instead of "needs PIL"
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_image_auto("a.gif", b"GIF89a\x01\x00")
    # WEBP magic routes to the real decoders (VP8L and, from r05, pure
    # VP8): an empty container and an empty lossy chunk both report
    # their own parse errors — nothing still routes to PIL
    with pytest.raises(ImageFormatError, match="no VP8L"):
        decode_image_auto("a.webp", b"RIFF\x00\x00\x00\x00WEBP")
    with pytest.raises(ImageFormatError, match="VP8"):
        decode_image_auto(
            "a.webp", b"RIFF\x0c\x00\x00\x00WEBPVP8 \x00\x00\x00\x00"
        )
    with pytest.raises(ImageFormatError, match="empty"):
        decode_image_auto("a.jpg", b"")


# --- JPEG ------------------------------------------------------------------


def test_jpeg_roundtrip_matches_bitstream_free_reference():
    # agreement with jpeg_reference_pipeline (no markers, no Huffman,
    # no bit I/O) proves the entropy-coding layer carries every
    # coefficient bit-exactly through encode -> decode
    for q in (50, 75, 92):
        img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert np.array_equal(out, jpeg_reference_pipeline(img, quality=q))


def test_jpeg_non_multiple_of_8_dims():
    img = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert out.shape == (13, 19, 3)
    assert np.array_equal(out, jpeg_reference_pipeline(img, quality=85))


def test_jpeg_smooth_image_near_lossless():
    g = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.stack([np.tile(g, (64, 1))] * 3, axis=2)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 1.0


def test_jpeg_420_subsampling_solid_color_exact():
    # constant image: box-mean downsample and replication upsample are
    # identities, so 4:2:0 reconstructs identically to 4:4:4
    img = np.full((17, 21, 3), 0, dtype=np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 200, 37, 90
    ref = jpeg_reference_pipeline(img, quality=75)
    for ss in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, quality=75, subsampling=ss))
        assert out.shape == img.shape
        assert len(np.unique(out.reshape(-1, 3), axis=0)) == 1
        assert np.array_equal(out, ref), ss


def test_jpeg_420_natural_image_close():
    # blockwise-smooth content: 4:2:0 loses chroma detail but stays
    # close on luma-dominated structure
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="4:2:0"))
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 12.0


def test_jpeg_error_contract():
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img)
    with pytest.raises(ImageFormatError, match="SOI"):
        decode_jpeg(b"\x00\x01" + data[2:])
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_jpeg(data[:40])
    with pytest.raises(ImageFormatError, match="truncated|marker"):
        decode_jpeg(data[:-20])  # cut inside entropy-coded data
    # SOF2 is now SUPPORTED; a baseline stream mislabeled progressive
    # still fails typed (its interleaved scan claims Se=63 for a DC pass)
    mut = bytearray(data)
    i = bytes(mut).find(b"\xff\xc0")
    mut[i + 1] = 0xC2
    with pytest.raises(ImageFormatError, match="DC scan"):
        decode_jpeg(bytes(mut))
    # arithmetic (SOF9/SOF10) is now SUPPORTED (test_arith_jpeg.py);
    # lossless (SOF11) stays a typed error
    mut[i + 1] = 0xCB
    with pytest.raises(ImageFormatError, match="lossless"):
        decode_jpeg(bytes(mut))


def test_jpeg_grayscale_single_component():
    # hand-build a 1-component scan by encoding RGB gray and checking
    # the decoder's gray replication path via decode of a gray JPEG is
    # covered by the 3-component path; here assert the auto dispatch
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = decode_image_auto("x.jpg", encode_jpeg(img))
    assert out.shape == (8, 8, 3)
    assert len(np.unique(out.reshape(-1, 3), axis=0)) == 1


# --- GIF -------------------------------------------------------------------


def _quantized_image(h, w, n_colors, seed=0):
    r = np.random.default_rng(seed)
    pal = r.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[r.integers(0, n_colors, (h, w))]


def test_gif_roundtrip_noise_palette():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_gif,
        encode_gif,
    )

    img = _quantized_image(95, 133, 200, seed=7)
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_gif_interlaced_roundtrip():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_gif,
        encode_gif,
    )

    img = _quantized_image(37, 23, 16, seed=11)
    data = encode_gif(img, interlace=True)
    assert data[6 + 7 + 16 * 3 + 9] & 0x40  # interlace flag set in descriptor
    assert np.array_equal(decode_gif(data), img)


def test_gif_dictionary_overflow_deferred_clear():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_gif,
        encode_gif,
    )

    # 300x300 of 256-color noise assigns >4096 LZW entries -> the
    # encoder freezes the dictionary (deferred clear) and the decoder
    # must track the same freeze point bit-exactly
    img = _quantized_image(300, 300, 256, seed=13)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_single_color_and_width_growth():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_gif,
        encode_gif,
    )

    img = np.full((17, 31, 3), 99, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    # smooth gradient: long runs compress heavily across width changes
    grad = np.zeros((256, 256, 3), dtype=np.uint8)
    grad[:, :, 0] = (np.arange(256)[:, None] // 2).astype(np.uint8)
    data = encode_gif(grad)
    assert len(data) < grad.size // 10  # actually compresses
    assert np.array_equal(decode_gif(data), grad)


def test_gif_real_world_vector():
    """A canonical third-party 1x1 GIF (the ubiquitous transparent
    tracking pixel) — validates spec conformance independently of our
    own encoder: graphic-control extension skipping, 2-color global
    table, 2-bit LZW."""
    import base64

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import decode_gif

    data = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    out = decode_gif(data)
    assert out.shape == (1, 1, 3)
    assert out[0, 0].tolist() == [0, 0, 0]


def test_gif_error_contract():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_gif,
        encode_gif,
    )

    img = _quantized_image(9, 9, 4, seed=3)
    data = encode_gif(img)
    with pytest.raises(ImageFormatError, match="magic"):
        decode_gif(b"XIF89a" + data[6:])
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_gif(data[:10])
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_gif(data[:-12])
    with pytest.raises(ImageFormatError, match="no image data"):
        decode_gif(data[:13] + data[13 : 13 + 3 * 4] + b"\x3b")
    with pytest.raises(ImageFormatError, match="256 distinct"):
        # full-range noise has far more than 256 distinct colors
        encode_gif(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))


def test_gif_auto_dispatch_and_pipeline_contract():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_gif

    img = _quantized_image(21, 40, 8, seed=5)
    out = decode_image_auto("anim.gif", encode_gif(img))
    assert out.dtype == np.uint8 and out.shape == (21, 40, 3)
    assert np.array_equal(out, img)


# --- progressive JPEG (SOF2) -----------------------------------------------


def test_jpeg_progressive_matches_baseline_bit_exact():
    """The progressive encode->decode pair must transport the SAME
    quantized coefficients as the baseline pair: identical output
    pixels, and both equal to the bitstream-free reference."""
    for dims in [(16, 16), (24, 17), (31, 9)]:
        img = rng.integers(0, 256, (*dims, 3), dtype=np.uint8)
        for q in (75, 90):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
            assert np.array_equal(prog, base)
            assert np.array_equal(prog, jpeg_reference_pipeline(img, quality=q))


def test_jpeg_progressive_420_and_smooth():
    img = rng.integers(0, 256, (33, 26, 3), dtype=np.uint8)
    p = decode_jpeg(encode_jpeg(img, quality=80, subsampling="4:2:0", progressive=True))
    b = decode_jpeg(encode_jpeg(img, quality=80, subsampling="4:2:0"))
    assert np.array_equal(p, b)
    # smooth gradient: EOB-heavy scans, zero high bands
    xs = np.linspace(0, 255, 40).astype(np.uint8)
    smooth = np.repeat(np.repeat(xs[None, :, None], 40, 0), 3, 2)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(smooth, quality=90, progressive=True)),
        decode_jpeg(encode_jpeg(smooth, quality=90)),
    )


def test_jpeg_ac_refinement_pair_fuzz():
    """Coefficient-level fuzz of the AC refinement encoder/decoder pair
    (T.81 G.1.2.3) including the adversarial shape — a >15 zero-history
    run followed by a previously-significant coefficient before the
    newly-significant one — where correction-bit placement relative to
    ZRL is easiest to get wrong."""
    from image_matadata_batchprocessing_aws_spark.multimodal import codecs as C

    dec_ac, enc_ac = C._jpeg_canonical_codes(*C._JPEG_HUFF_AC_LUMA)
    r = np.random.default_rng(11)

    def roundtrip(blocks_full, Al):
        w = C._JpegBitWriter()
        for zz in blocks_full:
            C._jpeg_enc_ac_refine_block(w, zz, 1, 63, Al, enc_ac)
        reader = C._JpegBitReader(w.flush() + b"\xff\xd9", 0)
        eobrun = 0
        outs = []
        for zz in blocks_full:
            prev = np.zeros(64, dtype=np.int64)
            for k in range(1, 64):
                v = int(zz[k])
                m = (abs(v) >> (Al + 1)) << (Al + 1)
                prev[C._JPEG_ZIGZAG[k]] = m if v >= 0 else -m
            outs.append(prev)
        for prev in outs:
            eobrun = C._jpeg_ac_refine(reader, dec_ac, prev, 1, 63, Al, eobrun)
        return outs

    cases = []
    for _ in range(60):
        zz = np.zeros(64, dtype=np.int64)
        pos = r.choice(np.arange(1, 64), size=r.integers(0, 10), replace=False)
        for p in pos:
            zz[p] = r.choice([-7, -3, -2, -1, 1, 2, 3, 9, 40])
        cases.append(zz)
    adversarial = np.zeros(64, dtype=np.int64)
    adversarial[18] = 40  # previously significant after 17 zeros
    adversarial[19] = 1  # newly significant right behind it
    cases += [adversarial, adversarial]
    outs = roundtrip(cases, 0)
    for zz, out in zip(cases, outs):
        want = np.zeros(64, dtype=np.int64)
        for k in range(1, 64):
            want[C._JPEG_ZIGZAG[k]] = int(zz[k])
        assert np.array_equal(out, want)


def test_jpeg_progressive_real_world_vector():
    """A real libjpeg-produced progressive JPEG (SOF2 with EOB runs and
    successive approximation) must decode to plausible full-range
    content — conformance evidence independent of our own encoder."""
    import os

    path = (
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/"
        "doc/rust/html/embedded-book/assets/f3.jpg"
    )
    if not os.path.exists(path):
        pytest.skip("real-world progressive fixture not present")
    out = decode_jpeg(open(path, "rb").read())
    assert out.shape == (477, 720, 3)
    assert out.std() > 30  # rich natural image, not a flat/garbled field


def test_png_adam7_interlaced_roundtrip():
    """Adam7: 7 independently-filtered sub-images scatter back to the
    full grid; edge dims leave some passes empty."""
    for shape in [(1, 1, 3), (7, 13, 3), (8, 8, 3), (9, 10, 3), (2, 2, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        blob = encode_png(img, interlace=True)
        assert np.array_equal(decode_png(blob), img), shape
    gray = rng.integers(0, 256, size=(11, 6), dtype=np.uint8)
    got = decode_png(encode_png(gray, color_type=0, interlace=True))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    # truncation surfaces as the codec error, not a numpy shape error
    with pytest.raises(ImageFormatError, match="truncated|incorrect"):
        import zlib as _z
        full = encode_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), interlace=True)
        # corrupt: drop the IEND and truncate the IDAT payload
        decode_png(full[:60])


def test_jpeg_12bit_roundtrip_matches_reference():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg,
        jpeg_reference_pipeline,
    )

    img = np.zeros((24, 17, 3), np.uint16)
    for r in range(24):
        img[r, :, 0] = 1800 + 20 * r
        img[r, :, 1] = 900 + 10 * r
        img[r, :, 2] = 3000 - 15 * r
    for q in (75, 90):
        for prog in (False, True):
            out = decode_jpeg(encode_jpeg(img, quality=q, bit_depth=12, progressive=prog))
            assert out.dtype == np.uint16
            ref = jpeg_reference_pipeline(img, quality=q, bit_depth=12)
            assert np.array_equal(out, ref), (q, prog)
    # values actually use the extended range
    assert int(out.max()) > 255


def test_jpeg_12bit_baseline_marker_rejected():
    import struct

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        ImageFormatError,
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((8, 8, 3), 1000, np.uint16)
    data = bytearray(encode_jpeg(img, bit_depth=12))
    # rewrite SOF1 (0xC1) to SOF0 (0xC0): T.81 forbids 12-bit baseline
    i = data.find(b"\xff\xc1")
    assert i > 0
    data[i + 1] = 0xC0
    with pytest.raises(ImageFormatError, match="SOF1/SOF2"):
        decode_jpeg(bytes(data))


def test_jpeg_16bit_dqt_parses():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    # bit_depth=12 emits Pq=1 (16-bit) quant tables; decode must read them
    img = np.full((8, 8, 3), 2048, np.uint16)
    data = encode_jpeg(img, bit_depth=12)
    assert b"\xff\xdb" in data
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 3)


def test_ico_round_trip_largest_entry_wins():
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_ico,
        encode_ico,
    )

    rng = np.random.default_rng(3)
    small = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    big = rng.integers(0, 256, (48, 32, 3)).astype(np.uint8)
    for kinds in (("png", "bmp"), ("bmp", "png")):
        data = encode_ico([(small, kinds[0]), (big, kinds[1])])
        out = decode_ico(data)
        assert out.shape == (48, 32, 3)
        assert np.array_equal(out, big), kinds
    # single-entry BMP payload, odd width exercises row padding
    odd = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    assert np.array_equal(decode_ico(encode_ico([(odd, "bmp")])), odd)


def test_ico_malformed_inputs():
    import pytest as _pytest

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        ImageFormatError,
        decode_ico,
    )

    with _pytest.raises(ImageFormatError, match="bad magic"):
        decode_ico(b"\x00\x00\x02\x00xx")
    with _pytest.raises(ImageFormatError, match="no entries"):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")
    with _pytest.raises(ImageFormatError, match="directory truncated"):
        decode_ico(b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 4)
