"""Image-path tests: ZIP explode, deterministic decode, resize/pad math,
error isolation, explicit image<->metadata join, batched sink."""

from __future__ import annotations

import glob
import io
import zipfile

import numpy as np
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.multimodal import (
    decode_images,
    image_metadata_join,
    scan_zip_entries,
    write_image_batches,
)
from image_matadata_batchprocessing_aws_spark.multimodal.images import TARGET_SIZE, resize_with_padding


def _make_zip(path, entries):
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in entries:
            zf.writestr(name, content)


def test_zip_scan_filters_and_explodes(spark, tmp_path):
    _make_zip(
        tmp_path / "part1.zip",
        [
            ("101.jpg", b"fake-jpeg-bytes-101"),
            ("102.png", b"fake-png-bytes-102"),
            ("readme.txt", b"not an image"),
        ],
    )
    _make_zip(tmp_path / "part2.zip", [("103.jpeg", b"fake-bytes-103")])
    entries = scan_zip_entries(spark, str(tmp_path / "*.zip"))
    rows = entries.collect()
    names = sorted(r.entry_name for r in rows)
    assert names == ["101.jpg", "102.png", "103.jpeg"]  # .txt filtered (ref :42)
    assert all(isinstance(bytes(r.content), bytes) and len(r.content) > 0 for r in rows)


def test_decode_shapes_and_error_isolation(spark, tmp_path):
    _make_zip(
        tmp_path / "p.zip",
        [("7.jpg", b"x" * 500), ("8.jpg", b""), ("9.jpg", b"y" * 123)],
    )
    decoded = decode_images(scan_zip_entries(spark, str(tmp_path / "p.zip")))
    rows = {r.file_name: r for r in decoded.collect()}
    ok = rows["7.jpg"]
    assert (ok.channels, ok.height, ok.width) == (3, TARGET_SIZE, TARGET_SIZE)
    assert len(ok.image) == 3 * TARGET_SIZE * TARGET_SIZE
    assert ok.decode_error is None
    assert all(0.0 <= v <= 1.0 for v in ok.image[:100])
    # empty payload -> kept, labeled (never silently dropped)
    assert rows["8.jpg"].decode_error is not None
    assert rows["8.jpg"].image is None
    # determinism across runs
    again = {r.file_name: r for r in decode_images(scan_zip_entries(spark, str(tmp_path / "p.zip"))).collect()}
    assert again["7.jpg"].image[:10] == ok.image[:10]


def test_decode_fn_seam_custom_decoder(spark, tmp_path):
    """The byte-decode is pluggable: a caller-supplied decode_fn replaces
    the deterministic fake without editing the module."""
    _make_zip(tmp_path / "s.zip", [("5.jpg", b"ignored")])

    def all_gray(name, content):
        return np.full((10, 10, 3), 128, dtype=np.uint8)

    decoded = decode_images(
        scan_zip_entries(spark, str(tmp_path / "s.zip")), decode_fn=all_gray
    )
    row = decoded.collect()[0]
    assert row.decode_error is None
    # every non-padding pixel is 128/255
    vals = {round(v, 6) for v in row.image if v != 0.0}
    assert vals == {round(128 / 255.0, 6)}


def test_real_codec_decodes_png_without_pil(spark, tmp_path):
    """use_real_codec=True REALLY decodes: a genuine PNG (zlib-compressed,
    CRC'd) comes back pixel-correct through the full Arrow pipeline with
    no PIL in the container; VALID baseline JPEG, GIF and lossless WEBP
    also decode for real; a malformed JPEG and a PIL-only format (lossy
    VP8 WEBP) land in the error column instead of failing the job."""
    from image_matadata_batchprocessing_aws_spark.multimodal.webp import (
        encode_webp_lossless,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        encode_gif,
        encode_jpeg,
        encode_png,
    )

    red = np.zeros((4, 4, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    _make_zip(
        tmp_path / "r.zip",
        [
            ("3.png", encode_png(red)),
            ("4.jpg", b"\xff\xd8\xff\xe0fakejpeg"),
            ("5.jpg", encode_jpeg(red, quality=90)),
            ("6.png", encode_gif(red)),  # GIF magic: real LZW decode now
            ("7.png", encode_webp_lossless(red)),  # VP8L: real decode now
            # malformed lossy VP8 payload: must error per-row, not throw
            ("8.png", b"RIFF\x0c\x00\x00\x00WEBPVP8 \x00\x00\x00\x00"),
        ],
    )
    entries = scan_zip_entries(spark, str(tmp_path / "r.zip"))
    rows = {
        r.file_name: r
        for r in decode_images(entries, use_real_codec=True, normalize=False).collect()
    }
    ok = rows["3.png"]
    assert ok.decode_error is None
    assert (ok.channels, ok.height, ok.width) == (3, TARGET_SIZE, TARGET_SIZE)
    # the red square is upscaled onto the canvas: exactly the two pixel
    # values {0, 200} survive, channel R only
    img = np.array(ok.image, dtype=np.float32).reshape(3, TARGET_SIZE, TARGET_SIZE)
    assert set(np.unique(img[0])) <= {0.0, 200.0} and 200.0 in set(np.unique(img[0]))
    assert img[1].max() == 0.0 and img[2].max() == 0.0
    bad = rows["4.jpg"]
    assert bad.image is None and "JPEG" in bad.decode_error
    jok = rows["5.jpg"]
    assert jok.decode_error is None
    assert (jok.channels, jok.height, jok.width) == (3, TARGET_SIZE, TARGET_SIZE)
    gif = rows["6.png"]  # GIF magic routes to the real LZW decoder
    assert gif.decode_error is None
    assert (gif.channels, gif.height, gif.width) == (3, TARGET_SIZE, TARGET_SIZE)
    webp = rows["7.png"]  # lossless WEBP routes to the real VP8L decoder
    assert webp.decode_error is None
    assert (webp.channels, webp.height, webp.width) == (3, TARGET_SIZE, TARGET_SIZE)
    # malformed lossy VP8: per-row error isolation — the pure VP8
    # decoder (r05) rejects the garbage payload with its own typed
    # parse error, no system library involved
    lossy = rows["8.png"]
    assert lossy.image is None
    assert "VP8" in lossy.decode_error


def test_resize_with_padding_golden():
    img = np.full((100, 200, 3), 255, dtype=np.uint8)  # wide image
    out = resize_with_padding(img, 224)
    assert out.shape == (224, 224, 3)
    assert out[:, :, :].max() == 255
    # aspect preserved: scaled to 112x224, centered vertically
    assert out[0].max() == 0 and out[223].max() == 0  # top/bottom padding rows
    assert out[112].max() == 255  # center row has content
    # left/right edges have content (full width used)
    assert out[112, 0].max() == 255 and out[112, 223].max() == 255


def test_image_metadata_join_and_sink(spark, tmp_path):
    _make_zip(
        tmp_path / "z.zip",
        [("101.jpg", b"a" * 50), ("102.jpg", b"b" * 60), ("999.jpg", b"c" * 70)],
    )
    decoded = decode_images(scan_zip_entries(spark, str(tmp_path / "z.zip")))
    meta = spark.createDataFrame(
        [(101, 48.1, 11.5), (102, 40.7, -74.0)], "id long, latitude double, longitude double"
    )
    joined = image_metadata_join(decoded, meta)
    got = {r.id: (r.latitude, r.file_name) for r in joined.collect()}
    assert set(got) == {101, 102}  # 999 has no metadata -> inner join drops
    assert got[101] == (48.1, "101.jpg")
    out = str(tmp_path / "sink")
    write_image_batches(joined, out, records_per_file=1)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 2  # maxRecordsPerFile honored (A9 as writer config)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert "image" in back.columns and "latitude" in back.columns


def test_sniff_image_meta_parses_headers_without_codecs(spark):
    import struct
    import zlib

    from image_matadata_batchprocessing_aws_spark.multimodal.images import sniff_image_meta

    def png(w, h):
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk))
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6

    def bmp(w, h):
        # BITMAPINFOHEADER: file header 14 bytes, then biSize + signed dims
        return b"BM" + b"\x00" * 12 + struct.pack("<Iii", 40, w, h) + b"\x00" * 20

    def bmp_core(w, h):
        # BITMAPCOREHEADER (OS/2): biSize=12, then uint16 dims
        return b"BM" + b"\x00" * 12 + struct.pack("<IHH", 12, w, h) + b"\x00" * 20

    def webp(tag, payload):
        body = b"WEBP" + tag + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def webp_vp8x(w, h):
        flags = b"\x00" + b"\x00\x00\x00"
        dims = struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        return webp(b"VP8X", flags + dims + b"\x00" * 8)

    def webp_vp8l(w, h):
        packed = (w - 1) | ((h - 1) << 14)
        return webp(b"VP8L", b"\x2f" + struct.pack("<I", packed) + b"\x00" * 8)

    def webp_vp8(w, h):
        # 3-byte frame tag, start code, then 14-bit LE dims
        return webp(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 8)

    def jpeg_seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def jpeg(w, h, pre_segments=(), sof_marker=0xC0):
        sof = struct.pack(">BHH", 8, h, w) + b"\x03" + b"\x00" * 9
        return b"\xff\xd8" + b"".join(pre_segments) + jpeg_seg(sof_marker, sof)

    def tiff(w, h, little=True, typ=3, extra_entries=0):
        e, hdr = ("<", b"II*\x00") if little else (">", b"MM\x00*")
        def entry(tag, value):
            if typ == 3:
                val = struct.pack(e + "H", value) + b"\x00\x00"
            else:
                val = struct.pack(e + "I", value)
            return struct.pack(e + "HHI", tag, typ, 1) + val
        pad = b"".join(entry(0x0FE, 0) for _ in range(extra_entries))
        n = extra_entries + 2
        ifd = struct.pack(e + "H", n) + pad + entry(0x100, w) + entry(0x101, h)
        return hdr + struct.pack(e + "I", 8) + ifd + b"\x00\x00\x00\x00"

    rows = [
        (1, bytearray(png(640, 480))),
        (2, bytearray(gif(320, 200))),
        (3, bytearray(bmp(1024, 768))),
        (4, bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 32)),  # jpeg: fmt only
        (5, bytearray(b"not an image at all")),
        (6, bytearray(bmp(800, -600))),  # top-down BMP: negative biHeight
        (7, bytearray(bmp_core(320, 240))),  # 12-byte OS/2 core header
        (8, bytearray(webp_vp8x(1920, 1080))),
        (9, bytearray(webp_vp8l(511, 257))),
        (10, bytearray(webp_vp8(640, 360))),
        (11, bytearray(webp(b"VP8 ", b"\x00" * 16))),  # lossy w/o start code
        # JPEG SOF walk: bare SOF0, EXIF-style skipped APP segments
        # (pushing SOF past the 34-byte fixed prefix), progressive SOF2,
        # and a truncated stream that must degrade to null dims
        (12, bytearray(jpeg(1600, 1200))),
        (13, bytearray(jpeg(320, 240, pre_segments=(
            jpeg_seg(0xE0, b"JFIF\x00" + b"\x00" * 11),
            jpeg_seg(0xE1, b"Exif\x00\x00" + b"\x00" * 60),
            jpeg_seg(0xDB, b"\x00" * 65),
        )))),
        (14, bytearray(jpeg(12, 7, pre_segments=(jpeg_seg(0xC4, b"\x00" * 20),),
                            sof_marker=0xC2))),
        (15, bytearray(b"\xff\xd8\xff\xe0\x00\x00" + b"\x00" * 20)),
        # TIFF IFD walk: little-endian SHORT dims, big-endian LONG dims
        # behind leading non-dim entries, and an IFD with no dim tags
        (16, bytearray(tiff(2048, 1536, little=True, typ=3))),
        (17, bytearray(tiff(70000, 50000, little=False, typ=4, extra_entries=3))),
        (18, bytearray(b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0) + b"\x00" * 4)),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r.id: r for r in sniff_image_meta(df).collect()}
    assert (out[1].image_format, out[1].image_width, out[1].image_height) == ("png", 640, 480)
    assert (out[2].image_format, out[2].image_width, out[2].image_height) == ("gif", 320, 200)
    assert (out[3].image_format, out[3].image_width, out[3].image_height) == ("bmp", 1024, 768)
    assert out[4].image_format == "jpeg" and out[4].image_width is None
    assert out[5].image_format == "unknown" and out[5].image_width is None
    assert out[1].image_bytes == len(png(640, 480))
    # signed biHeight: magnitude recovered, not 2^32-600
    assert (out[6].image_format, out[6].image_width, out[6].image_height) == ("bmp", 800, 600)
    assert (out[7].image_format, out[7].image_width, out[7].image_height) == ("bmp", 320, 240)
    assert (out[8].image_format, out[8].image_width, out[8].image_height) == ("webp", 1920, 1080)
    assert (out[9].image_format, out[9].image_width, out[9].image_height) == ("webp", 511, 257)
    assert (out[10].image_format, out[10].image_width, out[10].image_height) == ("webp", 640, 360)
    assert out[11].image_format == "webp" and out[11].image_width is None
    assert (out[12].image_format, out[12].image_width, out[12].image_height) == ("jpeg", 1600, 1200)
    # SOF sits past the 34-byte fixed prefix: the segment walk finds it
    assert (out[13].image_format, out[13].image_width, out[13].image_height) == ("jpeg", 320, 240)
    # DHT (C4) is NOT a SOF marker; progressive SOF2 is
    assert (out[14].image_format, out[14].image_width, out[14].image_height) == ("jpeg", 12, 7)
    # truncated stream: format sniffed, dims degrade to null
    assert out[15].image_format == "jpeg" and out[15].image_width is None
    assert (out[16].image_format, out[16].image_width, out[16].image_height) == ("tiff", 2048, 1536)
    assert (out[17].image_format, out[17].image_width, out[17].image_height) == ("tiff", 70000, 50000)
    assert out[18].image_format == "tiff" and out[18].image_width is None


def test_sniff_walks_fuzz_random_layouts(spark):
    """Seeded fuzz over the two iterative walks: random JPEG pre-SOF
    segment stacks and random TIFF IFD entry sets (both byte orders,
    SHORT/LONG, shuffled entry order) must all round-trip through the
    sniffer in one batch."""
    import random
    import struct

    from image_matadata_batchprocessing_aws_spark.multimodal.images import sniff_image_meta

    rng = random.Random(1234)
    rows = []
    expected = {}
    for i in range(80):
        w, h = rng.randrange(1, 60000), rng.randrange(1, 60000)
        segs = []
        for _ in range(rng.randrange(0, 8)):
            marker = rng.choice([0xE0, 0xE1, 0xE2, 0xDB, 0xC4, 0xFE])
            payload = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 80)))
            segs.append(bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload)
        sof_marker = rng.choice([0xC0, 0xC1, 0xC2, 0xCA])
        sof = struct.pack(">BHH", 8, h, w) + b"\x03" + b"\x00" * 9
        blob = b"\xff\xd8" + b"".join(segs) + bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof
        # walk budget: 12 segments / 4 KiB prefix; our layouts stay inside
        rows.append((i, bytearray(blob)))
        expected[i] = ("jpeg", w, h)
    for i in range(80, 160):
        w, h = rng.randrange(1, 100000), rng.randrange(1, 100000)
        little = rng.random() < 0.5
        e, hdr = ("<", b"II*\x00") if little else (">", b"MM\x00*")
        typ = rng.choice([3, 4])
        if typ == 3:
            w, h = w % 65535 + 1, h % 65535 + 1

        def entry(tag, value):
            val = struct.pack(e + "H", value) + b"\x00\x00" if typ == 3 else struct.pack(e + "I", value)
            return struct.pack(e + "HHI", tag, typ, 1) + val

        entries = [entry(0x100, w), entry(0x101, h)]
        entries += [entry(rng.choice([0x0FE, 0x106, 0x111]), rng.randrange(1000))
                    for _ in range(rng.randrange(0, 20))]
        # tags other than width/length are ignored wherever they sit
        rng.shuffle(entries)
        ifd = struct.pack(e + "H", len(entries)) + b"".join(entries)
        blob = hdr + struct.pack(e + "I", 8) + ifd + b"\x00" * 4
        rows.append((i, bytearray(blob)))
        expected[i] = ("tiff", w, h)
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r.id: r for r in sniff_image_meta(df).collect()}
    for i, (fmt, w, h) in expected.items():
        got = (out[i].image_format, out[i].image_width, out[i].image_height)
        assert got == (fmt, w, h), f"case {i}: {got} != {(fmt, w, h)}"


def test_real_fixture_zip_matches_manifest():
    # the multimodal_image_sniff oracle embeds the manifest's literals;
    # this pins the COMMITTED zip to the same manifest so they cannot
    # drift apart (tools/make_image_fixture.py regenerates both)
    import zipfile

    from tools.make_image_fixture import MANIFEST, OUT

    with zipfile.ZipFile(OUT) as zf:
        names = zf.namelist()
        assert names == [m[0] for m in MANIFEST]
        for name, fmt, w, h, enc in MANIFEST:
            assert zf.read(name) == enc(), name
