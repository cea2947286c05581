"""Multimodal-column queries (Stage 3).

The driver tables carry no binary columns, so: (a) binary *metadata*
ops run over utf8-encoded document text with a DuckDB oracle; (b) the
full image pipeline (ZIP scan -> decode -> resize -> join) runs over the
committed deterministic fixture ``tests/fixtures/images.zip`` against a
recomputed-manifest full oracle (decode is the clearly-marked
deterministic fake — see multimodal/images.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.multimodal import (
    decode_images,
    image_metadata_join,
    scan_zip_entries,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

_FIXTURE_ZIP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "images.zip",
)

#: Real encoded images with construction-known headers — manifest and
#: generator: tools/make_image_fixture.py (the sniff oracle's source of
#: truth).
_REAL_FIXTURE_ZIP = os.path.join(
    os.path.dirname(_FIXTURE_ZIP), "images_real.zip"
)


def multimodal_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-binary metadata surface: byte length + content hash of the
    utf8 payload (S6-shaped typed metadata over binary columns)."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


def multimodal_image_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end image path on the fixture ZIP: binaryFile scan ->
    mapInPandas unzip -> decode/resize/pad (deterministic fake) ->
    explicit image<->metadata join.  FULL oracle (upgraded from
    rows-only): the fixture is static, so the oracle builder recomputes
    the expected manifest with a plain-numpy replica of the
    decode+resize+fold math (sequential float64 accumulation, matching
    ``F.aggregate``'s left fold) — the driver row then proves the
    DISTRIBUTED plumbing (binaryFile scan, ZIP UDTF, Arrow batches,
    broadcast join, error-row routing of the empty corrupt.jpg member)
    reproduces the local computation bit-for-bit."""
    entries = scan_zip_entries(spark, _FIXTURE_ZIP)
    decoded = decode_images(entries)
    meta = spark.createDataFrame(
        [(101, 48.137, 11.575), (102, 40.712, -74.006), (103, 35.676, 139.65)],
        "id long, latitude double, longitude double",
    )
    joined = image_metadata_join(decoded, meta)
    return joined.select(
        "id",
        "file_name",
        "channels",
        "height",
        "width",
        F.col("decode_error").isNotNull().alias("failed"),
        F.round(F.aggregate("image", F.lit(0.0), lambda s, v: s + v), 2).alias(
            "pixel_sum"
        ),
        "latitude",
    )


def multimodal_image_sniff(spark: SparkSession, sf: str) -> DataFrame:
    """Codec-free header catalog of a ZIP of REAL encoded images
    (tools/make_image_fixture.py): format + dimensions parsed from the
    binary headers with pure Catalyst expressions
    (multimodal/images.sniff_image_meta) after the binaryFile + ZIP
    UDTF scan.  FULL oracle (upgraded from rows-only, VERDICT r3 item
    7): the DuckDB twin states the fixture manifest's
    construction-known (name, format, w, h, bytes) literals, so this
    row now verifies the ZIP input path AND the PNG/BMP/JPEG-SOF header
    walks end-to-end."""
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        sniff_image_meta,
    )

    entries = scan_zip_entries(spark, _REAL_FIXTURE_ZIP)
    return sniff_image_meta(entries).select(
        "entry_name", "image_format", "image_width", "image_height", "image_bytes"
    )


def multimodal_sniff_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S9 with a FULL oracle: per document, synthesize a real image
    header (PNG / GIF / classic BMP / top-down negative-height BMP /
    WEBP-VP8L / JPEG-with-APP0 / TIFF in both byte orders, chosen by
    ``doc_id % 8``, dimensions from doc_id arithmetic) as a binary
    column with pure expressions, then run the production header
    sniffer over it.  The DuckDB twin never touches bytes — it
    recomputes the expected (format, width, height, size) directly from
    the same arithmetic, so any error in the parse expressions
    (endianness, offsets, BMP sign recovery, VP8L bit unpacking, the
    JPEG SOF segment walk, the TIFF IFD walk) turns the driver row red.
    Complements the rows-only fixture-ZIP sniff, which covers the
    binaryFile/ZIP input path."""
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        sniff_image_meta,
    )

    def be_hex(col, nbytes: int):
        return F.lpad(F.hex(col), nbytes * 2, "0")

    def le_hex(col, nbytes: int):
        be = F.lpad(F.hex(col), nbytes * 2, "0")
        return F.concat(
            *[F.substring(be, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)]
        )

    d = t(spark, sf, "documents").select("doc_id")
    m = F.col("doc_id") % 8
    w = (F.col("doc_id") % 800 + 1).cast("long")
    h = ((F.col("doc_id") * 7) % 600 + 1).cast("long")
    neg_h = F.lit(4294967296).cast("long") - h  # two's-complement top-down
    vp8l_packed = (w - 1) + (h - 1) * 16384  # width-1 | (height-1)<<14
    hexstr = (
        F.when(m == 0, F.concat(
            F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
            be_hex(w, 4), be_hex(h, 4),
        ))
        .when(m == 1, F.concat(
            F.lit("474946383961"), le_hex(w, 2), le_hex(h, 2),
        ))
        .when(m == 2, F.concat(
            F.lit("424D" + "00" * 12 + "28000000"), le_hex(w, 4), le_hex(h, 4),
        ))
        .when(m == 3, F.concat(
            F.lit("424D" + "00" * 12 + "28000000"), le_hex(w, 4), le_hex(neg_h, 4),
        ))
        .when(m == 4, F.concat(
            F.lit("52494646" + "11000000" + "57454250" + "5650384C" + "05000000" + "2F"),
            le_hex(vp8l_packed, 4),
        ))
        # JPEG: SOI + APP0(len 16) + SOF0(precision 8, h, w) — the SOF
        # walk must hop the APP0 segment to find the dims
        .when(m == 5, F.concat(
            F.lit("FFD8" + "FFE0" + "0010" + "00" * 14 + "FFC0" + "0011" + "08"),
            be_hex(h, 2), be_hex(w, 2),
        ))
        # TIFF little-endian, SHORT dims: header + IFD@8 with 2 entries
        .when(m == 6, F.concat(
            F.lit("49492A00" + "08000000" + "0200"
                  + "0001" + "0300" + "01000000"),
            le_hex(w, 2), F.lit("0000"),
            F.lit("0101" + "0300" + "01000000"),
            le_hex(h, 2), F.lit("0000" + "00000000"),
        ))
        # TIFF big-endian, LONG dims
        .otherwise(F.concat(
            F.lit("4D4D002A" + "00000008" + "0002"
                  + "0100" + "0004" + "00000001"),
            be_hex(w, 4),
            F.lit("0101" + "0004" + "00000001"),
            be_hex(h, 4),
            F.lit("00000000"),
        ))
    )
    built = d.withColumn("content", F.unhex(hexstr))
    return sniff_image_meta(built).select(
        "doc_id", "image_format", "image_width", "image_height", "image_bytes"
    )


def multimodal_audio_sniff(spark: SparkSession, sf: str) -> DataFrame:
    """The audio twin of multimodal_sniff_roundtrip: per document,
    synthesize a canonical PCM WAV header (channels / sample rate / bit
    depth / data size from doc_id arithmetic) as a binary column, run
    the codec-free WAV sniffer (multimodal/media.sniff_audio_meta) over
    it, and let the DuckDB twin recompute the expected fields from the
    same arithmetic without touching bytes — any endianness or offset
    error in the parse turns the driver row red."""
    from image_matadata_batchprocessing_aws_spark.multimodal.media import (
        sniff_audio_meta,
    )

    def le_hex(col, nbytes: int):
        be = F.lpad(F.hex(col), nbytes * 2, "0")
        return F.concat(
            *[F.substring(be, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)]
        )

    d = t(spark, sf, "documents").select("doc_id")
    ch = (F.col("doc_id") % 2 + 1).cast("long")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100), F.lit(48000)),
        (F.col("doc_id") % 4 + 1).cast("int"),
    ).cast("long")
    bits = F.when(F.col("doc_id") % 3 == 0, F.lit(8)).otherwise(F.lit(16)).cast("long")
    block = (ch * bits / 8).cast("long")
    n_samples = (F.col("doc_id") % 1000 + 1).cast("long")
    data_size = n_samples * block
    hexstr = F.concat(
        F.lit("52494646"),
        le_hex(data_size + 36, 4),
        F.lit("57415645" + "666D7420"),
        le_hex(F.lit(16), 4),
        le_hex(F.lit(1), 2),
        le_hex(ch, 2),
        le_hex(rate, 4),
        le_hex(rate * block, 4),
        le_hex(block, 2),
        le_hex(bits, 2),
        F.lit("64617461"),
        le_hex(data_size, 4),
    )
    built = d.withColumn("content", F.unhex(hexstr))
    return sniff_audio_meta(built).select(
        "doc_id",
        "audio_format",
        "audio_channels",
        "audio_sample_rate",
        "audio_bits",
        "audio_n_samples",
        "audio_duration_ms",
    )


#: MP4 major brands cycled through by the synthesizer, with their ASCII
#: hex (computed once here; the oracle indexes the same list).
VIDEO_BRANDS = ["isom", "mp42", "avc1", "dash"]
_VIDEO_BRANDS_HEX = [b.encode().hex().upper() for b in VIDEO_BRANDS]


def multimodal_video_sniff(spark: SparkSession, sf: str) -> DataFrame:
    """The video twin of the sniffer pair: per document synthesize an
    MP4 ftyp box / RIFF-AVI header / Matroska EBML magic (container and
    brand chosen by doc_id arithmetic), run the codec-free container
    sniffer over the binary, and let the DuckDB twin recompute the
    expected fields from the same arithmetic without touching bytes."""
    from image_matadata_batchprocessing_aws_spark.multimodal.media import sniff_video_meta

    d = t(spark, sf, "documents").select("doc_id")
    kind = F.col("doc_id") % 3
    brand_hex = F.element_at(
        F.array(*[F.lit(b) for b in _VIDEO_BRANDS_HEX]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    ftyp_size = (F.lit(16) + (F.col("doc_id") % 17) * 8).cast("long")
    mp4 = F.concat(
        F.lpad(F.hex(ftyp_size), 8, "0"), F.lit("66747970"), brand_hex, F.lit("00000000")
    )
    avi = F.lit("52494646" + "24000000" + "41564920" + "00000000")
    mkv = F.lit("1A45DFA3" + "00" * 12)
    hexstr = F.when(kind == 0, mp4).when(kind == 1, avi).otherwise(mkv)
    built = d.withColumn("content", F.unhex(hexstr))
    return sniff_video_meta(built).select(
        "doc_id", "video_format", "video_brand", "video_ftyp_bytes"
    )


QUERIES = {
    "multimodal_audio_sniff": multimodal_audio_sniff,
    "multimodal_video_sniff": multimodal_video_sniff,
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_image_pipeline": multimodal_image_pipeline,
    "multimodal_image_sniff": multimodal_image_sniff,
    "multimodal_sniff_roundtrip": multimodal_sniff_roundtrip,
}

ORACLES = {
    "multimodal_video_sniff": f"""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'mp4' WHEN 1 THEN 'avi'
                    ELSE 'mkv' END AS video_format,
               CASE WHEN doc_id % 3 = 0
                    THEN (['{VIDEO_BRANDS[0]}', '{VIDEO_BRANDS[1]}',
                           '{VIDEO_BRANDS[2]}', '{VIDEO_BRANDS[3]}'])
                         [CAST(doc_id % 4 + 1 AS INT)]
               END AS video_brand,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(16 + (doc_id % 17) * 8 AS BIGINT)
               END AS video_ftyp_bytes
        FROM documents
    """,
    "multimodal_audio_sniff": """
        WITH s AS (SELECT doc_id,
                          CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
                          CAST([8000, 16000, 44100, 48000][(doc_id % 4 + 1)::INT] AS BIGINT) AS rate,
                          CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS BIGINT) AS bits,
                          CAST(doc_id % 1000 + 1 AS BIGINT) AS n_samples
                   FROM documents)
        SELECT doc_id,
               'wav' AS audio_format,
               ch AS audio_channels,
               rate AS audio_sample_rate,
               bits AS audio_bits,
               n_samples AS audio_n_samples,
               CAST(floor(n_samples * 1000 / rate) AS BIGINT) AS audio_duration_ms
        FROM s
    """,
    "multimodal_binary_meta": """
        SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_md5
        FROM documents
    """,
    # Independent recomputation: expected catalog values from the same
    # doc_id arithmetic, no byte construction or parsing — the Spark side
    # must build AND parse the headers correctly to match.
    "multimodal_sniff_roundtrip": """
        WITH s AS (SELECT doc_id, doc_id % 8 AS m,
                          CAST(doc_id % 800 + 1 AS BIGINT) AS w,
                          CAST((doc_id * 7) % 600 + 1 AS BIGINT) AS h
                   FROM documents)
        SELECT doc_id,
               CASE WHEN m = 0 THEN 'png' WHEN m = 1 THEN 'gif'
                    WHEN m IN (2, 3) THEN 'bmp' WHEN m = 4 THEN 'webp'
                    WHEN m = 5 THEN 'jpeg' ELSE 'tiff' END AS image_format,
               w AS image_width,
               h AS image_height,
               CAST(CASE WHEN m = 0 THEN 24 WHEN m = 1 THEN 10
                         WHEN m IN (2, 3) THEN 26 WHEN m = 4 THEN 25
                         WHEN m = 5 THEN 29 ELSE 38 END AS BIGINT) AS image_bytes
        FROM s
    """,
}


# --- REAL PNG decode with a closed-form oracle ----------------------------

#: (h, w) pairs where aspect-preserving resize onto the 224 canvas gives
#: INTEGRAL content dims (h*scale, w*scale both integers), so the
#: decoded pixel sums have closed forms SQL can state exactly.
PNG_DIMS = [
    (8, 14), (14, 8), (16, 28), (28, 16), (32, 56),
    (56, 32), (112, 224), (224, 112), (224, 224), (7, 7),
]
PNG_N_DOCS = 30


def _png_content_pixels() -> list[int]:
    out = []
    for h, w in PNG_DIMS:
        scale = min(224 / h, 224 / w)
        nh, nw = int(h * scale), int(w * scale)
        assert nh == h * scale and nw == w * scale  # integral by construction
        out.append(nh * nw)
    return out


def multimodal_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decoding, driver-checked: solid-color PNGs (genuine
    zlib-compressed, CRC'd files from the pure-python encoder) are
    decoded by the pure-numpy PNG decoder (``multimodal/codecs.py`` — no
    PIL anywhere) through the full Arrow ``mapInPandas`` pipeline, and
    the per-channel pixel sums after aspect-preserving resize+pad are
    compared against their CLOSED FORMS (value x content-pixel count;
    dimensions chosen so the resize is integral).  float32 sums stay
    exact (all values < 2^24).  The fixture synthesis is driver-side and
    fixture-sized (30 tiny PNGs); the decode is the distributed stage
    under test."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images

    rows = []
    for doc_id in range(PNG_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
        rows.append((doc_id, f"{doc_id}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    decoded = decode_images(entries, use_real_codec=True, normalize=False)

    def chan_sum(c: int):
        # CHW layout: channel c occupies slice [c*224*224, (c+1)*224*224)
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name")
    return out.select(
        "doc_id",
        F.col("channels").cast("long").alias("channels"),
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_png_decode"] = multimodal_png_decode

_PNG_PIX_CASE = " ".join(
    f"WHEN {i} THEN {px}" for i, px in enumerate(_png_content_pixels())
)

ORACLES["multimodal_png_decode"] = f"""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS channels,
           CAST(224 AS BIGINT) AS height,
           CAST(224 AS BIGINT) AS width,
           CAST((doc_id % 251) * px AS BIGINT) AS r_sum,
           CAST(((doc_id * 7) % 251) * px AS BIGINT) AS g_sum,
           CAST(((doc_id * 13) % 251) * px AS BIGINT) AS b_sum
    FROM (SELECT unnest(range({PNG_N_DOCS})) AS doc_id),
         LATERAL (SELECT CASE doc_id % {len(PNG_DIMS)} {_PNG_PIX_CASE} END AS px)
"""


# --- REAL JPEG decode with a bitstream-free oracle -------------------------

JPEG_N_DOCS = 30


def _jpeg_expected_rgb(doc_id: int) -> tuple[int, int, int]:
    """Expected decoded RGB for fixture ``doc_id``, via the
    bitstream-free reference pipeline (``codecs.jpeg_reference_pipeline``
    — DCT/quant/IDCT/color math only, no markers, no Huffman, no bit
    I/O).  A solid-color image reconstructs to a solid color, and 4:2:0
    equals 4:4:4 on constants (box-mean and replication are identities),
    so one 8x8 probe gives the exact full-image value."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        jpeg_reference_pipeline,
    )

    v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
    probe = np.zeros((8, 8, 3), dtype=np.uint8)
    probe[:, :, 0], probe[:, :, 1], probe[:, :, 2] = v
    q = 75 if doc_id % 2 == 0 else 90
    out = jpeg_reference_pipeline(probe, quality=q)
    return tuple(int(x) for x in out[0, 0])


def multimodal_jpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL baseline-JPEG decoding, oracle-checked (closes S9, VERDICT
    r3 item 4; reference decode: ``process_test_train_Images.py:45``):
    solid-color JPEGs from the pure-numpy encoder (Annex K tables,
    alternating quality 75/90 and 4:4:4 / 4:2:0 subsampling) are decoded
    by the pure Huffman+IDCT decoder through the full Arrow
    ``mapInPandas`` pipeline; per-channel pixel sums after
    aspect-preserving resize+pad are compared against the bitstream-free
    reference pipeline's values (agreement proves markers, canonical
    Huffman, zigzag, dequantize, IDCT, upsampling and color conversion
    carry every coefficient bit-exactly).  Same integral-resize dims as
    the PNG twin, so sums stay closed-form."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_jpeg
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images

    rows = []
    for doc_id in range(JPEG_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
        q = 75 if doc_id % 2 == 0 else 90
        ss = "4:4:4" if doc_id % 4 < 2 else "4:2:0"
        rows.append(
            (doc_id, f"{doc_id}.jpg", bytearray(encode_jpeg(img, quality=q, subsampling=ss)))
        )
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    decoded = decode_images(entries, use_real_codec=True, normalize=False)

    def chan_sum(c: int):
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id",
        F.col("channels").cast("long").alias("channels"),
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_jpeg_decode"] = multimodal_jpeg_decode

_JPEG_RGB = [_jpeg_expected_rgb(i) for i in range(JPEG_N_DOCS)]
_JPEG_R_CASE = " ".join(f"WHEN {i} THEN {v[0]}" for i, v in enumerate(_JPEG_RGB))
_JPEG_G_CASE = " ".join(f"WHEN {i} THEN {v[1]}" for i, v in enumerate(_JPEG_RGB))
_JPEG_B_CASE = " ".join(f"WHEN {i} THEN {v[2]}" for i, v in enumerate(_JPEG_RGB))

ORACLES["multimodal_jpeg_decode"] = f"""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS channels,
           CAST(224 AS BIGINT) AS height,
           CAST(224 AS BIGINT) AS width,
           CAST((CASE doc_id {_JPEG_R_CASE} END) * px AS BIGINT) AS r_sum,
           CAST((CASE doc_id {_JPEG_G_CASE} END) * px AS BIGINT) AS g_sum,
           CAST((CASE doc_id {_JPEG_B_CASE} END) * px AS BIGINT) AS b_sum
    FROM (SELECT unnest(range({JPEG_N_DOCS})) AS doc_id),
         LATERAL (SELECT CASE doc_id % {len(PNG_DIMS)} {_PNG_PIX_CASE} END AS px)
"""


# oracle literals = tools/make_image_fixture.py's manifest output
# (entry_name, format, width, height, byte length); the fixture zip and
# these rows regenerate together, and tests/test_multimodal.py pins the
# committed zip to the same manifest.
ORACLES["multimodal_image_sniff"] = """
    SELECT * FROM (VALUES
        ('p1.png',  'png',  CAST(37  AS BIGINT), CAST(23  AS BIGINT), CAST(95  AS BIGINT)),
        ('p2.png',  'png',  CAST(224 AS BIGINT), CAST(112 AS BIGINT), CAST(383 AS BIGINT)),
        ('b1.png',  'bmp',  CAST(15  AS BIGINT), CAST(9   AS BIGINT), CAST(486 AS BIGINT)),
        ('j1.jpg',  'jpeg', CAST(32  AS BIGINT), CAST(16  AS BIGINT), CAST(625 AS BIGINT)),
        ('j2.jpeg', 'jpeg', CAST(9   AS BIGINT), CAST(7   AS BIGINT), CAST(614 AS BIGINT))
    ) AS t(entry_name, image_format, image_width, image_height, image_bytes)
"""


def _image_pipeline_oracle() -> str:
    """Independent plain-numpy replica of fake-decode + resize/pad +
    normalize + CHW left-fold sum over the static fixture ZIP (see
    ``multimodal_image_pipeline``); emits the expected manifest as
    literals."""
    import hashlib
    import zipfile

    import numpy as np

    meta = {101: 48.137, 102: 40.712, 103: 35.676}
    rows = []
    with zipfile.ZipFile(_FIXTURE_ZIP) as zf:
        for name in ("101.jpg", "102.png", "103.jpeg"):
            content = zf.read(name)
            h, w = 32 + len(content) % 97, 32 + len(content) % 89
            pix = np.resize(
                np.frombuffer(hashlib.md5(content).digest(), dtype=np.uint8),
                (h, w, 3),
            )
            scale = min(224 / h, 224 / w)
            nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
            r = (np.arange(nh) / scale).astype(int).clip(0, h - 1)
            c = (np.arange(nw) / scale).astype(int).clip(0, w - 1)
            canvas = np.zeros((224, 224, 3), dtype=np.uint8)
            top, left = (224 - nh) // 2, (224 - nw) // 2
            canvas[top : top + nh, left : left + nw] = pix[r][:, c]
            arr = canvas.astype(np.float32) / 255.0
            chw = np.transpose(arr, (2, 0, 1)).reshape(-1)
            total = round(float(np.cumsum(chw.astype(np.float64))[-1]), 2)
            doc = int(name.split(".")[0])
            rows.append(
                f"({doc}, '{name}', CAST(3 AS BIGINT), CAST(224 AS BIGINT), "
                f"CAST(224 AS BIGINT), false, {total}, {meta[doc]})"
            )
    return f"""
        SELECT CAST(id AS BIGINT) AS id, file_name, channels, height, width,
               failed, CAST(pixel_sum AS DOUBLE) AS pixel_sum,
               CAST(latitude AS DOUBLE) AS latitude
        FROM (VALUES {", ".join(rows)})
          AS t(id, file_name, channels, height, width, failed, pixel_sum, latitude)
    """


ORACLES["multimodal_image_pipeline"] = _image_pipeline_oracle()
