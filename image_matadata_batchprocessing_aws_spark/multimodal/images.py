"""Multimodal (image) column plumbing — SURVEY section 2.1 S6/S8-S10, 2.8 F7/F8.

The reference's image ETL (``Image_Train_Model/process_test_train_Images.py``)
pulls a whole ZIP from S3 into memory (``:38``), iterates entries with an
extension filter (``:42``), PIL-decodes + resize/pads to 224x224 (``:13-28``),
stacks 200 tensors per ``.pt`` file (``:49-56``), and deletes the source
(``:68-71``) — keyed only by file position, with the (file_name, tensor)
pair discarded at save time (``:75``).

Engine shape:

- ``binaryFile`` scan of ZIP archives -> ``mapInPandas`` UDTF (one ZIP row
  in, many entry rows out) — real stdlib ``zipfile`` decompression.
- decode/resize/normalize as an Arrow-batched ``mapInPandas`` stage with a
  per-row ``decode_error`` column (bad entries are *kept and labeled*,
  never silently dropped — the reference drops them at ``:57-58`` and
  still deletes the source).
- the image<->metadata join is an explicit equi-join on the filename-
  derived id (replacing the reference's positional alignment,
  ``train.py:59-64``).
- sink = Parquet with ``maxRecordsPerFile`` (the "200 images per file"
  knob as writer config, not a mutable global counter).

Byte-level decode is REAL and 100 % pure numpy+stdlib for EVERY
supported format — PNG (all color types; 1/2/4/8/16-bit), BMP, PPM,
ICO, GIF (incl. animations with disposal/transparency compositing),
baseline / progressive / 12-bit / arithmetic JPEG (QM coder, validated
against system-libjpeg bitstreams), TIFF, and every WebP variant:
VP8L, lossy VP8 per RFC 6386 (bit-exact vs libwebp), ALPH stills and
ANIM/ANMF animations (``multimodal/webp_anim.py``).  No system codec
sits on any decode path; ``webp_sys.py`` survives only as the tests'
ground truth.  The default decode_fn stays the clearly-marked
deterministic fake (md5-seeded pixels) for format-independent golden
tests; everything Spark-side — schemas, ZIP expansion, Arrow batch
shapes, resize/pad math (pure NumPy nearest-neighbor), normalization,
partitioning, the join, the sink — is shared by both paths and tested.

Scale notes: ZIP archives are unsplittable, so one task per archive
(``repartition`` by path before the UDTF) and size-capped archives
upstream; decode is CPU-bound map-side work with zero shuffle; the sink
writes ``maxRecordsPerFile``-bounded parquet so downstream scans
parallelize regardless of archive skew.
"""

from __future__ import annotations

import hashlib
import io
import zipfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png")  # process_test_train_Images.py:42
TARGET_SIZE = 224  # process_test_train_Images.py:14

ZIP_ENTRY_SCHEMA = "zip_path string, entry_name string, content binary"
DECODED_SCHEMA = (
    "file_name string, image array<float>, channels int, height int, width int, "
    "decode_error string"
)


class ImageDecodeUnavailable(NotImplementedError):
    """Raised when a real (PIL) decode is requested but no codec exists
    in this environment."""


def scan_zip_entries(spark: SparkSession, path: str) -> DataFrame:
    """S8 — ``binaryFile`` scan of ZIP archives exploded to one row per
    image entry (UDTF-shaped: mapInPandas, 1 row -> N rows)."""
    raw = spark.read.format("binaryFile").load(path)
    raw = raw.repartition(F.col("path"))  # one unsplittable archive per task

    def explode_zip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[str, str, bytes]] = []
            for zpath, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in zf.namelist():
                        if not name.lower().endswith(IMAGE_EXTENSIONS):
                            continue  # extension filter (ref :42)
                        out.append((zpath, name, zf.read(name)))
            yield pd.DataFrame(out, columns=["zip_path", "entry_name", "content"])

    return raw.select("path", "content").mapInPandas(explode_zip, ZIP_ENTRY_SCHEMA)


def _fake_decode(name: str, content: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode (no image codec in this container).

    Produces an HxWx3 uint8 array whose dims derive from the content
    length and whose pixels derive from md5(content) — stable across
    runs/engines, so golden tests work.  Real deployments replace this
    body with ``PIL.Image.open(io.BytesIO(content)).convert("RGB")``.
    """
    if not content:
        raise ValueError("empty image payload")
    h = 32 + (len(content) % 97)
    w = 32 + (len(content) % 89)
    seed = np.frombuffer(hashlib.md5(content).digest(), dtype=np.uint8)
    pix = np.resize(seed, (h, w, 3))
    return pix


def _pil_decode(name: str, content: bytes) -> np.ndarray:
    """Real codec path: PIL decode to an HxWx3 uint8 RGB array
    (``process_test_train_Images.py:45``).  Import is local so
    environments without PIL can still use every other path."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImageDecodeUnavailable(
            "use_real_codec=True but PIL is not importable here; pass "
            "decode_fn= or install pillow"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))


def _real_decode(name: str, content: bytes) -> np.ndarray:
    """Real-codec dispatch: pure numpy+stdlib decoders for every
    supported format (PNG incl. sub-byte/16-bit, BMP, PPM, ICO,
    baseline/progressive/12-bit/arithmetic JPEG, GIF, TIFF, every WebP
    variant — ``multimodal/codecs.py`` and siblings).
    Raises per image (the mapInPandas stage isolates it into
    ``decode_error``)."""
    from image_matadata_batchprocessing_aws_spark.multimodal import codecs

    # dispatch on magic so a MALFORMED png/bmp/ppm reports its real
    # parse error instead of falling through to the PIL seam
    if content.startswith(b"\x89PNG\r\n\x1a\n"):
        return codecs.decode_png(content)
    if content[:2] == b"BM":
        return codecs.decode_bmp(content)
    if content[:4] == b"\x00\x00\x01\x00":
        return codecs.decode_ico(content)
    if content[:2] in (b"P6", b"P5"):
        return codecs.decode_ppm(content)
    if content[:2] == b"\xff\xd8":
        return codecs.decode_jpeg(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return codecs.decode_gif(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from image_matadata_batchprocessing_aws_spark.multimodal.webp import (  # noqa: PLC0415
            decode_webp,
        )

        # every WebP variant decodes pure: VP8L, lossy VP8 (RFC 6386),
        # ALPH stills, and ANIM/ANMF animations (first composited
        # frame) — webp_sys survives only as the tests' ground truth
        return decode_webp(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        from image_matadata_batchprocessing_aws_spark.multimodal.tiff import (  # noqa: PLC0415
            decode_tiff,
        )

        return decode_tiff(content)
    return _pil_decode(name, content)


#: EXIF orientation tag -> (rot90 k, flip-horizontal) per TIFF 6.0 /
#: EXIF 2.3: the transform that maps STORED pixels back to display
#: orientation.  1 = upright.
_EXIF_ORIENT = {
    1: (0, False),
    2: (0, True),   # mirrored
    3: (2, False),  # rotated 180
    4: (2, True),
    5: (1, True),   # transposed
    6: (3, False),  # rotated 90 CW -> undo with 90 CCW*3
    7: (3, True),   # transversed
    8: (1, False),  # rotated 90 CCW
}


def apply_exif_orientation(img: np.ndarray, orientation: int | None) -> np.ndarray:
    """Normalize stored pixels to display orientation per the EXIF
    orientation tag (the step every image ETL applies between decode
    and resize; pairs with ``exif.extract_exif``).  Unknown/absent tags
    pass through unchanged — absence is data, not an error."""
    spec = _EXIF_ORIENT.get(orientation or 1)
    if spec is None:
        return img
    k, flip = spec
    if flip:
        img = img[:, ::-1]
    if k:
        img = np.rot90(img, k)
    return np.ascontiguousarray(img)


def resize_with_padding(img: np.ndarray, target: int = TARGET_SIZE) -> np.ndarray:
    """F7 — aspect-preserving resize onto a black square canvas
    (``ResizeWithPadding``, process_test_train_Images.py:13-22), as pure
    NumPy nearest-neighbor (no codec needed)."""
    h, w = img.shape[:2]
    scale = min(target / h, target / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    rows = (np.arange(nh) / scale).astype(int).clip(0, h - 1)
    cols = (np.arange(nw) / scale).astype(int).clip(0, w - 1)
    resized = img[rows][:, cols]
    canvas = np.zeros((target, target, 3), dtype=img.dtype)
    top, left = (target - nh) // 2, (target - nw) // 2
    canvas[top : top + nh, left : left + nw] = resized
    return canvas


def decode_images(
    entries: DataFrame,
    target: int = TARGET_SIZE,
    normalize: bool = True,
    use_real_codec: bool = False,
    decode_fn=None,
) -> DataFrame:
    """S9/F7/F8 — decode + resize/pad + [0,1] float CHW normalize, as one
    Arrow-batched ``mapInPandas`` stage with per-row error isolation.

    The byte-level decode is a pluggable seam: ``decode_fn(name, content)
    -> HxWx3 uint8 ndarray``.  ``use_real_codec=True`` selects REAL
    decoding, 100 % pure numpy+stdlib — PNG / BMP / PPM / GIF
    (``multimodal/codecs.py``), baseline + progressive + 12-bit +
    arithmetic JPEG, TIFF, and every WebP variant: VP8L, lossy VP8
    (RFC 6386, ``multimodal/vp8.py``), ALPH stills and ANIM/ANMF
    animations (``multimodal/webp_anim.py``).  Malformed rows land in
    the ``decode_error`` column (per-row isolation) instead of failing
    the job.  Default remains the deterministic fake — stable
    golden-test pixels with zero per-row branching.
    """
    if decode_fn is None:
        decode_fn = _real_decode if use_real_codec else _fake_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                try:
                    img = decode_fn(name, bytes(content))
                    img = resize_with_padding(img, target)
                    arr = img.astype(np.float32)
                    if normalize:
                        arr = arr / 255.0  # ToTensor scaling (ref :25-28)
                    chw = np.transpose(arr, (2, 0, 1)).reshape(-1)
                    rows.append((name, chw.tolist(), 3, target, target, None))
                except Exception as exc:  # noqa: BLE001 — per-file isolation (ref :57-58)
                    rows.append((name, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "image",
                    "channels",
                    "height",
                    "width",
                    "decode_error",
                ],
            )

    return entries.mapInPandas(decode, DECODED_SCHEMA)


#: one row per composited animation frame — stats only; pixels never
#: leave the Arrow batch (signatures shuffle, frames don't)
ANIMATION_SCHEMA = (
    "file_name string, frame_idx long, duration_ms long, height long, "
    "width long, r_sum long, g_sum long, b_sum long, a_sum long, "
    "decode_error string"
)


def animation_frame_stats(entries: DataFrame) -> DataFrame:
    """S9 extension — animated GIF (89a disposal/transparency model,
    ``multimodal/gif_anim.py``) and animated WebP (VP8X/ANIM/ANMF +
    ALPH, ``multimodal/webp_anim.py``) decoded and COMPOSITED pure,
    one output row per frame with per-channel pixel sums + duration.

    Reference parity: PIL's ``Image.open`` + ``seek``/``n_frames``
    animation surface (process_test_train_Images.py:45 reads GIFs via
    PIL, which composites frames the same way).  Scale shape: one
    Arrow ``mapInPandas`` stage, per-row error isolation, linear in
    blob bytes; only fixed-width stats rows shuffle.  Input schema:
    (entry_name string, content binary)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from image_matadata_batchprocessing_aws_spark.multimodal.gif_anim import (  # noqa: PLC0415
            compose_gif_frames,
        )
        from image_matadata_batchprocessing_aws_spark.multimodal.webp_anim import (  # noqa: PLC0415
            compose_webp_frames,
        )

        for pdf in batches:
            rows = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                try:
                    blob = bytes(content)
                    if blob[:6] in (b"GIF87a", b"GIF89a"):
                        frames = [
                            (rgb, None, delay_cs * 10)
                            for rgb, delay_cs in compose_gif_frames(blob)
                        ]
                    elif blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
                        frames = [
                            (rgba[:, :, :3], rgba[:, :, 3], dur)
                            for rgba, dur in compose_webp_frames(blob)
                        ]
                    else:
                        raise codecs.ImageFormatError("not an animated GIF/WebP")
                    for i, (rgb, alpha, dur) in enumerate(frames):
                        h, w = rgb.shape[:2]
                        sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                        a_sum = (
                            int(alpha.sum(dtype=np.int64))
                            if alpha is not None
                            else 255 * h * w
                        )
                        rows.append(
                            (
                                name, i, dur, h, w,
                                int(sums[0]), int(sums[1]), int(sums[2]),
                                a_sum, None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "frame_idx", "duration_ms", "height", "width",
                    "r_sum", "g_sum", "b_sum", "a_sum", "decode_error",
                ],
            )

    return entries.mapInPandas(stats, ANIMATION_SCHEMA)


def image_metadata_join(
    images: DataFrame, metadata: DataFrame, id_col: str = "id"
) -> DataFrame:
    """The flagship explicit equi-join replacing positional alignment
    (SURVEY section 2.3): entry names encode the metadata id
    (``<id>.jpg``); metadata is typically the broadcast side."""
    extracted = F.regexp_extract(F.col("file_name"), r"(\d+)\.[a-zA-Z]+$", 1)
    # entries with no numeric id (e.g. corrupt.jpg) -> null key, not an
    # ANSI cast error
    keyed = images.withColumn(
        id_col, F.when(extracted != "", extracted).cast("long")
    )
    return keyed.join(F.broadcast(metadata), id_col, "inner")


def write_image_batches(
    df: DataFrame, path: str, records_per_file: int = 200, mode: str = "overwrite"
) -> None:
    """S10/A9 — batched sink: 200 images/file as writer config
    (``maxRecordsPerFile``), idempotent overwrite instead of mutable
    global counters (ref :31,:49-56)."""
    df.write.mode(mode).option("maxRecordsPerFile", records_per_file).parquet(path)


def sniff_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Image format + pixel dimensions parsed from BINARY HEADERS with
    pure Catalyst expressions — no codec, no Python, no UDF: the parse
    runs inside whole-stage codegen at scan speed.  The expression only
    ever touches the first 34 bytes of each value (every offset below is
    inside an explicit ``substring(content, 1, 34)`` prefix).  Note
    Spark's ``binaryFile`` source still materializes each FILE in full to
    build the content column — for a 100 TB lake, run this sniff once at
    ingest and persist the (path, format, width, height) catalog as
    parquet; subsequent catalog queries then never touch the blobs.

    Fixed-offset formats parse exactly:

    - PNG — IHDR big-endian 32-bit at bytes 17-24;
    - GIF87a/89a — little-endian 16-bit at 7-10;
    - BMP — gated on the DIB header-size field (LE 32-bit at 15-18):
      BITMAPCOREHEADER (12) stores 16-bit dims at 19-22, all later
      headers (40/108/124…) signed 32-bit dims at 19-26.  biHeight < 0
      means top-down row order — magnitude is the pixel height; a
      negative biWidth is invalid and yields null;
    - WEBP — RIFF container, dispatched on the first chunk tag:
      ``VP8X`` (extended: 24-bit LE canvas dims minus one at 25-30),
      ``VP8L`` (lossless: two 14-bit fields packed after the 0x2F
      signature byte), ``VP8 `` (lossy: 14-bit LE dims after the
      0x9D012A start code, validated).

    JPEG dimensions live in a variable-position SOF marker, so they get
    a BOUNDED SEGMENT WALK instead of a fixed offset: ``F.aggregate``
    over a constant step sequence carries (position, dims, done) through
    up to 12 marker segments of a 4 KiB prefix — still a single JVM-side
    expression (higher-order functions evaluate iteratively at runtime,
    so the walk cannot blow up the plan the way an unrolled when-chain
    would).  A SOF marker past the prefix or segment budget degrades to
    null dims (the row still reports ``format='jpeg'`` and can flow to
    the decode UDTF, :func:`decode_images`).  TIFF (both ``II`` and
    ``MM`` byte orders) rides the same pattern: follow the IFD offset,
    then walk up to 32 directory entries for the ImageWidth/ImageLength
    tags (0x0100/0x0101, SHORT or LONG, left-justified value field).
    Unknown magics are labeled 'unknown'.

    Big/little-endian integer extraction: ``hex()`` of a binary slice,
    byte-order fixed by slice order, then ``conv(_, 16, 10)``.
    """
    full = F.col(content_col)
    # every fixed-offset parse is <= byte 34; slicing keeps the codegen
    # expressions over a bounded prefix no matter how large the blob is
    c = F.substring(full, 1, 34)
    magic = F.hex(F.substring(c, 1, 8))

    def be(pos: int, nbytes: int):
        return F.conv(F.hex(F.substring(c, pos, nbytes)), 16, 10).cast("long")

    def le(pos: int, nbytes: int):
        # reverse byte order by concatenating single-byte hex slices
        return F.conv(
            F.concat(*[F.hex(F.substring(c, pos + i, 1)) for i in range(nbytes - 1, -1, -1)]),
            16,
            10,
        ).cast("long")

    def s32(col):
        # reinterpret an unsigned LE 32-bit read as signed int32
        return F.when(col > 0x7FFFFFFF, col - 0x100000000).otherwise(col)

    def positive_or_null(col):
        return F.when(col > 0, col)

    webp_tag = F.hex(F.substring(c, 13, 4))  # first RIFF chunk id
    is_webp = magic.startswith("52494646") & (F.hex(F.substring(c, 9, 4)) == F.lit("57454250"))
    is_tiff_le = magic.startswith("49492A00")
    is_tiff_be = magic.startswith("4D4D002A")
    fmt = (
        F.when(magic.startswith("89504E470D0A1A0A"), "png")
        .when(magic.startswith("474946383761") | magic.startswith("474946383961"), "gif")
        .when(magic.startswith("424D"), "bmp")
        .when(magic.startswith("FFD8FF"), "jpeg")
        .when(is_webp, "webp")
        .when(is_tiff_le | is_tiff_be, "tiff")
        .otherwise("unknown")
    )

    # BMP: DIB header size decides layout; int32 dims are signed
    dib = le(15, 4)
    bmp_w = F.when(dib == 12, le(19, 2)).otherwise(positive_or_null(s32(le(19, 4))))
    bmp_h = F.when(dib == 12, le(21, 2)).otherwise(positive_or_null(F.abs(s32(le(23, 4)))))

    # WEBP VP8L: signature byte 0x2F at 21, then uint32 LE at 22-25 packs
    # width-1 (bits 0-13) and height-1 (bits 14-27)
    vp8l_ok = F.hex(F.substring(c, 21, 1)) == F.lit("2F")
    vp8l_packed = le(22, 4)
    vp8l_w = F.when(vp8l_ok, vp8l_packed.bitwiseAND(F.lit(0x3FFF)) + 1)
    vp8l_h = F.when(vp8l_ok, F.shiftright(vp8l_packed, 14).bitwiseAND(F.lit(0x3FFF)) + 1)

    # WEBP VP8 (lossy): keyframe start code 9D 01 2A at 24-26, then
    # 16-bit LE fields whose low 14 bits are the dims
    vp8_ok = F.hex(F.substring(c, 24, 3)) == F.lit("9D012A")
    vp8_w = F.when(vp8_ok, le(27, 2).bitwiseAND(F.lit(0x3FFF)))
    vp8_h = F.when(vp8_ok, le(29, 2).bitwiseAND(F.lit(0x3FFF)))

    # JPEG: walk marker segments (FF mm LEN...) from byte 3 until a
    # start-of-frame marker (dims at +5/+7 past the segment start) or the
    # segment/prefix budget runs out.  The accumulator rides through
    # F.aggregate, so the 12-step walk is iterative at runtime.
    jpeg_prefix = F.substring(full, 1, 4096)

    def jbyte(pos):
        return F.conv(F.hex(jpeg_prefix.substr(pos, F.lit(1))), 16, 10).cast("long")

    def jbe16(pos):
        return F.conv(F.hex(jpeg_prefix.substr(pos, F.lit(2))), 16, 10).cast("long")

    _SOF_MARKERS = [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]

    def _jpeg_step(acc, _):
        pos = acc["pos"]
        done = acc["done"]
        is_ff = jbyte(pos) == 0xFF
        is_sof = is_ff & jbyte(pos + 1).isin(_SOF_MARKERS)
        new_done = done | is_sof | ~is_ff
        return F.struct(
            F.when(new_done, pos).otherwise(pos + 2 + jbe16(pos + 2)).alias("pos"),
            F.when(~done & is_sof, jbe16(pos + 7)).otherwise(acc["w"]).alias("w"),
            F.when(~done & is_sof, jbe16(pos + 5)).otherwise(acc["h"]).alias("h"),
            new_done.alias("done"),
        )

    jpeg_walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(12)),
        F.struct(
            F.lit(3).cast("long").alias("pos"),
            F.lit(None).cast("long").alias("w"),
            F.lit(None).cast("long").alias("h"),
            F.lit(False).alias("done"),
        ),
        _jpeg_step,
    )
    jpeg_w = jpeg_walk["w"]
    jpeg_h = jpeg_walk["h"]

    # TIFF: header gives the IFD offset; the IFD is a counted table of
    # 12-byte entries (tag, type, count, value) — walk up to 32 entries
    # for ImageWidth (0x0100) / ImageLength (0x0101).  SHORT(3)/LONG(4)
    # values are left-justified in the 4-byte value field, so a 16- or
    # 32-bit read at entry+8 in the file's byte order is the value.
    tiff_prefix = F.substring(full, 1, 4096)

    def _tiff_walk(little: bool):
        def rd(pos, nbytes: int):
            h = F.hex(tiff_prefix.substr(pos, F.lit(nbytes)))
            if little:
                h = F.concat(
                    *[F.substring(h, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)]
                )
            return F.conv(h, 16, 10).cast("long")

        ifd = rd(F.lit(5), 4) + 1  # 0-based file offset -> 1-based pos
        n_entries = rd(ifd, 2)

        def step(acc, i):
            epos = ifd + 2 + (i - 1) * 12
            valid = i <= n_entries
            tag = rd(epos, 2)
            typ = rd(epos + 2, 2)
            val = F.when(typ == 3, rd(epos + 8, 2)).when(typ == 4, rd(epos + 8, 4))
            return F.struct(
                F.when(valid & (tag == 0x0100) & acc["w"].isNull(), val)
                .otherwise(acc["w"]).alias("w"),
                F.when(valid & (tag == 0x0101) & acc["h"].isNull(), val)
                .otherwise(acc["h"]).alias("h"),
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(32)),
            F.struct(
                F.lit(None).cast("long").alias("w"),
                F.lit(None).cast("long").alias("h"),
            ),
            step,
        )

    tiff_le_walk = _tiff_walk(little=True)
    tiff_be_walk = _tiff_walk(little=False)
    tiff_w = F.when(is_tiff_le, tiff_le_walk["w"]).when(is_tiff_be, tiff_be_walk["w"])
    tiff_h = F.when(is_tiff_le, tiff_le_walk["h"]).when(is_tiff_be, tiff_be_walk["h"])

    # WEBP VP8X: 24-bit LE canvas-width-1 / height-1 at 25-27 / 28-30
    webp_w = (
        F.when(webp_tag == "56503858", le(25, 3) + 1)
        .when(webp_tag == "5650384C", vp8l_w)
        .when(webp_tag == "56503820", vp8_w)
    )
    webp_h = (
        F.when(webp_tag == "56503858", le(28, 3) + 1)
        .when(webp_tag == "5650384C", vp8l_h)
        .when(webp_tag == "56503820", vp8_h)
    )

    width = (
        F.when(fmt == "png", be(17, 4))
        .when(fmt == "gif", le(7, 2))
        .when(fmt == "bmp", bmp_w)
        .when(fmt == "webp", webp_w)
        .when(fmt == "jpeg", jpeg_w)
        .when(fmt == "tiff", tiff_w)
        .otherwise(F.lit(None).cast("long"))
    )
    height = (
        F.when(fmt == "png", be(21, 4))
        .when(fmt == "gif", le(9, 2))
        .when(fmt == "bmp", bmp_h)
        .when(fmt == "webp", webp_h)
        .when(fmt == "jpeg", jpeg_h)
        .when(fmt == "tiff", tiff_h)
        .otherwise(F.lit(None).cast("long"))
    )
    return df.withColumns(
        {
            "image_format": fmt,
            "image_width": width.cast("long"),
            "image_height": height.cast("long"),
            "image_bytes": F.octet_length(full).cast("long"),
        }
    )


PIXEL_STATS_SCHEMA = (
    "file_name string, n_pixels long, sum_px long, min_px long, max_px long, "
    "hist array<long>, stats_error string"
)


def image_pixel_stats(
    entries: DataFrame,
    bins: int = 16,
    use_real_codec: bool = True,
    decode_fn=None,
) -> DataFrame:
    """Integer-exact per-image pixel statistics at NATIVE resolution —
    the surfaces image-curation gates derive from (brightness = mean,
    contrast = max-min, flatness = histogram entropy): total pixel-value
    sum, min/max, and a ``bins``-bin histogram over all channel values,
    every field an exact integer so the float gates can be computed
    identically JVM-side and in the SQL twin.  Same Arrow decode seam
    and per-row error isolation as :func:`decode_images`."""
    if decode_fn is None:
        decode_fn = _real_decode if use_real_codec else _fake_decode
    width = 256 // bins

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                try:
                    img = decode_fn(name, bytes(content))
                    flat = img.reshape(-1).astype(np.int64)
                    hist = np.bincount(flat // width, minlength=bins)[:bins]
                    rows.append(
                        (
                            name,
                            int(img.shape[0] * img.shape[1]),
                            int(flat.sum()),
                            int(flat.min()),
                            int(flat.max()),
                            hist.tolist(),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "n_pixels", "sum_px", "min_px", "max_px",
                    "hist", "stats_error",
                ],
            )

    return entries.mapInPandas(stats, PIXEL_STATS_SCHEMA)


EQUALIZE_SCHEMA = (
    "file_name string, n_pixels long, n_levels long, eq_sum long, "
    "eq_min long, eq_max long, eq_error string"
)


def equalize_image_stats(
    entries: DataFrame,
    use_real_codec: bool = True,
    decode_fn=None,
) -> DataFrame:
    """HISTOGRAM EQUALIZATION over the real decode seam, reported as
    integer-exact post-equalization statistics: each image's values
    remap through the classic CDF stretch

        eq(v) = round((cdf(v) - cdf_min) * 255 / (n - cdf_min))

    computed ENTIRELY in int64 with round-half-up via
    ``(x*2 + d) // (2*d)`` — numpy's ``round`` is half-to-even and SQL
    ``round`` is half-away, so the integer form is the only one both
    engines (and the oracle) reproduce bit-for-bit.  A flat (solid)
    image has ``n == cdf_min``; the remap is undefined there and maps
    to 0, reported with ``n_levels = 1`` so curation gates can route
    degenerate images explicitly.

    Shape: per-file map-side work bounded by pixels + 256-entry LUT;
    no shuffle; per-row errors isolate in ``eq_error`` (the
    :func:`decode_images` contract).
    """
    if decode_fn is None:
        decode_fn = _real_decode if use_real_codec else _fake_decode

    def equalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                try:
                    img = decode_fn(name, bytes(content))
                    flat = img.reshape(-1).astype(np.int64)
                    vals, counts = np.unique(flat, return_counts=True)
                    cdf = counts.cumsum()
                    n = int(flat.size)
                    cmin = int(cdf[0])
                    denom = n - cmin
                    if denom > 0:
                        eq = ((cdf - cmin) * 255 * 2 + denom) // (2 * denom)
                    else:
                        eq = np.zeros_like(cdf)
                    lut = np.zeros(256, dtype=np.int64)
                    lut[vals] = eq
                    eqf = lut[flat]
                    rows.append(
                        (
                            name,
                            int(img.shape[0] * img.shape[1]),
                            int(len(vals)),
                            int(eqf.sum()),
                            int(eqf.min()),
                            int(eqf.max()),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "n_pixels", "n_levels", "eq_sum",
                    "eq_min", "eq_max", "eq_error",
                ],
            )

    return entries.mapInPandas(equalize, EQUALIZE_SCHEMA)


TILE_STATS_SCHEMA = (
    "file_name string, tile_row long, tile_col long, tile_sum long, "
    "tile_error string"
)


def image_tile_stats(
    entries: DataFrame,
    grid: int = 4,
    use_real_codec: bool = True,
    decode_fn=None,
) -> DataFrame:
    """Tile-level integer signatures for PARTIAL-image near-dup: the
    decoded image splits into a ``grid x grid`` tile lattice and each
    tile emits its exact pixel-value sum — a content signature a crop,
    shift, or watermark variant preserves for the tiles it keeps,
    which whole-image signatures (dHash & friends) lose entirely.

    Only decode + tile summation run in the Arrow stage; candidate
    generation (:func:`tile_overlap_pairs`) is a JVM-side posting-list
    join on the signature.  Per-file errors isolate per row.
    """
    if decode_fn is None:
        decode_fn = _real_decode if use_real_codec else _fake_decode

    from image_matadata_batchprocessing_aws_spark.multimodal import codecs

    def tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                try:
                    img = decode_fn(name, bytes(content)).astype(np.int64)
                    h, w = img.shape[0], img.shape[1]
                    th, tw = h // grid, w // grid
                    if th == 0 or tw == 0:
                        raise codecs.ImageFormatError(
                            f"image {h}x{w} smaller than {grid}x{grid} grid"
                        )
                    for r in range(grid):
                        for c in range(grid):
                            tile = img[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
                            rows.append((name, r, c, int(tile.sum()), None))
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["file_name", "tile_row", "tile_col", "tile_sum", "tile_error"],
            )

    return entries.mapInPandas(tiles, TILE_STATS_SCHEMA)


def tile_overlap_pairs(
    tiles: DataFrame,
    min_shared: int = 2,
    max_df: int | None = 64,
) -> DataFrame:
    """Image pairs sharing >= ``min_shared`` tile signatures, position-
    independent (a crop moves tiles; their content sums survive).

    Signatures deduplicate per image first, and ``max_df`` drops
    signatures appearing in more than that many images — solid
    background tiles are the boilerplate shingles of images and would
    otherwise pay k^2 join rows for zero signal (the
    :func:`ngram_jaccard_pairs` skew guard, same reasoning).
    One shuffle on the signature, one on the pair key.
    """
    sig = (
        tiles.where(F.col("tile_sum").isNotNull())
        .select("file_name", "tile_sum")
        .distinct()
    )
    if max_df is not None:
        hot = (
            sig.groupBy("tile_sum")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("tile_sum")
        )
        sig = sig.join(F.broadcast(hot), "tile_sum", "left_anti")
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, F.col("a.tile_sum") == F.col("b.tile_sum"))
        .where(F.col("a.file_name") < F.col("b.file_name"))
        .groupBy(
            F.col("a.file_name").alias("file_a"),
            F.col("b.file_name").alias("file_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .select("file_a", "file_b", F.col("n_shared").cast("long").alias("n_shared"))
    )
