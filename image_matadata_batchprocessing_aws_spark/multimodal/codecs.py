"""REAL image decoders in pure numpy + stdlib — no PIL, no C codec.

Closes most of the S9 decode gap (SURVEY §2.1; reference decode is
``process_test_train_Images.py:45`` via PIL): PNG, BMP and PPM/PGM are
fully decodable with nothing but ``zlib`` (stdlib) and numpy, so the
"real codec" path no longer needs an absent third-party library for
these formats, JPEG decodes for real too — baseline sequential AND
progressive (canonical Huffman + matrix IDCT + full T.81 Annex G
successive approximation, see the JPEG section) — and GIF decodes for
real (LZW, see the GIF section), as does lossless WEBP (VP8L — see
``multimodal/webp.py``).  12-bit extended sequential and progressive
JPEG decode for real (SOF1/SOF2, Pq=1 16-bit quant tables, extended
Huffman alphabet, uint16 output), and so does ARITHMETIC-coded JPEG
— both sequential (SOF9) and progressive (SOF10): the T.81 Annex D QM
coder plus the Annex F/G conditioning models, validated bit-exact
against system-libjpeg bitstreams (see the arithmetic section).  Only
LOSSY WebP (VP8) stays behind the PIL seam (``images._pil_decode``);
hierarchical/lossless JPEG raise typed errors.

Formats:

- **PNG** (``decode_png``): 8-bit depth, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth) inverted per the spec; multiple IDAT
  chunks concatenated; Adam7 interlacing de-interlaced (7 independently
  filtered passes scattered to the grid).  Alpha is dropped (PIL
  ``convert("RGB")`` semantics for the pipeline).
- **BMP** (``decode_bmp``): BITMAPINFOHEADER (40+) uncompressed 24/32
  bpp, bottom-up and top-down row orders, 4-byte row padding, BGR(A) →
  RGB; 8-bit paletted via the BGRX color table.
- **PPM/PGM** (``decode_ppm``): binary P6/P5, maxval <= 255,
  whitespace/comment-tolerant header.
- **JPEG** (``decode_jpeg``): baseline sequential DCT (SOF0/SOF1) AND
  progressive (SOF2 — spectral selection, successive approximation,
  EOB runs, refinement ZRL), 8-bit AND 12-bit precision (12-bit:
  SOF1/SOF2 only per T.81, Pq=1 16-bit quant tables, uint16 output),
  grayscale or YCbCr with any sampling factors, restart markers,
  0xFF00 unstuffing; arithmetic/hierarchical raise.  ``encode_jpeg`` (Annex K
  tables; ``progressive=True`` emits a libjpeg-shaped scan script)
  generates fixtures; ``jpeg_reference_pipeline`` is the
  bitstream-free oracle.
- **GIF** (``decode_gif``): 87a/89a first frame, global/local color
  tables, interlacing, deferred clear, frame placement on the logical
  screen; ``encode_gif`` (real compressing LZW) generates fixtures.

Everything returns HxWx3 uint8 (the pipeline contract of
``images.decode_images``).  These run INSIDE the Arrow-batched
mapInPandas stage — per-image Python is the accepted slow path there,
and the scanline un-filter loops are bounded by image height.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageFormatError(ValueError):
    """Malformed or unsupported image payload."""


# --- PNG -------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        yield ctype, payload
        off += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering -> (h, w*bpp) uint8."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ImageFormatError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: left neighbor — sequential in x
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 2:  # Up: fully vectorized
            row = (row.astype(np.int16) + prior).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prior[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + _paeth(left, int(prior[x]), ul)) & 0xFF
        else:
            raise ImageFormatError(f"unknown PNG filter type {ftype}")
        out[y] = row
    return out


#: Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _deinterlace_adam7(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Adam7: the stream is 7 independently-filtered sub-images (one
    filter byte per sub-image scanline, unfiltering references only the
    sub-image's own rows), scattered back onto the full grid."""
    out = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    for xs, ys, xstep, ystep in _ADAM7:
        pw = (w - xs + xstep - 1) // xstep
        ph = (h - ys + ystep - 1) // ystep
        if pw <= 0 or ph <= 0:
            continue  # empty pass for small images
        size = (1 + pw * ch) * ph
        sub = raw[pos : pos + size]
        if len(sub) < size:
            raise ImageFormatError("interlaced PNG pixel data truncated")
        pos += size
        px = _unfilter(sub, ph, pw, ch).reshape(ph, pw, ch)
        out[ys::ystep, xs::xstep] = px
    return out


def decode_png(content: bytes) -> np.ndarray:
    if not content.startswith(_PNG_MAGIC):
        raise ImageFormatError("not a PNG (bad magic)")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, payload in _png_chunks(content):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(payload)
    if ihdr is None:
        raise ImageFormatError("PNG missing IHDR")
    w, h, depth, ctype_code, comp, filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ImageFormatError(f"unsupported PNG bit depth {depth}")
    if ctype_code not in _PNG_CHANNELS:
        raise ImageFormatError(f"unsupported PNG color type {ctype_code}")
    if depth < 8 and ctype_code not in (0, 3):
        raise ImageFormatError(f"sub-byte PNG depth {depth} needs gray/palette")
    if depth == 16 and ctype_code == 3:
        raise ImageFormatError("16-bit palette PNG is not a legal combination")
    if comp != 0 or filt != 0:
        raise ImageFormatError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ImageFormatError(f"bad PNG interlace method {interlace}")
    if interlace == 1 and depth != 8:
        raise ImageFormatError("interlaced PNG supported at depth 8 only")
    if w == 0 or h == 0:
        raise ImageFormatError("zero-dimension PNG")
    ch = _PNG_CHANNELS[ctype_code]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ImageFormatError(f"PNG IDAT stream corrupt/truncated: {exc}") from exc
    if interlace == 1:
        px = _deinterlace_adam7(raw, h, w, ch)
    elif depth == 8:
        px = _unfilter(raw, h, w, ch).reshape(h, w, ch)
    elif depth == 16:
        # filters act on bytes with bpp = 2*ch; samples are big-endian,
        # reduced to 8 bits via the high byte (PIL's I;16 -> L rule)
        rows = _unfilter(raw, h, w, 2 * ch).reshape(h, w, ch, 2)
        px = rows[:, :, :, 0].copy()
    else:
        # 1/2/4-bit gray or palette: filters act on the packed bytes
        # (bpp = 1 per spec); unpack MSB-first, then scale gray samples
        # to 8 bits by bit replication (255 / (2^depth - 1))
        stride = (w * depth + 7) // 8
        packed = _unfilter(raw, h, stride, 1)
        bits = np.unpackbits(packed, axis=1)
        samples = bits.reshape(h, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        vals = (samples * weights).sum(axis=2)[:, :w].astype(np.uint16)
        if ctype_code == 0:
            vals = vals * (255 // ((1 << depth) - 1))
        px = vals.astype(np.uint8).reshape(h, w, 1)
    if ctype_code == 2:
        return px
    if ctype_code == 6:
        return px[:, :, :3].copy()
    if ctype_code == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_code == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if plte is None:
        raise ImageFormatError("palette PNG missing PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(plte):
        raise ImageFormatError("palette index out of range")
    return plte[idx]


def encode_png_raw(
    samples: np.ndarray,
    depth: int,
    ctype_code: int,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal any-depth PNG writer (fixture generator): filter 0 on
    every scanline, one IDAT.  ``samples`` is (h, w) ints for gray (0)
    / palette (3), or (h, w, ch) for RGB-family color types; values
    must fit ``depth`` bits (16-bit samples are written big-endian,
    sub-byte samples packed MSB-first per spec)."""
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, ch = samples.shape
    rows = bytearray()
    for y in range(h):
        rows.append(0)  # filter type 0
        flat = samples[y].reshape(-1).astype(np.uint32)
        if depth == 16:
            be = np.empty(flat.size * 2, np.uint8)
            be[0::2] = flat >> 8
            be[1::2] = flat & 0xFF
            rows.extend(be.tobytes())
        elif depth == 8:
            rows.extend(flat.astype(np.uint8).tobytes())
        else:
            bits = ((flat[:, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
            rows.extend(np.packbits(bits.astype(np.uint8)).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_code, 0, 0, 0)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    out = bytearray(_PNG_MAGIC)
    out += chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(rows)))
    out += chunk(b"IEND", b"")
    return bytes(out)


def encode_png(img: np.ndarray, color_type: int = 2, interlace: bool = False) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) — fixture generator for
    the decoder's round-trip tests and for building realistic binary
    columns in demos.  Accepts HxWx3 uint8 (color_type 2) or HxW
    (color_type 0); ``interlace=True`` writes the Adam7 pass layout."""
    if color_type == 2:
        h, w, _ = img.shape
        arr = img
    elif color_type == 0:
        h, w = img.shape
        arr = img[:, :, None]
    else:
        raise ImageFormatError("encoder supports color types 0 and 2 only")
    if interlace:
        parts = []
        for xs, ys, xstep, ystep in _ADAM7:
            sub = arr[ys::ystep, xs::xstep]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- BMP -------------------------------------------------------------------


def decode_bmp(content: bytes) -> np.ndarray:
    if len(content) < 54 or content[:2] != b"BM":
        raise ImageFormatError("not a BMP (bad magic / truncated)")
    (data_off,) = struct.unpack("<I", content[10:14])
    (hdr_size,) = struct.unpack("<I", content[14:18])
    if hdr_size < 40:
        raise ImageFormatError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack("<ii", content[18:26])
    planes, bpp = struct.unpack("<HH", content[26:30])
    (compression,) = struct.unpack("<I", content[30:34])
    if w <= 0 or h_signed == 0:
        raise ImageFormatError("invalid BMP dimensions")
    if compression != 0:
        raise ImageFormatError(f"compressed BMP (method {compression}) not supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 8:
        n_colors = struct.unpack("<I", content[46:50])[0] or 256
        tbl_off = 14 + hdr_size
        if tbl_off + n_colors * 4 > len(content):
            raise ImageFormatError("BMP color table truncated")
        table = np.frombuffer(
            content, dtype=np.uint8, count=n_colors * 4, offset=tbl_off
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        row_bytes = (w + 3) & ~3
        if data_off + row_bytes * h > len(content):
            raise ImageFormatError("BMP pixel data truncated")
        rows = []
        for y in range(h):
            off = data_off + y * row_bytes
            idx = np.frombuffer(content, dtype=np.uint8, count=w, offset=off)
            if int(idx.max(initial=0)) >= len(table):
                raise ImageFormatError("BMP palette index out of range")
            rows.append(table[idx])
        img = np.stack(rows)
    elif bpp in (24, 32):
        ch = bpp // 8
        row_bytes = (w * ch + 3) & ~3
        if data_off + row_bytes * h > len(content):
            raise ImageFormatError("BMP pixel data truncated")
        rows = []
        for y in range(h):
            off = data_off + y * row_bytes
            px = np.frombuffer(
                content, dtype=np.uint8, count=w * ch, offset=off
            ).reshape(w, ch)
            rows.append(px[:, :3][:, ::-1])  # BGR(A) -> RGB
        img = np.stack(rows)
    else:
        raise ImageFormatError(f"unsupported BMP bit depth {bpp}")
    return img if top_down else img[::-1].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (fixture generator)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(img[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))
    pixel_off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


# --- PPM / PGM -------------------------------------------------------------


def decode_ppm(content: bytes) -> np.ndarray:
    if content[:2] not in (b"P6", b"P5"):
        raise ImageFormatError("not a binary PPM/PGM")
    gray = content[:2] == b"P5"
    # header: magic, width, height, maxval — whitespace separated with
    # '#' comments; pixel data starts after the single whitespace byte
    # following maxval
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        if pos >= len(content):
            raise ImageFormatError("PPM header truncated")
        c = content[pos : pos + 1]
        if c == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            tok = content[start:pos]
            if not tok.isdigit():
                raise ImageFormatError(f"bad PPM header token {tok!r}")
            tokens.append(int(tok))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255 or maxval <= 0 or w <= 0 or h <= 0:
        raise ImageFormatError("unsupported PPM header values")
    ch = 1 if gray else 3
    need = w * h * ch
    if len(content) - pos < need:
        raise ImageFormatError("PPM pixel data truncated")
    px = np.frombuffer(content, dtype=np.uint8, count=need, offset=pos)
    img = px.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if gray else img.copy()


# --- dispatch --------------------------------------------------------------


def decode_image_auto(name: str, content: bytes) -> np.ndarray:
    """Real-codec dispatch on magic bytes: PNG/BMP/PPM decode HERE in
    pure numpy+stdlib; anything else (JPEG, WEBP, GIF, TIFF) raises
    ``ImageFormatError`` so the caller can route to the PIL seam or to
    the pipeline's error column.  Drop-in ``decode_fn`` for
    ``images.decode_images``."""
    if not content:
        raise ImageFormatError("empty image payload")
    if content.startswith(_PNG_MAGIC):
        return decode_png(content)
    if content.startswith(b"BM"):
        return decode_bmp(content)
    if content[:4] == _ICO_MAGIC:
        return decode_ico(content)
    if content[:2] in (b"P6", b"P5"):
        return decode_ppm(content)
    if content[:2] == b"\xff\xd8":
        return decode_jpeg(content)
    if content[:6] in _GIF_MAGICS:
        return decode_gif(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from image_matadata_batchprocessing_aws_spark.multimodal.webp import (  # noqa: PLC0415 — avoid an import cycle
            decode_webp,
        )

        return decode_webp(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        from image_matadata_batchprocessing_aws_spark.multimodal.tiff import (  # noqa: PLC0415
            decode_tiff,
        )

        return decode_tiff(content)
    raise ImageFormatError(
        f"no pure-python decoder for {name!r} (magic {content[:4]!r}); "
        "only lossy WEBP and exotic JPEG modes need the PIL path"
    )


# --- JPEG (baseline sequential DCT, ITU-T T.81) ----------------------------
#
# Closes the last S9 gap: entropy-coded decode with nothing but numpy +
# stdlib.  Scope: baseline sequential (SOF0), 8-bit, 1 or 3 components,
# any sampling factors (4:4:4 and 4:2:0 exercised by tests), restart
# markers honored (progressive SOF2 and 12-bit SOF1/SOF2 are covered
# in later sections); arithmetic coding raises a typed error.  ``encode_jpeg`` is the fixture generator (Annex K
# standard quant + Huffman tables), same role ``encode_png`` plays for
# the PNG oracle.  Reference behavior being matched: PIL decode at
# ``process_test_train_Images.py:45``.

#: zigzag position -> natural (row-major) index, T.81 Figure 5
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K Table K.1/K.2 base quantization tables (natural order)
_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_JPEG_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Extended-precision Huffman specs for 12-bit frames: Annex K stops at
#: DC category 11 / AC size 10, but 12-bit samples reach DC category 15
#: and AC size 14.  Flat canonical tables (15x4-bit + 1x5-bit DC; 242
#: 8-bit AC symbols = EOB + ZRL + (run 0-15) x (size 1-14)) keep the
#: Kraft sum < 1, avoid the all-ones max-length code, and cover the
#: whole alphabet — compression is not the fixture encoder's job.
_JPEG12_HUFF_DC = (
    [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
#: 226 AC symbols: EOB + ZRL + (run 0-15) x (size 1-14).
_JPEG12_HUFF_AC = (
    [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)],
)

#: Annex K Huffman specs: (bits[1..16] counts, symbol values)
_JPEG_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward C = T @ B @ T.T,
    inverse B = T.T @ C @ T."""
    i = np.arange(8)[:, None].astype(np.float64)
    j = np.arange(8)[None, :].astype(np.float64)
    m = 0.5 * np.cos((2 * j + 1) * i * np.pi / 16)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_JPEG_T = _jpeg_dct_matrix()


def _jpeg_idct_block(coef: np.ndarray) -> np.ndarray:
    """Dequantized natural-order 8x8 int coefficients -> float spatial
    block (level-shift NOT applied)."""
    return _JPEG_T.T @ coef.astype(np.float64) @ _JPEG_T


def _jpeg_canonical_codes(bits: list[int], values: list[int]):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    {(length, code): symbol} for decode and {symbol: (code, length)}
    for encode."""
    decode, encode = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffed marker is reached

    def _load_byte(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ImageFormatError("JPEG entropy-coded data truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ImageFormatError("JPEG entropy-coded data truncated")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                self.marker = nxt
                raise ImageFormatError(
                    f"JPEG marker 0xFF{nxt:02X} inside entropy-coded data"
                )
        self.cur = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._load_byte()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageFormatError("invalid JPEG Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ImageFormatError("expected JPEG restart marker")
        m = d[self.pos + 1]
        if m != 0xD0 + (n % 8):
            raise ImageFormatError(
                f"JPEG restart marker out of sequence (0xFF{m:02X})"
            )
        self.pos += 2


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.12: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline/extended sequential (SOF0/1) AND progressive (SOF2)
    JPEG -> HxWx3 uint8 RGB — or uint16 in [0, 4095] for 12-bit frames
    (SOF1/SOF2 with precision 12 and Pq=1 16-bit quant tables; T.81
    forbids 12-bit baseline and so does this decoder).  Pure numpy +
    stdlib: marker parse, canonical Huffman, zigzag/dequantize, matrix
    IDCT, box chroma upsampling, BT.601 YCbCr->RGB centered at
    2^(prec-1).  Progressive support is full T.81 Annex G entropy
    coding: spectral selection, successive approximation (DC+AC first
    and refinement passes), EOB runs, ZRL in refinement, restart
    markers.  Arithmetic/hierarchical/lossless raise
    :class:`ImageFormatError`."""
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ImageFormatError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)], precision)
    restart_interval = 0
    progressive = False
    arithmetic = False
    arith_cond: dict = {}
    store: dict[int, np.ndarray] | None = None  # cid -> (rows, cols, 64) natural
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ImageFormatError("JPEG marker sync lost")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and store is not None:
                return _jpeg_progressive_reconstruct(frame, qt, store)
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        if pos + 2 > len(content):
            raise ImageFormatError("JPEG segment length truncated")
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        seg = content[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ImageFormatError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq not in (0, 1):
                    raise ImageFormatError("bad JPEG DQT precision")
                if pq:  # 16-bit big-endian entries (12-bit frames)
                    tbl = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.int64)
                else:
                    tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                if tbl.size != 64:
                    raise ImageFormatError("JPEG DQT truncated")
                nat = np.zeros(64, dtype=np.int64)
                nat[_JPEG_ZIGZAG] = tbl
                qt[tq] = nat
                p += 129 if pq else 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nsym = sum(bits)
                values = list(seg[p + 17 : p + 17 + nsym])
                if len(bits) != 16 or len(values) != nsym:
                    raise ImageFormatError("JPEG DHT truncated")
                huff[(tc, th)], _ = _jpeg_canonical_codes(bits, values)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # SOF0/1/2, SOF9/10 (arith)
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec not in (8, 12):
                raise ImageFormatError(f"{prec}-bit JPEG not supported")
            if prec == 12 and marker == 0xC0:
                # T.81: baseline is 8-bit only; 12-bit needs SOF1/SOF2
                raise ImageFormatError("12-bit JPEG must be SOF1/SOF2")
            if h == 0 or w == 0:
                raise ImageFormatError("invalid JPEG dimensions")
            comps = []
            for i in range(ncomp):
                cid, hv, tqi = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tqi))
            frame = (h, w, comps, prec)
            if marker in (0xC9, 0xCA):
                arithmetic = True
            if marker in (0xC2, 0xCA):
                progressive = True
                hmax = max(hs for _, hs, _, _ in comps)
                vmax = max(vs for _, _, vs, _ in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                store = {
                    cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
                    for cid, hs, vs, _ in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                "hierarchical/lossless JPEG not supported"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                tc_tb, val = seg[p], seg[p + 1]
                tc, tb = tc_tb >> 4, tc_tb & 0x0F
                if tc == 0:
                    arith_cond[(0, tb)] = (val & 0x0F, val >> 4)  # (L, U)
                else:
                    arith_cond[(1, tb)] = val  # Kx
                p += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ImageFormatError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            if arithmetic and progressive:
                band = (seg[1 + 2 * ns], seg[2 + 2 * ns],
                        seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F)
                pos = _jpeg_decode_scan_arith_progressive(
                    content, pos + seglen, frame, scan, band,
                    restart_interval, arith_cond, store,
                )
                continue
            if arithmetic:
                return _jpeg_decode_scan_arith(
                    content, pos + seglen, frame, scan, qt,
                    restart_interval, arith_cond,
                )
            if not progressive:
                return _jpeg_decode_scan(
                    content, pos + seglen, frame, scan, qt, huff, restart_interval
                )
            band = (seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns] >> 4,
                    seg[3 + 2 * ns] & 0x0F)
            pos = _jpeg_decode_scan_progressive(
                content, pos + seglen, frame, scan, band, huff,
                restart_interval, store,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen
    raise ImageFormatError("JPEG has no scan (missing SOS)")


def _jpeg_decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps, prec = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ImageFormatError(f"JPEG missing quant table {tq}")
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
    reader = _JpegBitReader(data, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    n_rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_rst(n_rst)
            n_rst += 1
            pred = {cid: 0 for cid, _, _ in scan}
        my, mx = divmod(m, mcus_x)
        for cid, td, ta in scan:
            hs, vs, tq = by_id[cid]
            dc_tbl = huff.get((0, td))
            ac_tbl = huff.get((1, ta))
            if dc_tbl is None or ac_tbl is None:
                raise ImageFormatError("JPEG missing Huffman table")
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64, dtype=np.int64)
                    s = reader.decode_symbol(dc_tbl)
                    diff = _jpeg_extend(reader.read_bits(s), s) if s else 0
                    pred[cid] += diff
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tbl)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ImageFormatError("JPEG AC run overflows block")
                        coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                            reader.read_bits(size), size
                        )
                        k += 1
                    block = _jpeg_idct_block((coef * qt[tq]).reshape(8, 8))
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    return _jpeg_finish_planes(planes, comps, hmax, vmax, h, w, prec)


def _jpeg_finish_planes(planes, comps, hmax, vmax, h, w, prec=8) -> np.ndarray:
    """Upsample to full resolution, crop to (h, w), level-shift and
    color-convert — shared by the sequential and progressive paths.
    8-bit frames return uint8; 12-bit frames return uint16 with values
    in [0, 4095] (callers scale down when they need display range)."""
    half = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w] + half)
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, maxv).astype(dtype)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(out_planes) != 3:
        raise ImageFormatError(f"{len(out_planes)}-component JPEG not supported")
    y, cb, cr = out_planes
    return _jpeg_ycc_to_rgb(y, cb, cr, prec)


# --- progressive JPEG (SOF2), T.81 Annex G entropy coding ------------------


def _jpeg_decode_scan_progressive(
    data, pos, frame, scan, band, huff, restart_interval, store
):
    """Decode ONE progressive scan into the coefficient ``store``
    (natural-order int64 per block); returns the stream position of the
    next marker.  Handles all four scan kinds: DC first / DC refinement
    (interleaved or single-component) and AC first / AC refinement
    (single-component, own-dimension block raster), with EOB runs and
    restart markers."""
    Ss, Se, Ah, Al = band
    h, w, comps, _prec = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    reader = _JpegBitReader(data, pos)
    state = {"eobrun": 0, "pred": {cid: 0 for cid, _, _ in scan}}
    n_rst = 0
    n_units = 0

    def maybe_restart():
        nonlocal n_rst, n_units
        if restart_interval and n_units and n_units % restart_interval == 0:
            reader.align_and_expect_rst(n_rst)
            n_rst += 1
            state["eobrun"] = 0
            state["pred"] = {cid: 0 for cid, _, _ in scan}
        n_units += 1

    if Ss == 0:  # DC scan (Se must be 0; interleaved over scan comps)
        if Se != 0:
            raise ImageFormatError("JPEG DC scan with nonzero Se")
        if len(scan) > 1:
            # MCU-interleaved order (T.81: interleaved iff ns > 1)
            for m in range(mcus_x * mcus_y):
                maybe_restart()
                my, mx = divmod(m, mcus_x)
                for cid, td, _ta in scan:
                    hs, vs, _tq = by_id[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            blk = store[cid][my * vs + by, mx * hs + bx]
                            _jpeg_dc_pass(reader, huff, td, cid, blk, Ah, Al, state)
        else:
            # single-component non-interleaved DC scan: own block raster
            cid, td, _ta = scan[0]
            hs, vs, _tq = by_id[cid]
            bw = -(-(-(-(w * hs) // hmax)) // 8)
            bh = -(-(-(-(h * vs) // vmax)) // 8)
            for byy in range(bh):
                for bxx in range(bw):
                    maybe_restart()
                    _jpeg_dc_pass(
                        reader, huff, td, cid, store[cid][byy, bxx], Ah, Al, state
                    )
    else:  # AC scan: exactly one component, own-dimension raster
        if len(scan) != 1:
            raise ImageFormatError("JPEG AC progressive scan must be single-component")
        cid, _td, ta = scan[0]
        hs, vs, _tq = by_id[cid]
        ac_tbl = huff.get((1, ta))
        if ac_tbl is None:
            raise ImageFormatError("JPEG missing Huffman table")
        comp_w = -(-w * hs // hmax)
        comp_h = -(-h * vs // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        for byy in range(bh):
            for bxx in range(bw):
                maybe_restart()
                blk = store[cid][byy, bxx]
                if Ah == 0:
                    state["eobrun"] = _jpeg_ac_first(
                        reader, ac_tbl, blk, Ss, Se, Al, state["eobrun"]
                    )
                else:
                    state["eobrun"] = _jpeg_ac_refine(
                        reader, ac_tbl, blk, Ss, Se, Al, state["eobrun"]
                    )
    # advance to the next marker (discard padding bits and 0xFF fill)
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF)
    ):
        p += 1
    return p


def _jpeg_dc_pass(reader, huff, td, cid, blk, Ah, Al, state):
    if Ah == 0:  # first pass: Huffman-coded diffs, point-transformed
        dc_tbl = huff.get((0, td))
        if dc_tbl is None:
            raise ImageFormatError("JPEG missing Huffman table")
        s = reader.decode_symbol(dc_tbl)
        diff = _jpeg_extend(reader.read_bits(s), s) if s else 0
        state["pred"][cid] += diff
        blk[0] = state["pred"][cid] << Al
    else:  # refinement: one raw bit appends to the magnitude
        if reader.read_bit():
            blk[0] |= 1 << Al


def _jpeg_ac_first(reader, ac_tbl, blk, Ss, Se, Al, eobrun):
    """T.81 G.1.2.2: first AC pass of a band — baseline AC coding plus
    EOB runs; values arrive point-transformed (<< Al)."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > Se:
            raise ImageFormatError("JPEG AC run overflows band")
        blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.read_bits(s), s) << Al
        k += 1
    return eobrun


def _jpeg_ac_refine(reader, ac_tbl, blk, Ss, Se, Al, eobrun):
    """T.81 G.1.2.3: AC refinement pass — newly-significant coefficients
    arrive as (run, 1) symbols with a sign bit; every already-nonzero
    coefficient passed over consumes one correction bit."""
    p1 = 1 << Al
    m1 = -1 << Al

    def correct(z):
        v = int(blk[z])
        if reader.read_bit() and (v & p1) == 0:
            blk[z] = v + (p1 if v >= 0 else m1)

    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ImageFormatError("JPEG AC refinement size != 1")
                newval = p1 if reader.read_bit() else m1
            while k <= Se:
                z = _JPEG_ZIGZAG[k]
                if blk[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= Se:
                blk[_JPEG_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            z = _JPEG_ZIGZAG[k]
            if blk[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_reconstruct(frame, qt, store) -> np.ndarray:
    """Dequantize + batched IDCT of the accumulated coefficient store,
    then the shared upsample/crop/color tail."""
    h, w, comps, prec = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ImageFormatError(f"JPEG missing quant table {tq}")
        arr = store[cid]
        rows, cols, _ = arr.shape
        deq = (arr * qt[tq][None, None, :]).astype(np.float64).reshape(
            rows, cols, 8, 8
        )
        rec = np.einsum("ij,rcjk,kl->rcil", _JPEG_T.T, deq, _JPEG_T)
        planes[cid] = rec.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
    return _jpeg_finish_planes(planes, comps, hmax, vmax, h, w, prec)


def _jpeg_ycc_to_rgb(y, cb, cr, prec=8) -> np.ndarray:
    """BT.601 full-range YCbCr -> uint8 (or uint16 for 12-bit) RGB
    (T.871 constants, chroma centered at 2^(prec-1))."""
    half = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxv).astype(dtype)


def _jpeg_rgb_to_ycc(img: np.ndarray, prec=8):
    """BT.601 full-range RGB -> float YCbCr planes (not yet rounded),
    chroma centered at 2^(prec-1)."""
    half = float(1 << (prec - 1))
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = half - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = half + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _jpeg_scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K base table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _jpeg_quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero quantization (deterministic, mirrored
    by the oracle's expected-value computation)."""
    x = coef / q
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary
        return bytes(self.out)


def _jpeg_encode_block(writer, coef_q, pred, enc_dc, enc_ac):
    """Zigzag + Huffman-encode one quantized natural-order 8x8 block;
    returns the new DC predictor."""
    zz = coef_q.reshape(64)[_JPEG_ZIGZAG]
    diff = int(zz[0]) - pred
    mag = abs(diff)
    s = int(mag).bit_length()
    code, length = enc_dc[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = enc_ac[0x00]  # EOB
                writer.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = enc_ac[0xF0]  # ZRL
                writer.write(code, length)
                run = 0
            continue
        mag = abs(v)
        s = mag.bit_length()
        code, length = enc_ac[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    progressive: bool = False,
    bit_depth: int = 8,
) -> bytes:
    """Baseline sequential — or, with ``progressive=True``, progressive
    (SOF2) — JPEG writer (fixture generator): Annex K standard Huffman
    tables, libjpeg-style quality-scaled Annex K quant tables, 4:4:4 or
    4:2:0 (box-mean chroma downsample), no restart markers.  HxWx3
    uint8 in.  The progressive scan script mirrors libjpeg's default
    shape (DC first+refine with successive approximation, split AC
    bands, AC refinement per component); EOB runs are capped at 1 so
    the Annex K alphabet suffices (no EOBn symbols)."""
    h, w, _ = img.shape
    if bit_depth not in (8, 12):
        raise ValueError("bit_depth must be 8 or 12")
    half = float(1 << (bit_depth - 1))
    if bit_depth == 12 and int(img.max()) >= 4096:
        raise ValueError("12-bit JPEG input must be < 4096")
    if subsampling == "4:4:4":
        samp = [(1, 1), (1, 1), (1, 1)]
    elif subsampling == "4:2:0":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    qly = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    qlc = _jpeg_scaled_qt(_JPEG_QT_CHROMA, quality)
    y, cb, cr = _jpeg_rgb_to_ycc(img, bit_depth)
    planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if subsampling == "4:2:0":
        # pad to even, box-mean 2x2
        for i in (1, 2):
            p = planes[i]
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            planes[i] = 0.25 * (
                pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]
            )
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    blocks = []  # per component: 2D array padded to MCU grid
    for (hs, vs), p in zip(samp, planes):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        blocks.append(p - half)
    qts = [qly, qlc, qlc]
    if bit_depth == 12:
        spec_dc_l = spec_dc_c = _JPEG12_HUFF_DC
        spec_ac_l = spec_ac_c = _JPEG12_HUFF_AC
    else:
        spec_dc_l, spec_ac_l = _JPEG_HUFF_DC_LUMA, _JPEG_HUFF_AC_LUMA
        spec_dc_c, spec_ac_c = _JPEG_HUFF_DC_CHROMA, _JPEG_HUFF_AC_CHROMA
    dec_dc_l, enc_dc_l = _jpeg_canonical_codes(*spec_dc_l)
    dec_ac_l, enc_ac_l = _jpeg_canonical_codes(*spec_ac_l)
    dec_dc_c, enc_dc_c = _jpeg_canonical_codes(*spec_dc_c)
    dec_ac_c, enc_ac_c = _jpeg_canonical_codes(*spec_ac_c)
    enc_dc = [enc_dc_l, enc_dc_c, enc_dc_c]
    enc_ac = [enc_ac_l, enc_ac_c, enc_ac_c]
    if progressive:
        body = _jpeg_encode_progressive_scans(
            blocks, samp, qts, mcus_x, mcus_y, h, w, hmax, vmax, enc_dc, enc_ac
        )
    else:
        writer = _JpegBitWriter()
        pred = [0, 0, 0]
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci in range(3):
                hs, vs = samp[ci]
                q = qts[ci].reshape(8, 8)
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = blocks[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _JPEG_T @ blk @ _JPEG_T.T
                        cq = _jpeg_quantize(coef, q)
                        pred[ci] = _jpeg_encode_block(
                            writer, cq, pred[ci], enc_dc[ci], enc_ac[ci]
                        )
        payload = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, nat: np.ndarray) -> bytes:
        if bit_depth == 12:  # Pq=1: 16-bit big-endian entries
            return seg(
                0xDB,
                bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(nat[z])) for z in _JPEG_ZIGZAG),
            )
        return seg(0xDB, bytes([tid]) + bytes(int(nat[z]) for z in _JPEG_ZIGZAG))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    sof = seg(
        0xC2 if progressive else (0xC1 if bit_depth == 12 else 0xC0),
        struct.pack(">BHHB", bit_depth, h, w, 3)
        + b"".join(
            struct.pack(
                ">BBB", cid, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1
            )
            for i, cid in enumerate((1, 2, 3))
        ),
    )
    head = (
        b"\xff\xd8"
        + dqt(0, qly)
        + dqt(1, qlc)
        + sof
        + dht(0, 0, spec_dc_l)
        + dht(1, 0, spec_ac_l)
        + dht(0, 1, spec_dc_c)
        + dht(1, 1, spec_ac_c)
    )
    if progressive:
        scans = b""
        for scan_comps, Ss, Se, Ah, Al, payload in body:
            sos = seg(
                0xDA,
                bytes([len(scan_comps)])
                + b"".join(
                    struct.pack(">BB", ci + 1, (0 if ci == 0 else 1) * 0x11)
                    for ci in scan_comps
                )
                + bytes([Ss, Se, (Ah << 4) | Al]),
            )
            scans += sos + payload
        return head + scans + b"\xff\xd9"
    sos = seg(
        0xDA,
        bytes([3])
        + b"".join(
            struct.pack(">BB", cid, (0 if i == 0 else 1) * 0x11)
            for i, cid in enumerate((1, 2, 3))
        )
        + bytes([0, 63, 0]),
    )
    return head + sos + payload + b"\xff\xd9"


def jpeg_reference_pipeline(
    img: np.ndarray, quality: int = 75, bit_depth: int = 8
) -> np.ndarray:
    """Bitstream-free reference for what baseline 4:4:4 JPEG at
    ``quality`` reconstructs: per 8x8 block, the same DCT -> quantize ->
    dequantize -> IDCT -> color-convert float ops the codec pair uses,
    with NO marker parsing, NO Huffman coding, NO bit I/O.  Oracle for
    the round-trip tests and the driver query: agreement proves the
    entire entropy-coding layer is transparent (coefficients survive
    encode->decode bit-exactly).  ``bit_depth=12`` mirrors the
    extended-sequential (SOF1, Pq=1) path with 2048-centered planes."""
    h, w, _ = img.shape
    half = float(1 << (bit_depth - 1))
    qly = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    qlc = _jpeg_scaled_qt(_JPEG_QT_CHROMA, quality)
    y, cb, cr = _jpeg_rgb_to_ycc(img, bit_depth)
    outs = []
    for p, qt in ((y, qly), (cb, qlc), (cr, qlc)):
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - half
        rec = np.zeros_like(p)
        q = qt.reshape(8, 8)
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                blk = p[y0 : y0 + 8, x0 : x0 + 8]
                coef = _JPEG_T @ blk @ _JPEG_T.T
                cq = _jpeg_quantize(coef, q)
                rec[y0 : y0 + 8, x0 : x0 + 8] = _jpeg_idct_block(
                    (cq * q.reshape(8, 8).astype(np.int64))
                )
        outs.append(rec[:h, :w] + half)
    return _jpeg_ycc_to_rgb(*outs, prec=bit_depth)


# --- GIF (87a/89a, LZW) ----------------------------------------------------
#
# The last non-entropy-DCT format behind the PIL seam (reference decode:
# ``process_test_train_Images.py:45`` via PIL, which reads GIF natively).
# GIF is a palette format with LZW-compressed index streams — fully
# decodable with stdlib-only bit twiddling: variable-width LSB-first
# codes (start ``min_code_size+1`` bits, grow to 12), clear/end control
# codes, 4096-entry dictionary with deferred-clear tolerance, optional
# Adam-style 4-pass interlacing, and frame placement onto the logical
# screen.  ``encode_gif`` is the fixture generator (real compressing
# LZW, not the uncompressed-GIF trick, so round-trip tests exercise
# dictionary growth and width changes).  First frame only — the
# pipeline contract is one HxWx3 uint8 per document.

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """LZW-decode a GIF index stream (sub-blocks already concatenated)
    -> uint8 palette-index array of length ``n_pixels``."""
    if not 2 <= min_code_size <= 11:
        raise ImageFormatError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ImageFormatError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ImageFormatError("GIF LZW code out of range after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ImageFormatError("GIF LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ImageFormatError("GIF pixel data truncated")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real compressing GIF LZW encoder (fixture generator), the exact
    inverse discipline of ``_gif_lzw_decode``: width grows when the next
    free code reaches ``1 << code_size``; at 4096 entries the dictionary
    freezes (deferred clear), which every conformant decoder accepts."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    buf = b""
    for b in indices:
        nb = buf + bytes([b])
        if nb in table:
            buf = nb
            continue
        emit(table[buf])
        if next_code < 4096:
            table[nb] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        buf = nb[-1:]
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a -> HxWx3 uint8 on the
    logical screen (background-filled when the frame is smaller).
    Extensions (graphic control, comments, application) are skipped;
    transparency is ignored — PIL ``convert("RGB")`` semantics, the
    pipeline contract of ``images.decode_images``."""
    if content[:6] not in _GIF_MAGICS:
        raise ImageFormatError("not a GIF (bad magic)")
    if len(content) < 13:
        raise ImageFormatError("GIF header truncated")
    sw, sh, packed, bg_idx = struct.unpack("<HHBB", content[6:12])
    if sw == 0 or sh == 0:
        raise ImageFormatError("zero-dimension GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(content):
            raise ImageFormatError("GIF global color table truncated")
        gct = np.frombuffer(content, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ImageFormatError(f"unknown GIF block 0x{block:02x}")
        if pos + 10 > len(content):
            raise ImageFormatError("GIF image descriptor truncated")
        fx, fy, fw, fh, ipacked = struct.unpack("<HHHHB", content[pos + 1 : pos + 10])
        pos += 10
        if fw == 0 or fh == 0 or fx + fw > sw or fy + fh > sh:
            raise ImageFormatError("GIF frame outside logical screen")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(content):
                raise ImageFormatError("GIF local color table truncated")
            pal = np.frombuffer(content, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ImageFormatError("GIF frame has no color table")
        if pos >= len(content):
            raise ImageFormatError("GIF LZW header truncated")
        min_code_size = content[pos]
        pos += 1
        chunks = bytearray()
        while True:
            if pos >= len(content):
                raise ImageFormatError("GIF data sub-blocks truncated")
            ln = content[pos]
            pos += 1
            if ln == 0:
                break
            chunks.extend(content[pos : pos + ln])
            if len(chunks) < ln:
                raise ImageFormatError("GIF data sub-blocks truncated")
            pos += ln
        idx = _gif_lzw_decode(bytes(chunks), min_code_size, fw * fh)
        if int(idx.max(initial=0)) >= len(pal):
            raise ImageFormatError("GIF palette index out of range")
        frame = idx.reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, fh, step) for start, step in _GIF_INTERLACE_PASSES]
            )
            deinter = np.empty_like(frame)
            deinter[order] = frame
            frame = deinter
        rgb = pal[frame]
        if fx == 0 and fy == 0 and fw == sw and fh == sh:
            return rgb.copy()
        bg = pal[bg_idx] if (gct is not None and bg_idx < len(gct)) else np.zeros(3, np.uint8)
        canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
        canvas[fy : fy + fh, fx : fx + fw] = rgb
        return canvas
    raise ImageFormatError("GIF contains no image data")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal single-frame GIF89a writer (fixture generator): builds
    the palette from the image's distinct colors (<= 256 required),
    real compressing LZW."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ImageFormatError(f"GIF encoder needs <=256 distinct colors, got {len(pal)}")
    depth = max(1, int(len(pal) - 1).bit_length())
    n = 1 << depth
    pal_padded = np.zeros((n, 3), dtype=np.uint8)
    pal_padded[: len(pal)] = pal
    indices = inverse.astype(np.uint8)
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _GIF_INTERLACE_PASSES]
        )
        indices = indices.reshape(h, w)[order].reshape(-1)
    min_code_size = max(2, depth)
    lzw = _gif_lzw_encode(indices.tobytes(), min_code_size)
    sub = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        sub.append(len(chunk))
        sub.extend(chunk)
    sub.append(0)
    header = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    return (
        header
        + pal_padded.tobytes()
        + desc
        + bytes([min_code_size])
        + bytes(sub)
        + b"\x3b"
    )


# --- progressive JPEG encoder (fixture generator) --------------------------


def _jpeg_enc_dc_first(writer, blocks_zz, order, ci_of, enc_dc, Al, pred):
    for ci, by, bx in order:
        v = int(blocks_zz[ci][by, bx, 0]) >> Al  # arithmetic point transform
        diff = v - pred[ci]
        pred[ci] = v
        s = abs(diff).bit_length()
        code, length = enc_dc[ci][s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _jpeg_enc_dc_refine(writer, blocks_zz, order, Al):
    for ci, by, bx in order:
        writer.write((int(blocks_zz[ci][by, bx, 0]) >> Al) & 1, 1)


def _jpeg_enc_ac_first_block(writer, zz, Ss, Se, Al, enc_ac):
    """One block of a first AC scan: plain EOB per block (run length 1
    keeps us inside the Annex K symbol alphabet, which has no EOBn
    codes; spec-legal, just less compact than libjpeg)."""
    tv = []
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        m = abs(v) >> Al
        tv.append(m if v >= 0 else -m)
    if not any(tv):
        code, length = enc_ac[0x00]
        writer.write(code, length)
        return
    last_nz = max(i for i, v in enumerate(tv) if v)
    r = 0
    for i, v in enumerate(tv):
        if i > last_nz:
            code, length = enc_ac[0x00]  # EOB covers the zero tail
            writer.write(code, length)
            break
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, length = enc_ac[0xF0]
            writer.write(code, length)
            r -= 16
        s = abs(v).bit_length()
        code, length = enc_ac[(r << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    else:
        if r > 0:
            code, length = enc_ac[0x00]
            writer.write(code, length)


def _jpeg_enc_ac_refine_block(writer, zz, Ss, Se, Al, enc_ac):
    """One block of an AC refinement scan, emitted by SIMULATING the
    decoder's traversal (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients are placed exactly where
    :func:`_jpeg_ac_refine` reads them — after the Huffman symbol (and
    sign) whose advance passes over them."""
    tv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    signs = [int(zz[k]) > 0 for k in range(Ss, Se + 1)]
    n = len(tv)
    k = 0
    while True:
        events = []  # ('z', None) zero-history | ('c', bit) correction
        j = None
        kk = k
        while kk < n:
            t = tv[kk]
            if t == 1:
                j = kk
                break
            events.append(("z", None) if t == 0 else ("c", t & 1))
            kk += 1
        if j is None:
            if events:
                code, length = enc_ac[0x00]  # EOB(run 1) covers the tail
                writer.write(code, length)
                for kind, bit in events:
                    if kind == "c":
                        writer.write(bit, 1)
            break
        zcount = sum(1 for kind, _ in events if kind == "z")
        ei = 0
        while zcount > 15:
            code, length = enc_ac[0xF0]  # ZRL: 16 zero-history positions
            writer.write(code, length)
            consumed = 0
            while consumed < 16:
                kind, bit = events[ei]
                ei += 1
                if kind == "z":
                    consumed += 1
                else:
                    writer.write(bit, 1)
            zcount -= 16
        code, length = enc_ac[(zcount << 4) | 1]
        writer.write(code, length)
        writer.write(1 if signs[j] else 0, 1)
        for kind, bit in events[ei:]:
            if kind == "c":
                writer.write(bit, 1)
        k = j + 1
        if k >= n:
            break


#: progressive scan script: DC first (Al=1) -> DC refinement, split AC
#: first passes at Al=1, then AC refinement per component (libjpeg
#: default shape, EOB runs capped at 1)
_JPEG_PROG_SCRIPT = [
    ("dc_first", [0, 1, 2], 0, 0, 0, 1),
    ("dc_refine", [0, 1, 2], 0, 0, 1, 0),
    ("ac_first", [0], 1, 5, 0, 1),
    ("ac_first", [1], 1, 63, 0, 1),
    ("ac_first", [2], 1, 63, 0, 1),
    ("ac_first", [0], 6, 63, 0, 1),
    ("ac_refine", [0], 1, 63, 1, 0),
    ("ac_refine", [1], 1, 63, 1, 0),
    ("ac_refine", [2], 1, 63, 1, 0),
]


def _jpeg_encode_progressive_scans(
    blocks, samp, qts, mcus_x, mcus_y, h, w, hmax, vmax, enc_dc, enc_ac
):
    """Quantize every block once, then emit the scan script; returns
    [(scan_comps, Ss, Se, Ah, Al, payload)]."""
    coefs = []
    for ci in range(3):
        hs, vs = samp[ci]
        q = qts[ci].reshape(8, 8)
        rows, cols = mcus_y * vs, mcus_x * hs
        arr = np.zeros((rows, cols, 64), dtype=np.int64)
        for by in range(rows):
            for bx in range(cols):
                blk = blocks[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                cq = _jpeg_quantize(_JPEG_T @ blk @ _JPEG_T.T, q)
                arr[by, bx] = cq.reshape(64)[_JPEG_ZIGZAG]
        coefs.append(arr)
    mcu_order = []
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci in range(3):
            hs, vs = samp[ci]
            for by in range(vs):
                for bx in range(hs):
                    mcu_order.append((ci, my * vs + by, mx * hs + bx))

    def own_blocks(ci):
        hs, vs = samp[ci]
        bw = -(-(-(-(w * hs) // hmax)) // 8)
        bh = -(-(-(-(h * vs) // vmax)) // 8)
        return [(by, bx) for by in range(bh) for bx in range(bw)]

    out = []
    for kind, scan_comps, Ss, Se, Ah, Al in _JPEG_PROG_SCRIPT:
        wtr = _JpegBitWriter()
        if kind == "dc_first":
            pred = {ci: 0 for ci in scan_comps}
            _jpeg_enc_dc_first(wtr, coefs, mcu_order, None, enc_dc, Al, pred)
        elif kind == "dc_refine":
            _jpeg_enc_dc_refine(wtr, coefs, mcu_order, Al)
        else:
            ci = scan_comps[0]
            for by, bx in own_blocks(ci):
                zz = coefs[ci][by, bx]
                if kind == "ac_first":
                    _jpeg_enc_ac_first_block(wtr, zz, Ss, Se, Al, enc_ac[ci])
                else:
                    _jpeg_enc_ac_refine_block(wtr, zz, Ss, Se, Al, enc_ac[ci])
        out.append((scan_comps, Ss, Se, Ah, Al, wtr.flush()))
    return out


# --- arithmetic-coded JPEG (SOF9), T.81 Annex D QM-coder ------------------
#
# The LAST JPEG entropy modes: sequential (SOF9) AND progressive
# (SOF10) DCT with the adaptive binary QM arithmetic coder (T.81 Annex
# D) and the DC/AC statistical models of Annexes F and G.  Validated externally: tests encode reference bitstreams with
# the SYSTEM libjpeg-turbo (tools/libjpeg_ref.py, ctypes, nothing
# installed) and require bit-identical coefficients -- an encoder/decoder
# pair written together would be self-consistent even with a wrong
# probability model, so the independent bitstream is the ground truth.
# Every JPEG entropy mode now decodes; hierarchical/lossless remain out.

#: T.81 Table D.3 -- Qe values and probability-estimation state machine:
#: (Qe, next-MPS state, next-LPS state, MPS-switch).  State 113 is the
#: non-adapting 0.5-probability bin used for AC sign decisions.
#: (Cross-checked against the system libjpeg's jpeg_aritab in tests.)
_QM_TABLE = [
    (0x5a1d, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080b, 4, 18, 0), (0x03d8, 5, 20, 0), (0x01da, 6, 23, 0),
    (0x00e5, 7, 25, 0), (0x006f, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001a, 10, 33, 0), (0x000d, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5a7f, 15, 15, 1),
    (0x3f25, 16, 36, 0), (0x2cf2, 17, 38, 0), (0x207c, 18, 39, 0),
    (0x17b9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0cef, 21, 43, 0),
    (0x09a1, 22, 45, 0), (0x072f, 23, 46, 0), (0x055c, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01b1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00f5, 30, 57, 0),
    (0x00b7, 31, 59, 0), (0x008a, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004e, 34, 63, 0), (0x003b, 35, 32, 0), (0x002c, 9, 33, 0),
    (0x5ae1, 37, 37, 1), (0x484c, 38, 64, 0), (0x3a0d, 39, 65, 0),
    (0x2ef1, 40, 67, 0), (0x261f, 41, 68, 0), (0x1f33, 42, 69, 0),
    (0x19a8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0e74, 46, 74, 0), (0x0bfb, 47, 75, 0), (0x09f8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05cd, 51, 48, 0),
    (0x04de, 52, 50, 0), (0x040f, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02d4, 55, 52, 0), (0x025c, 56, 53, 0), (0x01f8, 57, 54, 0),
    (0x01a4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00f6, 61, 58, 0), (0x00cb, 62, 59, 0), (0x00ab, 63, 61, 0),
    (0x008f, 32, 61, 0), (0x5b12, 65, 65, 1), (0x4d04, 66, 80, 0),
    (0x412c, 67, 81, 0), (0x37d8, 68, 82, 0), (0x2fe8, 69, 83, 0),
    (0x293c, 70, 84, 0), (0x2379, 71, 86, 0), (0x1edf, 72, 87, 0),
    (0x1aa9, 73, 87, 0), (0x174e, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119c, 76, 74, 0), (0x0f6b, 77, 74, 0), (0x0d51, 78, 75, 0),
    (0x0bb6, 79, 77, 0), (0x0a40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4d1c, 82, 88, 0), (0x438e, 83, 89, 0), (0x3bdd, 84, 90, 0),
    (0x34ee, 85, 91, 0), (0x2eae, 86, 92, 0), (0x299a, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4ca9, 90, 95, 0),
    (0x44d9, 91, 96, 0), (0x3e22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32b4, 94, 99, 0), (0x2e17, 86, 93, 0), (0x56a8, 96, 95, 1),
    (0x4f46, 97, 101, 0), (0x47e5, 98, 102, 0), (0x41cf, 99, 103, 0),
    (0x3c3d, 100, 104, 0), (0x375e, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4c0f, 103, 106, 0), (0x4639, 104, 107, 0), (0x415e, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50e7, 107, 108, 0), (0x4b85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504f, 107, 111, 0), (0x5a10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59eb, 111, 112, 1), (0x5a1d, 113, 113, 0),
]


class _ArithDecoder:
    """T.81 Annex D QM decoder in the renorm-first register convention
    (reconstructed from the behavior of conformant decoders): ``c``
    accumulates RAW entropy bytes (0xFF00 byte-stuffing removed), ``ct``
    counts pending bits, and each decision compares ``c`` against
    ``(a - qe) << ct``.  Renormalization runs lazily at the START of the
    next decision; hitting any marker (or end of data) switches to
    zero-byte feeding, per the arithmetic-coding convention."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.end = len(data)
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # force reading 2 initial bytes
        self.marker = 0  # unread marker code (0 = none)

    def _fetch(self) -> int:
        if self.marker:
            return 0
        d, e = self.data, self.end
        p = self.pos
        if p >= e:
            self.marker = 0xD9
            return 0
        b = d[p]
        p += 1
        if b == 0xFF:
            while p < e and d[p] == 0xFF:
                p += 1
            if p >= e:
                self.marker = 0xD9
                self.pos = p
                return 0
            b2 = d[p]
            p += 1
            self.pos = p
            if b2 == 0:
                return 0xFF  # stuffed zero byte: data byte 0xFF
            self.marker = b2
            return 0
        self.pos = p
        return b

    def decode(self, area: bytearray, i: int) -> int:
        a = self.a
        ct = self.ct
        if a < 0x8000:
            while True:
                ct -= 1
                if ct >= 0:
                    a <<= 1
                    if a >= 0x8000:
                        break
                    continue
                self.c = (self.c << 8) | self._fetch()
                ct += 8
                if ct >= 0:
                    a <<= 1
                    if a >= 0x8000:
                        break
                    continue
                ct += 1
                if ct != 0:
                    a <<= 1
                    if a >= 0x8000:
                        break
                    continue
                a = 0x10000  # got both initial bytes
                break
        sv = area[i]
        qe, nmps, nlps, sw = _QM_TABLE[sv & 0x7F]
        nl_x = nlps | (sw << 7)
        a -= qe
        temp = a << ct
        self.ct = ct
        if self.c >= temp:
            # code point in the upper subinterval
            self.c -= temp
            self.a = qe
            if qe <= a:  # normal LPS
                area[i] = (sv & 0x80) ^ nl_x
                return 1 - (sv >> 7)
            area[i] = (sv & 0x80) ^ nmps  # conditional exchange: MPS
            return sv >> 7
        self.a = a
        if a >= 0x8000:
            return sv >> 7  # plain MPS, no estimation update
        if qe <= a:
            area[i] = (sv & 0x80) ^ nmps
            return sv >> 7
        area[i] = (sv & 0x80) ^ nl_x  # conditional exchange: LPS
        return 1 - (sv >> 7)


def _arith_magnitude(dec, area, m: int, st: int) -> int:
    """Shared Sz reconstruction (Figures F.23/F.24): exponent chain from
    ``st`` doubles ``m``; the mantissa bits live 14 states later."""
    while dec.decode(area, st):
        m <<= 1
        if m > 0x8000:
            raise ImageFormatError("arithmetic JPEG magnitude overflow")
        st += 1
    v = m
    st += 14
    m >>= 1
    while m:
        if dec.decode(area, st):
            v |= m
        m >>= 1
    return v


def _jpeg_decode_scan_arith(data, pos, frame, scan, qt, restart_interval, cond):
    """Sequential arithmetic scan (T.81 F.2.4): same MCU walk as the
    Huffman path, QM-decoded coefficients.  ``cond``: DAC conditioning
    {(0, tbl): (L, U), (1, tbl): Kx}."""
    h, w, comps, prec = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ImageFormatError(f"JPEG missing quant table {tq}")
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)

    def fresh_state():
        return (
            {td: bytearray(64) for _, td, _ in scan},
            {ta: bytearray(256) for _, _, ta in scan},
            bytearray([113]),
            {cid: {"pred": 0, "ctx": 0} for cid, _, _ in scan},
        )

    dc_stats, ac_stats, fixed_bin, dcs = fresh_state()
    dec = _ArithDecoder(data, pos)
    n_rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            # align to the RSTn marker, then full re-init (F.2.4.3).
            # The decoder may already have consumed the marker bytes
            # (lazy feeding), so search from just before its position.
            p = max(pos, dec.pos - 2)
            while p + 1 < len(data) and not (
                data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
            ):
                p += 1
            if p + 1 >= len(data) or data[p + 1] != 0xD0 + (n_rst & 7):
                raise ImageFormatError("JPEG restart marker mismatch")
            n_rst += 1
            dc_stats, ac_stats, fixed_bin, dcs = fresh_state()
            dec = _ArithDecoder(data, p + 2)
        my, mx = divmod(m, mcus_x)
        for cid, td, ta in scan:
            hs, vs, tq = by_id[cid]
            dc_area = dc_stats[td]
            ac_area = ac_stats[ta]
            dc_l, dc_u = cond.get((0, td), (0, 1))
            ac_kx = cond.get((1, ta), 5)
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64, dtype=np.int64)
                    st8 = dcs[cid]
                    s0 = st8["ctx"]
                    if dec.decode(dc_area, s0) == 0:
                        st8["ctx"] = 0
                    else:
                        sign = dec.decode(dc_area, s0 + 1)
                        m_ = dec.decode(dc_area, s0 + 2 + sign)
                        if m_:
                            v = _arith_magnitude(dec, dc_area, 1, 20)
                            mbase = 1
                            while mbase <= v and mbase << 1 <= v:
                                mbase <<= 1
                        else:
                            v = 0
                            mbase = 0
                        if mbase < (1 << dc_l) >> 1:
                            st8["ctx"] = 0
                        elif mbase > (1 << dc_u) >> 1:
                            st8["ctx"] = 12 + (sign << 2)
                        else:
                            st8["ctx"] = 4 + (sign << 2)
                        v += 1
                        st8["pred"] += -v if sign else v
                    coef[0] = st8["pred"]
                    k = 1
                    while k <= 63:
                        st = 3 * (k - 1)
                        if dec.decode(ac_area, st):
                            break  # EOB
                        while dec.decode(ac_area, st + 1) == 0:
                            st += 3
                            k += 1
                            if k > 63:
                                raise ImageFormatError("arith AC run overflow")
                        sign = dec.decode(fixed_bin, 0)
                        st += 2
                        if dec.decode(ac_area, st):
                            if dec.decode(ac_area, st):
                                base = 189 if k <= ac_kx else 217
                                v = _arith_magnitude(dec, ac_area, 2, base)
                            else:
                                v = 1
                        else:
                            v = 0
                        v += 1
                        coef[_JPEG_ZIGZAG[k]] = -v if sign else v
                        k += 1
                    block = _jpeg_idct_block((coef * qt[tq]).reshape(8, 8))
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    return _jpeg_finish_planes(planes, comps, hmax, vmax, h, w, prec)


def _jpeg_decode_scan_arith_progressive(
    data, pos, frame, scan, band, restart_interval, cond, store
):
    """Progressive arithmetic scan (T.81 Annex G + Annex D): DC
    first/refine and AC first/refine with the Annex F conditioning
    model.  Statistics start fresh per scan; returns the position of
    the next marker."""
    Ss, Se, Ah, Al = band
    h, w, comps, _prec = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def fresh():
        return (
            {td: bytearray(64) for _, td, _ in scan},
            {ta: bytearray(256) for _, _, ta in scan},
            bytearray([113]),
            {cid: {"pred": 0, "ctx": 0} for cid, _, _ in scan},
        )

    dc_stats, ac_stats, fixed_bin, dcs = fresh()
    dec = _ArithDecoder(data, pos)
    rst = {"n": 0, "units": 0}

    def maybe_restart():
        nonlocal dc_stats, ac_stats, fixed_bin, dcs, dec
        if restart_interval and rst["units"] and rst["units"] % restart_interval == 0:
            p = max(pos, dec.pos - 2)
            while p + 1 < len(data) and not (
                data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
            ):
                p += 1
            if p + 1 >= len(data) or data[p + 1] != 0xD0 + (rst["n"] & 7):
                raise ImageFormatError("JPEG restart marker mismatch")
            rst["n"] += 1
            dc_stats, ac_stats, fixed_bin, dcs = fresh()
            dec = _ArithDecoder(data, p + 2)
        rst["units"] += 1

    def dc_first(cid, td, blk):
        dc_area = dc_stats[td]
        dc_l, dc_u = cond.get((0, td), (0, 1))
        st8 = dcs[cid]
        s0 = st8["ctx"]
        if dec.decode(dc_area, s0) == 0:
            st8["ctx"] = 0
        else:
            sign = dec.decode(dc_area, s0 + 1)
            m_ = dec.decode(dc_area, s0 + 2 + sign)
            if m_:
                v = _arith_magnitude(dec, dc_area, 1, 20)
                mbase = 1
                while mbase << 1 <= v:
                    mbase <<= 1
            else:
                v = 0
                mbase = 0
            if mbase < (1 << dc_l) >> 1:
                st8["ctx"] = 0
            elif mbase > (1 << dc_u) >> 1:
                st8["ctx"] = 12 + (sign << 2)
            else:
                st8["ctx"] = 4 + (sign << 2)
            v += 1
            st8["pred"] += -v if sign else v
        blk[0] = st8["pred"] << Al

    def ac_first(ta, blk):
        ac_area = ac_stats[ta]
        ac_kx = cond.get((1, ta), 5)
        k = Ss
        while k <= Se:
            st = 3 * (k - 1)
            if dec.decode(ac_area, st):
                return  # EOB
            while dec.decode(ac_area, st + 1) == 0:
                st += 3
                k += 1
                if k > Se:
                    raise ImageFormatError("arith AC run overflow")
            sign = dec.decode(fixed_bin, 0)
            st += 2
            if dec.decode(ac_area, st):
                if dec.decode(ac_area, st):
                    base = 189 if k <= ac_kx else 217
                    v = _arith_magnitude(dec, ac_area, 2, base)
                else:
                    v = 1
            else:
                v = 0
            v += 1
            v <<= Al
            blk[_JPEG_ZIGZAG[k]] = -v if sign else v
            k += 1

    def ac_refine(ta, blk):
        ac_area = ac_stats[ta]
        p1 = 1 << Al
        m1 = -p1
        kex = Se
        while kex >= Ss and blk[_JPEG_ZIGZAG[kex]] == 0:
            kex -= 1
        k = Ss
        while k <= Se:
            st = 3 * (k - 1)
            if k > kex:
                if dec.decode(ac_area, st):
                    return  # EOB
            while True:
                ci = _JPEG_ZIGZAG[k]
                if blk[ci] != 0:
                    if dec.decode(ac_area, st + 2):
                        blk[ci] += m1 if blk[ci] < 0 else p1
                    break
                if dec.decode(ac_area, st + 1):
                    blk[ci] = m1 if dec.decode(fixed_bin, 0) else p1
                    break
                st += 3
                k += 1
                if k > Se:
                    raise ImageFormatError("arith AC refine overflow")
            k += 1

    if Ss == 0:  # DC scan
        if Se != 0:
            raise ImageFormatError("JPEG DC scan with nonzero Se")
        if len(scan) > 1:
            for m in range(mcus_x * mcus_y):
                maybe_restart()
                my, mx = divmod(m, mcus_x)
                for cid, td, _ta in scan:
                    hs, vs, _tq = by_id[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            blk = store[cid][my * vs + by, mx * hs + bx]
                            if Ah == 0:
                                dc_first(cid, td, blk)
                            elif dec.decode(fixed_bin, 0):
                                blk[0] |= 1 << Al
        else:
            cid, td, _ta = scan[0]
            hs, vs, _tq = by_id[cid]
            bw = -(-(-(-(w * hs) // hmax)) // 8)
            bh = -(-(-(-(h * vs) // vmax)) // 8)
            for byy in range(bh):
                for bxx in range(bw):
                    maybe_restart()
                    blk = store[cid][byy, bxx]
                    if Ah == 0:
                        dc_first(cid, td, blk)
                    elif dec.decode(fixed_bin, 0):
                        blk[0] |= 1 << Al
    else:  # AC scan: single component
        if len(scan) != 1:
            raise ImageFormatError("JPEG AC progressive scan must be single-component")
        cid, _td, ta = scan[0]
        hs, vs, _tq = by_id[cid]
        bw = -(-(-(-(w * hs) // hmax)) // 8)
        bh = -(-(-(-(h * vs) // vmax)) // 8)
        for byy in range(bh):
            for bxx in range(bw):
                maybe_restart()
                blk = store[cid][byy, bxx]
                if Ah == 0:
                    ac_first(ta, blk)
                else:
                    ac_refine(ta, blk)
    # advance to the next marker
    p = max(pos, dec.pos - 2)
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF)
    ):
        p += 1
    return p


# --- ICO container -----------------------------------------------------------

_ICO_MAGIC = b"\x00\x00\x01\x00"


def decode_ico(content: bytes) -> np.ndarray:
    """Decode a Windows ICO container -> RGB of the LARGEST entry (by
    pixel count, first on ties — PIL's size selection).  Entries are
    either embedded PNGs (decoded by :func:`decode_png`) or DIB
    payloads: a BITMAPINFOHEADER whose height covers XOR+AND masks
    (biHeight = 2h), bottom-up rows, 32/24-bit BGR(A) or paletted
    1/4/8-bit with BGRA palette entries; the AND transparency mask is
    ignored (the pipeline contract drops alpha)."""
    if len(content) < 6 or content[:4] != _ICO_MAGIC:
        raise ImageFormatError("not an ICO (bad magic)")
    (count,) = struct.unpack("<H", content[4:6])
    if count == 0:
        raise ImageFormatError("ICO with no entries")
    entries = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(content):
            raise ImageFormatError("ICO directory truncated")
        wb, hb = content[off], content[off + 1]
        size, data_off = struct.unpack("<II", content[off + 8 : off + 16])
        w = wb or 256
        h = hb or 256
        entries.append((w * h, i, w, h, data_off, size))
    _, _, w, h, data_off, size = max(entries, key=lambda e: (e[0], -e[1]))
    payload = content[data_off : data_off + size]
    if len(payload) < size:
        raise ImageFormatError("ICO payload truncated")
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if len(payload) < 40:
        raise ImageFormatError("ICO DIB header truncated")
    (bisize, bw, bh2, planes, bpp, comp) = struct.unpack("<IiiHHI", payload[:20])
    if bisize != 40 or comp != 0:
        raise ImageFormatError("unsupported ICO DIB (need BITMAPINFOHEADER, BI_RGB)")
    if bw != w or bh2 != 2 * h:
        raise ImageFormatError("ICO DIB dims disagree with the directory entry")
    pos = bisize
    if bpp in (1, 4, 8):
        n_pal = 1 << bpp
        pal = np.frombuffer(payload, np.uint8, count=4 * n_pal, offset=pos)
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        pos += 4 * n_pal
        row_bytes = ((w * bpp + 31) // 32) * 4
        rows = []
        for y in range(h):
            raw = np.frombuffer(payload, np.uint8, count=row_bytes, offset=pos + y * row_bytes)
            bits = np.unpackbits(raw)
            idx = (
                bits.reshape(-1, bpp) * (1 << np.arange(bpp - 1, -1, -1))
            ).sum(axis=1)[:w]
            rows.append(pal[idx])
        img = np.stack(rows)
    elif bpp in (24, 32):
        ch = bpp // 8
        row_bytes = ((w * ch + 3) // 4) * 4
        rows = []
        for y in range(h):
            px = np.frombuffer(
                payload, np.uint8, count=w * ch, offset=pos + y * row_bytes
            ).reshape(w, ch)
            rows.append(px[:, :3][:, ::-1])  # BGR(A) -> RGB
        img = np.stack(rows)
    else:
        raise ImageFormatError(f"unsupported ICO bit depth {bpp}")
    return img[::-1].copy()  # bottom-up -> top-down (AND mask ignored)


def encode_ico(images: list[tuple[np.ndarray, str]]) -> bytes:
    """Minimal ICO writer (fixture generator): each entry is
    (HxWx3 uint8, kind) with kind 'png' (embedded PNG) or 'bmp'
    (BITMAPINFOHEADER DIB, 24-bit rows + zeroed AND mask)."""
    payloads = []
    for img, kind in images:
        h, w, _ = img.shape
        if w > 256 or h > 256:
            raise ImageFormatError("ICO entries are at most 256x256")
        if kind == "png":
            payloads.append(encode_png(img))
        else:
            row_bytes = (w * 3 + 3) & ~3
            body = b"".join(
                img[y, :, ::-1].tobytes() + b"\x00" * (row_bytes - w * 3)
                for y in range(h - 1, -1, -1)
            )
            mask_row = ((w + 31) // 32) * 4
            body += b"\x00" * (mask_row * h)  # AND mask: all visible
            hdr = struct.pack(
                "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, len(body), 0, 0, 0, 0
            )
            payloads.append(hdr + body)
    out = bytearray(_ICO_MAGIC + struct.pack("<H", len(images)))
    data_off = 6 + 16 * len(images)
    for (img, _), payload in zip(images, payloads):
        h, w, _ = img.shape
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HHII", 1, 24, len(payload), data_off)
        data_off += len(payload)
    for payload in payloads:
        out += payload
    return bytes(out)
