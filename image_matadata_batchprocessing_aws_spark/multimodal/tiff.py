"""REAL baseline-TIFF codec in pure numpy + stdlib — no PIL.

Extends the codec family (``multimodal/codecs.py``, ``webp.py``) to
TIFF 6.0 baseline: both byte orders (II/MM), strip-organized 8-bit
grayscale / RGB / RGBA (alpha dropped), uncompressed (1), PackBits
(32773) and LZW (5) compression — the TIFF LZW variant with MSB-first
code packing and the spec's "early change" width switch, one code
earlier than GIF's — plus the horizontal-differencing predictor
(tag 317 = 2).  Tiled TIFFs, 16-bit, and palette photometric raise
``ImageFormatError`` (per-row isolated upstream).

``encode_tiff`` writes minimal conforming little-endian TIFFs with a
chosen compression/predictor for fixtures and round-trip tests; the
LZW encoder really compresses (dictionary growth, width changes, clear
on table overflow), so round-trips exercise the full code path.

The header sniffer (``images.sniff_image_meta``) already walks TIFF
IFDs as pure JVM expressions; this module is the Arrow-stage decode
counterpart, dispatched from ``decode_image_auto`` on the II*/MM*
magic.
"""

from __future__ import annotations

import struct

import numpy as np

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import ImageFormatError

_LZW_CLEAR = 256
_LZW_EOI = 257


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first code packing, initial width 9,
    'early change' (width bumps when the table reaches 2^w - 1)."""
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ImageFormatError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ImageFormatError("TIFF LZW code out of range after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ImageFormatError("TIFF LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:  # early change
                width += 1
        prev = entry
    if len(out) < expected:
        raise ImageFormatError("TIFF strip data truncated (LZW)")
    return bytes(out[:expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Real compressing TIFF-LZW writer (fixture generator)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # sync with the decoder's early-change rule: the decoder widens
        # reads one code after its table hits 2^w - 1, so the encoder
        # widens its emits once next_code reaches 2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected and pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:
            out.extend(data[pos : pos + n + 1])
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                break
            out.extend(bytes([data[pos]]) * (257 - n))
            pos += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ImageFormatError("TIFF strip data truncated (PackBits)")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out.extend(data[lit_start:i])
    return bytes(out)


def decode_tiff(content: bytes) -> np.ndarray:
    """Baseline TIFF -> HxWx3 uint8 (gray replicated, alpha dropped)."""
    if len(content) < 8:
        raise ImageFormatError("TIFF payload too short")
    if content[:4] == b"II*\x00":
        endian = "<"
    elif content[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ImageFormatError("not a TIFF payload")
    (ifd_off,) = struct.unpack(endian + "I", content[4:8])
    if ifd_off + 2 > len(content):
        raise ImageFormatError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack(endian + "H", content[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        e = content[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        if len(e) < 12:
            raise ImageFormatError("TIFF IFD truncated")
        tag, typ, count = struct.unpack(endian + "HHI", e[:8])
        if typ not in type_size:
            continue  # RATIONALs etc. — not needed for baseline decode
        total = type_size[typ] * count
        if total <= 4:
            raw = e[8 : 8 + total]
        else:
            (off,) = struct.unpack(endian + "I", e[8:12])
            raw = content[off : off + total]
            if len(raw) < total:
                raise ImageFormatError("TIFF tag value out of range")
        tags[tag] = list(struct.unpack(endian + type_fmt[typ] * count, raw))

    def one(tag: int, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ImageFormatError(f"TIFF missing required tag {tag}")
        return default

    if 322 in tags or 323 in tags:
        raise ImageFormatError("tiled TIFF not supported (strips only)")
    w, h = one(256), one(257)
    if not (1 <= w <= 65535 and 1 <= h <= 65535):
        raise ImageFormatError("bad TIFF dimensions")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ImageFormatError("only 8-bit TIFF samples supported")
    compression = one(259, 1)
    photometric = one(262, 1)
    if photometric == 3:
        raise ImageFormatError("palette TIFF not supported")
    if photometric not in (0, 1, 2):
        raise ImageFormatError(f"unsupported TIFF photometric {photometric}")
    if spp not in (1, 3, 4):
        raise ImageFormatError(f"unsupported TIFF samples/pixel {spp}")
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ImageFormatError("TIFF missing strip offsets/byte counts")

    row_bytes = w * spp
    rows = bytearray()
    row_cursor = 0
    for k, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = content[off : off + cnt]
        if len(strip) < cnt:
            raise ImageFormatError("TIFF strip out of range")
        n_rows = min(rows_per_strip, h - row_cursor)
        expected = n_rows * row_bytes
        if compression == 1:
            if len(strip) < expected:
                raise ImageFormatError("TIFF strip data truncated")
            raw = bytes(strip[:expected])
        elif compression == 5:
            raw = _lzw_decode_tiff(strip, expected)
        elif compression == 32773:
            raw = _packbits_decode(strip, expected)
        else:
            raise ImageFormatError(f"unsupported TIFF compression {compression}")
        rows.extend(raw)
        row_cursor += n_rows
    if row_cursor < h:
        raise ImageFormatError("TIFF strips cover fewer rows than ImageLength")

    arr = np.frombuffer(bytes(rows), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: cumulative sum per row
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ImageFormatError(f"unsupported TIFF predictor {predictor}")
    if photometric == 0:  # WhiteIsZero
        arr = 255 - arr
    if spp == 1:
        return np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr[:, :, :3])


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Minimal conforming strip-organized TIFF writer (8-bit RGB or
    grayscale), little-endian by default; real LZW/PackBits
    compressors."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_tiff wants uint8 HxW or HxWx3")
    gray = img.ndim == 2
    spp = 1 if gray else img.shape[2]
    if not gray and spp != 3:
        raise ValueError("encode_tiff writes 1 or 3 samples per pixel")
    h, w = img.shape[:2]
    endian = ">" if big_endian else "<"
    rps = rows_per_strip or max(1, min(h, 8192 // max(1, w * spp)))

    data = img.reshape(h, w * spp)
    if predictor == 2:
        d = data.astype(np.int16).reshape(h, w, spp)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        data = (d.reshape(h, w * spp) % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")

    strips = []
    for top in range(0, h, rps):
        raw = data[top : top + rps].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")

    def entry(tag: int, typ: int, values: list[int]) -> tuple[bytes, bytes]:
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(values)
        packed = struct.pack(endian + fmt * len(values), *values)
        if size <= 4:
            return struct.pack(endian + "HHI", tag, typ, len(values)) + packed.ljust(4, b"\x00"), b""
        return struct.pack(endian + "HHI", tag, typ, len(values)), packed

    n_strips = len(strips)
    # layout: header(8) | IFD | overflow values | strip data
    fields = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [1 if gray else 2]),
        (273, 4, [0] * n_strips),  # patched below
        (277, 3, [spp]),
        (278, 4, [rps]),
        (279, 4, [len(s) for s in strips]),
        (317, 3, [predictor]),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(fields) + 4
    # first pass: compute overflow area size
    overflow_at = ifd_off + ifd_size
    overflow_sizes = []
    for tag, typ, values in fields:
        size = {3: 2, 4: 4}[typ] * len(values)
        overflow_sizes.append(size if size > 4 else 0)
    data_at = overflow_at + sum(overflow_sizes)
    strip_offsets = []
    cursor = data_at
    for s in strips:
        strip_offsets.append(cursor)
        cursor += len(s)
    fields[5] = (273, 4, strip_offsets)

    ifd = struct.pack(endian + "H", len(fields))
    overflow = b""
    ov_cursor = overflow_at
    for tag, typ, values in fields:
        head, extra = entry(tag, typ, values)
        if extra:
            head = head + struct.pack(endian + "I", ov_cursor)
            overflow += extra
            ov_cursor += len(extra)
        ifd += head
    ifd += struct.pack(endian + "I", 0)  # no next IFD
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    return (
        magic
        + struct.pack(endian + "I", ifd_off)
        + ifd
        + overflow
        + b"".join(strips)
    )
