"""Animated GIF (GIF89a) multi-frame decode + fixture encoder — pure
numpy + stdlib.

Extends the single-frame decoder (``codecs.decode_gif``, which keeps
its PIL ``convert("RGB")`` first-frame contract untouched) to the full
89a animation model the reference's PIL path reads natively
(reference decode seam: ``process_test_train_Images.py:45`` —
``Image.open`` handles animated GIFs):

- Graphic Control Extension per frame: delay (centiseconds),
  transparency index, disposal method;
- frames as sub-rectangles of the logical screen, each with an
  optional local color table and optional interlacing;
- NETSCAPE 2.0 looping application extension (loop count surfaced in
  the parse, ignored by compositing).

Compositing semantics (documented contract, asserted by the oracle of
``multimodal_gif_animation``):

- the canvas starts as the background color (GCT[bg_idx] when a GCT
  exists, else black) — the single-frame decoder's rule;
- transparent pixels (index == GCE transparent index) leave the
  canvas unchanged;
- disposal 0/1 (unspecified / do not dispose): frame pixels stay;
- disposal 2 (restore to background): after the frame is shown its
  rectangle resets to the background color;
- disposal 3 (restore to previous): after the frame is shown the
  canvas reverts to its pre-frame state.

The raw per-frame index rasters, delays, disposal methods and
transparency indices are validated against the system giflib
(``tools/giflib_ref.py``, independent ground truth); compositing is
validated against these documented spec semantics by construction
(giflib's DGifSlurp exposes no compositor to diff against).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    ImageFormatError,
    _gif_lzw_decode,
    _gif_lzw_encode,
    _GIF_INTERLACE_PASSES,
    _GIF_MAGICS,
)


@dataclass
class GifFrame:
    """One parsed image descriptor + its graphic-control state."""

    x: int
    y: int
    w: int
    h: int
    indices: np.ndarray  # (h, w) uint8, de-interlaced
    palette: np.ndarray  # (n, 3) uint8 (local table if present, else global)
    delay_cs: int  # GCE delay in centiseconds (0 when absent)
    disposal: int  # 0..3 (0 when no GCE)
    transparent: int | None  # transparency index, or None
    interlaced: bool
    local_palette: bool


@dataclass
class GifScreen:
    width: int
    height: int
    bg_rgb: tuple[int, int, int]
    loop_count: int | None  # NETSCAPE extension, None when absent


def parse_gif_frames(content: bytes) -> tuple[GifScreen, list[GifFrame]]:
    """Walk every block of a GIF87a/89a stream -> (screen, frames)."""
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
    bg_rgb = (0, 0, 0)
    if gct is not None and bg_idx < len(gct):
        bg_rgb = tuple(int(v) for v in gct[bg_idx])

    frames: list[GifFrame] = []
    loop_count: int | None = None
    # pending graphic-control state (applies to the NEXT image block)
    delay_cs, disposal, transparent = 0, 0, None
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 2 > len(content):
                raise ImageFormatError("GIF extension truncated")
            label = content[pos + 1]
            pos += 2
            subs = []
            while pos < len(content) and content[pos] != 0:
                ln = content[pos]
                subs.append(content[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            if pos >= len(content):
                raise ImageFormatError("GIF extension sub-blocks truncated")
            pos += 1  # block terminator
            if label == 0xF9 and subs and len(subs[0]) >= 4:  # GCE
                gpacked = subs[0][0]
                delay_cs = struct.unpack("<H", subs[0][1:3])[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = subs[0][3] if gpacked & 0x01 else None
            elif label == 0xFF and subs and subs[0] == b"NETSCAPE2.0":
                for sb in subs[1:]:
                    if len(sb) >= 3 and sb[0] == 1:
                        loop_count = struct.unpack("<H", sb[1:3])[0]
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
        local = bool(ipacked & 0x80)
        if local:
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
            if len(content) - pos < ln:
                raise ImageFormatError("GIF data sub-blocks truncated")
            chunks.extend(content[pos : pos + ln])
            pos += ln
        idx = _gif_lzw_decode(bytes(chunks), min_code_size, fw * fh)
        if int(idx.max(initial=0)) >= len(pal):
            raise ImageFormatError("GIF palette index out of range")
        frame = idx.reshape(fh, fw)
        interlaced = bool(ipacked & 0x40)
        if interlaced:
            order = np.concatenate(
                [np.arange(start, fh, step) for start, step in _GIF_INTERLACE_PASSES]
            )
            deinter = np.empty_like(frame)
            deinter[order] = frame
            frame = deinter
        frames.append(
            GifFrame(
                x=fx,
                y=fy,
                w=fw,
                h=fh,
                indices=frame,
                palette=pal,
                delay_cs=delay_cs,
                disposal=disposal,
                transparent=transparent,
                interlaced=interlaced,
                local_palette=local,
            )
        )
        # GCE state applies to exactly one following image block
        delay_cs, disposal, transparent = 0, 0, None
    if not frames:
        raise ImageFormatError("GIF contains no image data")
    return GifScreen(sw, sh, bg_rgb, loop_count), frames


def compose_gif_frames(content: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode an animated GIF -> [(HxWx3 uint8 composited canvas,
    delay_cs)] per the documented disposal/transparency semantics."""
    screen, frames = parse_gif_frames(content)
    canvas = np.empty((screen.height, screen.width, 3), dtype=np.uint8)
    canvas[:, :] = screen.bg_rgb
    out: list[tuple[np.ndarray, int]] = []
    for fr in frames:
        before = canvas.copy() if fr.disposal == 3 else None
        region = canvas[fr.y : fr.y + fr.h, fr.x : fr.x + fr.w]
        rgb = fr.palette[fr.indices]
        if fr.transparent is not None:
            opaque = fr.indices != fr.transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        out.append((canvas.copy(), fr.delay_cs))
        if fr.disposal == 2:
            region[:, :] = screen.bg_rgb
        elif fr.disposal == 3:
            canvas[:, :] = before
    return out


def encode_gif_animation(
    frames: list[dict],
    screen_w: int,
    screen_h: int,
    palette: np.ndarray,
    bg_idx: int = 0,
    loop_count: int | None = 0,
) -> bytes:
    """Minimal animated-GIF89a writer (fixture generator).

    ``frames`` entries: ``{"indices": (h, w) uint8 array of palette
    indices, "x": int, "y": int, "delay_cs": int, "disposal": int,
    "transparent": int | None, "interlace": bool (opt),
    "palette": (n, 3) uint8 (opt local table)}``.  ``palette`` is the
    global color table (<= 256 rows, padded to a power of two).
    """

    def pack_palette(pal: np.ndarray) -> tuple[bytes, int]:
        if len(pal) > 256:
            raise ImageFormatError(f"GIF palette needs <=256 colors, got {len(pal)}")
        depth = max(1, int(len(pal) - 1).bit_length())
        padded = np.zeros((1 << depth, 3), dtype=np.uint8)
        padded[: len(pal)] = pal
        return padded.tobytes(), depth

    gct_bytes, gdepth = pack_palette(palette)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", screen_w, screen_h, 0x80 | (gdepth - 1), bg_idx, 0)
    out += gct_bytes
    if loop_count is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop_count) + b"\x00"
    for fr in frames:
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        h, w = idx.shape
        transparent = fr.get("transparent")
        gpacked = (int(fr.get("disposal", 0)) & 0x07) << 2
        tidx = 0
        if transparent is not None:
            gpacked |= 0x01
            tidx = int(transparent)
        out += b"\x21\xf9\x04" + bytes([gpacked])
        out += struct.pack("<H", int(fr.get("delay_cs", 0))) + bytes([tidx, 0])
        local = fr.get("palette")
        interlace = bool(fr.get("interlace", False))
        ipacked = 0x40 if interlace else 0
        lct_bytes = b""
        if local is not None:
            lct_bytes, ldepth = pack_palette(np.asarray(local, dtype=np.uint8))
            ipacked |= 0x80 | (ldepth - 1)
            depth = ldepth
        else:
            depth = gdepth
        out += b"\x2c" + struct.pack(
            "<HHHHB", int(fr.get("x", 0)), int(fr.get("y", 0)), w, h, ipacked
        )
        out += lct_bytes
        rows = idx
        if interlace:
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _GIF_INTERLACE_PASSES]
            )
            rows = idx[order]
        min_code_size = max(2, depth)
        lzw = _gif_lzw_encode(rows.reshape(-1).tobytes(), min_code_size)
        out += bytes([min_code_size])
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
