"""REAL lossless-WebP (VP8L) codec in pure numpy + stdlib — no PIL.

Closes the WEBP seam of S9 (SURVEY §2.1; reference decode is
``process_test_train_Images.py:45`` via PIL): ``decode_webp`` parses the
RIFF container and fully decodes VP8L streams — canonical prefix codes
(simple and normal, incl. the max_symbol short form), meta-prefix
(Huffman-image) segmentation, LZ77 backward references with the 120-code
2D distance map, color cache, and all four transforms (predictor with
its 14 modes, color transform, subtract-green, color indexing with
sub-byte pixel bundling) inverted in reverse stream order.  Only LOSSY
WebP (VP8 chunks — a boolean arithmetic coder plus a full intra codec)
stays behind the PIL seam, as do animations.

``encode_webp_lossless`` emits a minimal-but-conforming VP8L stream
(no transforms, no color cache, single prefix-code group; simple codes
for ≤2-symbol channels, else normal codes with package-merge
length-limited canonical Huffman) — fixture generation for tests and
the driver-checked oracle query, exact by round-trip.

Layout follows the WebP Lossless Bitstream Specification (RFC 9649);
the 2D distance map is built by inverting the public
``plane_to_code_lut`` from the spec so the mapping cannot be
mistranscribed.  Bit order: LSB-first within bytes; prefix codes are
canonical (DEFLATE-style) and transmitted MSB-of-code-first.

Output contract matches ``multimodal/codecs.py``: HxWx3 uint8 RGB
(alpha dropped — PIL ``convert("RGB")`` semantics).  Runs INSIDE the
Arrow-batched ``mapInPandas`` decode stage where per-image Python is
the accepted slow path.
"""

from __future__ import annotations

import struct

import numpy as np

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import ImageFormatError

# --- bit I/O (LSB-first) ---------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ImageFormatError("VP8L: bitstream truncated")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:
        # prefix codes go MSB-first into the LSB-first stream
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur)
            self.cur, self.nbits = 0, 0
        return bytes(self.out)


# --- canonical prefix codes ------------------------------------------------

#: code-length symbols are transmitted in this fixed order (RFC 9649)
#: kCodeLengthCodeOrder (RFC 9649 §5.2.2): symbol 16 sits at position 8,
#: between 5 and 6 — NOT at the end.  r06 fix: both the reader and the
#: writer had 16 last, a symmetric error invisible to round-trip tests
#: and to libwebp-produced fixtures with num_code_lengths <= 8 (the
#: first eight positions agree); independent libwebp decode of our own
#: normal-code streams with >= 33 distinct symbols exposed it.
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """DEFLATE-style canonical code assignment: symbol -> code, for
    symbols with nonzero length (increasing code per length, symbol
    order within a length)."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder for one canonical prefix code.  ``trivial`` (single
    symbol) codes consume zero bits per read."""

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ImageFormatError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.trivial = nz[0][0]
            self.table = None
            return
        self.trivial = None
        kraft = sum(1 << (15 - ln) for _, ln in nz)
        if kraft != 1 << 15:
            raise ImageFormatError("VP8L: invalid (incomplete) prefix code")
        codes = _canonical_codes(lengths)
        self.table = {(lengths[s], c): s for s, c in codes.items()}

    @classmethod
    def single(cls, symbol: int) -> "_PrefixCode":
        pc = cls.__new__(cls)
        pc.trivial = symbol
        pc.table = None
        return pc

    def read(self, br: _BitReader) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ImageFormatError("VP8L: prefix code read overflow")


def _read_code_lengths(br: _BitReader, cl_code: _PrefixCode, num_symbols: int) -> list[int]:
    """RFC 9649 ReadHuffmanCodeLengths: literal lengths 0..15 plus the
    three repeat codes, optional max_symbol short form."""
    lengths = [0] * num_symbols
    if br.read_bits(1):
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = num_symbols
    symbol = 0
    prev_len = 8
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, value = 3 + br.read_bits(2), prev_len
            elif code_len == 17:
                repeat, value = 3 + br.read_bits(3), 0
            else:
                repeat, value = 11 + br.read_bits(7), 0
            if symbol + repeat > num_symbols:
                raise ImageFormatError("VP8L: code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = value
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bits(1):  # simple code
        num_symbols = br.read_bits(1) + 1
        first = br.read_bits(8) if br.read_bits(1) else br.read_bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if first >= alphabet_size:
                raise ImageFormatError("VP8L: simple-code symbol out of range")
            return _PrefixCode.single(first)
        second = br.read_bits(8)
        if first >= alphabet_size or second >= alphabet_size or first == second:
            raise ImageFormatError("VP8L: bad simple-code symbols")
        lengths[first] = lengths[second] = 1
        return _PrefixCode(lengths)
    num_cl = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read_bits(3)
    cl_code = _PrefixCode(cl_lengths)
    return _PrefixCode(_read_code_lengths(br, cl_code, alphabet_size))


# --- LZ77 helpers ----------------------------------------------------------

#: plane_to_code_lut from the spec (8 rows x 16 cols, 255 = invalid);
#: code c at (row y, col 8-x) maps distance code c+1 to 2D offset (x, y).
#: Embedding the forward LUT and inverting it at import time makes the
#: 120-entry distance map impossible to mistranscribe.
_PLANE_TO_CODE = (
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
)

_DIST_MAP: dict[int, tuple[int, int]] = {}
for _y in range(8):
    for _col in range(16):
        _v = _PLANE_TO_CODE[_y * 16 + _col]
        if _v != 255:
            _DIST_MAP[_v + 1] = (8 - _col, _y)  # (x offset, y offset)


def _prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (shared formula)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


# --- image-stream decoding -------------------------------------------------

_NUM_LENGTH_CODES = 24
_HASH_MUL = 0x1E35A7BD


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int, is_level0: bool):
    """One VP8L image stream (spatially-coded ARGB): color cache, meta
    prefix image (level 0 only), n x 5 prefix codes, LZ77+cache decode.
    Returns a python list of uint32 ARGB values, row-major."""
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ImageFormatError("VP8L: bad color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta_codes = None
    meta_w = meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bits(1):
        meta_bits = br.read_bits(3) + 2
        meta_w = -(-xsize // (1 << meta_bits))
        meta_h = -(-ysize // (1 << meta_bits))
        meta_img = _decode_image_stream(br, meta_w, meta_h, False)
        meta_codes = [(p >> 8) & 0xFFFF for p in meta_img]
        num_groups = max(meta_codes) + 1

    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    alphabets = (green_size, 256, 256, 256, 40)
    groups = [
        tuple(_read_prefix_code(br, a) for a in alphabets) for _ in range(num_groups)
    ]

    n = xsize * ysize
    pixels: list[int] = []
    while len(pixels) < n:
        if meta_codes is not None:
            x, y = len(pixels) % xsize, len(pixels) // xsize
            grp = groups[meta_codes[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        else:
            grp = groups[0]
        s = grp[0].read(br)
        if s < 256:
            r = grp[1].read(br)
            b = grp[2].read(br)
            a = grp[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, grp[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code]
                dist = dx + dy * xsize
                if dist < 1:
                    dist = 1
            if dist > len(pixels):
                raise ImageFormatError("VP8L: LZ77 distance before image start")
            if len(pixels) + length > n:
                raise ImageFormatError("VP8L: LZ77 copy past image end")
            for _ in range(length):
                px = pixels[-dist]
                pixels.append(px)
                if cache is not None:
                    cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            continue
        else:
            if cache is None:
                raise ImageFormatError("VP8L: cache symbol without color cache")
            px = cache[s - 256 - _NUM_LENGTH_CODES]
        pixels.append(px)
        if cache is not None:
            cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
    return pixels


# --- inverse transforms ----------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, topleft: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (topleft >> sh) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return left if p_l < p_t else top


def _clamp_add_sub_full(left: int, top: int, topleft: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp255(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((topleft >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(ave: int, topleft: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((topleft >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation toward 0
        out |= _clamp255(a + half) << sh
    return out


def _add_pixels(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) & 0xFF)
    )


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), topleft)
    raise ImageFormatError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(pixels: list[int], w: int, h: int, bits: int, block_img: list[int]):
    bw = -(-w // (1 << bits))
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = (block_img[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
                # TR of the rightmost column is the current row's first
                # pixel (contiguous-row addressing, per the spec)
                pred = _predict(
                    mode, pixels[i - 1], pixels[i - w], pixels[i - w - 1], pixels[i - w + 1]
                )
            pixels[i] = _add_pixels(pixels[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: int8 x int8 product, arithmetic >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(pixels: list[int], w: int, h: int, bits: int, block_img: list[int]):
    bw = -(-w // (1 << bits))
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = block_img[(y >> bits) * bw + (x >> bits)]
            r2b = (cte >> 16) & 0xFF  # red channel of the element
            g2b = (cte >> 8) & 0xFF
            g2r = cte & 0xFF  # blue channel of the element
            px = pixels[i]
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) + _ct_delta(g2r, g)) & 0xFF
            b = ((px & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pixels[i] = (px & 0xFF000000) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pixels: list[int]):
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF000000) | (r << 16) | (g << 8) | b


def _inv_color_index(pixels: list[int], orig_w: int, h: int, width_bits: int, palette: list[int]):
    npal = len(palette)
    if width_bits == 0:
        out = []
        for px in pixels:
            idx = (px >> 8) & 0xFF
            out.append(palette[idx] if idx < npal else 0)
        return out
    per = 1 << width_bits
    ibits = 8 >> width_bits
    mask = (1 << ibits) - 1
    packed_w = -(-orig_w // per)
    out = [0] * (orig_w * h)
    for y in range(h):
        for px_x in range(packed_w):
            g = (pixels[y * packed_w + px_x] >> 8) & 0xFF
            for k in range(per):
                x = px_x * per + k
                if x >= orig_w:
                    break
                idx = (g >> (k * ibits)) & mask
                out[y * orig_w + x] = palette[idx] if idx < npal else 0
    return out


# --- VP8L stream + RIFF container ------------------------------------------


def _decode_vp8l(data: bytes, return_alpha: bool = False):
    """VP8L stream -> HxWx3 uint8 RGB; with ``return_alpha`` a
    (rgb, alpha HxW uint8) pair — the animation compositor needs the
    alpha plane the still contract (PIL convert('RGB') semantics)
    drops."""
    if not data or data[0] != 0x2F:
        raise ImageFormatError("VP8L: bad signature byte")
    br = _BitReader(data, 1)
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bits(1)  # alpha-used hint
    if br.read_bits(3) != 0:
        raise ImageFormatError("VP8L: unknown version")
    pixels = _decode_vp8l_body(br, w, h)

    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = (arr >> 16) & 0xFF
    rgb[:, :, 1] = (arr >> 8) & 0xFF
    rgb[:, :, 2] = arr & 0xFF
    if return_alpha:
        return rgb, ((arr >> 24) & 0xFF).astype(np.uint8)
    return rgb


def _decode_vp8l_body(br: _BitReader, w: int, h: int) -> list[int]:
    """Transform loop + level-0 image stream + inverse transforms ->
    row-major uint32 ARGB list.  Shared by the full VP8L decode (after
    its 5-byte header) and the ALPH alpha-chunk decode, whose
    lossless-compressed payload is exactly this headerless stream
    (container spec §Alpha: dimensions come from the frame)."""
    transforms = []
    seen = set()
    xsize = w
    while br.read_bits(1):
        ttype = br.read_bits(2)
        if ttype in seen:
            raise ImageFormatError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read_bits(3) + 2
            bw = -(-xsize // (1 << bits))
            bh = -(-h // (1 << bits))
            block_img = _decode_image_stream(br, bw, bh, False)
            transforms.append((ttype, bits, block_img, xsize))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None, xsize))
        else:  # color indexing
            npal = br.read_bits(8) + 1
            pal = _decode_image_stream(br, npal, 1, False)
            for i in range(1, npal):  # palette is delta-coded
                pal[i] = _add_pixels(pal[i], pal[i - 1])
            width_bits = 3 if npal <= 2 else 2 if npal <= 4 else 1 if npal <= 16 else 0
            transforms.append((3, width_bits, pal, xsize))
            if width_bits:
                xsize = -(-xsize // (1 << width_bits))

    pixels = _decode_image_stream(br, xsize, h, True)

    for ttype, bits, payload, t_xsize in reversed(transforms):
        if ttype == 0:
            _inv_predictor(pixels, t_xsize, h, bits, payload)
        elif ttype == 1:
            _inv_color_transform(pixels, t_xsize, h, bits, payload)
        elif ttype == 2:
            _inv_subtract_green(pixels)
        else:
            pixels = _inv_color_index(pixels, t_xsize, h, bits, payload)
    return pixels


def decode_webp(content: bytes) -> np.ndarray:
    """RIFF walk + VP8L (lossless) or VP8 (lossy, ``multimodal/vp8.py``)
    decode — pure numpy+stdlib.  Animated (ANIM/ANMF) files route to
    the pure compositor (``multimodal/webp_anim.py``) and return the
    first composited frame, alpha dropped — every WebP variant now
    decodes without a system codec."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ImageFormatError("not a WEBP RIFF container")
    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(body)
        if tag == b"VP8 ":
            from image_matadata_batchprocessing_aws_spark.multimodal.vp8 import (  # noqa: PLC0415
                decode_vp8_rgb,
            )

            return decode_vp8_rgb(body)
        if tag == b"ANMF" or tag == b"ANIM":
            from image_matadata_batchprocessing_aws_spark.multimodal.webp_anim import (  # noqa: PLC0415
                decode_webp_anim_first_rgb,
            )

            return decode_webp_anim_first_rgb(content)
        pos += 8 + size + (size & 1)  # chunks are even-padded
    raise ImageFormatError("WEBP container with no VP8L/VP8 image chunk")


# --- minimal conforming encoder --------------------------------------------


def _package_merge(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths (package-merge)."""
    items = sorted((f, (s,)) for s, f in freqs.items())
    if len(items) == 1:
        return {items[0][1][0]: 1}
    prev = list(items)
    for _ in range(limit - 1):
        packaged = [
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        ]
        prev = sorted(items + packaged)
    lengths: dict[int, int] = {}
    for _, syms in prev[: 2 * len(items) - 2]:
        for s in syms:
            lengths[s] = lengths.get(s, 0) + 1
    return lengths


def _write_prefix_code(bw: _BitWriter, alphabet_size: int, freqs: dict[int, int]):
    """Emit one prefix code; returns symbol -> (code, length) for the
    body writer.  <=2 used symbols (all < 256) use the simple form."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write_bits(1, 1)  # simple
        bw.write_bits(len(used) - 1, 1)
        if used[0] <= 1:
            bw.write_bits(0, 1)
            bw.write_bits(used[0], 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.write_bits(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}

    lengths_map = _package_merge({s: freqs[s] for s in used}, 15)
    lengths = [0] * alphabet_size
    for s, ln in lengths_map.items():
        lengths[s] = ln

    # code-length code over the 19-symbol alphabet (no RLE symbols)
    cl_freqs: dict[int, int] = {}
    for ln in lengths:
        cl_freqs[ln] = cl_freqs.get(ln, 0) + 1
    if len(cl_freqs) == 1:
        only = next(iter(cl_freqs))  # pad to a complete 2-symbol code
        cl_lengths_map = {only: 1, (only + 1) % 16: 1}
    else:
        cl_lengths_map = _package_merge(cl_freqs, 7)
    cl_lengths = [0] * 19
    for s, ln in cl_lengths_map.items():
        cl_lengths[s] = ln
    cl_codes = _canonical_codes(cl_lengths)

    bw.write_bits(0, 1)  # not simple
    num_cl = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0) + 1
    num_cl = max(num_cl, 4)
    bw.write_bits(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write_bits(cl_lengths[_CL_ORDER[i]], 3)
    bw.write_bits(0, 1)  # no max_symbol short form
    for ln in lengths:
        bw.write_code(cl_codes[ln], cl_lengths[ln])

    codes = _canonical_codes(lengths)
    return {s: (codes[s], lengths[s]) for s in used}


def encode_vp8l_payload(img: np.ndarray) -> bytes:
    """HxWx3 (opaque) or HxWx4 (RGBA) uint8 -> a conforming VP8L
    chunk payload (``0x2F`` signature + bitstream): no transforms, no
    color cache, one prefix-code group, literals only.  Exact by
    construction (lossless round-trips are unit-tested); the RGBA path
    exists for the animation mux, whose sub-frames carry real alpha."""
    if img.ndim != 3 or img.shape[2] not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("encode_vp8l_payload wants HxWx3 or HxWx4 uint8")
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dims must be in [1, 16384]")
    has_alpha = img.shape[2] == 4

    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(1 if has_alpha else 0, 1)  # alpha-used hint
    bw.write_bits(0, 3)  # version
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta prefix image

    r = img[:, :, 0].reshape(-1)
    g = img[:, :, 1].reshape(-1)
    b = img[:, :, 2].reshape(-1)
    a = img[:, :, 3].reshape(-1) if has_alpha else None

    def freq(channel) -> dict[int, int]:
        vals, counts = np.unique(channel, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, counts)}

    green_book = _write_prefix_code(bw, 256 + _NUM_LENGTH_CODES, freq(g))
    red_book = _write_prefix_code(bw, 256, freq(r))
    blue_book = _write_prefix_code(bw, 256, freq(b))
    alpha_book = _write_prefix_code(bw, 256, freq(a) if a is not None else {255: 1})
    _write_prefix_code(bw, 40, {0: 1})  # distance code (never read)

    for i in range(h * w):
        c, ln = green_book[int(g[i])]
        bw.write_code(c, ln)
        c, ln = red_book[int(r[i])]
        bw.write_code(c, ln)
        c, ln = blue_book[int(b[i])]
        bw.write_code(c, ln)
        if a is not None:
            c, ln = alpha_book[int(a[i])]
            bw.write_code(c, ln)
        # single-symbol alpha/distance books cost zero bits per pixel

    return bytes([0x2F]) + bw.flush()


def encode_webp_lossless(img: np.ndarray) -> bytes:
    """Minimal conforming lossless WebP file (RIFF + one VP8L chunk);
    see ``encode_vp8l_payload`` for the bitstream shape."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_webp_lossless wants HxWx3 uint8")
    payload = encode_vp8l_payload(img)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
