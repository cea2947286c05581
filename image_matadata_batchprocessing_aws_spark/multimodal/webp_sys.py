"""System-libwebp ctypes binding — RETIRED as the lossy-VP8 decode path
in r05, retired as the animation fallback in r06 (ANMF/ANIM containers
now decode pure via ``multimodal/webp_anim.py`` — this libwebp has no
demuxer, so the seam never actually covered them), and kept for ONE
job:

- **test-time ground truth**: the pure decoder (``multimodal/vp8.py``,
  RFC 6386 from scratch) is validated bit-exact against
  ``WebPDecodeYUV`` / ``WebPDecodeRGB`` here, the same
  independent-implementation standard the arithmetic-JPEG work used
  libjpeg-turbo for (``tools/libjpeg_ref.py``); the default probability
  tables the r04 notes called irreproducible-from-memory are now
  extracted from this binary by ``tools/extract_vp8_tables.py``.
  No production code path imports this module.

Plain C ABI (``WebPGetInfo`` / ``WebPDecodeRGB`` / ``WebPDecodeYUV`` /
``WebPFree``): no structs on the decode side, errors return NULL
rather than aborting, so in-process use is safe.  Gated:
:func:`available` is False when no libwebp is found.
"""

from __future__ import annotations

import ctypes as C
import ctypes.util

import numpy as np


class WebPSysError(ValueError):
    """Lossy-WebP decode failure (bad stream or no system codec)."""


_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for name in (
        ctypes.util.find_library("webp"),
        "libwebp.so.7",
        "libwebp.so",
    ):
        if not name:
            continue
        try:
            lib = C.CDLL(name)
            lib.WebPGetInfo.restype = C.c_int
            lib.WebPGetInfo.argtypes = [
                C.c_char_p, C.c_size_t,
                C.POINTER(C.c_int), C.POINTER(C.c_int),
            ]
            lib.WebPDecodeRGB.restype = C.c_void_p
            lib.WebPDecodeRGB.argtypes = [
                C.c_char_p, C.c_size_t,
                C.POINTER(C.c_int), C.POINTER(C.c_int),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [C.c_void_p]
            _LIB = lib
            return lib
        except OSError:
            continue
    return None


def available() -> bool:
    return _load() is not None


def decode_webp_sys(content: bytes) -> np.ndarray:
    """RIFF/WEBP (any flavor libwebp reads — in practice the lossy VP8
    payloads the pure VP8L decoder refuses) -> HxWx3 uint8 RGB."""
    lib = _load()
    if lib is None:
        raise WebPSysError("no system libwebp for lossy VP8 decode")
    w = C.c_int(0)
    h = C.c_int(0)
    if not lib.WebPGetInfo(content, len(content), C.byref(w), C.byref(h)):
        raise WebPSysError("not a decodable WebP stream")
    ptr = lib.WebPDecodeRGB(content, len(content), C.byref(w), C.byref(h))
    if not ptr:
        raise WebPSysError("libwebp failed to decode stream")
    try:
        n = w.value * h.value * 3
        buf = C.cast(ptr, C.POINTER(C.c_ubyte * n)).contents
        img = np.frombuffer(buf, dtype=np.uint8).reshape(h.value, w.value, 3).copy()
    finally:
        lib.WebPFree(ptr)
    return img


def encode_webp_lossy_sys(img: np.ndarray, quality: float = 80.0) -> bytes:
    """Fixture generator: lossy VP8 encode via libwebp (``WebPEncodeRGB``)."""
    lib = _load()
    if lib is None:
        raise WebPSysError("no system libwebp")
    lib.WebPEncodeRGB.restype = C.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_float,
        C.POINTER(C.c_void_p),
    ]
    h, w, _ = img.shape
    out = C.c_void_p(None)
    raw = np.ascontiguousarray(img).tobytes()
    size = lib.WebPEncodeRGB(raw, w, h, w * 3, quality, C.byref(out))
    if not size or not out:
        raise WebPSysError("libwebp encode failed")
    try:
        data = C.string_at(out, size)
    finally:
        lib.WebPFree(out)
    return data


def decode_webp_yuv_sys(content: bytes):
    """Ground-truth (y, u, v) planes via ``WebPDecodeYUV`` — used by the
    pure-VP8 tests to validate each reconstruction stage bit-exactly
    before the RGB conversion enters the picture."""
    lib = _load()
    if lib is None:
        raise WebPSysError("no system libwebp")
    lib.WebPDecodeYUV.restype = C.c_void_p
    lib.WebPDecodeYUV.argtypes = [
        C.c_char_p, C.c_size_t,
        C.POINTER(C.c_int), C.POINTER(C.c_int),
        C.POINTER(C.c_void_p), C.POINTER(C.c_void_p),
        C.POINTER(C.c_int), C.POINTER(C.c_int),
    ]
    w = C.c_int(0)
    h = C.c_int(0)
    up = C.c_void_p(None)
    vp = C.c_void_p(None)
    stride = C.c_int(0)
    uv_stride = C.c_int(0)
    yp = lib.WebPDecodeYUV(
        content, len(content), C.byref(w), C.byref(h),
        C.byref(up), C.byref(vp), C.byref(stride), C.byref(uv_stride),
    )
    if not yp:
        raise WebPSysError("libwebp YUV decode failed")
    try:
        cw, ch = (w.value + 1) // 2, (h.value + 1) // 2

        def plane(ptr, rows, cols, srd):
            buf = C.cast(ptr, C.POINTER(C.c_ubyte * (rows * srd))).contents
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(rows, srd)
            return arr[:, :cols].copy()

        y = plane(yp, h.value, w.value, stride.value)
        u = plane(up.value, ch, cw, uv_stride.value)
        v = plane(vp.value, ch, cw, uv_stride.value)
    finally:
        lib.WebPFree(C.c_void_p(yp))
    return y, u, v
