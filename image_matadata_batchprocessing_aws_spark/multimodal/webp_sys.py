"""Lossy-WebP (VP8) decode via the SYSTEM libwebp — the last image
format on the external-codec seam, made functional.

Honesty note (docs mirror this): unlike PNG/BMP/PPM/GIF/TIFF/VP8L and
every JPEG entropy mode — which this repo decodes in pure
numpy+stdlib — lossy VP8 here is a thin ctypes binding over
``libwebp.so`` (plain C ABI: ``WebPGetInfo`` / ``WebPDecodeRGB`` /
``WebPFree``; no structs, decode errors return NULL rather than
aborting, so in-process use is safe).  This is the same posture a
production Spark pipeline takes for codecs: system library behind a
per-row-isolated Arrow seam.  A pure-python VP8 decoder needs the RFC
6386 default probability tables (1056 constants) which are not
reproducible from memory — the boolean-decoder/predictor/IDCT
scaffolding is the easy half, so the seam stays documented rather than
half-faked.

Gated: :func:`available` is False when no libwebp is found, and
callers fall back to the historical PIL-seam error row.
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
