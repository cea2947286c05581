"""Advanced libwebp encode harness (ctypes) for VP8 decoder validation.

The simple ``WebPEncodeRGB`` API always produces normal-filter,
single-partition streams; validating the pure VP8 decoder's simple
loop filter, multi-partition, sharpness, and loop-filter-delta paths
needs ``WebPEncode`` with a full ``WebPConfig`` — bound here per the
public ``webp/encode.h`` layout.  Same posture as ``libjpeg_ref.py``:
the system binary is the independent ground truth; this file is
tooling, not a production dependency (the decoder itself never touches
libwebp).

Struct-layout safety: both structs get 64 bytes of trailing padding so
a field-count drift in a future libwebp can only write into our own
slack, and ``WebPConfigInitInternal`` is probed over known ABI
versions until it accepts; every config goes through
``WebPValidateConfig`` before use.
"""

from __future__ import annotations

import ctypes as C
import ctypes.util

import numpy as np


class WebPRefError(RuntimeError):
    pass


class WebPConfig(C.Structure):
    _fields_ = [
        ("lossless", C.c_int),
        ("quality", C.c_float),
        ("method", C.c_int),
        ("image_hint", C.c_int),
        ("target_size", C.c_int),
        ("target_PSNR", C.c_float),
        ("segments", C.c_int),
        ("sns_strength", C.c_int),
        ("filter_strength", C.c_int),
        ("filter_sharpness", C.c_int),
        ("filter_type", C.c_int),  # 0 = simple, 1 = strong/normal
        ("autofilter", C.c_int),
        ("alpha_compression", C.c_int),
        ("alpha_filtering", C.c_int),
        ("alpha_quality", C.c_int),
        ("pass_", C.c_int),
        ("show_compressed", C.c_int),
        ("preprocessing", C.c_int),
        ("partitions", C.c_int),  # log2(token partitions), 0..3
        ("partition_limit", C.c_int),
        ("emulate_jpeg_size", C.c_int),
        ("thread_level", C.c_int),
        ("low_memory", C.c_int),
        ("near_lossless", C.c_int),
        ("exact", C.c_int),
        ("use_delta_palette", C.c_int),
        ("use_sharp_yuv", C.c_int),
        ("qmin", C.c_int),
        ("qmax", C.c_int),
        ("_slack", C.c_byte * 64),
    ]


class WebPMemoryWriter(C.Structure):
    _fields_ = [
        ("mem", C.c_void_p),
        ("size", C.c_size_t),
        ("max_size", C.c_size_t),
        ("pad", C.c_uint32 * 1),
        ("_slack", C.c_byte * 64),
    ]


class WebPPicture(C.Structure):
    _fields_ = [
        ("use_argb", C.c_int),
        ("colorspace", C.c_int),
        ("width", C.c_int),
        ("height", C.c_int),
        ("y", C.c_void_p),
        ("u", C.c_void_p),
        ("v", C.c_void_p),
        ("y_stride", C.c_int),
        ("uv_stride", C.c_int),
        ("a", C.c_void_p),
        ("a_stride", C.c_int),
        ("pad1", C.c_uint32 * 2),
        ("argb", C.c_void_p),
        ("argb_stride", C.c_int),
        ("pad2", C.c_uint32 * 3),
        ("writer", C.c_void_p),
        ("custom_ptr", C.c_void_p),
        ("extra_info_type", C.c_int),
        ("extra_info", C.c_void_p),
        ("stats", C.c_void_p),
        ("error_code", C.c_int),
        ("progress_hook", C.c_void_p),
        ("user_data", C.c_void_p),
        ("pad3", C.c_uint32 * 3),
        ("pad4", C.c_void_p),
        ("pad5", C.c_void_p),
        ("pad6", C.c_uint32 * 8),
        ("_slack", C.c_byte * 64),
    ]


_LIB = None
_ABI = None


def _load():
    global _LIB, _ABI
    if _LIB is not None:
        return _LIB
    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    lib = C.CDLL(name)
    lib.WebPConfigInitInternal.restype = C.c_int
    lib.WebPConfigInitInternal.argtypes = [
        C.POINTER(WebPConfig), C.c_int, C.c_float, C.c_int,
    ]
    lib.WebPPictureInitInternal.restype = C.c_int
    lib.WebPPictureInitInternal.argtypes = [C.POINTER(WebPPicture), C.c_int]
    lib.WebPValidateConfig.restype = C.c_int
    lib.WebPValidateConfig.argtypes = [C.POINTER(WebPConfig)]
    lib.WebPPictureImportRGB.restype = C.c_int
    lib.WebPPictureImportRGB.argtypes = [
        C.POINTER(WebPPicture), C.c_char_p, C.c_int,
    ]
    lib.WebPPictureImportRGBA.restype = C.c_int
    lib.WebPPictureImportRGBA.argtypes = [
        C.POINTER(WebPPicture), C.c_char_p, C.c_int,
    ]
    lib.WebPDecodeRGBA.restype = C.POINTER(C.c_ubyte)
    lib.WebPDecodeRGBA.argtypes = [
        C.c_char_p, C.c_size_t, C.POINTER(C.c_int), C.POINTER(C.c_int),
    ]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [C.c_void_p]
    lib.WebPEncode.restype = C.c_int
    lib.WebPEncode.argtypes = [C.POINTER(WebPConfig), C.POINTER(WebPPicture)]
    lib.WebPPictureFree.restype = None
    lib.WebPPictureFree.argtypes = [C.POINTER(WebPPicture)]
    lib.WebPMemoryWriterInit.restype = None
    lib.WebPMemoryWriterInit.argtypes = [C.POINTER(WebPMemoryWriter)]
    lib.WebPMemoryWriterClear.restype = None
    lib.WebPMemoryWriterClear.argtypes = [C.POINTER(WebPMemoryWriter)]
    lib.WebPMemoryWrite.restype = C.c_int
    # probe the ABI version WebPConfigInitInternal accepts
    for abi in (0x020F, 0x020E, 0x020D, 0x020C, 0x020B, 0x020A, 0x0209,
                0x0208, 0x0210, 0x0211):
        cfg = WebPConfig()
        if lib.WebPConfigInitInternal(C.byref(cfg), 0, 75.0, abi):
            _ABI = abi
            break
    else:
        raise WebPRefError("no accepted WEBP_ENCODER_ABI_VERSION")
    _LIB = lib
    return lib


def encode_rgb(img: np.ndarray, quality: float = 75.0, **overrides) -> bytes:
    """Encode HxWx3 RGB with explicit WebPConfig field overrides, e.g.
    ``filter_type=0, partitions=2, filter_sharpness=3, segments=1``."""
    lib = _load()
    cfg = WebPConfig()
    if not lib.WebPConfigInitInternal(C.byref(cfg), 0, float(quality), _ABI):
        raise WebPRefError("config init failed")
    for k, v in overrides.items():
        field = "pass_" if k == "pass" else k
        if not hasattr(cfg, field):
            raise WebPRefError(f"unknown WebPConfig field {k}")
        setattr(cfg, field, v)
    if not lib.WebPValidateConfig(C.byref(cfg)):
        raise WebPRefError(f"invalid config {overrides}")
    pic = WebPPicture()
    if not lib.WebPPictureInitInternal(C.byref(pic), _ABI):
        raise WebPRefError("picture init failed")
    h, w, _ = img.shape
    pic.width = w
    pic.height = h
    pic.use_argb = 0  # import converts straight to YUV420
    raw = np.ascontiguousarray(img).tobytes()
    if not lib.WebPPictureImportRGB(C.byref(pic), raw, w * 3):
        raise WebPRefError("picture import failed")
    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(C.byref(wr))
    pic.writer = C.cast(lib.WebPMemoryWrite, C.c_void_p)
    pic.custom_ptr = C.cast(C.byref(wr), C.c_void_p)
    ok = lib.WebPEncode(C.byref(cfg), C.byref(pic))
    try:
        if not ok:
            raise WebPRefError(f"encode failed: error_code={pic.error_code}")
        out = C.string_at(wr.mem, wr.size)
    finally:
        lib.WebPPictureFree(C.byref(pic))
        lib.WebPMemoryWriterClear(C.byref(wr))
    return out


def encode_rgba(img: np.ndarray, quality: float = 75.0, **overrides) -> bytes:
    """Encode HxWx4 RGBA -> extended WebP (VP8X + ALPH + VP8) — the
    ALPH ground-truth minting path.  ``alpha_compression`` (0 raw /
    1 lossless) and ``alpha_filtering`` (0 none / 1 fast / 2 best)
    pass through as overrides to exercise every ALPH decode branch."""
    lib = _load()
    cfg = WebPConfig()
    if not lib.WebPConfigInitInternal(C.byref(cfg), 0, float(quality), _ABI):
        raise WebPRefError("config init failed")
    cfg.exact = 1  # keep RGB under transparent pixels
    for k, v in overrides.items():
        field = "pass_" if k == "pass" else k
        if not hasattr(cfg, field):
            raise WebPRefError(f"unknown WebPConfig field {k}")
        setattr(cfg, field, v)
    if not lib.WebPValidateConfig(C.byref(cfg)):
        raise WebPRefError(f"invalid config {overrides}")
    pic = WebPPicture()
    if not lib.WebPPictureInitInternal(C.byref(pic), _ABI):
        raise WebPRefError("picture init failed")
    h, w, _ = img.shape
    pic.width = w
    pic.height = h
    pic.use_argb = 0
    raw = np.ascontiguousarray(img).tobytes()
    if not lib.WebPPictureImportRGBA(C.byref(pic), raw, w * 4):
        raise WebPRefError("picture import failed")
    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(C.byref(wr))
    pic.writer = C.cast(lib.WebPMemoryWrite, C.c_void_p)
    pic.custom_ptr = C.cast(C.byref(wr), C.c_void_p)
    ok = lib.WebPEncode(C.byref(cfg), C.byref(pic))
    try:
        if not ok:
            raise WebPRefError(f"encode failed: error_code={pic.error_code}")
        out = C.string_at(wr.mem, wr.size)
    finally:
        lib.WebPPictureFree(C.byref(pic))
        lib.WebPMemoryWriterClear(C.byref(wr))
    return out


def decode_rgba(data: bytes) -> np.ndarray:
    """WebPDecodeRGBA -> HxWx4 uint8 (static files only — this libwebp
    has no demuxer, which is exactly why the pure ANMF path exists)."""
    lib = _load()
    w = C.c_int(0)
    h = C.c_int(0)
    ptr = lib.WebPDecodeRGBA(data, len(data), C.byref(w), C.byref(h))
    if not ptr:
        raise WebPRefError("WebPDecodeRGBA failed")
    try:
        buf = C.string_at(ptr, w.value * h.value * 4)
    finally:
        lib.WebPFree(C.cast(ptr, C.c_void_p))
    return np.frombuffer(buf, dtype=np.uint8).reshape(h.value, w.value, 4).copy()


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    for kw in ({}, {"filter_type": 0}, {"partitions": 2},
               {"filter_sharpness": 5}, {"segments": 1}, {"method": 0}):
        data = encode_rgb(img, 60.0, **kw)
        print(kw, len(data), "bytes")
