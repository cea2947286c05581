"""System giflib (libgif.so.7) ctypes harness — independent ground
truth for the pure animated-GIF parser (`multimodal/gif_anim.py`).

Same posture as ``tools/libwebp_ref.py`` / ``tools/libjpeg_ref.py``:
the system library is test-only tooling bound per the public
``gif_lib.h`` (giflib 5.x) layout; the decoder itself never touches
it.  ``DGifSlurp`` exposes per-frame index rasters (already in DISPLAY
order — giflib 5.x de-interlaces inside DGifSlurp, so interlaced
frames compare directly against ``parse_gif_frames``), image
descriptors, color tables, and ``DGifSavedExtensionToGCB`` the
per-frame graphic-control blocks;
there is no compositor in giflib, so compositing semantics are
validated against the documented spec contract instead.
"""

from __future__ import annotations

import ctypes as C

import numpy as np


class GifRefError(RuntimeError):
    pass


class _GifColorType(C.Structure):
    _fields_ = [("Red", C.c_ubyte), ("Green", C.c_ubyte), ("Blue", C.c_ubyte)]


class _ColorMapObject(C.Structure):
    _fields_ = [
        ("ColorCount", C.c_int),
        ("BitsPerPixel", C.c_int),
        ("SortFlag", C.c_bool),
        ("Colors", C.POINTER(_GifColorType)),
    ]


class _GifImageDesc(C.Structure):
    _fields_ = [
        ("Left", C.c_int),
        ("Top", C.c_int),
        ("Width", C.c_int),
        ("Height", C.c_int),
        ("Interlace", C.c_bool),
        ("ColorMap", C.POINTER(_ColorMapObject)),
    ]


class _ExtensionBlock(C.Structure):
    _fields_ = [
        ("ByteCount", C.c_int),
        ("Bytes", C.POINTER(C.c_ubyte)),
        ("Function", C.c_int),
    ]


class _SavedImage(C.Structure):
    _fields_ = [
        ("ImageDesc", _GifImageDesc),
        ("RasterBits", C.POINTER(C.c_ubyte)),
        ("ExtensionBlockCount", C.c_int),
        ("ExtensionBlocks", C.POINTER(_ExtensionBlock)),
    ]


class _GifFileType(C.Structure):
    _fields_ = [
        ("SWidth", C.c_int),
        ("SHeight", C.c_int),
        ("SColorResolution", C.c_int),
        ("SBackGroundColor", C.c_int),
        ("AspectByte", C.c_ubyte),
        ("SColorMap", C.POINTER(_ColorMapObject)),
        ("ImageCount", C.c_int),
        ("Image", _GifImageDesc),
        ("SavedImages", C.POINTER(_SavedImage)),
        ("ExtensionBlockCount", C.c_int),
        ("ExtensionBlocks", C.POINTER(_ExtensionBlock)),
        ("Error", C.c_int),
        ("UserData", C.c_void_p),
        ("Private", C.c_void_p),
    ]


class _GCB(C.Structure):
    _fields_ = [
        ("DisposalMode", C.c_int),
        ("UserInputFlag", C.c_bool),
        ("DelayTime", C.c_int),
        ("TransparentColor", C.c_int),
    ]


_INPUT_FUNC = C.CFUNCTYPE(C.c_int, C.POINTER(_GifFileType), C.POINTER(C.c_ubyte), C.c_int)

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = C.CDLL("libgif.so.7")
        lib.DGifOpen.restype = C.POINTER(_GifFileType)
        lib.DGifOpen.argtypes = [C.c_void_p, _INPUT_FUNC, C.POINTER(C.c_int)]
        lib.DGifSlurp.restype = C.c_int
        lib.DGifSlurp.argtypes = [C.POINTER(_GifFileType)]
        lib.DGifCloseFile.restype = C.c_int
        lib.DGifCloseFile.argtypes = [C.POINTER(_GifFileType), C.POINTER(C.c_int)]
        lib.DGifSavedExtensionToGCB.restype = C.c_int
        lib.DGifSavedExtensionToGCB.argtypes = [
            C.POINTER(_GifFileType),
            C.c_int,
            C.POINTER(_GCB),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def decode_gif_ref(content: bytes) -> dict:
    """DGifSlurp a GIF byte string -> screen + per-frame dicts.

    Raster arrays are in DISPLAY order — DGifSlurp de-interlaces
    internally (4-pass loop over InterlacedOffset/InterlacedJumps), so
    interlaced frames compare directly against the pure parser's
    de-interlaced output.  Palettes are the effective (local else
    global) table; GCB fields use giflib's conventions (``disposal``
    0..3, ``transparent`` -1 -> None).
    """
    lib = _load()
    data = {"buf": content, "pos": 0}

    def read_cb(_gif, out, want):
        pos = data["pos"]
        chunk = data["buf"][pos : pos + want]
        C.memmove(out, chunk, len(chunk))
        data["pos"] = pos + len(chunk)
        return len(chunk)

    cb = _INPUT_FUNC(read_cb)
    err = C.c_int(0)
    gif = lib.DGifOpen(None, cb, C.byref(err))
    if not gif:
        raise GifRefError(f"DGifOpen failed (err={err.value})")
    try:
        if lib.DGifSlurp(gif) != 1:
            raise GifRefError(f"DGifSlurp failed (err={gif.contents.Error})")
        g = gif.contents

        def palette(cmap) -> np.ndarray | None:
            if not cmap:
                return None
            n = cmap.contents.ColorCount
            cols = cmap.contents.Colors
            arr = np.empty((n, 3), dtype=np.uint8)
            for i in range(n):
                arr[i] = (cols[i].Red, cols[i].Green, cols[i].Blue)
            return arr

        gct = palette(g.SColorMap)
        frames = []
        for fi in range(g.ImageCount):
            si = g.SavedImages[fi]
            d = si.ImageDesc
            n_px = d.Width * d.Height
            raster = np.ctypeslib.as_array(si.RasterBits, shape=(n_px,)).copy()
            gcb = _GCB()
            disposal, delay, transparent = 0, 0, None
            if lib.DGifSavedExtensionToGCB(gif, fi, C.byref(gcb)) == 1:
                disposal = gcb.DisposalMode
                delay = gcb.DelayTime
                transparent = None if gcb.TransparentColor < 0 else gcb.TransparentColor
            frames.append(
                {
                    "x": d.Left,
                    "y": d.Top,
                    "w": d.Width,
                    "h": d.Height,
                    "raster": raster.reshape(d.Height, d.Width),
                    "interlaced": bool(d.Interlace),
                    "palette": palette(d.ColorMap) if d.ColorMap else gct,
                    "local_palette": bool(d.ColorMap),
                    "disposal": disposal,
                    "delay_cs": delay,
                    "transparent": transparent,
                }
            )
        return {
            "width": g.SWidth,
            "height": g.SHeight,
            "bg_index": g.SBackGroundColor,
            "frames": frames,
        }
    finally:
        err2 = C.c_int(0)
        lib.DGifCloseFile(gif, C.byref(err2))
