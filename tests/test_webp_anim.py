"""Animated WebP + ALPH alpha chunk — libwebp parity + mux round-trip.

Ground-truth strategy: this box's libwebp has NO demuxer, so there is
no system decoder for full animations — but every building block is
validated independently: VP8L payloads round-trip bit-exact (pure
encoder ⇄ pure decoder, and vs libwebp elsewhere), lossy VP8 is
bit-exact vs libwebp (``test_vp8_pure.py``), and the ALPH chunk decode
is asserted here bit-exact against ``WebPDecodeRGBA`` on
libwebp-encoded RGBA stills across raw/lossless compression × all
filtering modes.  Compositing (blend/dispose) is asserted against
hand-built canvases per the documented contract in
``multimodal/webp_anim.py``.
"""

from __future__ import annotations

import importlib.util
import pathlib
import struct

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.webp import decode_webp
from image_matadata_batchprocessing_aws_spark.multimodal.webp_anim import (
    compose_webp_frames,
    decode_alph,
    encode_webp_animation,
    parse_webp_frames,
)

_TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"


def _libwebp():
    spec = importlib.util.spec_from_file_location("libwebp_ref", _TOOLS / "libwebp_ref.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _grad_rgba(h: int, w: int) -> np.ndarray:
    img = np.empty((h, w, 4), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :, 0] = (xx * 3) % 256
    img[:, :, 1] = (yy * 5) % 256
    img[:, :, 2] = ((xx + yy) * 2) % 256
    alpha = np.full((h, w), 255, np.uint8)
    alpha[5 : h // 2, 8 : w // 2] = 0
    alpha[h // 2 + 2 :, :] = (xx[h // 2 + 2 :, :] * 4 % 256).astype(np.uint8)
    img[:, :, 3] = alpha
    return img


def test_alph_decode_matches_libwebp_all_modes():
    ref = _libwebp()
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    radial = np.empty((h, w, 4), np.uint8)
    radial[:, :, :3] = _grad_rgba(h, w)[:, :, :3]
    radial[:, :, 3] = (np.sqrt((xx - 28) ** 2 + (yy - 20) ** 2) * 7).astype(np.uint8)
    modes_seen = set()  # (filter, compression) pairs libwebp produced
    for img in (_grad_rgba(h, w), radial):
        for comp in (0, 1):
            for filt in (0, 1, 2):
                data = ref.encode_rgba(img, 80.0, alpha_compression=comp, alpha_filtering=filt)
                sysdec = ref.decode_rgba(data)
                _, frames = parse_webp_frames(data)
                assert len(frames) == 1
                assert np.array_equal(frames[0].rgb, sysdec[:, :, :3])
                assert np.array_equal(frames[0].alpha, sysdec[:, :, 3])
                pos = 12
                while pos + 8 <= len(data):
                    tag = data[pos : pos + 4]
                    (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
                    if tag == b"ALPH":
                        modes_seen.add(((data[pos + 8] >> 2) & 0x03, data[pos + 8] & 0x03))
                    pos += 8 + size + (size & 1)
    # raw + lossless compression, plus a real nonzero filter, all
    # system-validated (filters 2/3 are synthetic-round-trip tested —
    # libwebp's heuristic never picks them on these planes)
    assert {(0, 0), (0, 1), (1, 1)} <= modes_seen, modes_seen


def test_alph_unfilter_methods_round_trip_synthetic():
    # exercise every filter method explicitly (libwebp picks its own):
    # filter forward per the spec recurrences, then decode raw-compressed
    rng = np.random.default_rng(9)
    plane = rng.integers(0, 256, (13, 17)).astype(np.uint8)
    h, w = plane.shape

    def filt_forward(p: np.ndarray, method: int) -> np.ndarray:
        out = p.astype(np.int64).copy()
        if method == 1:  # horizontal: pred = left, row-start pred = above
            out[:, 1:] = p[:, 1:].astype(np.int64) - p[:, :-1]
            out[1:, 0] = p[1:, 0].astype(np.int64) - p[:-1, 0]
        elif method == 2:  # vertical (row 0 horizontal)
            out[0, 1:] = p[0, 1:].astype(np.int64) - p[0, :-1]
            out[1:, :] = p[1:, :].astype(np.int64) - p[:-1, :]
        elif method == 3:  # gradient (row 0 horizontal)
            out[0, 1:] = p[0, 1:].astype(np.int64) - p[0, :-1]
            for y in range(1, h):
                for x in range(w):
                    left = int(p[y, x - 1]) if x else int(p[y - 1, 0])
                    top = int(p[y - 1, x])
                    tl = int(p[y - 1, x - 1]) if x else int(p[y - 1, 0])
                    g = min(255, max(0, left + top - tl))
                    out[y, x] = int(p[y, x]) - g
        return (out % 256).astype(np.uint8)

    for method in (0, 1, 2, 3):
        body = bytes([method << 2]) + filt_forward(plane, method).tobytes()
        assert np.array_equal(decode_alph(body, w, h), plane), method


def test_anim_mux_parse_compose_round_trip():
    ref = _libwebp()
    rng = np.random.default_rng(5)
    cw, ch = 48, 32
    f0 = np.dstack(
        [rng.integers(0, 256, (ch, cw, 3)).astype(np.uint8), np.full((ch, cw), 255, np.uint8)]
    )
    f1 = np.dstack(
        [
            rng.integers(0, 256, (10, 14, 3)).astype(np.uint8),
            np.where(rng.random((10, 14)) < 0.5, 0, 255).astype(np.uint8),
        ]
    )
    f2 = np.dstack(
        [rng.integers(0, 256, (8, 12, 3)).astype(np.uint8), rng.integers(0, 256, (8, 12)).astype(np.uint8)]
    )
    img3 = _grad_rgba(16, 24)
    lossy = ref.encode_rgba(img3, 80.0, alpha_compression=1, alpha_filtering=1)
    sysdec3 = ref.decode_rgba(lossy)
    pos, inner = 12, b""
    while pos + 8 <= len(lossy):
        tag = lossy[pos : pos + 4]
        (size,) = struct.unpack("<I", lossy[pos + 4 : pos + 8])
        if tag in (b"ALPH", b"VP8 ", b"VP8L"):
            inner += lossy[pos : pos + 8 + size] + (b"\x00" if size & 1 else b"")
        pos += 8 + size + (size & 1)

    frames = [
        dict(rgba=f0, x=0, y=0, duration_ms=100, blend=False, dispose_bg=False),
        dict(rgba=f1, x=4, y=6, duration_ms=50, blend=True, dispose_bg=True),
        dict(rgba=f2, x=20, y=10, duration_ms=70, blend=False, dispose_bg=False),
        dict(payload=inner, w=24, h=16, x=12, y=8, duration_ms=30, blend=False, dispose_bg=False),
    ]
    data = encode_webp_animation(frames, cw, ch, bg_rgba=(9, 18, 27, 255), loop_count=2)
    canvas, parsed = parse_webp_frames(data)
    assert (canvas.width, canvas.height, canvas.loop_count) == (cw, ch, 2)
    assert canvas.bg_rgba == (9, 18, 27, 255)
    assert [f.duration_ms for f in parsed] == [100, 50, 70, 30]
    assert [f.blend for f in parsed] == [False, True, False, False]
    assert [f.dispose_bg for f in parsed] == [False, True, False, False]
    assert np.array_equal(parsed[0].rgb, f0[:, :, :3])
    assert np.array_equal(parsed[1].alpha, f1[:, :, 3])
    assert np.array_equal(parsed[3].rgb, sysdec3[:, :, :3])
    assert np.array_equal(parsed[3].alpha, sysdec3[:, :, 3])

    comp = compose_webp_frames(data)
    c0 = comp[0][0]
    assert np.array_equal(c0[:, :, :3], f0[:, :, :3]) and (c0[:, :, 3] == 255).all()
    exp1 = c0.copy()
    m = f1[:, :, 3] == 255
    exp1[6:16, 4:18, :3][m] = f1[:, :, :3][m]
    assert np.array_equal(comp[1][0], exp1)
    exp2 = exp1.copy()
    exp2[6:16, 4:18] = (9, 18, 27, 255)  # dispose-to-background
    exp2[10:18, 20:32, :3] = f2[:, :, :3]
    exp2[10:18, 20:32, 3] = f2[:, :, 3]  # overwrite, not blend
    assert np.array_equal(comp[2][0], exp2)
    exp3 = exp2.copy()
    exp3[8:24, 12:36, :3] = sysdec3[:, :, :3]
    exp3[8:24, 12:36, 3] = sysdec3[:, :, 3]
    assert np.array_equal(comp[3][0], exp3)

    # decode_webp routes animations to the first composited frame, RGB
    assert np.array_equal(decode_webp(data), c0[:, :, :3])


def test_fractional_alpha_blend_formula():
    # one fractional-alpha blend checked against the spec formula by hand
    base = np.full((2, 2, 4), (100, 150, 200, 255), np.uint8)
    over = np.full((2, 2, 4), (20, 30, 40, 128), np.uint8)
    data = encode_webp_animation(
        [
            dict(rgba=base, x=0, y=0, duration_ms=10, blend=False),
            dict(rgba=over, x=0, y=0, duration_ms=10, blend=True),
        ],
        2, 2, bg_rgba=(0, 0, 0, 0),
    )
    comp = compose_webp_frames(data)
    sa, da = 128 / 255.0, 1.0
    oa = sa + da * (1 - sa)
    want_r = round((20 * sa + 100 * da * (1 - sa)) / oa)
    got = comp[1][0]
    assert got[0, 0, 0] == want_r
    assert got[0, 0, 3] == 255
