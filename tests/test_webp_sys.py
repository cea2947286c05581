"""Lossy-WebP (VP8) via the system libwebp ctypes seam: the committed
fixtures pin libwebp's own decode sums (this validates the PLUMBING —
sniff, dispatch, decode, Arrow isolation — the codec itself is the
system library, stated honestly in webp_sys.py's docstring)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.webp_sys import (
    WebPSysError,
    available,
    decode_webp_sys,
    encode_webp_lossy_sys,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "webp_lossy")

needs_libwebp = pytest.mark.skipif(not available(), reason="no system libwebp")


@needs_libwebp
def test_lossy_fixtures_decode_to_pinned_sums():
    manifest = json.load(open(os.path.join(FIXDIR, "manifest.json")))
    assert len(manifest) == 3
    for name, w, h, rs, gs, bs in manifest:
        data = open(os.path.join(FIXDIR, name), "rb").read()
        assert data[12:16] == b"VP8 "  # lossy payload
        img = decode_webp_sys(data)
        assert img.shape == (h, w, 3)
        got = [int(img[:, :, c].astype(np.int64).sum()) for c in range(3)]
        assert got == [rs, gs, bs], name


@needs_libwebp
def test_real_decode_dispatch_routes_lossy_to_system_codec():
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    data = open(os.path.join(FIXDIR, "l_solid.webp"), "rb").read()
    img = _real_decode("l_solid.webp", data)
    assert np.array_equal(img, decode_webp_sys(data))
    # lossless VP8L still goes through the PURE decoder (webp.py)
    from image_matadata_batchprocessing_aws_spark.multimodal.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    src = np.full((8, 8, 3), (10, 20, 30), np.uint8)
    vp8l = encode_webp_lossless(src)
    assert np.array_equal(_real_decode("x.webp", vp8l), src)
    assert np.array_equal(decode_webp(vp8l), src)


@needs_libwebp
def test_lossy_roundtrip_quality_monotone():
    rng = np.random.default_rng(5)
    img = np.ascontiguousarray(
        (rng.integers(0, 8, (32, 32, 3)) * 32).astype(np.uint8)
    )
    errs = []
    for q in (30.0, 95.0):
        out = decode_webp_sys(encode_webp_lossy_sys(img, q))
        errs.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
    assert errs[1] <= errs[0]  # higher quality, no worse reconstruction


def test_bad_stream_raises_typed():
    if not available():
        pytest.skip("no system libwebp")
    with pytest.raises(WebPSysError):
        decode_webp_sys(b"RIFF\x00\x00\x00\x00WEBPVP8 garbagegarbage")
