"""Pure VP8 (lossy WebP) decoder vs the system libwebp, bit-exact.

Three layers, mirroring the arithmetic-JPEG validation strategy:
- committed fixtures (minted by libwebp's advanced encoder across the
  keyframe feature space: simple + normal loop filter, sharpness,
  8 token partitions, 4-segment maps, odd dimensions) decode to the
  sha256-pinned RGB the SYSTEM decoder produced at minting time — no
  libwebp needed at test time;
- when the system libwebp is present, fresh randomized round-trips are
  compared plane-by-plane (``WebPDecodeYUV``) and as RGB
  (``WebPDecodeRGB``) — an independent-implementation check on inputs
  the fixtures can't have anticipated;
- malformed-stream error paths raise ``ImageFormatError`` (per-row
  isolation upstream depends on that).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark.multimodal import vp8, webp_sys
from image_matadata_batchprocessing_aws_spark.multimodal.codecs import ImageFormatError
from image_matadata_batchprocessing_aws_spark.multimodal.webp import decode_webp

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "vp8")
MANIFEST = json.load(open(os.path.join(FIXDIR, "manifest.json")))


def _vp8_chunk(content: bytes) -> bytes:
    import struct

    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


@pytest.mark.parametrize("name,w,h,rs,gs,bs,sha", MANIFEST)
def test_fixture_decodes_bit_exact(name, w, h, rs, gs, bs, sha):
    content = open(os.path.join(FIXDIR, name), "rb").read()
    rgb = decode_webp(content)
    assert rgb.shape == (h, w, 3)
    assert hashlib.sha256(rgb.tobytes()).hexdigest() == sha
    assert [int(rgb[:, :, c].astype(np.int64).sum()) for c in range(3)] == [
        rs, gs, bs,
    ]


def test_truncated_and_malformed_raise():
    content = open(os.path.join(FIXDIR, MANIFEST[0][0]), "rb").read()
    chunk = _vp8_chunk(content)
    with pytest.raises(ImageFormatError):
        vp8.decode_vp8_frame(chunk[:5])
    with pytest.raises(ImageFormatError):
        vp8.decode_vp8_frame(b"\x01" + chunk[1:])  # interframe bit set
    bad = bytearray(chunk)
    bad[3:6] = b"\x00\x00\x00"  # start code
    with pytest.raises(ImageFormatError):
        vp8.decode_vp8_frame(bytes(bad))


@pytest.mark.skipif(not webp_sys.available(), reason="no system libwebp")
def test_random_roundtrips_match_system_decoder():
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:45, 0:59]
    imgs = [
        rng.integers(0, 256, (29, 43, 3), dtype=np.uint8),
        (
            np.stack(
                [
                    np.sin(xx / 6) * 70 + np.cos(yy / 9) * 50 + 128,
                    np.cos(xx / 11) * 90 + 128,
                    np.sin(yy / 4) * 60 + 120,
                ],
                -1,
            )
        ).clip(0, 255).astype(np.uint8),
    ]
    for img in imgs:
        for q in (25.0, 65.0, 95.0):
            data = webp_sys.encode_webp_lossy_sys(img, q)
            chunk = _vp8_chunk(data)
            gy, gu, gv = webp_sys.decode_webp_yuv_sys(data)
            py, pu, pv = vp8.decode_vp8_frame(chunk)
            assert np.array_equal(gy, py)
            assert np.array_equal(gu, pu)
            assert np.array_equal(gv, pv)
            assert np.array_equal(
                webp_sys.decode_webp_sys(data), vp8.decode_vp8_rgb(chunk)
            )


@pytest.mark.skipif(not webp_sys.available(), reason="no system libwebp")
def test_advanced_features_match_system_decoder():
    try:
        from tools.libwebp_ref import encode_rgb
    except Exception:
        pytest.skip("advanced encoder binding unavailable")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 66, 3), dtype=np.uint8)
    for kw in (
        {"filter_type": 0, "filter_strength": 70},
        {"partitions": 2, "method": 0},
        {"filter_sharpness": 6, "filter_strength": 90},
        {"segments": 3},
    ):
        data = encode_rgb(img, 45.0, **kw)
        assert np.array_equal(
            webp_sys.decode_webp_sys(data), decode_webp(data)
        )


def test_tables_regenerate_bit_identical(tmp_path):
    # the committed generated module must be reproducible from the
    # system binary (provenance check for the extracted constants)
    if not webp_sys.available():
        pytest.skip("no system libwebp")
    import subprocess

    src = "image_matadata_batchprocessing_aws_spark/multimodal/vp8_tables.py"
    before = open(os.path.join("/root/repo", src)).read()
    r = subprocess.run(
        [sys.executable, "tools/extract_vp8_tables.py"],
        cwd="/root/repo", capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert open(os.path.join("/root/repo", src)).read() == before


def test_corrupted_streams_never_hang_or_crash():
    # per-row isolation upstream catches ANY exception; what a decoder
    # must never do with corrupt input is loop forever or return
    # garbage SHAPES.  Flip bytes across the stream (header, partition
    # table, token data) and require: decode completes promptly and
    # either raises or returns planes of the advertised geometry.
    content = open(os.path.join(FIXDIR, MANIFEST[0][0]), "rb").read()
    chunk = bytearray(_vp8_chunk(content))
    rng = np.random.default_rng(3)
    for _ in range(25):
        bad = bytearray(chunk)
        for _ in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        try:
            y, u, v = vp8.decode_vp8_frame(bytes(bad))
        except Exception:
            continue  # any typed failure is fine — isolation catches it
        # a corrupt dim byte may change the geometry; it must stay
        # internally consistent (chroma = ceil-half of luma)
        assert u.shape == v.shape
        assert u.shape == ((y.shape[0] + 1) // 2, (y.shape[1] + 1) // 2)
