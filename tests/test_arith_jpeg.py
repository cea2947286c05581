"""Arithmetic-coded JPEG (SOF9): the QM decoder against INDEPENDENT
ground truth — bitstreams produced by the system libjpeg-turbo via
ctypes (tools/libjpeg_ref.py).  Entropy coding is lossless, so a
same-quality Huffman encoding of the same image must decode to
bit-identical pixels through our own Huffman path; committed fixtures
keep the check alive on machines without libjpeg."""

from __future__ import annotations

import ctypes.util
import json
import os
import subprocess

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    _QM_TABLE,
    ImageFormatError,
    decode_jpeg,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "arith")

_HAS_LIBJPEG = ctypes.util.find_library("jpeg") is not None or os.path.exists(
    "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
)
needs_libjpeg = pytest.mark.skipif(not _HAS_LIBJPEG, reason="no system libjpeg")


def _ref_encode(img, q, mode, arith, rst=0, subsamp="444", prog=False):
    code = f"""
import sys; sys.path.insert(0,'/root/repo/tools')
import libjpeg_ref as L
raw = sys.stdin.buffer.read()
data = L.encode({img.shape[1]}, {img.shape[0]}, {q}, '{mode}', raw,
                arith={arith}, restart_rows={rst}, subsamp='{subsamp}',
                progressive={prog})
sys.stdout.buffer.write(data)
"""
    p = subprocess.run(
        ["python", "-c", code], input=img.tobytes(), capture_output=True
    )
    assert p.returncode == 0, p.stderr.decode()[:500]
    return p.stdout


def test_committed_arith_fixtures_decode_to_pinned_sums():
    manifest = json.load(open(os.path.join(FIXDIR, "manifest.json")))
    assert len(manifest) == 6
    for name, w, h, rs, gs, bs in manifest:
        data = open(os.path.join(FIXDIR, name), "rb").read()
        sof = b"\xff\xca" if name == "a_rgb_prog.jpg" else b"\xff\xc9"
        assert data[:2] == b"\xff\xd8" and sof in data
        img = decode_jpeg(data)
        assert img.shape == (h, w, 3)
        got = [int(img[:, :, c].astype(np.int64).sum()) for c in range(3)]
        assert got == [rs, gs, bs], name


@needs_libjpeg
def test_qm_table_matches_system_libjpeg():
    out = subprocess.run(
        ["python", "tools/libjpeg_ref.py", "aritab"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[:300]
    packed = [int(v) for v in out.stdout.strip().split(",")]
    assert len(packed) == 114
    for i, v in enumerate(packed):
        qe, nm, nlraw = v >> 16, (v >> 8) & 0xFF, v & 0xFF
        assert _QM_TABLE[i] == (qe, nm, nlraw & 0x7F, nlraw >> 7), i


@needs_libjpeg
@pytest.mark.parametrize("quality", [60, 90])
def test_arith_equals_huffman_across_shapes(quality):
    rng = np.random.default_rng(quality)
    cases = [
        (np.full((8, 8), 200, np.uint8), "gray", 0, "444"),
        (rng.integers(0, 256, (24, 24), dtype=np.uint8), "gray", 0, "444"),
        (rng.integers(0, 256, (16, 24, 3), dtype=np.uint8), "rgb", 0, "444"),
        (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8), "rgb", 0, "420"),
        (rng.integers(0, 256, (40, 40), dtype=np.uint8), "gray", 1, "444"),
    ]
    for img, mode, rst, ss in cases:
        ph = decode_jpeg(_ref_encode(img, quality, mode, False, rst, ss))
        pa = decode_jpeg(_ref_encode(img, quality, mode, True, rst, ss))
        assert np.array_equal(ph, pa), (img.shape, mode, rst, ss)
        # progressive arithmetic (SOF10): same coefficients again
        pp = decode_jpeg(_ref_encode(img, quality, mode, True, rst, ss, prog=True))
        assert np.array_equal(ph, pp), ("prog", img.shape, mode, rst, ss)


def test_lossless_jpeg_still_rejected():
    data = bytearray(
        open(os.path.join(FIXDIR, "a_gray_noise.jpg"), "rb").read()
    )
    i = data.find(b"\xff\xc9")
    data[i + 1] = 0xCB  # SOF11: lossless
    with pytest.raises(ImageFormatError, match="lossless"):
        decode_jpeg(bytes(data))
