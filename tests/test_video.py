"""MJPEG-in-AVI codec tests (multimodal/video.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    jpeg_reference_pipeline,
)
from image_matadata_batchprocessing_aws_spark.multimodal.video import (
    VideoFormatError,
    decode_video_frames,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
)


def _solid(v, h=8, w=8):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = v
    return img


def test_container_roundtrip_and_headers():
    frames = [_solid((i * 10, 0, 255 - i * 10)) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=25)
    meta, payloads = parse_avi_mjpeg(avi)
    assert meta["n_frames"] == 5 and meta["fps"] == 25.0
    assert (meta["width"], meta["height"]) == (8, 8)
    assert len(payloads) == 5
    assert all(p[:2] == b"\xff\xd8" for p in payloads)


def test_frames_decode_to_reference_pixels():
    """Solid 8x8 frames reconstruct exactly to the bitstream-free
    reference pipeline's values (one DCT block, no subsampling)."""
    values = [(200, 30, 64), (0, 0, 0), (251, 17, 99)]
    avi = encode_avi_mjpeg([_solid(v) for v in values], fps=10, quality=75)
    _meta, payloads = parse_avi_mjpeg(avi)
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import decode_jpeg

    for v, p in zip(values, payloads):
        exp = jpeg_reference_pipeline(_solid(v), quality=75)
        assert np.array_equal(decode_jpeg(p), exp)


def test_error_contract():
    with pytest.raises(VideoFormatError, match="AVI"):
        parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(VideoFormatError, match="truncated"):
        parse_avi_mjpeg(encode_avi_mjpeg([_solid((1, 2, 3))])[:-7])
    with pytest.raises(VideoFormatError, match="no video frame"):
        empty = b"AVI " + b"LIST" + struct.pack("<I", 4) + b"movi"
        parse_avi_mjpeg(b"RIFF" + struct.pack("<I", len(empty)) + empty)


def test_spark_stage_samples_and_isolates(spark):
    frames = [_solid((i, i, i)) for i in range(0, 60, 3)]  # 20 frames
    df = spark.createDataFrame(
        [
            ("clip.avi", bytearray(encode_avi_mjpeg(frames, fps=5))),
            ("h264.avi", bytearray(b"RIFF\x08\x00\x00\x00AVI LIST")),
        ],
        "file_name string, content binary",
    )
    out = decode_video_frames(df, every_n=7, max_frames=2, normalize=False).collect()
    ok = sorted(
        (r for r in out if r.file_name == "clip.avi" and r.decode_error is None),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in ok] == [0, 7]  # every 7th, capped at 2
    assert all(r.height == 8 and r.width == 8 and len(r.frame) == 192 for r in ok)
    exp0 = jpeg_reference_pipeline(_solid((0, 0, 0)), quality=75)
    assert np.allclose(np.array(ok[0].frame).reshape(8, 8, 3), exp0)
    bad = [r for r in out if r.file_name == "h264.avi"]
    assert len(bad) == 1 and bad[0].decode_error


def test_media_entry_point_routes_real(spark):
    from image_matadata_batchprocessing_aws_spark.multimodal.media import (
        sample_video_frames,
    )

    avi = encode_avi_mjpeg([_solid((9, 9, 9))] * 3)
    df = spark.createDataFrame(
        [("v.avi", bytearray(avi))], "file_name string, content binary"
    )
    out = sample_video_frames(df, every_n=1, max_frames=2, use_real_codec=True).collect()
    good = [r for r in out if r.decode_error is None]
    assert len(good) == 2 and all(r.height == 8 for r in good)
