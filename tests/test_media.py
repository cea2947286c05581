"""Audio/video multimodal plumbing: UDTF fan-out shape, typed metadata,
determinism, error isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.multimodal.media import (
    FRAME_SIZE,
    N_AUDIO_FEATURES,
    extract_audio_features,
    sample_video_frames,
)


def _videos(spark):
    return spark.createDataFrame(
        [
            ("a.mp4", b"x" * 5000),   # 5 fake frames -> idx 0 sampled w/ every_n=10... see test
            ("b.mp4", b"y" * 30000),  # 30 fake frames
            ("bad.mp4", b""),         # decode error row
        ],
        "file_name string, content binary",
    )


def test_frame_sampling_fanout_and_errors(spark):
    out = sample_video_frames(_videos(spark), every_n=10, max_frames=2).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r.file_name, []).append(r)
    # 5 frames, every 10th -> just frame 0; 30 frames -> 0,10 (max_frames=2 caps)
    assert [r.frame_idx for r in by_file["a.mp4"]] == [0]
    assert [r.frame_idx for r in sorted(by_file["b.mp4"], key=lambda r: r.frame_idx)] == [0, 10]
    assert all(len(r.frame) == FRAME_SIZE * FRAME_SIZE * 3 for r in by_file["b.mp4"])
    (bad,) = by_file["bad.mp4"]
    assert bad.decode_error and bad.frame is None  # kept + labeled, not dropped


def test_frame_sampling_deterministic(spark):
    a = sample_video_frames(_videos(spark)).orderBy("file_name", "frame_idx").collect()
    b = sample_video_frames(_videos(spark)).orderBy("file_name", "frame_idx").collect()
    assert a == b


def test_audio_features_shape_and_metadata(spark):
    audio = spark.createDataFrame(
        [("a.wav", b"z" * 32000), ("bad.wav", b"")], "file_name string, content binary"
    )
    rows = {r.file_name: r for r in extract_audio_features(audio).collect()}
    ok = rows["a.wav"]
    assert ok.n_features == N_AUDIO_FEATURES and len(ok.features) == N_AUDIO_FEATURES
    assert ok.duration_s == 2.0  # 32000 bytes @ 16kB/s
    assert all(0.0 <= v <= 1.0 for v in ok.features)
    assert rows["bad.wav"].decode_error


def test_real_video_codec_isolates_non_avi(spark):
    """use_real_codec=True routes to the real MJPEG-AVI decoder now
    (multimodal/video.py); non-AVI blobs land per row in decode_error
    instead of raising."""
    out = sample_video_frames(_videos(spark), use_real_codec=True).collect()
    assert out and all(r.decode_error for r in out)


def test_real_audio_codec_decodes_wav_and_isolates_the_rest(spark):
    """use_real_codec=True REALLY decodes WAV/PCM now (multimodal/
    audio.py); non-WAV blobs land per row in decode_error."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        encode_wav_pcm16,
    )

    rate = 8000
    t = np.arange(rate)  # 1 s
    sine = np.round(16000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int64)
    df = spark.createDataFrame(
        [
            ("tone.wav", bytearray(encode_wav_pcm16(sine, rate))),
            ("notaudio.mp3", bytearray(b"\xff\xfb\x90notawav")),
        ],
        "file_name string, content binary",
    )
    rows = {r.file_name: r for r in extract_audio_features(df, use_real_codec=True).collect()}
    ok = rows["tone.wav"]
    assert ok.decode_error is None and ok.duration_s == 1.0
    assert ok.n_features == 16
    rms, zcr, peak, centroid = ok.features[:4]
    assert abs(rms - (16000 / 32768) / 2**0.5) < 0.01  # sine RMS = A/sqrt(2)
    assert abs(zcr - 2 * 440 / rate) < 0.01  # 2f crossings/s, rate pairs/s
    assert abs(centroid - 440.0) < 5.0  # pure tone -> spectral centroid at f
    bad = rows["notaudio.mp3"]
    assert bad.features is None and "RIFF" in bad.decode_error


def test_audio_sniffer_rejects_non_wav_and_non_canonical(spark):
    from pyspark.sql import functions as F

    from image_matadata_batchprocessing_aws_spark.multimodal.media import (
        sniff_audio_meta,
    )

    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"\x00" * 40),  # PNG magic
        (2, b"RIFF" + b"\x00" * 4 + b"WAVE" + b"JUNK" + b"\x00" * 28),  # no fmt chunk
        (3, b"\x00" * 10),  # short garbage
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: (r.audio_format, r.audio_channels) for r in
           sniff_audio_meta(df).collect()}
    assert got[1] == ("unknown", None)
    assert got[2] == ("wav", None)  # labeled wav, derived fields nulled
    assert got[3] == ("unknown", None)


def test_video_sniffer_identifies_containers_and_guards_brand(spark):
    from image_matadata_batchprocessing_aws_spark.multimodal.media import sniff_video_meta

    rows = [
        (0, bytes.fromhex("00000020") + b"ftypisom" + bytes(4)),
        (1, b"RIFF" + bytes.fromhex("24000000") + b"AVI " + bytes(4)),
        (2, bytes.fromhex("1A45DFA3") + bytes(12)),
        (3, b"\x00" * 16),  # unknown magic
        (4, bytes.fromhex("00000018") + b"ftyp" + bytes.fromhex("00010203") + bytes(4)),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: r for r in sniff_video_meta(df).collect()}
    assert got[0].video_format == "mp4" and got[0].video_brand == "isom"
    assert got[0].video_ftyp_bytes == 32
    assert got[1].video_format == "avi" and got[1].video_brand is None
    assert got[2].video_format == "mkv"
    assert got[3].video_format == "unknown"
    # unprintable brand bytes -> null brand, format still mp4
    assert got[4].video_format == "mp4" and got[4].video_brand is None
