"""WAV/PCM codec + DSP feature tests (multimodal/audio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
    AudioFormatError,
    audio_feature_vector,
    decode_wav,
    encode_wav_pcm16,
    wav_to_mono_float,
)


def test_pcm16_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, 1000, dtype=np.int64)
    got, rate = decode_wav(encode_wav_pcm16(mono, 16000))
    assert rate == 16000 and got.shape == (1000, 1)
    assert np.array_equal(got[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (500, 2), dtype=np.int64)
    got, rate = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert rate == 44100 and got.shape == (500, 2)
    assert np.array_equal(got, stereo)


def _wav(fmt_code, channels, rate, bits, data):
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_8_24_32_bit_and_float_depths():
    # 8-bit unsigned recentres to signed
    got, _ = decode_wav(_wav(1, 1, 8000, 8, bytes([0, 128, 255])))
    assert got[:, 0].tolist() == [-128, 0, 127]
    # 24-bit little-endian signed
    vals = [1, -1, (1 << 23) - 1, -(1 << 23)]
    raw = b"".join(v.to_bytes(3, "little", signed=True) for v in vals)
    got, _ = decode_wav(_wav(1, 1, 8000, 24, raw))
    assert got[:, 0].tolist() == vals
    # 32-bit int
    arr = np.array([7, -9, 2**31 - 1], dtype="<i4")
    got, _ = decode_wav(_wav(1, 1, 8000, 32, arr.tobytes()))
    assert got[:, 0].tolist() == arr.tolist()
    # float32 passes through as float64
    f = np.array([0.5, -0.25, 1.0], dtype="<f4")
    got, _ = decode_wav(_wav(3, 1, 8000, 32, f.tobytes()))
    assert got.dtype == np.float64 and np.allclose(got[:, 0], f)


def test_extra_chunks_skipped_and_errors_raised():
    # LIST chunk before data is skipped
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", 4) + struct.pack("<hh", 3, -3)
    )
    got, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert got[:, 0].tolist() == [3, -3]
    with pytest.raises(AudioFormatError, match="RIFF"):
        decode_wav(b"nope")
    with pytest.raises(AudioFormatError, match="truncated"):
        decode_wav(encode_wav_pcm16(np.arange(10), 8000)[:-5])
    with pytest.raises(AudioFormatError, match="format code"):
        decode_wav(_wav(85, 1, 8000, 16, b"\x00\x00"))  # mu-law etc.
    with pytest.raises(AudioFormatError, match="bit depth"):
        decode_wav(_wav(1, 1, 8000, 12, b"\x00\x00"))


def test_mono_downmix_scaling():
    stereo = np.array([[32767, -32767], [100, 300]], dtype=np.int64)
    got, _ = decode_wav(encode_wav_pcm16(stereo, 8000))
    mono = wav_to_mono_float(got)
    assert abs(mono[0]) < 1e-9  # opposite phases cancel
    assert abs(mono[1] - 200 / 32768) < 1e-9


def test_feature_vector_on_known_tone():
    rate = 16000
    t = np.arange(rate * 2)  # 2 s
    sine = np.round(8000 * np.sin(2 * np.pi * 1000 * t / rate)).astype(np.int64)
    duration, feats = audio_feature_vector(encode_wav_pcm16(sine, rate))
    assert duration == 2.0 and len(feats) == 16
    rms, zcr, peak, centroid, rolloff, flatness = feats[:6]
    assert abs(rms - (8000 / 32768) / 2**0.5) < 0.01
    assert abs(zcr - 2 * 1000 / rate) < 0.005
    assert abs(peak - 8000 / 32768) < 0.001
    assert abs(centroid - 1000.0) < 5.0
    assert 900.0 < rolloff < 1100.0
    assert flatness < 0.01  # pure tone: extremely peaky spectrum
    bands = feats[6:14]
    assert abs(sum(bands) - 1.0) < 1e-6
    assert bands[1] > 0.95  # 1 kHz of 8 kHz Nyquist -> second band
    assert feats[14] == 2.0 and feats[15] == 16.0


def test_wav_pcm_stats_and_frames(spark):
    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        wav_frame_features,
        wav_pcm_stats,
    )

    rate = 8000
    saw = (np.arange(rate, dtype=np.int64) * 997 % 2001) - 1000  # 1 s sawtooth
    df = spark.createDataFrame(
        [
            ("a.wav", bytearray(encode_wav_pcm16(saw, rate))),
            ("bad.wav", bytearray(b"RIFFxxxxWAVEgarbage!")),
        ],
        "file_name string, content binary",
    )
    rows = {r.file_name: r for r in wav_pcm_stats(df).collect()}
    ok = rows["a.wav"]
    assert ok.n_samples == rate and ok.sample_rate == rate and ok.channels == 1
    assert ok.sum_abs == int(np.abs(saw).sum())
    assert ok.sum_sq == int((saw * saw).sum())
    assert ok.peak == 1000
    neg = saw < 0
    assert ok.zero_crossings == int((neg[1:] != neg[:-1]).sum())
    assert rows["bad.wav"].decode_error
    frames = wav_frame_features(df, frame_ms=25, hop_ms=10).collect()
    okf = [r for r in frames if r.file_name == "a.wav" and r.decode_error is None]
    # (8000 - 200) // 80 + 1 = 98 frames
    assert len(okf) == 98
    assert okf[0].start_s == 0.0 and abs(okf[1].start_s - 0.010) < 1e-9
    assert all(0.0 <= r.rms <= 1.0 and 0.0 <= r.zcr <= 1.0 for r in okf)


# --- property tests ----------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2000),
    channels=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, channels, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int64)
    got, got_rate = decode_wav(encode_wav_pcm16(samples, rate))
    assert got_rate == rate and np.array_equal(got, samples)


def test_detect_silence_segments_runs_and_error_rows(spark):
    from image_matadata_batchprocessing_aws_spark.multimodal.audio import detect_silence_segments

    frames = spark.createDataFrame(
        [
            # a: voiced(2) -> silent(1) -> voiced(1); b: all silent
            ("a", 0, 0.5), ("a", 1, 0.3), ("a", 2, 0.001), ("a", 3, 0.9),
            ("b", 0, 0.0), ("b", 1, 0.005),
            # decode-error row must be ignored
            ("c", None, None),
        ],
        "file_name string, frame_idx int, rms double",
    )
    out = detect_silence_segments(frames, threshold=0.01)
    rows = {(r.file_name, r.segment_id): r for r in out.collect()}
    assert len(rows) == 4  # 3 for a, 1 for b, none for c
    a0 = rows[("a", 0)]
    assert (a0.is_silent, a0.start_frame, a0.end_frame, a0.n_frames) == (False, 0, 1, 2)
    a1 = rows[("a", 1)]
    assert (a1.is_silent, a1.start_frame, a1.end_frame, a1.n_frames) == (True, 2, 2, 1)
    a2 = rows[("a", 2)]
    assert (a2.is_silent, a2.start_frame, a2.end_frame, a2.n_frames) == (False, 3, 3, 1)
    b0 = rows[("b", 0)]
    assert (b0.is_silent, b0.n_frames) == (True, 2)


def test_resample_linear_nonramp_reference(spark):
    """resample_linear vs a direct numpy reference on a NON-ramp signal
    (the closed-form oracle only exercises ramps; this pins the
    interpolation itself) plus the error-isolation path."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        encode_wav_pcm16,
        resample_linear,
    )

    rng = np.array([0, 100, -50, 32767, -32768, 7, 7, -7], dtype=np.int64)
    df = spark.createDataFrame(
        [
            ("a.wav", bytearray(encode_wav_pcm16(rng, 8000))),
            ("bad.wav", bytearray(b"not a wav")),
        ],
        "file_name string, content binary",
    )
    out = {r.file_name: r for r in resample_linear(df, 16000).collect()}
    n = len(rng)
    m = (n - 1) * 2 + 1
    pos = np.arange(m) * 0.5
    ref = np.interp(pos, np.arange(n), rng.astype(np.float64))
    a = out["a.wav"]
    assert a.n_in == n and a.n_out == m and a.decode_error is None
    assert a.sum2 == int(round((2.0 * ref).sum()))
    assert out["bad.wav"].decode_error is not None
    assert out["bad.wav"].sum2 is None
