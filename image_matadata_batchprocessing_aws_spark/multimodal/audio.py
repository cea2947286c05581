"""REAL WAV/PCM audio decode + DSP feature extraction — pure numpy+stdlib.

Upgrades the audio half of the multimodal surface from the
clearly-marked deterministic fake (``media.extract_audio_features``) to
a real codec path, the same move ``multimodal/codecs.py`` made for
images (reference treats media as opaque files; decode parity target is
the librosa/ffmpeg seam named in ``media.py``):

- ``decode_wav``: RIFF/WAVE chunk walk; PCM 8 (unsigned) / 16 / 24 /
  32-bit integer and IEEE float32/float64, any channel count, chunk
  order tolerant (fmt before data enforced, extra chunks skipped).
  Returns the raw interleaved integer/float samples — keeping integers
  exact is what lets the oracle query compare bit-for-bit.
- ``encode_wav_pcm16``: canonical 44-byte-header PCM writer for
  fixtures and round-trip tests.
- ``wav_pcm_stats``: Arrow ``mapInPandas`` stage emitting per-blob
  INTEGER-EXACT channel-0 statistics (n_samples, sum_abs, sum_sq,
  peak, zero crossings) — a closed-form surface DuckDB can recompute
  exactly from the fixture formula, giving the audio twin of
  ``multimodal_png_decode``'s closed-form pixel sums.
- ``wav_frame_features``: UDTF-shaped framing (one blob row ->
  one row per 25 ms/10 ms frame) with per-frame RMS and
  zero-crossing-rate — the standard speech-processing front end.
- ``audio_feature_vector``: fixed-width per-blob descriptor (RMS, ZCR,
  peak, spectral centroid/rolloff/flatness + 8 FFT band energies +
  duration + sample rate) replacing the fake's md5 vector when
  ``use_real_codec=True``.

Scale notes: all stages are pure map-side (zero shuffle) Arrow batch
loops; blobs are unsplittable so parallelism = file count (repartition
upstream, like the ZIP scan).  Framing is bounded per input row by
``max_frames`` so task output cannot blow up on a long recording.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class AudioFormatError(ValueError):
    """Malformed / unsupported WAV payload (per-row isolated upstream)."""


def decode_wav(content: bytes):
    """Parse a RIFF/WAVE blob.  Returns ``(samples, sample_rate)`` where
    ``samples`` is an (n_frames, channels) numpy array — int32 for
    integer PCM (8-bit is recentred to signed), float64 for IEEE-float
    WAVs.  Raises ``AudioFormatError`` on anything malformed."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise AudioFormatError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise AudioFormatError("fmt chunk too small")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            if fmt is None:
                raise AudioFormatError("data chunk before fmt")
            data = body
            break
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise AudioFormatError("missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
    if channels < 1 or rate < 1:
        raise AudioFormatError("bad channel count or sample rate")
    if audio_fmt == 0xFFFE and len(content) >= pos:  # WAVE_FORMAT_EXTENSIBLE
        raise AudioFormatError("WAVE_FORMAT_EXTENSIBLE not supported")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.int32)
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8).reshape(-1, 3)
            arr = (
                raw[:, 0].astype(np.int32)
                | raw[:, 1].astype(np.int32) << 8
                | raw[:, 2].astype(np.int32) << 16
            )
            arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
        elif bits == 32:
            arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4").astype(np.int32)
        else:
            raise AudioFormatError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8")
        else:
            raise AudioFormatError(f"unsupported float bit depth {bits}")
    else:
        raise AudioFormatError(f"unsupported WAV format code {audio_fmt}")
    n_frames = len(arr) // channels
    if n_frames == 0:
        raise AudioFormatError("no sample frames in data chunk")
    return arr[: n_frames * channels].reshape(n_frames, channels), rate


def wav_to_mono_float(samples: np.ndarray, bits_hint: int = 16) -> np.ndarray:
    """Channel-mean downmix scaled to [-1, 1] floats (integer PCM full
    scale inferred from the value range; float WAVs pass through)."""
    mono = samples.astype(np.float64).mean(axis=1)
    if np.issubdtype(samples.dtype, np.integer):
        peak = max(np.abs(samples).max(), 1)
        scale = 1 << (7 if peak < 1 << 7 else 15 if peak < 1 << 15 else 23 if peak < 1 << 23 else 31)
        mono = mono / scale
    return mono


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Canonical PCM16 writer: (n_frames,) or (n_frames, channels)
    int-like array, little-endian data, 44-byte header."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D (frames, channels)")
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("samples exceed int16 range")
    channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


WAV_STATS_SCHEMA = (
    "file_name string, sample_rate long, channels long, n_samples long, "
    "sum_abs long, sum_sq long, peak long, zero_crossings long, decode_error string"
)


def wav_pcm_stats(audio: DataFrame) -> DataFrame:
    """Integer-exact channel-0 PCM statistics per blob, with per-row
    error isolation.  ``zero_crossings`` counts sign transitions under
    the convention (s[i-1] < 0) != (s[i] < 0) — stated here because the
    SQL oracle must use the identical convention."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    samples, rate = decode_wav(bytes(content))
                    if not np.issubdtype(samples.dtype, np.integer):
                        raise AudioFormatError("float WAV has no exact integer stats")
                    ch0 = samples[:, 0].astype(np.int64)
                    neg = ch0 < 0
                    rows.append(
                        (
                            name,
                            rate,
                            samples.shape[1],
                            len(ch0),
                            int(np.abs(ch0).sum()),
                            int((ch0 * ch0).sum()),
                            int(np.abs(ch0).max()),
                            int((neg[1:] != neg[:-1]).sum()),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "sample_rate", "channels", "n_samples",
                    "sum_abs", "sum_sq", "peak", "zero_crossings", "decode_error",
                ],
            )

    return audio.mapInPandas(stats, WAV_STATS_SCHEMA)


FRAME_FEATURES_SCHEMA = (
    "file_name string, frame_idx long, start_s double, rms double, zcr double, "
    "decode_error string"
)


def wav_frame_features(
    audio: DataFrame,
    frame_ms: int = 25,
    hop_ms: int = 10,
    max_frames: int = 2000,
) -> DataFrame:
    """UDTF-shaped speech-processing front end: one blob row -> one row
    per (frame_ms window, hop_ms stride) frame with RMS and
    zero-crossing RATE (fraction of adjacent pairs that cross).  Output
    bounded by ``max_frames`` rows per input."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    samples, rate = decode_wav(bytes(content))
                    mono = wav_to_mono_float(samples)
                    flen = max(1, rate * frame_ms // 1000)
                    hop = max(1, rate * hop_ms // 1000)
                    n = max(0, (len(mono) - flen) // hop + 1)
                    for f in range(min(n, max_frames)):
                        seg = mono[f * hop : f * hop + flen]
                        neg = seg < 0
                        zcr = float((neg[1:] != neg[:-1]).mean()) if len(seg) > 1 else 0.0
                        rows.append(
                            (
                                name,
                                f,
                                round(f * hop / rate, 6),
                                float(np.sqrt((seg * seg).mean())),
                                zcr,
                                None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001
                    rows.append((name, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["file_name", "frame_idx", "start_s", "rms", "zcr", "decode_error"],
            )

    return audio.mapInPandas(frames, FRAME_FEATURES_SCHEMA)


N_BANDS = 8


def audio_feature_vector(content: bytes) -> tuple[float, list[float]]:
    """(duration_s, 16-float descriptor) for one WAV blob: [rms, zcr,
    peak, spectral centroid (Hz), rolloff-85 (Hz), flatness,
    band_energy_0..7 (fraction), duration_s, sample_rate/1e3] — real
    DSP via numpy FFT, the drop-in for the md5 fake in
    ``media.extract_audio_features``."""
    samples, rate = decode_wav(content)
    mono = wav_to_mono_float(samples)
    duration = len(mono) / rate
    rms = float(np.sqrt((mono * mono).mean()))
    neg = mono < 0
    zcr = float((neg[1:] != neg[:-1]).mean()) if len(mono) > 1 else 0.0
    peak = float(np.abs(mono).max())
    spec = np.abs(np.fft.rfft(mono))
    power = spec * spec
    total = power.sum()
    freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
    if total > 0:
        centroid = float((freqs * power).sum() / total)
        rolloff = float(freqs[np.searchsorted(np.cumsum(power), 0.85 * total)])
        flatness = float(np.exp(np.log(power + 1e-20).mean()) / (power.mean() + 1e-20))
    else:
        centroid = rolloff = flatness = 0.0
    edges = np.linspace(0, len(power), N_BANDS + 1).astype(int)
    bands = [
        float(power[edges[i] : edges[i + 1]].sum() / total) if total > 0 else 0.0
        for i in range(N_BANDS)
    ]
    feats = [rms, zcr, peak, centroid, rolloff, flatness, *bands, duration, rate / 1e3]
    return duration, [float(v) for v in feats]


def detect_silence_segments(
    frames: DataFrame,
    threshold: float = 0.01,
    key_col: str = "file_name",
    frame_col: str = "frame_idx",
    rms_col: str = "rms",
) -> DataFrame:
    """VAD-lite energy segmentation over ``wav_frame_features`` output,
    all JVM-side: a frame is silent when ``rms < threshold``; maximal
    runs of equal silent/voiced state become segments (the speech-corpus
    curation primitive — strip leading/trailing silence, split long
    recordings at pauses, measure speech density).  Same temporal
    pattern as ``video.detect_scene_cuts``: one keyed window carries the
    lag comparison AND the running segment counter, so the whole
    operator is a single sort per recording, state bounded by frames
    per file, never corpus size.

    Returns ``key, segment_id, is_silent, start_frame, end_frame,
    n_frames`` (segment_id 0-based per recording).
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(key_col).orderBy(frame_col)
    silent = F.col(rms_col) < F.lit(threshold)
    prev = F.lag(silent).over(w)
    boundary = prev.isNull() | (prev != silent)
    seg = (
        frames.where(F.col(rms_col).isNotNull())
        .withColumn("is_silent", silent)
        .withColumn(
            "segment_id",
            F.sum(boundary.cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.lit(1),
        )
    )
    return seg.groupBy(key_col, "segment_id", "is_silent").agg(
        F.min(frame_col).cast("long").alias("start_frame"),
        F.max(frame_col).cast("long").alias("end_frame"),
        F.count("*").alias("n_frames"),
    )


PITCH_SCHEMA = (
    "file_name string, sample_rate long, n_samples long, best_lag long, "
    "best_ac long, pitch_hz double, decode_error string"
)


def wav_pitch_autocorr(
    audio: DataFrame,
    lag_min: int = 20,
    lag_max: int = 80,
    max_samples: int = 8000,
) -> DataFrame:
    """Pitch (fundamental-period) detection by INTEGER autocorrelation
    over channel 0 of each PCM16 blob: ``ac(L) = sum_i s[i]*s[i+L]``
    for L in [lag_min, lag_max]; the best lag is the argmax with
    smallest-lag tie-break, and ``pitch_hz = rate / best_lag``.

    Every accumulation is int64-exact (|s| <= 32767, so n * s^2 fits
    up to n ~ 8.5e9 samples), which is what makes this operator
    oracle-checkable bit-for-bit: an engine-independent SQL twin can
    recompute ``ac`` from a closed-form fixture via a lag self-join.
    The analysis window caps at ``max_samples`` per blob so work per
    row is bounded regardless of blob size; per-row errors land in
    ``decode_error`` (the ``wav_pcm_stats`` contract).
    """

    def pitch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    samples, rate = decode_wav(bytes(content))
                    ch0 = samples[:, 0] if samples.ndim == 2 else samples
                    s = ch0[:max_samples].astype(np.int64)
                    n = len(s)
                    if n <= lag_max:
                        raise AudioFormatError(
                            f"need > {lag_max} samples, got {n}"
                        )
                    best_l, best_a = None, None
                    for lag in range(lag_min, lag_max + 1):
                        a = int(np.dot(s[: n - lag], s[lag:]))
                        if best_a is None or a > best_a:
                            best_l, best_a = lag, a
                    rows.append(
                        (
                            name,
                            rate,
                            n,
                            best_l,
                            best_a,
                            round(rate / best_l, 6),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((name, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "sample_rate",
                    "n_samples",
                    "best_lag",
                    "best_ac",
                    "pitch_hz",
                    "decode_error",
                ],
            )

    return audio.mapInPandas(pitch, PITCH_SCHEMA)


RESAMPLE_SCHEMA = (
    "file_name string, src_rate long, dst_rate long, n_in long, n_out long, "
    "sum2 long, decode_error string"
)


def resample_linear(audio: DataFrame, dst_rate: int) -> DataFrame:
    """Linear-interpolation resampler over the Arrow pipeline — the
    sample-rate normalization stage an audio-corpus build runs before
    feature extraction (real deployments swap in a windowed-sinc kernel;
    the engine surface — binary in, per-row error isolation, exact
    audit column out — is identical).

    Output grid: ``m = (n-1) * dst // src + 1`` positions at
    ``j * src / dst`` source coordinates (endpoints preserved), values
    by ``np.interp``.  The audit column ``sum2`` is the DOUBLED sample
    sum cast to int64: for integer-ratio upsampling the interpolated
    values are exact halves, so doubling makes the audit integral and
    engine-exact (a ramp input stays a ramp, giving the oracle a closed
    form).
    """

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    samples, rate = decode_wav(bytes(content))
                    ch0 = samples[:, 0].astype(np.float64)
                    n = len(ch0)
                    if n < 2:
                        raise AudioFormatError("resample needs >= 2 samples")
                    m = (n - 1) * dst_rate // rate + 1
                    pos = np.arange(m, dtype=np.float64) * (rate / dst_rate)
                    out = np.interp(pos, np.arange(n, dtype=np.float64), ch0)
                    rows.append(
                        (name, rate, dst_rate, n, m, int(round((2.0 * out).sum())), None)
                    )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "src_rate", "dst_rate", "n_in", "n_out",
                    "sum2", "decode_error",
                ],
            )

    return audio.mapInPandas(rs, RESAMPLE_SCHEMA)
