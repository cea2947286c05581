"""Audio/video multimodal columns: opaque binary + typed metadata, with
frame-sampling and feature-extraction as Arrow ``mapInPandas`` stages.

Same design contract as multimodal/images.py: the Spark-side plumbing —
schemas, batch shapes, UDTF-style row expansion, error isolation, typed
metadata columns — is real and tested; the byte-level codecs (ffmpeg /
librosa territory) are stubbed behind ``MediaCodecUnavailable`` with
DETERMINISTIC FAKES (md5-seeded) so golden tests are stable.

Scale notes: both operators are pure map-side (zero shuffle), CPU-bound
in the Arrow batch loop; media blobs are unsplittable so parallelism =
file count (repartition upstream like the ZIP scan).  Frame sampling is
UDTF-shaped (one video row -> ``n_frames`` rows) — output row count is
bounded by ``max_frames`` per input, so task output can't blow up on a
long video.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FRAME_SCHEMA = (
    "file_name string, frame_idx int, frame array<float>, height int, width int, "
    "decode_error string"
)
AUDIO_FEATURES_SCHEMA = (
    "file_name string, duration_s double, n_features int, features array<float>, "
    "decode_error string"
)
N_AUDIO_FEATURES = 16
FRAME_SIZE = 32  # fake frames are FRAME_SIZE x FRAME_SIZE x 3


class MediaCodecUnavailable(NotImplementedError):
    """Raised when a real (ffmpeg/librosa) decode is requested but no
    codec exists in this environment."""


def _fake_frame(content: bytes, idx: int) -> np.ndarray:
    """DETERMINISTIC FAKE frame decode: pixels derive from
    md5(content || idx) — replace with an ffmpeg seek+decode in real
    deployments."""
    seed = np.frombuffer(
        hashlib.md5(content + idx.to_bytes(4, "big")).digest(), dtype=np.uint8
    )
    return np.resize(seed, (FRAME_SIZE, FRAME_SIZE, 3))


def sample_video_frames(
    videos: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    use_real_codec: bool = False,
) -> DataFrame:
    """UDTF-shaped frame sampler: one (file_name, content) video row ->
    up to ``max_frames`` frame rows (every ``every_n``-th frame).  The
    fake treats ``len(content) // 1024 + 1`` as the frame count."""
    if use_real_codec:
        raise MediaCodecUnavailable("no video codec (ffmpeg) in this environment")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    blob = bytes(content)
                    if not blob:
                        raise ValueError("empty video payload")
                    n_frames = len(blob) // 1024 + 1
                    picked = range(0, n_frames, every_n)
                    for k, idx in enumerate(picked):
                        if k >= max_frames:
                            break
                        frame = _fake_frame(blob, idx).astype(np.float32) / 255.0
                        rows.append(
                            (name, idx, frame.reshape(-1).tolist(), FRAME_SIZE, FRAME_SIZE, None)
                        )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["file_name", "frame_idx", "frame", "height", "width", "decode_error"],
            )

    return videos.mapInPandas(sample, FRAME_SCHEMA)


def extract_audio_features(
    audio: DataFrame, use_real_codec: bool = False
) -> DataFrame:
    """Fixed-width feature vector per audio blob (MFCC-shaped surface).
    The fake derives ``N_AUDIO_FEATURES`` floats from md5(content) and
    duration from the byte length (16 kB/s)."""
    if use_real_codec:
        raise MediaCodecUnavailable("no audio codec (librosa) in this environment")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    blob = bytes(content)
                    if not blob:
                        raise ValueError("empty audio payload")
                    seed = np.frombuffer(hashlib.md5(blob).digest(), dtype=np.uint8)
                    feats = (
                        np.resize(seed, N_AUDIO_FEATURES).astype(np.float32) / 255.0
                    )
                    rows.append(
                        (name, round(len(blob) / 16000.0, 4), N_AUDIO_FEATURES,
                         feats.tolist(), None)
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((name, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["file_name", "duration_s", "n_features", "features", "decode_error"],
            )

    return audio.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
