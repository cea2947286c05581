"""Audio/video multimodal columns: opaque binary + typed metadata, with
frame-sampling and feature-extraction as Arrow ``mapInPandas`` stages.

Same design contract as multimodal/images.py: the Spark-side plumbing —
schemas, batch shapes, UDTF-style row expansion, error isolation, typed
metadata columns — is real and tested.  Audio now has a REAL codec path
(``multimodal/audio.py``: pure-stdlib WAV/PCM decode + numpy DSP
features, used when ``use_real_codec=True``) and so does MJPEG-in-AVI
video (``multimodal/video.py``); inter-coded video (ffmpeg territory)
errors per row, and the default paths stay DETERMINISTIC FAKES
(md5-seeded) so golden tests are stable.

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
    fake treats ``len(content) // 1024 + 1`` as the frame count.
    ``use_real_codec=True`` now does REAL decoding for MJPEG-in-AVI
    (``multimodal/video.py``: RIFF walk + the pure JPEG decoder);
    inter-coded codecs (H.264/VP9/...) raise per row into
    ``decode_error`` — they stay behind the ffmpeg seam."""
    if use_real_codec:
        from image_matadata_batchprocessing_aws_spark.multimodal.video import (  # noqa: PLC0415
            decode_video_frames,
        )

        return decode_video_frames(videos, every_n=every_n, max_frames=max_frames)

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
    ``use_real_codec=True`` now does REAL decoding for WAV/PCM blobs:
    ``multimodal/audio.py`` parses RIFF/WAVE and computes a 16-float
    DSP descriptor (RMS, ZCR, peak, spectral centroid/rolloff/flatness,
    8 FFT band energies, duration, rate) — the librosa seam survives
    only for compressed formats (mp3/ogg/flac), which raise per row
    into ``decode_error``.  The default stays the deterministic fake
    (md5 floats, byte-length duration at 16 kB/s)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    blob = bytes(content)
                    if not blob:
                        raise ValueError("empty audio payload")
                    if use_real_codec:
                        from image_matadata_batchprocessing_aws_spark.multimodal.audio import (  # noqa: PLC0415
                            audio_feature_vector,
                        )

                        duration, feats = audio_feature_vector(blob)
                        rows.append(
                            (name, round(duration, 4), N_AUDIO_FEATURES, feats, None)
                        )
                        continue
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


def sniff_audio_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Codec-free WAV header sniffer (the audio twin of
    ``images.sniff_image_meta``): RIFF/WAVE magic, PCM fmt chunk fields
    (channels, sample rate, bits per sample) and — when the canonical
    ``data`` chunk follows fmt — the sample count and integer-ms
    duration, all as pure Catalyst expressions over a 44-byte prefix.
    Non-RIFF blobs label ``audio_format='unknown'`` with null fields;
    non-PCM or non-canonical chunk layouts keep the 'wav' label but null
    the derived fields (a full chunk walk a la the TIFF IFD walk slots
    in here if non-canonical layouts ever matter).

    Little-endian extraction: single-byte hex slices concatenated in
    reverse, then ``conv(_, 16, 10)`` — same move as the image sniffer.
    """
    from pyspark.sql import functions as F

    c = F.substring(F.col(content_col), 1, 44)

    def tag(pos: int, nbytes: int):
        return F.hex(F.substring(c, pos, nbytes))

    def le(pos: int, nbytes: int):
        return F.conv(
            F.concat(
                *[F.hex(F.substring(c, pos + i, 1)) for i in range(nbytes - 1, -1, -1)]
            ),
            16,
            10,
        ).cast("long")

    is_wav = (tag(1, 4) == "52494646") & (tag(9, 4) == "57415645")
    has_fmt = tag(13, 4) == "666D7420"
    is_pcm = le(21, 2) == 1
    ok = is_wav & has_fmt & is_pcm
    channels = F.when(ok, le(23, 2))
    rate = F.when(ok, le(25, 4))
    bits = F.when(ok, le(35, 2))
    block = F.when(ok, le(33, 2))
    has_data = ok & (tag(37, 4) == "64617461")
    data_size = F.when(has_data, le(41, 4))
    n_samples = (data_size / block).cast("long")
    duration_ms = F.when(
        has_data, ((n_samples * 1000) / rate).cast("long")
    )
    return df.withColumns(
        {
            "audio_format": F.when(is_wav, F.lit("wav")).otherwise(F.lit("unknown")),
            "audio_channels": channels.cast("long"),
            "audio_sample_rate": rate.cast("long"),
            "audio_bits": bits.cast("long"),
            "audio_n_samples": F.when(has_data, n_samples).cast("long"),
            "audio_duration_ms": duration_ms.cast("long"),
        }
    )


def sniff_video_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Codec-free video CONTAINER sniffer, completing the sniffer trio
    (image formats, WAV audio, video containers): identifies MP4/ISO-BMFF
    (``ftyp`` box — major brand + ftyp box size extracted), RIFF/AVI,
    and Matroska/WebM (EBML magic) from a 16-byte prefix as pure
    Catalyst expressions.  Stream dimensions/duration live inside
    codec-specific boxes (moov/avih/EBML segment) — that is decode
    territory, kept behind the Pandas-UDF seam (`sample_video_frames`);
    cataloging 100 TB of video starts with exactly this cheap
    container/brand pass.

    MP4 brand is decoded as ASCII only when all four bytes are printable
    (0x20-0x7E) — a malformed ftyp yields null brand, not mojibake.
    """
    from pyspark.sql import functions as F

    c = F.substring(F.col(content_col), 1, 16)

    def tag(pos: int, nbytes: int):
        return F.hex(F.substring(c, pos, nbytes))

    def be(pos: int, nbytes: int):
        return F.conv(tag(pos, nbytes), 16, 10).cast("long")

    is_mp4 = tag(5, 4) == "66747970"  # 'ftyp'
    is_avi = (tag(1, 4) == "52494646") & (tag(9, 4) == "41564920")  # RIFF..'AVI '
    is_mkv = tag(1, 4) == "1A45DFA3"  # EBML
    brand_bin = F.substring(c, 9, 4)
    brand_printable = F.forall(
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: F.conv(F.hex(F.substring(brand_bin, i.cast("int"), 1)), 16, 10),
        ),
        lambda b: (b >= 32) & (b <= 126),
    )
    return df.withColumns(
        {
            "video_format": F.when(is_mp4, F.lit("mp4"))
            .when(is_avi, F.lit("avi"))
            .when(is_mkv, F.lit("mkv"))
            .otherwise(F.lit("unknown")),
            "video_brand": F.when(
                is_mp4 & brand_printable, brand_bin.cast("string")
            ),
            "video_ftyp_bytes": F.when(is_mp4, be(1, 4)),
        }
    )
