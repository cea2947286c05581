"""REAL video frame decode for MJPEG-in-AVI — pure numpy+stdlib.

Closes part of the ffmpeg seam named in ``multimodal/media.py``: AVI is
just RIFF (the container walk is ~30 lines), and Motion-JPEG frames are
ordinary baseline JPEGs — which ``multimodal/codecs.py`` already
decodes for real (Huffman + IDCT).  So one genuinely decodable video
codec exists end-to-end:

- ``parse_avi_mjpeg``: RIFF/AVI walk — ``hdrl`` headers (frame count,
  fps, dims from ``avih``/``strh``) and the ``movi`` LIST's
  ``..dc``/``..db`` chunks as the per-frame JPEG payloads.
- ``decode_video_frames``: Arrow ``mapInPandas`` frame sampler (the
  real-codec twin of ``media.sample_video_frames``): one video row ->
  every-n-th frame row, each frame JPEG-decoded by the pure decoder,
  with per-row error isolation.  Inter-coded codecs (H.264 etc.)
  raise per row — they stay behind the ffmpeg seam.
- ``encode_avi_mjpeg``: minimal conforming AVI writer (avih + strl +
  movi + idx1) over ``codecs.encode_jpeg`` frames, for fixtures.

Scale notes: map-side only; videos are unsplittable blobs so
parallelism = file count (repartition upstream).  Output rows are
bounded by ``max_frames`` per input; JPEG decode cost is per sampled
frame, not per stored frame, because the movi walk skips unsampled
chunks without decoding them.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
    ImageFormatError,
    decode_jpeg,
    encode_jpeg,
)

VIDEO_FRAME_SCHEMA = (
    "file_name string, frame_idx int, frame array<float>, height int, width int, "
    "decode_error string"
)


class VideoFormatError(ValueError):
    """Malformed / non-MJPEG video payload (per-row isolated upstream)."""


def _walk_riff(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for chunks in [pos, end)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise VideoFormatError(f"truncated {tag!r} chunk")
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi_mjpeg(content: bytes):
    """Parse an AVI container; returns ``(meta, frames)`` where meta is
    ``{n_frames, width, height, fps}`` from the headers and frames is
    the list of raw per-frame payloads (JPEG bytes for MJPEG).  Raises
    ``VideoFormatError`` for non-AVI; non-MJPEG streams are surfaced by
    the JPEG magic check on first decode, not here (the container is
    codec-agnostic)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise VideoFormatError("not a RIFF/AVI payload")
    meta = {"n_frames": None, "width": None, "height": None, "fps": None}
    frames: list[bytes] = []
    for tag, start, size in _walk_riff(content, 12, len(content)):
        if tag != b"LIST":
            continue
        list_type = content[start : start + 4]
        if list_type == b"hdrl":
            for t2, s2, z2 in _walk_riff(content, start + 4, start + size):
                if t2 == b"avih" and z2 >= 40:
                    vals = struct.unpack("<10I", content[s2 : s2 + 40])
                    meta["n_frames"] = vals[4]
                    meta["width"], meta["height"] = vals[8], vals[9]
                    if vals[0]:
                        meta["fps"] = round(1e6 / vals[0], 3)
                elif t2 == b"LIST" and content[s2 : s2 + 4] == b"strl":
                    for t3, s3, z3 in _walk_riff(content, s2 + 4, s2 + z2):
                        if t3 == b"strh" and z3 >= 36:
                            scale, rate = struct.unpack("<II", content[s3 + 20 : s3 + 28])
                            if scale:
                                meta["fps"] = round(rate / scale, 3)
        elif list_type == b"movi":
            for t2, s2, z2 in _walk_riff(content, start + 4, start + size):
                if t2[2:4] in (b"dc", b"db"):
                    frames.append(content[s2 : s2 + z2])
    if not frames:
        raise VideoFormatError("AVI with no video frame chunks in movi")
    return meta, frames


def decode_video_frames(
    videos: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    normalize: bool = True,
) -> DataFrame:
    """REAL frame sampling: AVI walk + pure-JPEG decode of every
    ``every_n``-th frame, up to ``max_frames`` rows per video; flattened
    HWC float frames ([0,1] when ``normalize``), per-row error
    isolation.  The real-codec twin of ``media.sample_video_frames``."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    _meta, frames = parse_avi_mjpeg(bytes(content))
                    picked = range(0, len(frames), every_n)
                    for k, idx in enumerate(picked):
                        if k >= max_frames:
                            break
                        payload = frames[idx]
                        if payload[:2] != b"\xff\xd8":
                            raise ImageFormatError(
                                "non-JPEG frame payload (not MJPEG; needs ffmpeg)"
                            )
                        img = decode_jpeg(payload).astype(np.float32)
                        if normalize:
                            img = img / 255.0
                        rows.append(
                            (
                                name,
                                idx,
                                img.reshape(-1).tolist(),
                                img.shape[0],
                                img.shape[1],
                                None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["file_name", "frame_idx", "frame", "height", "width", "decode_error"],
            )

    return videos.mapInPandas(sample, VIDEO_FRAME_SCHEMA)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 75
) -> bytes:
    """Minimal conforming MJPEG AVI (avih + strl + movi + idx1) over
    the pure-numpy JPEG encoder; all frames must share dimensions."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        payloads.append(encode_jpeg(f, quality=quality))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0, 0x10,  # padding, AVIF_HASINDEX
        len(payloads), 0, 1, max_bytes,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I2HI", 0, 0, 0, 0)  # flags, prio, lang, initial
        + struct.pack("<IIIII", 1, fps, 0, len(payloads), max_bytes)
        + struct.pack("<iI", -1, 0)  # quality, sample size
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<I2i2H", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<I2i2I", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b""
    offsets = []
    for p in payloads:
        offsets.append(4 + len(movi_body))  # offset from 'movi' fourcc
        movi_body += chunk(b"00dc", p)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(p))
            for off, p in zip(offsets, payloads)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


SIGNATURE_SCHEMA = (
    "file_name string, frame_idx int, sig array<double>, sig_error string"
)


def video_frame_signatures(
    videos: DataFrame, every_n: int = 1, max_frames: int = 64, grid: int = 8
) -> DataFrame:
    """Per-frame compact signatures for temporal analysis: each sampled
    frame decodes (pure JPEG) and reduces to a ``grid x grid`` exact
    area-mean luminance sketch (the dHash grid, see
    ``multimodal/phash.area_resize``) — ``grid**2`` doubles per frame
    instead of W*H, so downstream shuffles move signatures, never
    pixels.  Per-row error isolation as everywhere."""
    from image_matadata_batchprocessing_aws_spark.multimodal.phash import area_resize

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    _meta, frames = parse_avi_mjpeg(bytes(content))
                    picked = range(0, len(frames), every_n)
                    for k, idx in enumerate(picked):
                        if k >= max_frames:
                            break
                        payload = frames[idx]
                        if payload[:2] != b"\xff\xd8":
                            raise ImageFormatError(
                                "non-JPEG frame payload (not MJPEG; needs ffmpeg)"
                            )
                        img = decode_jpeg(payload)
                        gray = img.astype(np.float64).mean(axis=2)
                        sig = area_resize(gray, grid, grid).reshape(-1)
                        rows.append((name, idx, sig.tolist(), None))
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["file_name", "frame_idx", "sig", "sig_error"]
            )

    return videos.mapInPandas(sigs, SIGNATURE_SCHEMA)


def detect_scene_cuts(
    sigs: DataFrame, threshold: float = 30.0, key_col: str = "file_name"
) -> DataFrame:
    """Scene-change detection over frame signatures, all JVM-side: a
    frame starts a new scene when the mean absolute signature
    difference vs the previous frame exceeds ``threshold``.  One keyed
    window (lag + running sum share the same sort) — the temporal logic
    lives in Spark expressions, only the decode was Python.

    Returns ``key, frame_idx, is_cut, scene_id`` (scene_id counts cuts,
    0-based; the first frame of each video is scene 0, not a cut)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("frame_idx")
    prev = F.lag("sig").over(w)
    diff = F.aggregate(
        F.zip_with(F.col("sig"), prev, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(F.col("sig"))
    cut = F.when(prev.isNull(), F.lit(False)).otherwise(diff > threshold)
    out = sigs.where(F.col("sig").isNotNull()).withColumn("is_cut", cut)
    return out.withColumn(
        "scene_id",
        F.sum(F.col("is_cut").cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(key_col, "frame_idx", "is_cut", "scene_id")


def select_scene_keyframes(
    cuts: DataFrame, key_col: str = "file_name"
) -> DataFrame:
    """Representative-frame selection over :func:`detect_scene_cuts`
    output — the frame-sampling step VLM training pipelines run after
    scene segmentation (one frame per scene instead of every-n-th
    blind sampling).  Picks the MEDIAN frame of each scene by frame
    order (deterministic; for even lengths the earlier of the two
    middles), all JVM-side: one keyed window shared by the rank and
    the scene length.

    Returns ``key, scene_id, keyframe_idx, n_frames``."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col, "scene_id").orderBy("frame_idx")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cuts.select(
        key_col,
        "scene_id",
        "frame_idx",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wfull).alias("__n"),
    )
    return ranked.where(
        F.col("__rn") == F.floor((F.col("__n") + 1) / 2)
    ).select(
        key_col,
        "scene_id",
        F.col("frame_idx").alias("keyframe_idx"),
        F.col("__n").cast("long").alias("n_frames"),
    )
