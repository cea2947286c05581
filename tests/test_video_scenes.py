"""Video scene-change detection: signature stage over real MJPEG decode
and the window-based temporal logic (tested separately on synthetic
signatures so thresholds are exact)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.multimodal.video import (
    detect_scene_cuts,
    encode_avi_mjpeg,
    video_frame_signatures,
)


def test_signatures_shape_and_isolation(spark):
    frames = [np.full((16, 16, 3), v, np.uint8) for v in (50, 52, 200)]
    videos = spark.createDataFrame(
        [
            (0, "ok.avi", bytearray(encode_avi_mjpeg(frames, quality=90))),
            (1, "bad.avi", bytearray(b"RIFFxxxxAVI corrupt")),
        ],
        "video_id long, file_name string, content binary",
    )
    rows = video_frame_signatures(videos, every_n=1, max_frames=8).collect()
    ok = sorted(
        (r for r in rows if r["file_name"] == "ok.avi"), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in ok] == [0, 1, 2]
    assert all(len(r["sig"]) == 64 and r["sig_error"] is None for r in ok)
    # solid frames -> near-constant signatures at the planted values
    assert abs(ok[0]["sig"][0] - 50) < 4 and abs(ok[2]["sig"][0] - 200) < 4
    bad = [r for r in rows if r["file_name"] == "bad.avi"]
    assert len(bad) == 1 and bad[0]["sig_error"] is not None


def _sig_rows(vals, key="v0"):
    return [(key, i, [float(v)] * 4) for i, v in enumerate(vals)]


def test_cut_logic_on_synthetic_signatures(spark):
    sigs = spark.createDataFrame(
        _sig_rows([100, 101, 160, 161, 99]) + _sig_rows([10, 11], key="v1"),
        "file_name string, frame_idx int, sig array<double>",
    ).withColumn("sig_error", F.lit(None).cast("string"))
    out = {
        (r["file_name"], r["frame_idx"]): (r["is_cut"], r["scene_id"])
        for r in detect_scene_cuts(sigs, threshold=30.0).collect()
    }
    assert out[("v0", 0)] == (False, 0)
    assert out[("v0", 1)] == (False, 0)   # drift 1 < 30
    assert out[("v0", 2)] == (True, 1)    # jump 59
    assert out[("v0", 3)] == (False, 1)
    assert out[("v0", 4)] == (True, 2)    # jump 62 back down (abs diff)
    assert out[("v1", 0)] == (False, 0)   # keys independent
    assert out[("v1", 1)] == (False, 0)


def test_threshold_is_a_knob(spark):
    sigs = spark.createDataFrame(
        _sig_rows([100, 120]),
        "file_name string, frame_idx int, sig array<double>",
    ).withColumn("sig_error", F.lit(None).cast("string"))
    loose = detect_scene_cuts(sigs, threshold=30.0).where("is_cut").count()
    tight = detect_scene_cuts(sigs, threshold=10.0).where("is_cut").count()
    assert (loose, tight) == (0, 1)


def test_select_scene_keyframes_median_and_odd_even(spark):
    from image_matadata_batchprocessing_aws_spark.multimodal.video import select_scene_keyframes

    cuts = spark.createDataFrame(
        [
            # scene 0: 3 frames (odd -> middle), scene 1: 4 frames
            # (even -> earlier middle), scene 2: 1 frame
            ("a", 0, 0), ("a", 1, 0), ("a", 2, 0),
            ("a", 3, 1), ("a", 4, 1), ("a", 5, 1), ("a", 6, 1),
            ("a", 7, 2),
        ],
        "file_name string, frame_idx int, scene_id int",
    )
    out = {
        (r.file_name, r.scene_id): (r.keyframe_idx, r.n_frames)
        for r in select_scene_keyframes(cuts).collect()
    }
    assert out[("a", 0)] == (1, 3)
    assert out[("a", 1)] == (4, 4)   # frames 3,4,5,6 -> earlier middle = 4
    assert out[("a", 2)] == (7, 1)
