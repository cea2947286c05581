"""Animated GIF parse/compose/encode — giflib parity + spec semantics.

The system giflib (``tools/giflib_ref.py``) is the independent ground
truth for the block walk: per-frame index rasters (DGifSlurp
de-interlaces, as does ``parse_gif_frames`` — compared directly),
descriptors, palettes, and graphic-control blocks.  Compositing
(disposal 0-3 + transparency) has no giflib counterpart; it is
asserted against hand-built expected canvases per the documented
contract in ``multimodal/gif_anim.py``.
"""

from __future__ import annotations

import importlib.util
import pathlib

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.gif_anim import (
    compose_gif_frames,
    encode_gif_animation,
    parse_gif_frames,
)

_TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"


def _giflib():
    spec = importlib.util.spec_from_file_location("giflib_ref", _TOOLS / "giflib_ref.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PAL = np.array(
    [[10, 20, 30], [200, 50, 50], [50, 200, 50], [50, 50, 200], [255, 255, 0]],
    np.uint8,
)


def _fixture_frames(rng):
    return [
        dict(
            indices=rng.integers(0, 5, (30, 40)).astype(np.uint8),
            x=0, y=0, delay_cs=10, disposal=1, transparent=None,
        ),
        dict(
            indices=rng.integers(0, 5, (10, 12)).astype(np.uint8),
            x=5, y=7, delay_cs=20, disposal=2, transparent=4,
        ),
        dict(
            indices=rng.integers(0, 4, (8, 8)).astype(np.uint8),
            x=20, y=15, delay_cs=5, disposal=3, transparent=0,
            palette=np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]], np.uint8),
        ),
        dict(
            indices=rng.integers(0, 5, (30, 40)).astype(np.uint8),
            x=0, y=0, delay_cs=7, disposal=0, transparent=2, interlace=True,
        ),
    ]


def test_parse_matches_giflib_per_frame():
    ref = _giflib()
    if not ref.available():
        pytest.skip("libgif.so.7 not present")
    rng = np.random.default_rng(7)
    frames = _fixture_frames(rng)
    data = encode_gif_animation(frames, 40, 30, PAL, bg_idx=0, loop_count=3)
    screen, parsed = parse_gif_frames(data)
    assert (screen.width, screen.height) == (40, 30)
    assert screen.bg_rgb == (10, 20, 30)
    assert screen.loop_count == 3
    g = ref.decode_gif_ref(data)
    assert (g["width"], g["height"], g["bg_index"]) == (40, 30, 0)
    assert len(parsed) == len(g["frames"]) == 4
    for i, (mine, theirs, want) in enumerate(zip(parsed, g["frames"], frames)):
        assert (mine.x, mine.y, mine.w, mine.h) == (
            theirs["x"], theirs["y"], theirs["w"], theirs["h"],
        ), i
        assert mine.delay_cs == theirs["delay_cs"] == want["delay_cs"]
        assert mine.disposal == theirs["disposal"]
        assert mine.transparent == theirs["transparent"]
        assert mine.interlaced == theirs["interlaced"]
        assert mine.local_palette == theirs["local_palette"]
        assert np.array_equal(mine.indices, theirs["raster"]), f"frame {i} raster"
        assert np.array_equal(mine.indices, want["indices"]), f"frame {i} round-trip"
        assert np.array_equal(mine.palette[: len(theirs["palette"])], theirs["palette"])


def test_parse_matches_giflib_randomized():
    ref = _giflib()
    if not ref.available():
        pytest.skip("libgif.so.7 not present")
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        sw, sh = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        n_colors = int(rng.integers(2, 256))
        pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
        frames = []
        for _ in range(int(rng.integers(1, 6))):
            fw, fh = int(rng.integers(1, sw + 1)), int(rng.integers(1, sh + 1))
            frames.append(
                dict(
                    indices=rng.integers(0, n_colors, (fh, fw)).astype(np.uint8),
                    x=int(rng.integers(0, sw - fw + 1)),
                    y=int(rng.integers(0, sh - fh + 1)),
                    delay_cs=int(rng.integers(0, 500)),
                    disposal=int(rng.integers(0, 4)),
                    transparent=(int(rng.integers(0, n_colors)) if rng.random() < 0.5 else None),
                    interlace=bool(rng.random() < 0.3),
                )
            )
        data = encode_gif_animation(frames, sw, sh, pal, bg_idx=0, loop_count=None)
        _, parsed = parse_gif_frames(data)
        g = ref.decode_gif_ref(data)
        assert len(parsed) == len(g["frames"]) == len(frames)
        for mine, theirs in zip(parsed, g["frames"]):
            assert np.array_equal(mine.indices, theirs["raster"])
            assert mine.disposal == theirs["disposal"]
            assert mine.transparent == theirs["transparent"]
            assert mine.delay_cs == theirs["delay_cs"]


def test_compose_disposal_and_transparency_semantics():
    rng = np.random.default_rng(7)
    frames = _fixture_frames(rng)
    data = encode_gif_animation(frames, 40, 30, PAL, bg_idx=0, loop_count=3)
    comp = compose_gif_frames(data)
    assert [d for _, d in comp] == [10, 20, 5, 7]
    c0 = comp[0][0]
    assert np.array_equal(c0, PAL[frames[0]["indices"]])
    # frame 1: transparent index 4 leaves canvas; disposal 2 resets AFTER show
    exp1 = c0.copy()
    reg = exp1[7:17, 5:17]
    op = frames[1]["indices"] != 4
    reg[op] = PAL[frames[1]["indices"]][op]
    assert np.array_equal(comp[1][0], exp1)
    # frame 2 paints over the disposal-2 reset rectangle with its local palette
    exp2 = exp1.copy()
    exp2[7:17, 5:17] = (10, 20, 30)
    lpal = frames[2]["palette"]
    reg2 = exp2[15:23, 20:28]
    op2 = frames[2]["indices"] != 0
    reg2[op2] = lpal[frames[2]["indices"]][op2]
    assert np.array_equal(comp[2][0], exp2)
    # frame 3 sees the canvas with frame 2 disposed back to the pre-frame state
    exp3 = exp1.copy()
    exp3[7:17, 5:17] = (10, 20, 30)
    op3 = frames[3]["indices"] != 2
    exp3[op3] = PAL[frames[3]["indices"]][op3]
    assert np.array_equal(comp[3][0], exp3)


def test_single_frame_matches_static_decoder():
    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    img = PAL[rng.integers(0, 5, (17, 23))]
    data = encode_gif(img)
    comp = compose_gif_frames(data)
    assert len(comp) == 1
    assert np.array_equal(comp[0][0], decode_gif(data))
