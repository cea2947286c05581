"""dHash perceptual hashing: exact area downsample, bit packing, the
banded Hamming join's recall guarantee, and per-row error isolation."""

from __future__ import annotations

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
from image_matadata_batchprocessing_aws_spark.multimodal.phash import (
    area_resize,
    dhash64,
    dhash_near_pairs,
    image_dhash,
)


def test_area_resize_exact_block_means():
    img = np.arange(16 * 18, dtype=np.float64).reshape(16, 18)
    out = area_resize(img, 8, 9)
    assert out.shape == (8, 9)
    # divisible dims -> plain block means
    expect = img.reshape(8, 2, 9, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect)


def test_area_resize_fractional_preserves_mean():
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, size=(10, 13))  # non-divisible dims
    out = area_resize(img, 8, 9)
    # area weighting conserves total mass exactly
    assert out.mean() == pytest.approx(img.mean())


def test_dhash_bit_packing():
    # gradient increasing left-to-right -> every comparison true -> all
    # 32 bits set in each half
    img = np.repeat(
        np.arange(0, 90, 10, dtype=np.uint8)[None, :], 8, axis=0
    )[:, :, None].repeat(3, axis=2)  # 8x9
    hi, lo = dhash64(img)
    assert hi == lo == 0xFFFFFFFF
    # decreasing -> all bits clear
    hi2, lo2 = dhash64(img[:, ::-1])
    assert hi2 == lo2 == 0


def test_dhash_robust_to_small_noise():
    """The perceptual property: pixel noise below the comparison margin
    leaves the hash unchanged."""
    rng = np.random.default_rng(11)
    g = np.cumsum(rng.choice([-20, 20], size=(8, 9)), axis=1) + 128
    g -= g.min() - 10
    img = np.repeat(g, 4, axis=1).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    noisy = img.astype(np.int64) + rng.integers(-3, 4, size=img.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    assert dhash64(img) == dhash64(noisy)


def _entries(spark, imgs):
    rows = [
        (i, f"{i}.png", bytearray(encode_png(img))) for i, img in enumerate(imgs)
    ]
    return spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")


def test_banded_join_finds_pairs_at_threshold(spark):
    """A planted pair at Hamming distance exactly 4 (the threshold, and
    2 bits per half so no half matches exactly) must be found — the
    pigeonhole recall guarantee over the 6 bands."""
    g = np.zeros((8, 9), dtype=np.int64)
    g[:, 0] = 160
    base_bits = np.zeros((8, 8), dtype=bool)
    base_bits[::2, ::2] = True
    flipped = base_bits.copy()
    for r, c in [(0, 0), (2, 2), (5, 1), (7, 3)]:  # 2 flips in each half
        flipped[r, c] = ~flipped[r, c]
    imgs = []
    for bits in (base_bits, flipped):
        gg = g.copy()
        for c in range(8):
            gg[:, c + 1] = gg[:, c] + np.where(bits[:, c], 11, -11)
        imgs.append(np.repeat(gg, 2, axis=1).astype(np.uint8)[:, :, None].repeat(3, axis=2))
    hashed = image_dhash(_entries(spark, imgs)).withColumn(
        "doc_id", F_col_doc()
    )
    pairs = dhash_near_pairs(hashed, max_hamming=4).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 4
    # one more flip pushes it past the threshold
    far = flipped.copy()
    far[3, 5] = ~far[3, 5]
    gg = g.copy()
    for c in range(8):
        gg[:, c + 1] = gg[:, c] + np.where(far[:, c], 11, -11)
    imgs[1] = np.repeat(gg, 2, axis=1).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    hashed = image_dhash(_entries(spark, imgs)).withColumn("doc_id", F_col_doc())
    assert dhash_near_pairs(hashed, max_hamming=4).count() == 0


def F_col_doc():
    from pyspark.sql import functions as F

    return F.regexp_extract("file_name", r"(\d+)\.png", 1).cast("long")


def test_image_dhash_isolates_bad_rows(spark):
    good = np.full((8, 18, 3), 100, np.uint8)
    entries = spark.createDataFrame(
        [
            (0, "ok.png", bytearray(encode_png(good))),
            (1, "bad.png", bytearray(b"\x89PNG\r\n\x1a\n broken")),
        ],
        "doc_id long, entry_name string, content binary",
    )
    rows = {r["file_name"]: r for r in image_dhash(entries).collect()}
    assert rows["ok.png"]["hash_error"] is None
    assert rows["bad.png"]["hash_error"] is not None
    assert rows["bad.png"]["hash_hi"] is None


def test_max_hamming_cap_enforced(spark):
    entries = _entries(spark, [np.full((8, 18, 3), 100, np.uint8)])
    hashed = image_dhash(entries).withColumn("doc_id", F_col_doc())
    with pytest.raises(ValueError, match="Hamming distance 5"):
        dhash_near_pairs(hashed, max_hamming=6)


def test_tile_overlap_finds_shared_region_and_isolates_errors(spark):
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        image_tile_stats,
        tile_overlap_pairs,
    )

    base = np.zeros((16, 16, 3), dtype=np.uint8)
    for r in range(4):
        for c in range(4):
            base[4 * r : 4 * r + 4, 4 * c : 4 * c + 4, :] = 10 * (4 * r + c)
    shifted = np.roll(base, 8, axis=1)  # crop/shift: same tiles, moved
    other = np.full((16, 16, 3), 201, dtype=np.uint8)
    rows = [
        ("a.png", bytearray(encode_png(base))),
        ("b.png", bytearray(encode_png(shifted))),
        ("c.png", bytearray(encode_png(other))),
        ("bad.png", bytearray(b"not a png")),
        ("tiny.png", bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))),
    ]
    entries = spark.createDataFrame(rows, "entry_name string, content binary")
    tiles = image_tile_stats(entries, grid=4)
    errs = {r.file_name: r.tile_error for r in tiles.where("tile_error IS NOT NULL").collect()}
    assert set(errs) == {"bad.png", "tiny.png"}
    assert "grid" in errs["tiny.png"]
    pairs = {(r.file_a, r.file_b): r.n_shared for r in tile_overlap_pairs(tiles).collect()}
    # the shifted image shares ALL 16 tile signatures position-independently
    assert pairs == {("a.png", "b.png"): 16}
