"""EXIF orientation normalization: each tag value against the
independent numpy expression for its display transform (EXIF 2.3 /
PIL exif_transpose semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.images import apply_exif_orientation


@pytest.fixture()
def img():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)


EXPECT = {
    1: lambda a: a,
    2: lambda a: a[:, ::-1],
    3: lambda a: a[::-1, ::-1],
    4: lambda a: a[::-1, :],
    5: lambda a: a.swapaxes(0, 1),
    6: lambda a: np.rot90(a, 3),
    7: lambda a: a[::-1, ::-1].swapaxes(0, 1),
    8: lambda a: np.rot90(a, 1),
}


@pytest.mark.parametrize("tag", sorted(EXPECT))
def test_each_orientation(img, tag):
    np.testing.assert_array_equal(
        apply_exif_orientation(img, tag), EXPECT[tag](img)
    )


def test_rotations_swap_dims(img):
    for tag in (5, 6, 7, 8):
        assert apply_exif_orientation(img, tag).shape == (6, 4, 3)
    for tag in (1, 2, 3, 4):
        assert apply_exif_orientation(img, tag).shape == (4, 6, 3)


def test_absent_or_unknown_passes_through(img):
    np.testing.assert_array_equal(apply_exif_orientation(img, None), img)
    np.testing.assert_array_equal(apply_exif_orientation(img, 99), img)


def test_display_round_trip(img):
    """Storing a display image under orientation o (inverse transform)
    then normalizing recovers it — 6 and 8 invert each other, the rest
    self-invert."""
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for o, inv in inverse.items():
        stored = apply_exif_orientation(img, inv)
        np.testing.assert_array_equal(
            apply_exif_orientation(stored, o), img, err_msg=f"tag {o}"
        )
