"""Regenerate tests/fixtures/images_real.zip — REAL encoded images with
construction-known dimensions, the fixture behind the fully-oracled
``multimodal_image_sniff`` query (VERDICT r3 item 7: the old fake-byte
``images.zip`` stays for the decode-error pipeline test, but a sniff
oracle needs headers whose parse result is knowable WITHOUT running the
sniffer).

The manifest here is the single source of truth: the query's DuckDB
oracle embeds (name, format, w, h, byte-length) literals printed by
this script, and ``tests/test_multimodal.py`` re-checks the committed
zip against the same manifest, so fixture and oracle cannot drift
apart silently.

Usage: python tools/make_image_fixture.py  (prints the oracle rows)
"""

from __future__ import annotations

import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (  # noqa: E402
    encode_bmp,
    encode_jpeg,
    encode_png,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "images_real.zip",
)


def _solid(h: int, w: int, rgb) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = rgb
    return img


#: (entry_name, expected_format, width, height, encoder)
MANIFEST = [
    ("p1.png", "png", 37, 23, lambda: encode_png(_solid(23, 37, (10, 20, 30)))),
    ("p2.png", "png", 224, 112, lambda: encode_png(_solid(112, 224, (200, 0, 50)))),
    # .png EXTENSION with BMP content: the ZIP scan's extension filter
    # (reference parity: .jpg/.jpeg/.png only) admits it, and the
    # sniffer keys on MAGIC — proving format detection is
    # content-derived, not name-derived
    ("b1.png", "bmp", 15, 9, lambda: encode_bmp(_solid(9, 15, (7, 8, 9)))),
    (
        "j1.jpg",
        "jpeg",
        32,
        16,
        lambda: encode_jpeg(_solid(16, 32, (120, 60, 200)), quality=75),
    ),
    (
        "j2.jpeg",
        "jpeg",
        9,
        7,
        lambda: encode_jpeg(_solid(7, 9, (1, 2, 3)), quality=90, subsampling="4:2:0"),
    ),
]


def build() -> list[tuple[str, str, int, int, int]]:
    rows = []
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_STORED) as zf:
        for name, fmt, w, h, enc in MANIFEST:
            data = enc()
            zf.writestr(zipfile.ZipInfo(name), data)  # fixed date -> stable zip
            rows.append((name, fmt, w, h, len(data)))
    return rows


if __name__ == "__main__":
    for row in build():
        print(row)
