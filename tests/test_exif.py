"""EXIF APP1 build/parse round-trips and the distributed extract stage.

The reference joins a side CSV of per-image metadata
(``Image_Train_Model/read_csv_s3_train.py``); ``multimodal/exif.py``
reads the in-band equivalent (APP1/TIFF IFD tree).  Round-trips cover
both byte orders, value overflow vs inline storage, EXIF-less files
(nulls, not errors), and malformed containers (per-row isolation).
"""

from __future__ import annotations

import numpy as np
import pytest

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import ImageFormatError, encode_jpeg
from image_matadata_batchprocessing_aws_spark.multimodal.exif import (
    build_exif_app1,
    extract_exif,
    inject_app1,
    parse_exif,
)

TAGS = dict(
    make="ACME",
    model="Cam-9",
    orientation=6,
    datetime_original="2023:05:01 12:34:56",
    pixel_x=4000,
    pixel_y=3000,
    iso=200,
    f_number=(28, 10),
    exposure_time=(1, 125),
    focal_length=(350, 10),
    gps_lat=("N", 37, 46, (302, 10)),
    gps_lon=("W", 122, 25, (99, 10)),
)


@pytest.fixture(scope="module")
def carrier():
    return encode_jpeg(np.full((16, 16, 3), 128, np.uint8))


@pytest.mark.parametrize("big_endian", [False, True])
def test_round_trip_both_endians(carrier, big_endian):
    jp = inject_app1(carrier, build_exif_app1(**TAGS, big_endian=big_endian))
    f = parse_exif(jp)
    assert f["make"] == "ACME" and f["model"] == "Cam-9"
    assert f["orientation"] == 6
    assert f["datetime_original"] == "2023:05:01 12:34:56"
    assert (f["exif_width"], f["exif_height"]) == (4000, 3000)
    assert f["iso"] == 200
    assert f["f_number"] == 2.8
    assert f["exposure_time"] == 1 / 125
    assert f["focal_length"] == 35.0
    assert f["gps_lat"] == 37 + 46 / 60.0 + (302 / 10) / 3600.0
    assert f["gps_lon"] == -(122 + 25 / 60.0 + (99 / 10) / 3600.0)


def test_short_strings_store_inline(carrier):
    """A <=3-char make packs into the 4-byte value field (no overflow);
    the parser must read it inline, not chase an offset."""
    tags = dict(TAGS, make="abc", model="x")
    f = parse_exif(inject_app1(carrier, build_exif_app1(**tags)))
    assert f["make"] == "abc" and f["model"] == "x"


def test_no_exif_yields_nulls_not_error(carrier):
    f = parse_exif(carrier)
    assert all(v is None for v in f.values())


def test_non_jpeg_and_truncated_raise():
    with pytest.raises(ImageFormatError):
        parse_exif(b"\x89PNG\r\n")
    with pytest.raises(ImageFormatError):
        parse_exif(b"\xff\xd8\xff\xe1\x00\x40Exif\x00\x00II")


def test_zero_denominator_rational_is_null(carrier):
    tags = dict(TAGS, exposure_time=(1, 0), gps_lat=("N", 37, 46, (302, 0)))
    f = parse_exif(inject_app1(carrier, build_exif_app1(**tags)))
    assert f["exposure_time"] is None
    assert f["gps_lat"] is None
    assert f["f_number"] == 2.8  # intact fields still parse


def test_extract_exif_isolates_bad_rows(spark, carrier):
    good = inject_app1(carrier, build_exif_app1(**TAGS))
    entries = spark.createDataFrame(
        [
            (0, "good.jpg", bytearray(good)),
            (1, "noexif.jpg", bytearray(carrier)),
            (2, "broken.bin", bytearray(b"\x00\x01\x02")),
        ],
        "doc_id long, entry_name string, content binary",
    )
    rows = {r["file_name"]: r for r in extract_exif(entries).collect()}
    assert rows["good.jpg"]["exif_error"] is None
    assert rows["good.jpg"]["make"] == "ACME"
    assert rows["good.jpg"]["gps_lon"] == pytest.approx(-122.41941666666668)
    assert rows["noexif.jpg"]["exif_error"] is None
    assert rows["noexif.jpg"]["make"] is None
    assert rows["broken.bin"]["exif_error"] is not None
    assert rows["broken.bin"]["make"] is None
