"""EXIF metadata extraction from JPEG APP1 — the reference's namesake.

The reference repo is *image metadata* batch processing: it carries a
CSV of per-image metadata next to the image archive and joins the two
(SURVEY section 3.1/3.2).  Real camera imagery carries that metadata
IN-BAND as an EXIF APP1 segment — a TIFF-structured IFD tree embedded
in the JPEG container — so a metadata engine should be able to read it
without a side CSV.  This module adds that:

- ``build_exif_app1`` / ``inject_app1`` — fixture writers: construct a
  conforming APP1 (``Exif\\0\\0`` + TIFF header + IFD0 + Exif sub-IFD +
  GPS sub-IFD, either byte order) and splice it into a JPEG after SOI.
- ``parse_exif`` — pure-stdlib reader: walks the JPEG marker stream to
  APP1, then the TIFF IFD tree (BYTE/ASCII/SHORT/LONG/RATIONAL types,
  II and MM byte orders, Exif and GPS pointer tags), and returns a flat
  dict of the portable fields.
- ``extract_exif`` — the distributed stage: Arrow-batched
  ``mapInPandas`` with an explicit result schema and per-row
  ``exif_error`` isolation (house style — bad rows are kept and
  labeled, never dropped, matching ``decode_images``).

GPS coordinates return as signed decimal degrees computed as
``deg + min/60.0 + sec/3600.0`` (textually identical arithmetic in the
DuckDB oracle twin so the doubles match bit-for-bit).

Scale notes: parsing is map-side CPU work with zero shuffle; APP1 is
capped at 64 KiB by the JPEG format so per-row memory is bounded; the
marker walk stops at SOS so the entropy-coded body is never touched.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from image_matadata_batchprocessing_aws_spark.multimodal.codecs import ImageFormatError

# TIFF field types used by EXIF
_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_TYPE_SIZE = {_T_BYTE: 1, _T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_RATIONAL: 8}

# IFD0 tags
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
# Exif sub-IFD tags
TAG_EXPOSURE_TIME = 0x829A
TAG_F_NUMBER = 0x829D
TAG_ISO = 0x8827
TAG_DATETIME_ORIGINAL = 0x9003
TAG_FOCAL_LENGTH = 0x920A
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
# GPS sub-IFD tags
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004


def _pack_ifd(entries, ifd_off: int, endian: str) -> bytes:
    """Pack one IFD at ``ifd_off``: entries are ``(tag, type, values)``
    with values a list of ints, ``(num, den)`` rational tuples, or one
    ASCII string.  Values wider than 4 bytes overflow to a data block
    directly after the IFD (next-IFD pointer = 0)."""
    ifd_size = 2 + 12 * len(entries) + 4
    overflow = bytearray()
    body = struct.pack(endian + "H", len(entries))
    for tag, typ, values in sorted(entries):
        if typ == _T_ASCII:
            raw = values.encode("ascii") + b"\x00"
            count = len(raw)
        elif typ == _T_RATIONAL:
            raw = b"".join(struct.pack(endian + "II", n, d) for n, d in values)
            count = len(values)
        else:
            fmt = {_T_BYTE: "B", _T_SHORT: "H", _T_LONG: "I"}[typ]
            raw = b"".join(struct.pack(endian + fmt, v) for v in values)
            count = len(values)
        head = struct.pack(endian + "HHI", tag, typ, count)
        if len(raw) <= 4:
            head += raw + b"\x00" * (4 - len(raw))
        else:
            head += struct.pack(endian + "I", ifd_off + ifd_size + len(overflow))
            overflow += raw
        body += head
    body += struct.pack(endian + "I", 0)
    return body + bytes(overflow)


def build_exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime_original: str,
    pixel_x: int,
    pixel_y: int,
    iso: int,
    f_number: tuple[int, int],
    exposure_time: tuple[int, int],
    focal_length: tuple[int, int],
    gps_lat: tuple[str, int, int, tuple[int, int]],
    gps_lon: tuple[str, int, int, tuple[int, int]],
    big_endian: bool = False,
) -> bytes:
    """Construct a conforming EXIF APP1 segment (marker included).

    ``gps_lat``/``gps_lon`` are ``(ref, deg, min, (sec_num, sec_den))``.
    """
    endian = ">" if big_endian else "<"

    def gps_entries(ref_tag, val_tag, ref, deg, minute, sec):
        return [
            (ref_tag, _T_ASCII, ref),
            (val_tag, _T_RATIONAL, [(deg, 1), (minute, 1), sec]),
        ]

    exif_entries = [
        (TAG_DATETIME_ORIGINAL, _T_ASCII, datetime_original),
        (TAG_F_NUMBER, _T_RATIONAL, [f_number]),
        (TAG_EXPOSURE_TIME, _T_RATIONAL, [exposure_time]),
        (TAG_ISO, _T_SHORT, [iso]),
        (TAG_FOCAL_LENGTH, _T_RATIONAL, [focal_length]),
        (TAG_PIXEL_X, _T_LONG, [pixel_x]),
        (TAG_PIXEL_Y, _T_LONG, [pixel_y]),
    ]
    gps = gps_entries(TAG_GPS_LAT_REF, TAG_GPS_LAT, *gps_lat) + gps_entries(
        TAG_GPS_LON_REF, TAG_GPS_LON, *gps_lon
    )

    # Two-pass layout: sizes don't depend on the pointer values, so a
    # dry pack with zero pointers yields the real offsets.
    def ifd0(exif_off: int, gps_off: int):
        return [
            (TAG_MAKE, _T_ASCII, make),
            (TAG_MODEL, _T_ASCII, model),
            (TAG_ORIENTATION, _T_SHORT, [orientation]),
            (TAG_DATETIME, _T_ASCII, datetime_original),
            (TAG_EXIF_IFD, _T_LONG, [exif_off]),
            (TAG_GPS_IFD, _T_LONG, [gps_off]),
        ]

    ifd0_len = len(_pack_ifd(ifd0(0, 0), 8, endian))
    exif_off = 8 + ifd0_len
    exif_len = len(_pack_ifd(exif_entries, exif_off, endian))
    gps_off = exif_off + exif_len
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(endian + "H", 42)
        + struct.pack(endian + "I", 8)
        + _pack_ifd(ifd0(exif_off, gps_off), 8, endian)
        + _pack_ifd(exif_entries, exif_off, endian)
        + _pack_ifd(gps, gps_off, endian)
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment into a JPEG directly after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ImageFormatError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _read_ifd(tiff: bytes, off: int, endian: str) -> dict[int, object]:
    """Read one IFD into ``{tag: decoded_value}``; no pointer recursion."""
    if off + 2 > len(tiff):
        raise ImageFormatError("EXIF IFD offset out of range")
    (n,) = struct.unpack_from(endian + "H", tiff, off)
    out: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            raise ImageFormatError("EXIF IFD truncated")
        tag, typ, count = struct.unpack_from(endian + "HHI", tiff, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:  # unknown type: skip the tag, stay tolerant
            continue
        nbytes = size * count
        if nbytes <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", tiff, base + 8)
        if voff + nbytes > len(tiff):
            raise ImageFormatError("EXIF value out of range")
        raw = tiff[voff : voff + nbytes]
        if typ == _T_ASCII:
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == _T_RATIONAL:
            vals = [
                struct.unpack_from(endian + "II", raw, 8 * j) for j in range(count)
            ]
            out[tag] = vals if count > 1 else vals[0]
        else:
            fmt = {_T_BYTE: "B", _T_SHORT: "H", _T_LONG: "I"}[typ]
            vals = [struct.unpack_from(endian + fmt, raw, size * j)[0] for j in range(count)]
            out[tag] = vals if count > 1 else vals[0]
    return out


def _gps_degrees(ref, dms) -> float | None:
    """``(ref, [(d,1),(m,1),(sn,sd)])`` -> signed decimal degrees; the
    ``d + m/60.0 + s/3600.0`` arithmetic is textually mirrored in the
    oracle SQL so doubles match bit-for-bit."""
    if ref is None or dms is None or len(dms) != 3:
        return None
    (dn, dd), (mn, md), (sn, sd) = dms
    if 0 in (dd, md, sd):
        return None
    val = dn / dd + (mn / md) / 60.0 + (sn / sd) / 3600.0
    return -val if ref in ("S", "W") else val


def _ratio(v) -> float | None:
    if v is None:
        return None
    n, d = v
    return None if d == 0 else n / d


def parse_exif(content: bytes) -> dict:
    """Walk the JPEG marker stream to APP1/Exif and parse the IFD tree.

    Raises ``ImageFormatError`` for a malformed container; a JPEG with
    no EXIF returns a dict of Nones (absence is data, not an error).
    """
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ImageFormatError("not a JPEG (missing SOI)")
    fields = dict.fromkeys(
        (
            "make", "model", "orientation", "datetime_original",
            "exif_width", "exif_height", "iso", "f_number",
            "exposure_time", "focal_length", "gps_lat", "gps_lon",
        )
    )
    pos = 2
    tiff = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ImageFormatError("bad JPEG marker sync in EXIF walk")
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS — entropy body; no APP1 past here
            break
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(content):
            raise ImageFormatError("JPEG segment overruns file in EXIF walk")
        if marker == 0xE1 and content[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = content[pos + 10 : pos + 2 + seglen]
            break
        pos += 2 + seglen
    if tiff is None:
        return fields
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        raise ImageFormatError("bad EXIF TIFF header")
    endian = "<" if tiff[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(endian + "H", tiff, 2)
    if magic != 42:
        raise ImageFormatError("bad EXIF TIFF magic")
    (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, endian)
    fields["make"] = ifd0.get(TAG_MAKE)
    fields["model"] = ifd0.get(TAG_MODEL)
    fields["orientation"] = ifd0.get(TAG_ORIENTATION)
    exif_ptr = ifd0.get(TAG_EXIF_IFD)
    if isinstance(exif_ptr, int):
        sub = _read_ifd(tiff, exif_ptr, endian)
        fields["datetime_original"] = sub.get(TAG_DATETIME_ORIGINAL)
        fields["exif_width"] = sub.get(TAG_PIXEL_X)
        fields["exif_height"] = sub.get(TAG_PIXEL_Y)
        fields["iso"] = sub.get(TAG_ISO)
        fields["f_number"] = _ratio(sub.get(TAG_F_NUMBER))
        fields["exposure_time"] = _ratio(sub.get(TAG_EXPOSURE_TIME))
        fields["focal_length"] = _ratio(sub.get(TAG_FOCAL_LENGTH))
    gps_ptr = ifd0.get(TAG_GPS_IFD)
    if isinstance(gps_ptr, int):
        gps = _read_ifd(tiff, gps_ptr, endian)
        fields["gps_lat"] = _gps_degrees(gps.get(TAG_GPS_LAT_REF), gps.get(TAG_GPS_LAT))
        fields["gps_lon"] = _gps_degrees(gps.get(TAG_GPS_LON_REF), gps.get(TAG_GPS_LON))
    return fields


EXIF_SCHEMA = (
    "file_name string, make string, model string, orientation int, "
    "datetime_original string, exif_width long, exif_height long, iso int, "
    "f_number double, exposure_time double, focal_length double, "
    "gps_lat double, gps_lon double, exif_error string"
)


def extract_exif(
    entries: DataFrame, content_col: str = "content", name_col: str = "entry_name"
) -> DataFrame:
    """The distributed EXIF stage: Arrow-batched ``mapInPandas`` with
    per-row error isolation (malformed containers land in
    ``exif_error``; EXIF-less JPEGs yield null fields, not errors)."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in EXIF_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for name, content in zip(pdf[name_col], pdf[content_col]):
                try:
                    f = parse_exif(bytes(content))
                    rows.append(
                        (
                            name, f["make"], f["model"], f["orientation"],
                            f["datetime_original"], f["exif_width"],
                            f["exif_height"], f["iso"], f["f_number"],
                            f["exposure_time"], f["focal_length"],
                            f["gps_lat"], f["gps_lon"], None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name,) + (None,) * 12 + (str(exc),))
            yield pd.DataFrame(rows, columns=cols)

    return entries.mapInPandas(walk, EXIF_SCHEMA)
