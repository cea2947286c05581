"""Multimodal-column queries (Stage 3).

The driver tables carry no binary columns, so: (a) binary *metadata*
ops run over utf8-encoded document text with a DuckDB oracle; (b) the
full image pipeline (ZIP scan -> decode -> resize -> join) runs over the
committed deterministic fixture ``tests/fixtures/images.zip`` as a
rows-only check (stable output; decode is the clearly-marked
deterministic fake — see multimodal/images.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.multimodal import (
    decode_images,
    image_metadata_join,
    scan_zip_entries,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

_FIXTURE_ZIP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "images.zip",
)


def multimodal_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-binary metadata surface: byte length + content hash of the
    utf8 payload (S6-shaped typed metadata over binary columns)."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


def multimodal_image_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end image path on the fixture ZIP: binaryFile scan ->
    mapInPandas unzip -> decode/resize/pad (deterministic fake) ->
    explicit image<->metadata join.  Rows-only driver check (no SQL
    equivalent for the Arrow UDTF stages)."""
    entries = scan_zip_entries(spark, _FIXTURE_ZIP)
    decoded = decode_images(entries)
    meta = spark.createDataFrame(
        [(101, 48.137, 11.575), (102, 40.712, -74.006), (103, 35.676, 139.65)],
        "id long, latitude double, longitude double",
    )
    joined = image_metadata_join(decoded, meta)
    return joined.select(
        "id",
        "file_name",
        "channels",
        "height",
        "width",
        F.col("decode_error").isNotNull().alias("failed"),
        F.round(F.aggregate("image", F.lit(0.0), lambda s, v: s + v), 2).alias(
            "pixel_sum"
        ),
        "latitude",
    )


def multimodal_image_sniff(spark: SparkSession, sf: str) -> DataFrame:
    """Codec-free header catalog of the fixture ZIP's entries: format +
    dimensions parsed from the binary headers with pure Catalyst
    expressions (multimodal/images.sniff_image_meta).  Rows-only check
    (binary fixture input, no SQL twin)."""
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        sniff_image_meta,
    )

    entries = scan_zip_entries(spark, _FIXTURE_ZIP)
    return sniff_image_meta(entries).select(
        "entry_name", "image_format", "image_width", "image_height", "image_bytes"
    )


QUERIES = {
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_image_pipeline": multimodal_image_pipeline,
    "multimodal_image_sniff": multimodal_image_sniff,
}

ORACLES = {
    "multimodal_binary_meta": """
        SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_md5
        FROM documents
    """,
}
