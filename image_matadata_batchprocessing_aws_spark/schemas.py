"""Explicit schemas — declared at the edge, never inferred in production.

The reference declares a 32-column dtype map at CSV ingestion
(``Image_Train_Model/read_csv_s3_train.py:11-44``) and null sentinels at
``:52``.  We keep the same column inventory but repair the type erosion the
reference performs downstream (id/creator_id recast to str at ``:64-65``,
schema loss through ``.npy`` at ``:142``): ids stay integral, epoch-ms
becomes a real TimestampType, and parquet preserves everything.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Null sentinels used by the reference CSV reader
#: (``read_csv_s3_train.py:52``) plus the ``'<NA>'`` string handled at
#: ``Best-Model-architecture-for-local.py:23``.
NULL_SENTINELS = ["", " ", "NA", "NULL", "<NA>"]

#: The 32-column OSV5M-style image-metadata table
#: (``read_csv_s3_train.py:11-44``; Spark types per SURVEY.md section 1.2).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("thumb_original_url", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("captured_at", T.LongType(), True),  # epoch-ms
        T.StructField("lon_bin", T.IntegerType(), True),
        T.StructField("lat_bin", T.IntegerType(), True),
        T.StructField("cell", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("sub-region", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("land_cover", T.IntegerType(), True),
        T.StructField("road_index", T.DoubleType(), True),
        T.StructField("drive_side", T.IntegerType(), True),
        T.StructField("climate", T.IntegerType(), True),
        T.StructField("soil", T.IntegerType(), True),
        T.StructField("dist_sea", T.DoubleType(), True),
        T.StructField("quadtree_10_500", T.LongType(), True),
        T.StructField("quadtree_10_1000", T.LongType(), True),
        T.StructField("quadtree_10_2500", T.LongType(), True),
        T.StructField("quadtree_10_5000", T.LongType(), True),
        T.StructField("quadtree_10_12500", T.LongType(), True),
        T.StructField("quadtree_10_25000", T.LongType(), True),
        T.StructField("quadtree_10_50000", T.LongType(), True),
        T.StructField("unique_region", T.StringType(), True),
        T.StructField("unique_sub-region", T.StringType(), True),
        T.StructField("unique_city", T.StringType(), True),
        T.StructField("unique_country", T.StringType(), True),
        T.StructField("creator_username", T.StringType(), True),
        T.StructField("creator_id", T.StringType(), True),
    ]
)

#: Columns the reference trims (``read_csv_s3_train.py:67-69``).
TRIM_COLUMNS = ["country", "region", "sub-region", "city", "sequence"]

#: Columns the reference forward/backward-fills (``read_csv_s3_train.py:77-80``).
FFILL_COLUMNS = [
    "country",
    "region",
    "sub-region",
    "city",
    "unique_region",
    "unique_sub-region",
    "unique_country",
]

#: Constant fills (``read_csv_s3_train.py:83-84``).
UNKNOWN_FILL_COLUMNS = ["unique_city", "creator_username", "creator_id"]

#: Label-encoded categoricals (``read_csv_s3_train.py:96-100``).
ENCODE_COLUMNS = [
    "country",
    "sequence",
    "cell",
    "region",
    "sub-region",
    "city",
    "unique_region",
    "unique_sub-region",
    "unique_city",
    "unique_country",
    "creator_username",
    "creator_id",
]

#: Z-scored numerics (``read_csv_s3_train.py:107-109``).
ZSCORE_COLUMNS = ["latitude", "longitude", "dist_sea", "road_index"]

#: Decoded-image row: the explicit keyed form of the reference's
#: positional ``(file_name, tensor)`` pairs (``process_test_train_Images.py:47``
#: builds the pair, ``:75`` drops the name — we keep it as the join key).
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("image", T.ArrayType(T.FloatType()), True),  # C*H*W flat
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

#: Driver `events` table (TESTDATA.md) — the streaming surface.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: Star-schema + pipeline table names the driver pre-registers.
DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
