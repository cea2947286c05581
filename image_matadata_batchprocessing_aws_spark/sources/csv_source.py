"""Schema'd CSV scans (SURVEY.md S1-S3).

The reference reads S3 CSV with an explicit 32-column dtype map, 100k-row
chunks, and sentinel null strings (``Image_Train_Model/
read_csv_s3_train.py:47-53``).  In Spark the dtype map is a StructType,
sentinel nulls are the reader's ``nullValue`` plus a post-read sentinel
sweep (CSV readers accept a single nullValue, so the remaining sentinels
are normalized by :func:`normalize_sentinels`), and chunking disappears —
file-split partitions bound memory instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from image_matadata_batchprocessing_aws_spark.schemas import METADATA_SCHEMA, NULL_SENTINELS


def normalize_sentinels(df: DataFrame, sentinels: list[str] | None = None) -> DataFrame:
    """Replace sentinel strings with real nulls on every string column.

    Covers the reference's ``na_values=["", " ", "NA", "NULL"]``
    (``read_csv_s3_train.py:52``) and the ``'<NA>'`` handled at
    ``Best-Model-architecture-for-local.py:23``.
    """
    sentinels = NULL_SENTINELS if sentinels is None else sentinels
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType):
            c = F.col(f"`{field.name}`")
            out = out.withColumn(
                field.name, F.when(F.trim(c).isin([s.strip() for s in sentinels]) | (F.trim(c) == ""), F.lit(None)).otherwise(c)
            )
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sentinels: list[str] | None = None,
) -> DataFrame:
    """Schema'd CSV scan with sentinel-null normalization (S1/S2/S3)."""
    df = (
        spark.read.schema(schema)
        .options(header=str(header).lower(), nullValue="NA", nanValue="", mode="PERMISSIVE")
        .csv(path)
    )
    return normalize_sentinels(df, sentinels)


def read_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """The reference's metadata CSV scan with its exact 32-column schema."""
    return read_csv(spark, path, METADATA_SCHEMA)


def parse_fixed_width(
    df: DataFrame,
    line_col: str,
    fields: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width record parser — the mainframe/legacy-feed format
    that predates delimiters: ``fields`` is (name, start_1_based,
    width, spark_type); each field is a substring, trimmed, cast.
    Pure map-side expressions (one projection, no UDF); empty-after-
    trim fields become NULL rather than failing the ANSI cast, so a
    blank-padded numeric column behaves like a CSV null.
    """
    cols = []
    for name, start, width, typ in fields:
        raw = F.trim(F.substring(F.col(line_col), start, width))
        val = F.when(raw != "", raw).cast(typ)
        cols.append(val.alias(name))
    return df.select(*cols)
