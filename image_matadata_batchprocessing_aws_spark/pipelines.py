"""The reference's flagship metadata ETL as ONE lazy Catalyst plan.

``Image_Train_Model/read_csv_s3_train.py`` runs: chunked CSV read
(``:47-53``) -> per-chunk ``process_batch`` (``:57-118``: drop, cast,
trim, to_datetime + date parts, ffill/bfill, constant fills, null audit,
label encode, numeric fill, z-score) -> list-append + concat
(``:122-134``) -> assert-no-nulls (``:136-139``) -> ``np.save``
(``:142``) -> reload-verify (``:145-153``).

Here the whole thing is one DataFrame chain materialized by a single
parquet write: the chunk loop, concat, GC calls, and ``.npy`` schema loss
have no equivalent (SURVEY section 3.1 "Spark shape").

Documented divergences (SURVEY section 7 design stance):

- encoder/scaler statistics are fit GLOBALLY via two-pass operators; the
  reference fits per 100k-row chunk (``:96-109``), so its codes/scales
  are chunk-dependent — a bug we do not reproduce.
- ffill ordering is explicit (default: the ``id`` column via the scale
  path ``ffill_partitioned``); the reference silently relies on CSV row
  order within a chunk and never fills across chunk boundaries.
- ``id``/``creator_id`` stay integral/typed; the reference casts to str
  (``:64-65``) and then erases all types through ``.npy``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from image_matadata_batchprocessing_aws_spark.operators.audit import expect_no_nulls
from image_matadata_batchprocessing_aws_spark.operators.cleaning import (
    add_date_parts,
    drop_columns,
    epoch_ms_to_timestamp,
    trim_columns,
)
from image_matadata_batchprocessing_aws_spark.operators.encode import label_encode
from image_matadata_batchprocessing_aws_spark.operators.impute import ffill_partitioned
from image_matadata_batchprocessing_aws_spark.operators.scale import zscore_scale
from image_matadata_batchprocessing_aws_spark.schemas import (
    ENCODE_COLUMNS,
    FFILL_COLUMNS,
    TRIM_COLUMNS,
    UNKNOWN_FILL_COLUMNS,
    ZSCORE_COLUMNS,
)


def metadata_etl(df: DataFrame, order_col: str = "id") -> DataFrame:
    """``process_batch`` (``read_csv_s3_train.py:57-118``) as one lazy
    plan over a METADATA_SCHEMA frame."""
    d = drop_columns(df, ["thumb_original_url"])  # :61 (P1)
    d = trim_columns(d, TRIM_COLUMNS)  # :67-69 (F1)
    d = epoch_ms_to_timestamp(d, "captured_at", out="captured_ts")  # :72 (F2)
    d = add_date_parts(d, "captured_ts")  # :73-75 (F3)
    d = ffill_partitioned(d, FFILL_COLUMNS, order_by=order_col)  # :77-80 (W1)
    d = d.na.fill({c: "Unknown" for c in UNKNOWN_FILL_COLUMNS})  # :83-84 (F4)
    d = label_encode(d, ENCODE_COLUMNS)  # :96-100 (A8, global fit)
    numeric_cols = [
        f.name
        for f in d.schema.fields
        if isinstance(f.dataType, (T.IntegerType, T.LongType, T.DoubleType, T.FloatType))
    ]
    d = d.na.fill(0, numeric_cols)  # :102-104 (F4 numeric)
    d = zscore_scale(d, ZSCORE_COLUMNS)  # :107-109 (A3, global fit)
    return d


def metadata_etl_verified(df: DataFrame, order_col: str = "id") -> DataFrame:
    """metadata_etl + the reference's hard quality gate
    (``assert total_missing == 0``, ``read_csv_s3_train.py:136-139``) on
    every column the pipeline promises to have filled."""
    out = metadata_etl(df, order_col)
    # captured_ts legitimately stays null for unparseable epochs (the
    # date parts carry the 1970 defaults, ref :73-75); every other column
    # is covered by ffill+bfill, "Unknown"/0 fills, or encoding
    checked = [c for c in out.columns if c != "captured_ts"]
    return expect_no_nulls(out, checked)
