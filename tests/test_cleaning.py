"""Operator unit tests: cleaning / casts / timestamps / sentinels.

Covers the reference ETL quirk cases (SURVEY.md section 5): sentinel
nulls, epoch-ms coercion with 1970 defaults, trim, drop/cast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators import (
    add_date_parts,
    cast_columns,
    drop_columns,
    epoch_ms_to_timestamp,
    fill_constants,
    replace_sentinel,
    trim_columns,
)
from image_matadata_batchprocessing_aws_spark.sources.csv_source import normalize_sentinels


def test_drop_cast_trim(spark):
    df = spark.createDataFrame(
        [(1, "  us  ", "http://x"), (2, "de", None)], "id long, country string, url string"
    )
    out = trim_columns(drop_columns(df, ["url"]), ["country"])
    assert out.columns == ["id", "country"]
    assert [r.country for r in out.orderBy("id").collect()] == ["us", "de"]
    out2 = cast_columns(df, {"id": "string"})
    assert dict(out2.dtypes)["id"] == "string"


def test_sentinel_normalization(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "NA"), (4, "NULL"), (5, "<NA>"), (6, "ok")],
        "id long, v string",
    )
    out = normalize_sentinels(df)
    vals = {r.id: r.v for r in out.collect()}
    assert vals == {1: None, 2: None, 3: None, 4: None, 5: None, 6: "ok"}


def test_replace_sentinel_value(spark):
    df = spark.createDataFrame([(1, "<NA>"), (2, "x")], "id long, v string")
    out = replace_sentinel(df, ["v"], "<NA>", "0")
    assert {r.id: r.v for r in out.collect()} == {1: "0", 2: "x"}


def test_epoch_ms_and_date_parts_defaults(spark):
    df = spark.createDataFrame(
        [(1, 1704067200000), (2, None)], "id long, captured_at long"
    )
    out = add_date_parts(epoch_ms_to_timestamp(df, "captured_at", out="ts"), "ts")
    rows = {r.id: (r.year, r.month, r.day) for r in out.collect()}
    assert rows[1] == (2024, 1, 1)
    assert rows[2] == (1970, 1, 1)  # reference default (read_csv_s3_train.py:73-75)


def test_fill_constants(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, "x", 5.0)], "id long, city string, v double"
    )
    out = fill_constants(df, {"city": "Unknown", "v": 0.0})
    rows = {r.id: (r.city, r.v) for r in out.collect()}
    assert rows[1] == ("Unknown", 0.0)
    assert rows[2] == ("x", 5.0)


def test_pseudonymize_is_consistent_and_salt_sensitive(spark):
    from image_matadata_batchprocessing_aws_spark.operators.cleaning import (
        pseudonymize_keys,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,), (1,), (None,)], "k long")
    a = [r.k for r in pseudonymize_keys(df, ["k"], "s1").collect()]
    assert a[0] == a[2] and a[0] != a[1]          # same in -> same token
    assert a[3] is None                            # NULL stays NULL
    assert all(len(t) == 16 for t in a if t)
    b = [r.k for r in pseudonymize_keys(df, ["k"], "s2").collect()]
    assert b[0] != a[0]                            # salt rotation re-keys
