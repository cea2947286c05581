from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators import (
    add_batch_id,
    expect_no_nulls,
    null_audit,
    total_nulls,
    write_size_split_csv,
)


def test_null_audit_counts(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, 3.0, None), (3, None, None)], "id long, a double, b string"
    )
    row = null_audit(df).collect()[0]
    assert (row["id"], row["a"], row["b"]) == (0, 2, 2)
    assert total_nulls(df) == 4


def test_expect_no_nulls_gate(spark):
    clean = spark.createDataFrame([(1, 2.0)], "id long, a double")
    expect_no_nulls(clean)  # passes
    dirty = spark.createDataFrame([(1, None)], "id long, a double")
    with pytest.raises(AssertionError):
        expect_no_nulls(dirty)


def test_add_batch_id_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(450)], "id long")
    out = add_batch_id(df, 200, order_by="id")
    sizes = {r.batch_id: r.n for r in out.groupBy("batch_id").agg(F.count("*").alias("n")).collect()}
    assert sizes == {0: 200, 1: 200, 2: 50}  # 200-per-batch + final partial (A9)


def test_write_size_split_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(i, f"name_{i}") for i in range(1000)], "id long, name string")
    out_dir = str(tmp_path / "parts")
    write_size_split_csv(df, out_dir, max_records_per_file=300)
    files = glob.glob(os.path.join(out_dir, "*.csv"))
    assert files  # header'd parts exist
    back = spark.read.option("header", True).csv(out_dir)
    assert back.count() == 1000  # union-of-parts == original (U1)
    assert back.columns == ["id", "name"]


def test_expectations_report_semantics(spark):
    """Every rule kind, planted violations, and the one-pass shape."""
    from image_matadata_batchprocessing_aws_spark.operators.audit import (
        expectations_report,
    )
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "ok-1"),
            (2, "a", 99.0, "ok-2"),
            (3, None, -5.0, "bad!"),
            (3, "c", 50.0, None),
        ],
        "id int, grp string, x double, tag string",
    )
    rules = [
        ("not_null", "grp"),
        ("unique", "id"),
        ("in_range", "x", 0.0, 100.0),
        ("in_set", "grp", ["a", "c"]),
        ("matches", "tag", "^ok-[0-9]$"),
        ("min_rows", 10),
    ]
    out = expectations_report(df, rules)
    got = {(r.rule, r.column): (r.violations, r.passed) for r in out.collect()}
    assert got[("not_null", "grp")] == (1, False)
    assert got[("unique", "id")] == (1, False)  # id 3 twice
    assert got[("in_range", "x")] == (1, False)  # -5.0
    assert got[("in_set", "grp")] == (1, False)  # the null
    assert got[("matches", "tag")] == (1, False)  # 'bad!'
    assert got[("min_rows", "*")] == (6, False)  # shortfall 10 - 4
    # one aggregate pass: a single scan node in the plan
    import re

    assert len(re.findall(r"^\(\d+\) Scan", formatted_plan(out), re.M)) == 1
