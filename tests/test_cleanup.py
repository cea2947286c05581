"""S13 delete-after-consume: commit-before-delete ordering.

Reference behavior (``process_test_train_Images.py:68-71``) deletes the
consumed source even when the batch failed; the engine's deliberate
divergence is delete-only-after-commit, gated off by default.
"""

from __future__ import annotations

import os

import pytest

from image_matadata_batchprocessing_aws_spark.operators.cleanup import (
    cleanup_after_commit,
    write_parquet_then_cleanup,
)


@pytest.fixture()
def source_dir(tmp_path):
    src = tmp_path / "source"
    src.mkdir()
    (src / "part-000.csv").write_text("a,b\n1,2\n")
    return src


def test_disabled_gate_deletes_nothing(spark, source_dir):
    assert cleanup_after_commit(spark, [str(source_dir)], enabled=False) == []
    assert source_dir.exists()


def test_commit_then_delete(spark, tmp_path, source_dir):
    df = spark.range(10).toDF("id")
    out = tmp_path / "out.parquet"
    deleted = write_parquet_then_cleanup(
        df, str(out), [str(source_dir)], enabled=True
    )
    assert deleted == [str(source_dir)]
    assert not source_dir.exists()
    assert spark.read.parquet(str(out)).count() == 10


def test_failed_write_deletes_nothing(spark, tmp_path, source_dir):
    df = spark.range(10).toDF("id")
    out = tmp_path / "occupied.parquet"
    df.write.parquet(str(out))  # occupy the target so mode="error" raises
    with pytest.raises(Exception):
        write_parquet_then_cleanup(df, str(out), [str(source_dir)], enabled=True)
    assert source_dir.exists()
    assert os.path.exists(source_dir / "part-000.csv")


def test_missing_path_is_not_an_error(spark, tmp_path):
    gone = tmp_path / "never-existed"
    assert cleanup_after_commit(spark, [str(gone)], enabled=True) == []
