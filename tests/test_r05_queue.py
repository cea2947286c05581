"""The r05 registration queue carries full oracle confidence NOW: every
(query, oracle) pair runs through the same normalize-and-compare check
``tools/check_oracle.py`` applies to the registered inventory."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark.queries import r05_queue
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
from tests.conftest import SF_SMOKE


def test_queue_keys_paired():
    assert set(r05_queue.QUERIES) == set(r05_queue.ORACLES)
    # and no collision with the live registry
    from image_matadata_batchprocessing_aws_spark.queries import all_queries

    assert not set(r05_queue.QUERIES) & set(all_queries())


@pytest.mark.parametrize("name", sorted(r05_queue.QUERIES))
def test_queue_query_matches_oracle(spark, name):
    from tools.check_oracle import normalize

    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_SMOKE}/{tbl}.parquet'"
        )
    sdf = r05_queue.QUERIES[name](spark, SF_SMOKE)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r05_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    assert srows == orows


def test_queue_stays_jvm_side(spark):
    from image_matadata_batchprocessing_aws_spark.plans import assert_no_python_udf

    for name, fn in r05_queue.QUERIES.items():
        assert_no_python_udf(fn(spark, SF_SMOKE))
