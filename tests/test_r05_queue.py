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
    # registered in r05: every queue entry is IN the live registry
    # (all_queries() itself raises on any cross-module name collision)
    from image_matadata_batchprocessing_aws_spark.queries import all_queries, all_oracles

    reg = all_queries()
    assert set(r05_queue.QUERIES) <= set(reg)
    assert set(r05_queue.ORACLES) <= set(all_oracles())


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


# (test_queue_stays_jvm_side retired with registration: the queue is
# now part of all_queries(), so test_plans.py::
# test_whole_inventory_stays_jvm_side covers every entry.)
