"""The r08 staging queue carries full oracle confidence NOW — the same
discipline test_r07_queue.py applies: every staged (query, oracle) pair
runs through the exact normalize-and-compare check
``tools/check_oracle.py`` applies to the registered inventory, plus the
drain-plan cap (growth <= drain rate, the r03 lesson)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark.queries import r07_queue, r08_queue
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
from tests.conftest import SF_SMOKE


def test_queue_keys_paired_and_capped():
    assert set(r08_queue.QUERIES) == set(r08_queue.ORACLES)
    # staged: no collision with the live registry OR the r07 queue
    from image_matadata_batchprocessing_aws_spark.queries import all_queries

    assert not set(r08_queue.QUERIES) & set(all_queries())
    assert not set(r08_queue.QUERIES) & set(r07_queue.QUERIES)
    # drain-plan cap: stage at most 50 pairs per round (growth <= drain)
    assert len(r08_queue.QUERIES) <= 50


@pytest.mark.parametrize("name", sorted(r08_queue.QUERIES))
def test_queue_query_matches_oracle(spark, name):
    from tools.check_oracle import normalize

    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_SMOKE}/{tbl}.parquet'"
        )
    sdf = r08_queue.QUERIES[name](spark, SF_SMOKE)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r08_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    assert srows == orows


def test_staged_queries_construct_lazily(spark):
    """ADVICE r7: ``eval_holm_bonferroni`` ran ``tests.count()`` during
    construction, so merely BUILDING the DataFrame (plan dumps, plan
    tests) executed a full Spark job — unlike every other staged query.
    Lock laziness for the whole queue: constructing every staged
    DataFrame must launch zero Spark jobs."""
    sc = spark.sparkContext
    # warm pass: first-touch parquet loads may run one-off
    # schema/footer jobs, which are per-session, not per-construction
    for fn in r08_queue.QUERIES.values():
        fn(spark, SF_SMOKE)
    group = "r08_lazy_probe"
    sc.setJobGroup(group, "construction must not run jobs")
    try:
        for name, fn in r08_queue.QUERIES.items():
            fn(spark, SF_SMOKE)
            ids = sc.statusTracker().getJobIdsForGroup(group)
            assert ids == [], f"{name} ran Spark job(s) during construction: {ids}"
    finally:
        sc.setJobGroup("default", "")
