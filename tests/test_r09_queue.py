"""The r09 staging queue carries full oracle confidence NOW — the same
discipline as tests/test_r08_queue.py: every staged (query, oracle)
pair runs through the exact normalize-and-compare check
``tools/check_oracle.py`` applies to the registered inventory, plus the
drain-plan cap (growth <= drain rate, the r03 lesson) and the
lazy-construction lock (ADVICE r7)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark.queries import r07_queue, r08_queue, r09_queue
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
from tests.conftest import SF_SMOKE


def test_queue_keys_paired_and_capped():
    assert set(r09_queue.QUERIES) == set(r09_queue.ORACLES)
    # staged: no collision with the live registry OR earlier queues
    from image_matadata_batchprocessing_aws_spark.queries import all_queries

    assert not set(r09_queue.QUERIES) & set(all_queries())
    assert not set(r09_queue.QUERIES) & set(r07_queue.QUERIES)
    assert not set(r09_queue.QUERIES) & set(r08_queue.QUERIES)
    # drain-plan cap: stage at most 50 pairs per round (growth <= drain)
    assert len(r09_queue.QUERIES) <= 50


@pytest.mark.parametrize("name", sorted(r09_queue.QUERIES))
def test_queue_query_matches_oracle(spark, name):
    from tools.check_oracle import normalize

    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_SMOKE}/{tbl}.parquet'"
        )
    sdf = r09_queue.QUERIES[name](spark, SF_SMOKE)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r09_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    assert srows == orows


def test_staged_queries_construct_lazily(spark):
    """ADVICE r7 lock, extended to the r09 queue: constructing every
    staged DataFrame must launch zero Spark jobs (after a warm pass for
    one-off parquet footer/schema reads)."""
    sc = spark.sparkContext
    for fn in r09_queue.QUERIES.values():
        fn(spark, SF_SMOKE)
    group = "r09_lazy_probe"
    sc.setJobGroup(group, "construction must not run jobs")
    try:
        for name, fn in r09_queue.QUERIES.items():
            fn(spark, SF_SMOKE)
            ids = sc.statusTracker().getJobIdsForGroup(group)
            assert ids == [], f"{name} ran Spark job(s) during construction: {ids}"
    finally:
        sc.setJobGroup("default", "")


@pytest.mark.parametrize(
    "name",
    [
        # one representative per scale-shape family, pinned at sf0.1
        # permanently (the r07 animation-pin precedent): day-window
        # regression, position-join text, residue-grid dedup, grid
        # duels, and the waterfilling window
        "agg_durbin_watson",
        "text_skipgram_cooccur",
        "dedup_threshold_sweep",
        "eval_bradley_terry",
        "sample_capped_allocation",
    ],
)
def test_queue_representatives_oracle_exact_at_sf01(spark, name):
    """Five representative r09 stagings run oracle-exact at sf0.1 —
    ten times the driver's check scale — so plan-shape regressions in
    the families where window partitioning, position joins and residue
    grids actually carry volume get caught where it matters."""
    from tools.check_oracle import normalize

    sf_dir = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    sdf = r09_queue.QUERIES[name](spark, sf_dir)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r09_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows) and len(srows) > 0
    assert srows == orows
