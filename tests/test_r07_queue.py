"""The r07 staging queue carries full oracle confidence NOW — the same
discipline test_r06_queue.py applied before the r06 registration: every
staged (query, oracle) pair runs through the exact normalize-and-compare
check ``tools/check_oracle.py`` applies to the registered inventory,
plus the drain-plan cap (growth <= drain rate, the r03 lesson)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark.queries import r07_queue
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
from tests.conftest import SF_SMOKE


def test_queue_keys_paired_and_capped():
    assert set(r07_queue.QUERIES) == set(r07_queue.ORACLES)
    # registered in r09 (drain plan): every queue entry is IN the live
    # registry (all_queries() itself raises on any name collision)
    from image_matadata_batchprocessing_aws_spark.queries import all_oracles, all_queries

    assert set(r07_queue.QUERIES) <= set(all_queries())
    assert set(r07_queue.ORACLES) <= set(all_oracles())
    # drain-plan cap: stage at most 50 pairs per round (growth <= drain)
    assert len(r07_queue.QUERIES) <= 50


@pytest.mark.parametrize("name", sorted(r07_queue.QUERIES))
def test_queue_query_matches_oracle(spark, name):
    from tools.check_oracle import normalize

    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_SMOKE}/{tbl}.parquet'"
        )
    sdf = r07_queue.QUERIES[name](spark, SF_SMOKE)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r07_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    assert srows == orows


@pytest.mark.parametrize(
    "name", ["multimodal_gif_animation", "multimodal_webp_anim"]
)
def test_animation_compositing_oracle_exact_at_sf01(spark, name):
    """VERDICT r6 item 7: the animation-compositing contract is pinned
    at sf0.1 PERMANENTLY (not only when a staged sweep happens to run)
    so disposal/blend regressions surface at scale, not just on
    sf0.001 fixtures.  Same normalize-and-compare gate as the
    registered inventory."""
    from tools.check_oracle import normalize

    sf_dir = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    sdf = r07_queue.QUERIES[name](spark, sf_dir)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r07_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols and len(srows) == len(orows) and srows == orows
