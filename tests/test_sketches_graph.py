"""Sketch operators (Bloom, Count-Min) and fixed-point PageRank:
structural guarantees that the SQL oracles can't state — no false
negatives, deterministic overcounts, mass conservation — plus the plan
shapes (map-side probe, broadcast counter join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.sketches import (
    bloom_build,
    bloom_capacity,
    bloom_dense,
    bloom_hit,
    bloom_hit_any,
    cms_build,
    cms_estimate,
)
from image_matadata_batchprocessing_aws_spark.operators.graph import (
    PR_SCALE,
    pagerank_scaled,
)
from image_matadata_batchprocessing_aws_spark.plans import formatted_plan


M, K = 65536, 3  # generous sizing: FP probability ~1e-8 at 50 keys


def _sketch(spark, keys, m=M):
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    return bloom_dense(bloom_build(df, "key", K, m).collect(), m)


def test_bloom_capacity_is_power_of_two_and_covers_keys(spark):
    assert bloom_capacity(500, 64) == 32768
    assert bloom_capacity(4845, 64) == 524288
    for n in (1, 255, 256, 257, 8192):
        m = bloom_capacity(n, 64)
        assert m & (m - 1) == 0 and m >= 64 * n


def test_bloom_no_false_negatives(spark):
    keys = [f"key-{i}" for i in range(50)]
    dense = _sketch(spark, keys)
    probe = spark.createDataFrame([(k,) for k in keys], "key string")
    hits = probe.where(bloom_hit(F.col("key"), dense, K, M)).count()
    assert hits == 50  # every inserted key MUST test positive


def test_bloom_rejects_disjoint_keys_at_generous_m(spark):
    dense = _sketch(spark, [f"key-{i}" for i in range(50)])
    other = spark.createDataFrame([(f"other-{i}",) for i in range(200)], "key string")
    fp = other.where(bloom_hit(F.col("key"), dense, K, M)).count()
    assert fp == 0  # deterministic: this seed/sizing has no collisions


def test_bloom_hit_any_is_joinless_map_side(spark):
    dense = _sketch(spark, ["alpha beta", "gamma delta"])
    docs = spark.createDataFrame(
        [(1, ["alpha beta", "zzz"]), (2, ["yyy", "xxx"])], "doc_id long, sh array<string>"
    )
    flagged = docs.where(bloom_hit_any(F.col("sh"), dense, K, M))
    assert [r.doc_id for r in flagged.collect()] == [1]
    assert "Join" not in formatted_plan(flagged)  # probe is pure codegen


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    # 20 keys with known frequencies 1..20
    rows = [(f"k{i}",) for i in range(1, 21) for _ in range(i)]
    df = spark.createDataFrame(rows, "key string")
    exact = {r.key: r.cnt for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    keys = df.select("key").distinct()

    # wide sketch: no collisions possible to matter -> est == exact
    wide = cms_estimate(keys, cms_build(df, "key", 3, 4096), "key", 3, 4096)
    got = {r.key: r.est_cnt for r in wide.collect()}
    assert got == exact

    # 8-cell rows force collisions -> still never undercounts
    tiny = cms_estimate(keys, cms_build(df, "key", 2, 8), "key", 2, 8)
    for r in tiny.collect():
        assert r.est_cnt >= exact[r.key]


def test_cms_estimate_broadcasts_counters(spark):
    df = spark.createDataFrame([(f"k{i % 5}",) for i in range(100)], "key string")
    est = cms_estimate(
        df.select("key").distinct(), cms_build(df, "key", 3, 64), "key", 3, 64
    )
    assert "BroadcastHashJoin" in formatted_plan(est)


def _pr(spark, edges, iters=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank_scaled for r in pagerank_scaled(e, iterations=iters).collect()}


def test_pagerank_cycle_is_uniform_and_conserves_mass(spark):
    ranks = _pr(spark, [(0, 1), (1, 2), (2, 0)])
    assert len(set(ranks.values())) == 1  # symmetry -> identical ranks
    total = sum(ranks.values())
    # truncating division leaks at most a few units per node per round
    assert PR_SCALE * 0.999 < total <= PR_SCALE


def test_pagerank_star_center_dominates(spark):
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = _pr(spark, edges)
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    leaf_ranks = {ranks[i] for i in range(1, 6)}
    assert len(leaf_ranks) == 1  # leaves are symmetric
