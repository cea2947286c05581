"""SemDeDup composition: cluster -> within-cluster pairs -> groups -> keep."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.clustering import kmeans_train
from image_matadata_batchprocessing_aws_spark.operators.semdedup import (
    semantic_dedup,
    semantic_pairs,
)


def _corpus_with_dups(spark, dim=8, seed=5):
    """Two well-separated blobs; ids 100/101/102 are near-copies of id 0,
    id 200 is a near-copy of id 50 (the other blob)."""
    rng = np.random.RandomState(seed)
    c1 = rng.standard_normal(dim) * 10
    c2 = -c1
    rows = []
    for i in range(40):
        rows.append((i, [float(v) for v in c1 + 3.0 * rng.standard_normal(dim)]))
    for i in range(50, 90):
        rows.append((i, [float(v) for v in c2 + 3.0 * rng.standard_normal(dim)]))
    base0 = np.array(rows[0][1])
    base50 = np.array(rows[40][1])
    for j, nid in enumerate((100, 101, 102)):
        rows.append((nid, [float(v) for v in base0 + 1e-4 * rng.standard_normal(dim)]))
    rows.append((200, [float(v) for v in base50 + 1e-4 * rng.standard_normal(dim)]))
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def test_semantic_dedup_finds_planted_near_copies(spark):
    df = _corpus_with_dups(spark)
    cents, _ = kmeans_train(df, k=2)
    pairs = semantic_pairs(df, cents, threshold=0.9995)
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    # the planted copies pair with their source (and each other)
    assert {(0, 100), (0, 101), (0, 102), (100, 101), (100, 102), (101, 102)} <= got_pairs
    assert (50, 200) in got_pairs

    out = semantic_dedup(df, cents, threshold=0.9995)
    rows = {r.vec_id: (r.component, r.keep) for r in out.collect()}
    assert rows[0] == (0, True)
    for nid in (100, 101, 102):
        assert rows[nid] == (0, False)
    assert rows[50] == (50, True) and rows[200] == (50, False)
    # everything else is a singleton and kept
    kept = [v for v, (_, k) in rows.items() if k]
    assert len(kept) == len(rows) - 4


def test_semantic_pairs_never_cross_clusters(spark):
    df = _corpus_with_dups(spark)
    cents, _ = kmeans_train(df, k=2)
    # opposite-blob vectors have cosine ~ -1; within-blob ~ +1.  With a
    # permissive threshold the pair set must still stay within clusters.
    pairs = semantic_pairs(df, cents, threshold=-1.0)
    from image_matadata_batchprocessing_aws_spark.operators.clustering import assign_clusters

    cl = {r.vec_id: r.cluster_id for r in assign_clusters(df, cents).collect()}
    for r in pairs.collect():
        assert cl[r.id_a] == cl[r.id_b]


def _planted_hot_cluster(spark, dim=8, seed=11):
    """400 vectors: 200 DIVERSE vectors around one centroid (the 50%-mass
    hot cluster), 10 exact-duplicate pairs planted inside it, and 200
    spread across three other blobs."""
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import (  # noqa: F401
        semantic_pairs_bounded,
    )

    rng = np.random.default_rng(seed)
    cents = [
        [10.0] + [0.0] * (dim - 1),
        [-10.0] + [0.0] * (dim - 1),
        [0.0, 10.0] + [0.0] * (dim - 2),
        [0.0, -10.0] + [0.0] * (dim - 2),
    ]
    rows = []
    vid = 0
    # hot cluster: diverse (noise comparable to nothing — spread wide so
    # LSH separates non-duplicates)
    for i in range(180):
        v = np.array(cents[0]) + rng.normal(0, 3.0, dim)
        rows.append((vid, [float(x) for x in v])); vid += 1
    # 10 planted exact-duplicate pairs inside the hot cluster
    dup_pairs = []
    for i in range(10):
        v = np.array(cents[0]) + rng.normal(0, 3.0, dim)
        rows.append((vid, [float(x) for x in v]))
        rows.append((vid + 1, [float(x) for x in v]))
        dup_pairs.append((vid, vid + 1)); vid += 2
    # the other half of the corpus
    for c in cents[1:]:
        for i in range(66):
            v = np.array(c) + rng.normal(0, 1.0, dim)
            rows.append((vid, [float(x) for x in v])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    return df, cents, dup_pairs


def test_bounded_pairs_respect_budget_and_keep_exact_dups(spark):
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import (
        semantic_pairs,
        semantic_pairs_bounded,
    )

    df, cents, dup_pairs = _planted_hot_cluster(spark)
    budget = 500  # n_cap = 32
    # threshold=-1: every within-cell pair becomes a candidate, so the
    # observable pair-degree proves the join bound
    unbounded = semantic_pairs(df, cents, threshold=-1.0).count()
    bounded = semantic_pairs_bounded(
        df, cents, threshold=-1.0, pair_budget=budget
    )
    n_bounded = bounded.count()
    assert unbounded > 19000  # the (f*N)^2 hazard is real on this corpus
    assert n_bounded < unbounded * 0.4  # sub-split collapsed the hot join
    # an id sits in exactly ONE cell, so its candidate degree bounds that
    # cell's membership: degree <= n_cap - 1 proves every cell's pair
    # count is within budget
    deg = (
        bounded.select(F.col("id_a").alias("i"))
        .unionAll(bounded.select(F.col("id_b").alias("i")))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("m"))
        .collect()[0]["m"]
    )
    n_cap = 32
    assert deg <= n_cap - 1
    # LSH never separates exact duplicates: all 10 planted pairs survive
    got = {
        (r.id_a, r.id_b)
        for r in semantic_pairs_bounded(
            df, cents, threshold=0.999, pair_budget=budget
        ).collect()
    }
    assert set(dup_pairs) <= got


def test_bounded_hash_fallback_caps_unsplittable_blob(spark):
    # 100 IDENTICAL vectors: LSH correctly refuses to split them, so the
    # hash stage must enforce the cap (and without it the blob stays hot)
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import (
        semantic_pairs_bounded,
    )

    dim = 8
    cents = [[5.0] + [0.0] * (dim - 1), [-5.0] + [0.0] * (dim - 1)]
    v = [1.0] * dim
    rows = [(i, v) for i in range(100)] + [
        (100 + i, [-1.0] * dim) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    budget = 60  # n_cap = 11
    bounded = semantic_pairs_bounded(df, cents, threshold=-1.0, pair_budget=budget)
    deg = (
        bounded.select(F.col("id_a").alias("i"))
        .unionAll(bounded.select(F.col("id_b").alias("i")))
        .groupBy("i").agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("m")).collect()[0]["m"]
    )
    assert deg <= 10  # hash salts brought every cell under n_cap=11
    # recall-over-cost mode: the blob is left intact
    free = semantic_pairs_bounded(
        df, cents, threshold=-1.0, pair_budget=budget, enforce_budget=False
    )
    assert free.count() >= 100 * 99 // 2


def test_zero_norm_vectors_stay_singletons(spark):
    # a zero vector's cosine is 0/0 = NaN, which both engines order
    # above any threshold — unguarded it would pair with its whole
    # cluster; guarded it must come back as a kept singleton
    dim = 4
    cents = [[5.0] + [0.0] * (dim - 1), [-5.0] + [0.0] * (dim - 1)]
    rows = [
        (0, [5.0, 0.0, 0.0, 0.0]),
        (1, [5.0, 0.0, 0.0, 0.0]),   # exact dup of 0
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector (assigned somewhere)
        (3, [-5.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    out = {r.vec_id: (r.component, r.keep) for r in semantic_dedup(
        df, cents, threshold=0.9
    ).collect()}
    assert out[2] == (2, True)       # singleton, kept
    assert out[0] == (0, True) and out[1] == (0, False)
    assert out[3] == (3, True)
