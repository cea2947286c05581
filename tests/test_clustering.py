"""Distributed k-means: planted-cluster recovery, determinism, the
map-side assignment contract, and empty-cluster survival."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.clustering import (
    assign_clusters,
    kmeans_predict,
    kmeans_train,
)


def _planted(spark, n_per=30, k=3, dim=8, spread=0.05, seed=7):
    """k well-separated Gaussian blobs around orthogonal-ish centers."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((k, dim)) * 10
    rows = []
    for ci in range(k):
        pts = centers[ci] + rng.standard_normal((n_per, dim)) * spread
        for j, p in enumerate(pts):
            rows.append((ci * n_per + j, [float(v) for v in p], ci))
    return (
        spark.createDataFrame(rows, "vec_id long, e array<double>, true_cluster int"),
        centers,
    )


def test_kmeans_recovers_planted_clusters(spark):
    df, centers = _planted(spark)
    cents, iters = kmeans_train(df, k=3, max_iterations=15)
    assert iters <= 15
    out = kmeans_predict(df, cents)
    # every planted blob maps to exactly one fitted cluster and vice versa
    mapping = (
        out.groupBy("true_cluster")
        .agg(F.count_distinct("cluster_id").alias("nc"))
        .collect()
    )
    assert all(r.nc == 1 for r in mapping)
    assert out.select("cluster_id").distinct().count() == 3
    # fitted centroids land on the true centers (spread 0.05 << 10)
    fitted = sorted(tuple(round(v, 1) for v in c) for c in cents)
    true = sorted(tuple(round(v, 1) for v in c) for c in centers)
    for f, t in zip(fitted, true):
        assert max(abs(a - b) for a, b in zip(f, t)) < 0.5


def test_kmeans_deterministic_across_partitionings(spark):
    df, _ = _planted(spark)
    c1, _ = kmeans_train(df, k=3)
    c2, _ = kmeans_train(df.repartition(11), k=3)
    # md5 init is partitioning-independent; avg() bits may wiggle in the
    # last ulp, but cluster geometry (and rounded centroids) must agree
    r1 = sorted(tuple(round(v, 6) for v in c) for c in c1)
    r2 = sorted(tuple(round(v, 6) for v in c) for c in c2)
    assert r1 == r2


def test_assign_clusters_is_nearest_and_tie_breaks_low_id(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [5.0, 5.0])],
        "vec_id long, e array<double>",
    )
    cents = [[0.0, 0.0], [10.0, 10.0]]
    got = {r.vec_id: r.cluster_id for r in assign_clusters(df, cents).collect()}
    assert got[1] == 0 and got[2] == 1
    assert got[3] == 0  # equidistant -> first (lowest) centroid id


def test_kmeans_k_exceeding_rows_raises(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, e array<double>")
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_train(df, k=5)


def test_kmeans_init_centroids_validated(spark):
    """ADVICE r8: init_centroids from a different k (or mixed dims)
    must raise instead of silently training the wrong model."""
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(6)], "vec_id long, e array<double>"
    )
    with pytest.raises(ValueError, match="expected k"):
        kmeans_train(df, k=3, init_centroids=[[0.0, 0.0], [1.0, 0.0]])
    with pytest.raises(ValueError, match="dimensions disagree"):
        kmeans_train(df, k=2, init_centroids=[[0.0, 0.0], [1.0]])


def test_kmeans_init_reuse_matches_internal_init(spark):
    """The init-reuse path (r08) plus the probe-free dim derivation
    (r09) must fit the SAME model as the self-init path."""
    df, _ = _planted(spark, n_per=6)
    from image_matadata_batchprocessing_aws_spark.operators.clustering import kmeans_init

    init = kmeans_init(df, 3)
    c1, i1 = kmeans_train(df, k=3, init_centroids=init)
    c2, i2 = kmeans_train(df, k=3)
    assert i1 == i2
    assert c1 == c2


def test_kmeans_plan_has_no_python_udf(spark):
    """Assignment must stay JVM-side (whole-stage codegen), never a
    Python UDF."""
    df, _ = _planted(spark, n_per=5)
    out = assign_clusters(df, [[0.0] * 8, [1.0] * 8])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
