"""Unit tests for the fixed-point power-iteration PCA
(``operators/pca.py``)."""

from __future__ import annotations

import math
import random

from image_matadata_batchprocessing_aws_spark.operators.pca import (
    PCA_V_SCALE,
    pca_top_component_scaled,
)


def _vectors(n=200, d=8, seed=7):
    # planted dominant direction along dim 0 with noise elsewhere
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        main = rng.gauss(0.0, 1.0)
        vec = [main * 3.0] + [rng.gauss(0.0, 0.3) for _ in range(d - 1)]
        rows.append((vec,))
    return rows


def test_pca_recovers_planted_direction(spark):
    df = spark.createDataFrame(_vectors(), "embedding array<double>")
    out = {
        r["dim_idx"]: r["loading_scaled"]
        for r in pca_top_component_scaled(df, iterations=6).collect()
    }
    assert len(out) == 8
    # dim 0 carries the variance: it should hold the max-scale loading
    # (within the truncated-divisor rounding of the renormalization)
    # and dominate every other dimension by a wide margin
    assert abs(abs(out[0]) - PCA_V_SCALE) <= PCA_V_SCALE // 1000
    for i in range(1, 8):
        assert abs(out[i]) < PCA_V_SCALE * 0.3


def test_pca_sign_pinned_by_uniform_start(spark):
    # the planted direction correlates positively with the start vector's
    # uniform positive mass only through the data; what must hold is
    # determinism: two runs give the identical signed result
    df = spark.createDataFrame(_vectors(seed=11), "embedding array<double>")
    a = sorted(map(tuple, pca_top_component_scaled(df, iterations=4).collect()))
    b = sorted(map(tuple, pca_top_component_scaled(df, iterations=4).collect()))
    assert a == b


def test_pca_partitioning_invariant(spark):
    rows = _vectors(seed=23)
    df1 = spark.createDataFrame(rows, "embedding array<double>").coalesce(1)
    df8 = spark.createDataFrame(rows, "embedding array<double>").repartition(8)
    a = sorted(map(tuple, pca_top_component_scaled(df1, iterations=3).collect()))
    b = sorted(map(tuple, pca_top_component_scaled(df8, iterations=3).collect()))
    assert a == b


def test_remove_top_strips_planted_common_direction(spark):
    from image_matadata_batchprocessing_aws_spark.operators.pca import (
        PCA_Q,
        remove_top_component_scaled,
        pca_top_component_scaled,
    )
    from pyspark.sql import functions as F

    # dim 0 carries almost all the CENTERED variance (a constant offset
    # would vanish at mean-centering — variance is what PCA sees):
    # removing the top component should collapse norms dramatically
    rng = random.Random(5)
    rows = [
        (
            i,
            [rng.gauss(0.0, 2.0)] + [rng.gauss(0.0, 0.05) for _ in range(7)],
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qarr = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * PCA_Q).cast("long")
    )
    means = (
        df.select(qarr.alias("__q"))
        .select(F.posexplode("__q").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
        .select("i", F.expr("sx div n").alias("m"))
        .collect()
    )
    mean_q = [int(r["m"]) for r in sorted(means, key=lambda r: r["i"])]
    loadings = [
        int(r["loading_scaled"])
        for r in pca_top_component_scaled(df, iterations=6).orderBy("dim_idx").collect()
    ]
    out = remove_top_component_scaled(
        df, "embedding", "vec_id", mean_q, loadings
    ).collect()
    assert len(out) == 100
    for r in out:
        # monotone up to one truncation quantum
        assert r["norm2_after_scaled"] <= r["norm2_before_scaled"] + 1
    total_b = sum(r["norm2_before_scaled"] for r in out)
    total_a = sum(r["norm2_after_scaled"] for r in out)
    # the shared direction holds nearly all centered variance here
    assert total_a < total_b * 0.15


def test_jl_projection_preserves_distances_within_tolerance(spark):
    """The JL lemma in practice: with k=16 of 64 dims, squared
    pairwise distances on a random sample stay within a loose (1±0.6)
    band and the MEAN ratio is near 1 (unbiasedness) — the property
    that makes the sketch usable for candidate generation."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        jl_projections,
    )

    rng = np.random.RandomState(3)
    X = rng.standard_normal((40, 64))
    M = np.array(jl_projections(k=16, dim=64))
    P = X @ M.T
    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 7):
            d0 = float(((X[i] - X[j]) ** 2).sum())
            d1 = float(((P[i] - P[j]) ** 2).sum())
            ratios.append(d1 / d0)
    assert 0.15 < min(ratios) and max(ratios) < 2.2  # chi2_16/16 tails
    assert abs(sum(ratios) / len(ratios) - 1.0) < 0.15
