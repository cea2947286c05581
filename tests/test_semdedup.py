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
