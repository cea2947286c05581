"""Semantic dedup over embeddings (SemDeDup-style: Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — public method).

Pipeline: cluster the corpus (k-means, `operators/clustering.py`), find
near-identical pairs WITHIN each cluster only (cosine >= threshold),
resolve pairs into duplicate groups (`operators/graph.py` star
contraction), keep the minimum id per group.

Scale shape: clustering bounds the pair search — a corpus of N vectors
in k balanced clusters costs sum (N/k)^2 * k = N^2/k pair evaluations
instead of N^2, and the within-cluster join is an equi-join on the tiny
``cluster_id`` key (never a cross join).  Skewed clusters are the
hazard: a cluster holding f*N vectors costs (f*N)^2 — raise k or
sub-split hot clusters (re-cluster within) when a cluster exceeds a
pair budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.functions import dot, l2_norm
from image_matadata_batchprocessing_aws_spark.operators.clustering import assign_clusters
from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components


def semantic_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) for same-cluster pairs with cosine >=
    threshold.  Assignment is map-side (literal centroids); the pair join
    is an equi-join on cluster_id with norms precomputed per side."""
    # both pair sides derive from this frame: persist so the k x dim
    # literal-centroid assignment and the norm run once, not per side
    # (cache entries key on the analyzed plan — repeat calls share one;
    # track_persist registers it for bulk release between batch queries)
    from image_matadata_batchprocessing_aws_spark.operators.caching import track_persist

    assigned = track_persist(
        assign_clusters(df, centroids, vec_col, "__c").withColumn(
            "__n", l2_norm(F.col(vec_col))
        )
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"), "__c",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"), "__c",
    )
    return (
        a.join(b, "__c")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """(id, component, keep): every vector labeled with its duplicate
    group (component = min reachable id through the near-identical pair
    graph) and the keep decision (the group minimum survives).  Vectors
    in no pair are their own singleton group and are kept."""
    pairs = semantic_pairs(df, centroids, vec_col, id_col, threshold)
    comps = connected_components(pairs, out_id=id_col)
    all_ids = df.select(id_col)
    labeled = all_ids.join(comps, id_col, "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("component"),
    )
    return labeled.withColumn("keep", F.col(id_col) == F.col("component"))
