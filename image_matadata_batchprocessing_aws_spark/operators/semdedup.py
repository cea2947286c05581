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
hazard: a cluster holding f*N vectors costs (f*N)^2 —
:func:`semantic_pairs_bounded` implements the mitigation (median-split
refinement + hash enforcement under a caller-set pair budget);
:func:`semantic_pairs` stays as the exact, budget-free form.
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
    # zero-norm vectors have no direction: their cosine is 0/0 = NaN, and
    # BOTH engines order NaN above every threshold, so an unguarded pair
    # join would mark a zero vector as a duplicate of its whole cluster.
    # Exclude them from PAIRING only — semantic_dedup's left join still
    # returns them as kept singletons.
    pairable = assigned.where(F.col("__n") != 0)
    a = pairable.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"), "__c",
    )
    b = pairable.select(
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


def semantic_pairs_bounded(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    pair_budget: int = 1_000_000,
    lsh_rounds: int = 6,
    enforce_budget: bool = True,
    seed: int = 7,
) -> DataFrame:
    """:func:`semantic_pairs` with the documented skew mitigation
    implemented (VERDICT r3 item 8): any cell whose membership would
    exceed ``pair_budget`` within-cell pairs is sub-split before the
    pair join, so one hot cluster (the (f*N)^2 hazard in the module
    docstring) can no longer blow up the join.

    Two-stage split, similarity-aware first:

    1. **Median-split refinement** (up to ``lsh_rounds`` rounds): each
       hot cell's members are projected onto that round's deterministic
       random hyperplane and split at the CELL's median projection (not
       at the origin — a cluster centered away from 0 sits entirely on
       one side of almost every origin-through plane, so a plain
       sign-LSH bit would never split it).  The median split halves the
       cell every round regardless of where it sits in space, EXACT
       duplicates are never separated (equal vectors -> equal
       projection -> same side), and near-duplicates are separated only
       when the median plane happens to fall between them — recall loss
       proportional to pair distance, only for pairs in hot cells, and
       only as many bits as that cell needs.  Each round costs one
       cell-count aggregate + a per-hot-cell median + a broadcast join
       + a map-side comparison; the driver sees cell statistics, never
       data.
    2. **Hash enforcement** (``enforce_budget=True``): cells still over
       budget after LSH (e.g. one giant blob of near-copies — which
       LSH correctly refuses to split) get id-hash salt bits sized per
       cell to bring the EXPECTED membership under the cap, +1 bit of
       slack.  This is the hard-budget fallback and the only step that
       can separate true duplicates; callers preferring full recall
       over bounded cost pass ``enforce_budget=False``.

    Returns the same (id_a, id_b, cosine) schema as
    :func:`semantic_pairs`; pairs across sub-cells are missed, the same
    approximation class as SemDeDup's own cross-cluster misses."""
    import math

    from image_matadata_batchprocessing_aws_spark.operators.caching import track_persist
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        lsh_projections,
    )

    n_cap = max(2, int(math.isqrt(8 * pair_budget + 1) + 1) // 2)
    while n_cap * (n_cap - 1) // 2 > pair_budget:
        n_cap -= 1
    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("semantic_pairs_bounded: empty input")
    planes = lsh_projections(num_planes=lsh_rounds, dim=dim_row["d"], seed=seed)
    base = track_persist(
        assign_clusters(df, centroids, vec_col, "__c").select(
            F.col(id_col),
            F.col(vec_col),
            l2_norm(F.col(vec_col)).alias("__n"),
            F.col("__c").cast("string").alias("__cell"),
        )
    )
    cells = base
    for r in range(lsh_rounds):
        lits = F.array(*[F.lit(v) for v in planes[r]])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), lits, lambda x, y: x * y),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        with_proj = cells.withColumn("__proj", proj)
        # per-cell median of the projection, hot cells only: split AT the
        # cell, not at the origin — a blob of identical vectors yields
        # median == every projection, all land on one side, and the cell
        # is correctly left for the enforcement stage.  The frame is one
        # row per hot CELL (statistics, never data) — checkpointed eagerly
        # so the empty-probe and the join below share one computation.
        hot = (
            with_proj.groupBy("__cell")
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.median("__proj").alias("__med"),
            )
            .where(F.col("__cnt") > n_cap)
            .select("__cell", "__med")
        ).localCheckpoint(eager=True)
        if hot.isEmpty():
            break
        bit = F.when(F.col("__proj") <= F.col("__med"), F.lit("0")).otherwise(
            F.lit("1")
        )
        # lineage truncation per round (connected_components pattern):
        # without it round r's broadcast subquery re-derives rounds
        # 1..r-1's joins and the recomputation goes exponential
        cells = (
            with_proj.join(F.broadcast(hot), "__cell", "left")
            .withColumn(
                "__cell",
                F.when(
                    F.col("__med").isNotNull(),
                    F.concat(F.col("__cell"), F.lit("."), bit),
                ).otherwise(F.col("__cell")),
            )
            .drop("__med", "__proj")
        ).localCheckpoint(eager=False)
    if enforce_budget:
        still_hot = (
            cells.groupBy("__cell")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") > n_cap)
        )
        # bits so that EXPECTED members-per-salt <= n_cap/2 (one slack bit)
        bits = F.ceil(F.log2(F.col("__cnt") / F.lit(n_cap))).cast("int") + F.lit(1)
        salt_den = F.pow(F.lit(2.0), bits).cast("long")  # shiftleft needs an int literal
        cells = (
            cells.join(F.broadcast(still_hot), "__cell", "left")
            .withColumn(
                "__cell",
                F.when(
                    F.col("__cnt").isNotNull(),
                    F.concat(
                        F.col("__cell"),
                        F.lit("#"),
                        F.pmod(
                            F.xxhash64(F.col(id_col), F.lit(seed)), salt_den
                        ).cast("string"),
                    ),
                ).otherwise(F.col("__cell")),
            )
            .drop("__cnt")
        )
    # zero-norm guard: see semantic_pairs — NaN cosine orders above any
    # threshold in both engines, so zero vectors must not enter the join
    pairable = cells.where(F.col("__n") != 0)
    a = pairable.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"), "__cell",
    )
    b = pairable.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"), "__cell",
    )
    return (
        a.join(b, "__cell")
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


def semantic_dedup_bounded(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    pair_budget: int = 1_000_000,
    **kwargs,
) -> DataFrame:
    """Budget-bounded :func:`semantic_dedup`: identical output contract,
    with the hot-cluster sub-split guarding the pair join."""
    pairs = semantic_pairs_bounded(
        df, centroids, vec_col, id_col, threshold, pair_budget, **kwargs
    )
    comps = connected_components(pairs, out_id=id_col)
    all_ids = df.select(id_col)
    labeled = all_ids.join(comps, id_col, "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("component"),
    )
    return labeled.withColumn("keep", F.col(id_col) == F.col("component"))
