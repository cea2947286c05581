"""IVF physical layout: the index IS the partitioning (north star,
similarity search at 100 TB).

The logical IVF query (`queries/similarity.ann_ivf`) prunes the *search*
to ``nprobe`` cells but still scans the whole corpus to find them.  At
scale the cells must become the **physical** layout: write the corpus
``partitionBy(cent_id)``, and a probe turns into a partition-pruned scan
of ``nprobe`` directories — the other ``k_cents - nprobe`` cells are
never read (Hive-style partition pruning, visible as ``PartitionFilters``
in the scan node).

Write once, probe many: the write path costs one map-side assignment
(zero shuffles — literal centroids) plus the sink; every subsequent query
is ``nprobe/k_cents`` of a full scan, before any row-level work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.functions import dot, l2_norm
from image_matadata_batchprocessing_aws_spark.operators.clustering import (
    assign_clusters,
)


def write_ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "e",
    mode: str = "overwrite",
) -> None:
    """Assign each vector to its nearest centroid (map-side, zero
    shuffles) and write the corpus partitioned by ``cent_id``."""
    assigned = assign_clusters(corpus, centroids, vec_col, "cent_id")
    assigned.write.mode(mode).partitionBy("cent_id").parquet(path)


def probe_cells(
    spark: SparkSession, path: str, cent_ids: list[int]
) -> DataFrame:
    """Partition-pruned read of the probed cells only.  ``isin`` on the
    partition column reaches the scan as a PartitionFilter — directories
    outside ``cent_ids`` are never listed or read."""
    return spark.read.parquet(path).where(F.col("cent_id").isin(cent_ids))


def ann_query_indexed(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_q: str = "qe",
    vec_c: str = "e",
) -> DataFrame:
    """Top-k cosine ANN against a written IVF index: queries pick their
    ``nprobe`` nearest centroids driver-side (centroids are literals),
    the probed cells load via partition pruning, and exact re-scoring
    runs inside the union of probed cells only."""
    import numpy as np
    from pyspark.sql import Window

    cents = np.asarray(centroids, dtype=float)
    q_rows = queries.select(query_id, vec_q).collect()  # queries are small
    probe_map: list[tuple] = []  # (query_id, cent_id) — strict nprobe per query
    for r in q_rows:
        qv = np.asarray(r[vec_q], dtype=float)
        d2 = ((cents - qv) ** 2).sum(axis=1)
        for i in np.argsort(d2, kind="stable")[:nprobe]:
            probe_map.append((r[query_id], int(i)))
    probe_ids = sorted({cid for _, cid in probe_map})
    cells = probe_cells(spark, index_path, probe_ids)
    probes = spark.createDataFrame(probe_map, f"{query_id} long, cent_id int")
    # each query joins ONLY its own probed cells (cent_id from the probe
    # map), not the union of all queries' probes — strict IVF semantics
    pairs = (
        cells.withColumn("__nc", l2_norm(F.col(vec_c)))
        .join(F.broadcast(probes), "cent_id")
        .join(
            F.broadcast(queries.withColumn("__nq", l2_norm(F.col(vec_q)))), query_id
        )
    )
    scored = pairs.select(
        query_id,
        F.col(corpus_id).alias("neighbor_id"),
        F.round(
            dot(F.col(vec_q), F.col(vec_c)) / (F.col("__nq") * F.col("__nc")), 6
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(query_id, "neighbor_id", "score", F.col("rn").cast("long").alias("rn"))
    )
