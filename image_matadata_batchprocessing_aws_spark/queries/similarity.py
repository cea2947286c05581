"""Similarity-search queries over embeddings (Stage 5).

Brute-force kNN (cosine + L2) with bit-matched DuckDB oracles, the
LSH-bucketed ANN variant (deterministic hyperplanes inlined on both
sides), and embedding statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.functions import l2_norm
from image_matadata_batchprocessing_aws_spark.operators.similarity import (
    add_lsh_bucket,
    as_double_array,
    cosine_sim,
    knn_bruteforce,
    lsh_projections,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

K = 5
N_QUERIES = 10


def _qc(spark: SparkSession, sf: str):
    e = t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qe")
    )
    c = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), as_double_array("embedding").alias("ce")
    )
    return q, c


def knn_brute_cosine(spark: SparkSession, sf: str) -> DataFrame:
    q, c = _qc(spark, sf)
    return knn_bruteforce(q, c, k=K, metric="cosine")


def knn_brute_l2(spark: SparkSession, sf: str) -> DataFrame:
    q, c = _qc(spark, sf)
    return knn_bruteforce(q, c, k=K, metric="l2")


def ann_lsh_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """ANN via sign-random-projection buckets: candidates = same bucket;
    exact cosine re-scoring within the bucket only."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    b = add_lsh_bucket(e, "e", "bucket")
    q = b.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("bucket")
    )
    c = b.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("bucket")
    )
    return (
        c.join(F.broadcast(q), "bucket")
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket"),
            F.round(cosine_sim(F.col("qe"), F.col("ce")), 6).alias("score"),
        )
    )


def embedding_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings").select(
        "label", l2_norm(as_double_array("embedding")).alias("norm")
    )
    return e.groupBy("label").agg(
        F.count("*").alias("n"), F.round(F.avg("norm"), 4).alias("avg_norm")
    )


QUERIES = {
    "knn_brute_cosine": knn_brute_cosine,
    "knn_brute_l2": knn_brute_l2,
    "ann_lsh_bucket": ann_lsh_bucket,
    "embedding_stats": embedding_stats,
}


def _proj_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"


def _ann_oracle() -> str:
    planes = lsh_projections()
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, {_proj_sql(p)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        b AS (SELECT vec_id, e, CAST({terms} AS BIGINT) AS bucket FROM v),
        q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, e AS ce, bucket FROM b WHERE vec_id >= {N_QUERIES})
        SELECT q.query_id, c.neighbor_id, q.bucket,
               round(list_cosine_similarity(qe, ce), 6) AS score
        FROM c JOIN q ON c.bucket = q.bucket
    """


ORACLES = {
    "knn_brute_cosine": f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id >= {N_QUERIES}),
        s AS (SELECT query_id, neighbor_id,
                     round(list_cosine_similarity(qe, ce), 6) AS score
              FROM q CROSS JOIN c),
        r AS (SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rn
              FROM s)
        SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= {K}
    """,
    "knn_brute_l2": f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id >= {N_QUERIES}),
        s AS (SELECT query_id, neighbor_id,
                     round(list_distance(qe, ce), 6) AS score
              FROM q CROSS JOIN c),
        r AS (SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score ASC, neighbor_id) AS rn
              FROM s)
        SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= {K}
    """,
    "ann_lsh_bucket": _ann_oracle(),
    "embedding_stats": """
        SELECT label, count(*) AS n,
               round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
        FROM embeddings GROUP BY label
    """,
}
