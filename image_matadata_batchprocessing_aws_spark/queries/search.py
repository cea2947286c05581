"""Lexical search queries (north star: retrieval over the corpus).

BM25 ranking for a fixed bag-of-words query — posting-list-shaped
(explode filtered to the query terms before any shuffle), fully
DuckDB-oracle-able since every statistic is exact integer/float math
over the same tokenization.

Registry placement: below the driver's 50-entry correctness window
(see queries/chunking.py for the rotation rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from image_matadata_batchprocessing_aws_spark.operators.text import bm25_rank
from image_matadata_batchprocessing_aws_spark.queries.util import t

QUERY_TERMS = ["join", "spark", "vector"]
K1 = 1.2
B = 0.75
TOP_K = 20


def search_bm25(spark: SparkSession, sf: str) -> DataFrame:
    return bm25_rank(
        t(spark, sf, "documents"), QUERY_TERMS, k1=K1, b=B, top_k=TOP_K
    )


QUERIES = {
    "search_bm25": search_bm25,
}

_TERMS_SQL = ", ".join(f"'{w}'" for w in QUERY_TERMS)

ORACLES = {
    "search_bm25": rf"""
        WITH base AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS t,
                 len(string_split_regex(trim(text), '\s+')) AS dl
          FROM documents),
        stats AS (
          SELECT count(*) AS N, avg(dl) AS avgdl FROM base),
        ex AS (
          SELECT doc_id, dl, unnest(t) AS term FROM base),
        tf AS (
          SELECT doc_id, dl, term, count(*) AS tf
          FROM ex WHERE term IN ({_TERMS_SQL})
          GROUP BY 1, 2, 3),
        dfreq AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT tf.doc_id,
                 ln(1.0 + (s.N - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * ({K1} + 1))
                   / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / s.avgdl)) AS sc
          FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s)
        SELECT doc_id, round(sum(sc), 4) AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {TOP_K}
    """,
}
