"""Lexical search queries (north star: retrieval over the corpus).

BM25 ranking for a fixed bag-of-words query — posting-list-shaped
(explode filtered to the query terms before any shuffle), fully
DuckDB-oracle-able since every statistic is exact integer/float math
over the same tokenization.

Registry placement: below the driver's 50-entry correctness window
(see queries/chunking.py for the rotation rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from image_matadata_batchprocessing_aws_spark.functions import cosine_sim
from image_matadata_batchprocessing_aws_spark.operators.similarity import as_double_array
from image_matadata_batchprocessing_aws_spark.operators.text import bm25_rank
from image_matadata_batchprocessing_aws_spark.queries.util import t
from image_matadata_batchprocessing_aws_spark.operators.caching import track_persist

QUERY_TERMS = ["join", "spark", "vector"]
K1 = 1.2
B = 0.75
TOP_K = 20

#: RRF fusion: pool size per retrieval system, rank-discount constant
#: (the standard k=60 from Cormack et al.'s RRF), final cut.
RRF_POOL = 100
RRF_K = 60
RRF_QUERY_ID = 0  # the semantic query vector: embedding of doc 0
N_QUERIES = 10  # docs 0..9 are query stand-ins (same split as queries/similarity)


def search_bm25(spark: SparkSession, sf: str) -> DataFrame:
    return bm25_rank(
        t(spark, sf, "documents"), QUERY_TERMS, k1=K1, b=B, top_k=TOP_K
    )


def search_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: a BM25 lexical list
    and an embedding-cosine semantic list (query = doc 0's vector), each
    pooled to its top-100, fused as sum(1 / (60 + rank)) — the standard
    public RRF formula.  Docs missing from one list contribute only the
    other term (coalesce to 0), so strong single-system hits still rank.

    Rank assignment happens AFTER each system's top-pool cut, so the
    keyless row_number windows run over <= pool-size rows — bounded by
    construction (same contract as fit statistics), never corpus-sized.
    Both scores round identically on both engines; ranks break ties by
    id, so the fusion is bit-exact in the DuckDB twin."""
    docs = t(spark, sf, "documents").where(F.col("doc_id") >= N_QUERIES)
    lex_pool = bm25_rank(docs, QUERY_TERMS, k1=K1, b=B, top_k=RRF_POOL)
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("r_lex"),
    )
    e = t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") == RRF_QUERY_ID).select(
        as_double_array("embedding").alias("qe")
    )
    c = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("doc_id"), as_double_array("embedding").alias("ce")
    )
    sem_pool = (
        c.crossJoin(F.broadcast(q))
        .select("doc_id", F.round(cosine_sim(F.col("qe"), F.col("ce")), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    sem = sem_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), "doc_id"))
        .alias("r_sem"),
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.col("r_lex").cast("long").alias("r_lex"),
        F.col("r_sem").cast("long").alias("r_sem"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(TOP_K)


QUERIES = {
    "search_bm25": search_bm25,
    "search_hybrid_rrf": search_hybrid_rrf,
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
    "search_hybrid_rrf": rf"""
        WITH base AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS t,
                 len(string_split_regex(trim(text), '\s+')) AS dl
          FROM documents WHERE doc_id >= {N_QUERIES}),
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
          FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s),
        lexs AS (
          SELECT doc_id, round(sum(sc), 4) AS bm25
          FROM scored GROUP BY doc_id
          ORDER BY bm25 DESC, doc_id LIMIT {RRF_POOL}),
        lex AS (
          SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
          FROM lexs),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
              WHERE vec_id = {RRF_QUERY_ID}),
        cc AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS ce
               FROM embeddings WHERE vec_id >= {N_QUERIES}),
        sems AS (
          SELECT doc_id, round(list_cosine_similarity(qe, ce), 6) AS cos
          FROM cc CROSS JOIN q
          ORDER BY cos DESC, doc_id LIMIT {RRF_POOL}),
        sem AS (
          SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
          FROM sems)
        SELECT doc_id,
               round(coalesce(1.0 / ({RRF_K} + r_lex), 0.0)
                     + coalesce(1.0 / ({RRF_K} + r_sem), 0.0), 6) AS rrf,
               CAST(r_lex AS BIGINT) AS r_lex,
               CAST(r_sem AS BIGINT) AS r_sem
        FROM lex FULL JOIN sem USING (doc_id)
        ORDER BY rrf DESC, doc_id
        LIMIT {TOP_K}
    """,
}


# --- phrase-position search (positional-index reuse) ------------------------

PHRASE_K = 5


def search_phrase_positions(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-phrase search via the POSITIONAL fingerprint index the
    substring-dedup family builds (operators/substrings.positional_kgrams):
    take the corpus's most frequent 5-gram (deterministic fp tiebreak)
    and list every (doc, position) occurrence — the inverted-positional-
    index lookup a phrase-search engine runs, here as two aggregations
    over the same narrow positions table (no text ever shuffles)."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        positional_kgrams,
    )

    d = t(spark, sf, "documents")
    pos = track_persist(positional_kgrams(d, "text", "doc_id", PHRASE_K))
    top = (
        pos.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), "fp")
        .limit(1)
    )
    return (
        pos.join(F.broadcast(top.select("fp")), "fp", "left_semi")
        .select("doc_id", "pos")
    )


QUERIES["search_phrase_positions"] = search_phrase_positions


def _phrase_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    fp = md5_int64_sql(f"array_to_string(list_slice(t, pos + 1, pos + {PHRASE_K}), ' ')")
    return rf"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE trim(text) <> ''),
        pz AS (
          SELECT doc_id, t, unnest(range(len(t) - {PHRASE_K - 1})) AS pos
          FROM toks WHERE len(t) >= {PHRASE_K}),
        grams AS (SELECT doc_id, pos, {fp} AS fp FROM pz),
        top AS (SELECT fp FROM grams GROUP BY fp
                ORDER BY count(*) DESC, fp LIMIT 1)
        SELECT g.doc_id, g.pos FROM grams g JOIN top USING (fp)
    """


ORACLES["search_phrase_positions"] = _phrase_oracle()
