"""Document chunking queries (north star: embedding-pipeline prep).

The inverse of context-window *packing* (many docs -> one window):
chunking splits one document into fixed-token windows with overlap
(stride < chunk), the standard prep for embedding / retrieval corpora.

Registry placement: this module sits BELOW the driver's 50-entry
correctness window by design (the window is reserved for the operator
families with no prior driver rows); these queries are verified by the
local oracle gate and unit tests until window space frees up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.text import tokens
from image_matadata_batchprocessing_aws_spark.queries.util import t

CHUNK_TOKENS = 32
STRIDE = 24  # < CHUNK_TOKENS => 8-token overlap between neighbors


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = STRIDE,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_id`` (0-based), the chunk text
    (tokens re-joined with single spaces), and its token count.  Start
    offsets are 0, stride, 2*stride, ... strictly below the doc's token
    count, so every doc emits >= 1 chunk and the tail partial chunk is
    kept.  Pure map-side: tokenize, generate starts, explode, slice —
    zero shuffles, runs at scan speed.
    """
    toks = tokens(text_col)
    d = df.select(F.col(id_col), toks.alias("__t"), F.size(toks).alias("__n"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)
    )
    # posexplode_OUTER + a null-guard on the GENERATED column only: the
    # inner form makes the optimizer infer size/non-null filters over the
    # starts sequence, and even a `__start < __n` guard lets constraint
    # propagation push an inferred isnotnull(__n) into the scan with the
    # tokenization inlined (an extra full split per row at the scan).
    # The sequence upper bound (greatest(__n - 1, 0), step `stride`)
    # already guarantees every generated start < __n for any tokenized
    # doc (whitespace split yields >= 1 token), so only the outer form's
    # null row (null text) needs dropping — and a predicate on a
    # generated column cannot be pushed below its Generate.
    ex = d.select(
        F.col(id_col),
        "__t",
        F.posexplode_outer(starts).alias("chunk_id", "__start"),
    ).where(F.col("__start").isNotNull())
    piece = F.slice(F.col("__t"), F.col("__start") + 1, F.lit(chunk_tokens))
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def chunk_docs_overlap(spark: SparkSession, sf: str) -> DataFrame:
    return chunk_documents(t(spark, sf, "documents"))


QUERIES = {
    "chunk_docs_overlap": chunk_docs_overlap,
}

ORACLES = {
    "chunk_docs_overlap": rf"""
        WITH d AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents),
        ex AS (
          SELECT doc_id, t,
                 unnest(range(0, CAST(ceil(greatest(len(t), 1) / {STRIDE}.0) AS BIGINT))) AS chunk_id
          FROM d),
        s AS (
          SELECT doc_id, chunk_id, chunk_id * {STRIDE} AS start, t
          FROM ex WHERE chunk_id * {STRIDE} < len(t)),
        c AS (
          SELECT doc_id, chunk_id,
                 list_slice(t, start + 1, start + {CHUNK_TOKENS}) AS piece
          FROM s)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(piece, ' ') AS chunk_text,
               CAST(len(piece) AS BIGINT) AS n_chunk_tokens
        FROM c
    """,
}
