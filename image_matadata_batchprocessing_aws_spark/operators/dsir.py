"""Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
method), DataFrame-first.

Select source-corpus documents whose hashed n-gram distribution looks
like a TARGET corpus: per-bucket log-likelihood ratios between the
target and source unigram+bigram distributions score each document, and
Gumbel top-k on the scores draws the sample (importance resampling
without replacement).

Scale shape: feature hashing bounds the model at ``buckets`` rows — the
two distributions and their log-ratios are one tiny broadcast table —
so the corpus is touched twice (once to fit the source distribution,
once to score), both times map-side after the explode, with one
groupBy(doc) shuffle for the per-document sum.  The target corpus is
typically small (a quality seed set); its distribution fit is one
aggregation over it.

Cross-engine exactness (the house playbook): the log-ratio per bucket
quantizes to a scaled BIGINT once, per-document scores are integer
sums of (count x scaled-llr) — associative, partitioning-independent —
and the Gumbel noise derives from md5 like every sampler in
``operators/sampling.py``, so the whole selection is reproducible and
exactly SQL-expressible (DuckDB twin in ``queries/r05_queue.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64
from image_matadata_batchprocessing_aws_spark.operators.sampling import (
    SAMPLE_DELIM,
    SAMPLE_DENOM,
)

LLR_SCALE = 1_000_000_000  # 1e9: llr in [-~30, 30] fits a long with room


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    doc_id: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """(doc_id, bucket, cnt): whitespace unigrams + bigrams, feature-
    hashed into ``buckets`` via the module-standard md5 bucket."""
    words = F.split(F.col(text_col), " ")
    bigrams = F.zip_with(
        F.slice(words, 1, F.size(words) - 1),
        F.slice(words, 2, F.size(words) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(words, bigrams)
    return (
        df.select(F.col(doc_id), F.explode(grams).alias("__g"))
        .select(
            doc_id,
            F.pmod(md5_int64(F.col("__g")), F.lit(buckets)).alias("bucket"),
        )
        .groupBy(doc_id, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    doc_id: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """(bucket, llr_scaled): add-1-smoothed log(p_target / p_source) per
    hash bucket, quantized to a scaled BIGINT — the broadcast-sized
    importance model (at most ``buckets`` rows)."""
    src = (
        hashed_gram_buckets(source, text_col, doc_id, buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("sc"))
    )
    tgt = (
        hashed_gram_buckets(target, text_col, doc_id, buckets)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("tc"))
    )
    totals = src.agg(F.sum("sc").alias("s_total")).crossJoin(
        tgt.agg(F.sum("tc").alias("t_total"))
    )
    joined = (
        src.join(tgt, "bucket", "full")
        .na.fill({"sc": 0, "tc": 0})
        .crossJoin(F.broadcast(totals))
    )
    b = F.lit(float(buckets))
    llr = F.log(
        (F.col("tc").cast("double") + 1.0) / (F.col("t_total").cast("double") + b)
    ) - F.log(
        (F.col("sc").cast("double") + 1.0) / (F.col("s_total").cast("double") + b)
    )
    return joined.select(
        "bucket",
        F.round(llr * F.lit(float(LLR_SCALE))).cast("long").alias("llr_scaled"),
    )


def dsir_resample(
    source: DataFrame,
    target: DataFrame,
    n_take: int = 100,
    text_col: str = "text",
    doc_id: str = "doc_id",
    buckets: int = 1024,
    seed: int = 1,
) -> DataFrame:
    """Top-``n_take`` source documents under Gumbel-perturbed importance
    scores: ``key = logw + Gumbel(md5(doc, seed))`` — equivalent to
    sampling without replacement with probability proportional to the
    importance weight (Gumbel top-k), deterministic given the seed.

    Returns (doc_id, logw, key) ordered by (key desc, doc_id) —
    a global top-n (TakeOrderedAndProject: partial top-n per partition,
    nothing else moves)."""
    ratios = dsir_log_ratios(source, target, text_col, doc_id, buckets)
    scored = (
        hashed_gram_buckets(source, text_col, doc_id, buckets)
        .join(F.broadcast(ratios), "bucket", "left")
        .na.fill({"llr_scaled": 0})
        .groupBy(doc_id)
        .agg(F.sum(F.col("cnt") * F.col("llr_scaled")).alias("__lw_scaled"))
    )
    h = md5_int64(
        F.concat(
            F.col(doc_id).cast("string"), F.lit(SAMPLE_DELIM), F.lit(str(seed))
        )
    )
    u = (h % SAMPLE_DENOM + 1) / F.lit(float(SAMPLE_DENOM + 1))
    gumbel = -F.log(-F.log(u))
    logw = F.col("__lw_scaled").cast("double") / F.lit(float(LLR_SCALE))
    return (
        scored.select(
            doc_id,
            F.round(logw, 6).alias("logw"),
            F.round(logw + gumbel, 6).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc(doc_id))
        .limit(n_take)
    )
