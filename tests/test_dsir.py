"""DSIR importance resampling: planted-distribution selection, hashing
determinism, and partitioning invariance."""

from __future__ import annotations

import numpy as np

from image_matadata_batchprocessing_aws_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_resample,
    hashed_gram_buckets,
)


def _corpora(spark, seed=2):
    """Source: 150 'math' docs + 150 'web' docs from disjoint-ish word
    pools; target: 40 fresh math docs.  DSIR must pull math docs."""
    rng = np.random.default_rng(seed)
    math_words = ["integral", "matrix", "theorem", "proof", "vector", "prime"]
    web_words = ["click", "shop", "free", "deal", "login", "news"]

    def doc(pool):
        return " ".join(rng.choice(pool, size=30))

    rows = []
    kind = {}
    for i in range(150):
        rows.append((i, doc(math_words))); kind[i] = "math"
    for i in range(150, 300):
        rows.append((i, doc(web_words))); kind[i] = "web"
    source = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, doc(math_words)) for i in range(40)], "doc_id long, text string"
    )
    return source, target, kind


def test_dsir_selects_target_like_docs(spark):
    source, target, kind = _corpora(spark)
    picked = [r.doc_id for r in dsir_resample(source, target, n_take=100).collect()]
    assert len(picked) == 100
    math_frac = sum(1 for d in picked if kind[d] == "math") / 100
    assert math_frac > 0.95  # near-perfect separation on disjoint pools
    # and the weights themselves separate the classes
    w = {r.doc_id: r.logw for r in dsir_resample(source, target, n_take=300).collect()}
    avg_math = np.mean([w[d] for d in w if kind[d] == "math"])
    avg_web = np.mean([w[d] for d in w if kind[d] == "web"])
    assert avg_math > 0 > avg_web


def test_dsir_deterministic_and_partitioning_invariant(spark):
    source, target, _ = _corpora(spark)
    a = [(r.doc_id, r.logw, r.key) for r in dsir_resample(source, target, n_take=50).collect()]
    b = [
        (r.doc_id, r.logw, r.key)
        for r in dsir_resample(
            source.repartition(11), target.repartition(3), n_take=50
        ).collect()
    ]
    assert a == b


def test_hashed_gram_buckets_counts_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    total = (
        hashed_gram_buckets(df, buckets=16)
        .groupBy()
        .sum("cnt")
        .collect()[0][0]
    )
    assert total == 5  # 3 unigrams + 2 bigrams


def test_dsir_log_ratios_bounded_rows(spark):
    source, target, _ = _corpora(spark)
    r = dsir_log_ratios(source, target, buckets=64)
    assert r.count() <= 64
