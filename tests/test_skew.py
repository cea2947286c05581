"""Skew operators: salted join preserves join semantics; skew-safe
distinct matches countDistinct."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.skew import (
    salted_join,
    skewsafe_count_distinct,
)


def _skewed(spark):
    # one hot key (90% of rows) + a tail
    hot = spark.range(900).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select((F.col("id") % 7 + 2).cast("long").alias("k"), F.col("id").alias("v"))
    return hot.unionByName(tail)


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (99, "unmatched")], "k long, name string"
    )
    plain = big.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_preserves_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(2, "a")], "k long, name string")
    out = salted_join(big, small, "k", n_salts=4, how="left")
    assert out.count() == big.count()  # no row loss, no duplication
    assert out.where(F.col("name").isNull()).count() == big.where(F.col("k") != 2).count()


def test_skewsafe_count_distinct_matches_exact(spark):
    df = _skewed(spark)
    got = {
        r.k: r.n_distinct_v for r in skewsafe_count_distinct(df, ["k"], "v").collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_knn_auto_strategy_and_lsh_recall_on_planted_dups(spark):
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.operators.similarity import knn

    rng = np.random.RandomState(3)
    base = rng.standard_normal((20, 64))
    queries = spark.createDataFrame(
        [(int(i), [float(v) for v in base[i]]) for i in range(5)], "query_id long, qe array<double>"
    )
    # corpus contains an exact copy of each query (ids 100+i) plus noise
    corpus_rows = [(100 + i, [float(v) for v in base[i]]) for i in range(5)]
    corpus_rows += [(200 + j, [float(v) for v in rng.standard_normal(64)]) for j in range(15)]
    corpus = spark.createDataFrame(corpus_rows, "neighbor_id long, ce array<double>")
    # auto picks brute below the limit: identical to knn_bruteforce
    brute = knn(queries, corpus, k=1, strategy="auto", brute_force_limit=1000)
    top1 = {r.query_id: r.neighbor_id for r in brute.collect()}
    assert top1 == {i: 100 + i for i in range(5)}
    # lsh: an identical vector shares every hyperplane sign -> same bucket,
    # so planted duplicates are always recalled
    lsh = knn(queries, corpus, k=1, strategy="lsh")
    top1_lsh = {r.query_id: r.neighbor_id for r in lsh.collect()}
    assert top1_lsh == {i: 100 + i for i in range(5)}


def test_knn_auto_plan_construction_launches_no_job(spark):
    """strategy='auto' must decide from Catalyst statistics, not an eager
    count() — constructing the plan may not run a single Spark job."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import knn

    queries = spark.createDataFrame(
        [(1, [1.0] * 64)], "query_id long, qe array<double>"
    )
    corpus = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(10)], "neighbor_id long, ce array<double>"
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    knn(queries, corpus, k=1, strategy="auto")  # plan only, no action
    after = set(tracker.getJobIdsForGroup())
    assert after == before


def test_key_skew_profile_flags_planted_hot_key(spark):
    from image_matadata_batchprocessing_aws_spark.operators.skew import key_skew_profile

    rows = [(1,)] * 80 + [(k,) for k in range(2, 22)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_profile(df, "k", top_k=3).collect()
    assert [r.key for r in out] == [1, 2, 3]  # count desc, key asc tie-break
    hot = out[0]
    assert hot.n_rows == 80 and hot.share == 0.8
    assert hot.ratio_to_mean == round(80 * 21 / 100, 6) and hot.is_heavy
    assert not out[1].is_heavy
