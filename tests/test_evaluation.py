"""Unit tests for the model-evaluation aggregates
(``operators/evaluation.py``) and the JS mixture diagnostic —
edge cases the null-free oracle columns never exercise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.evaluation import calibration_bins, roc_auc
from image_matadata_batchprocessing_aws_spark.operators.stats import js_mixture_divergence


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "s double, y int")
    out = roc_auc(df, "s", "y").collect()
    assert len(out) == 1
    return out[0]


def test_auc_perfect_separation(spark):
    r = _auc(spark, [(0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1)])
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_reversed_is_zero(spark):
    r = _auc(spark, [(0.1, 1), (0.2, 1), (0.3, 0), (0.4, 0)])
    assert r["auc"] == 0.0


def test_auc_all_tied_is_half(spark):
    r = _auc(spark, [(1.0, 0), (1.0, 1), (1.0, 0), (1.0, 1)])
    assert r["auc"] == 0.5


def test_auc_tie_correction_matches_hand_computation(spark):
    # scores: 1,2,2,3  labels: 0,1,0,1
    # pairs (pos vs neg): (2,1)=win, (2,2)=half, (3,1)=win, (3,2)=win
    # AUC = 3.5/4 = 0.875
    r = _auc(spark, [(1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)])
    assert r["auc"] == 0.875


def test_auc_monotone_transform_invariant(spark):
    rows = [(float(i % 7), int(i % 3 == 0)) for i in range(40)]
    base = _auc(spark, rows)["auc"]
    warped = _auc(spark, [(s * 3.0 + 11.0, y) for s, y in rows])["auc"]
    assert base == warped


def test_auc_single_class_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 0), ("b", 2.0, 1)],
        "g string, s double, y int",
    )
    out = {r["g"]: r["auc"] for r in roc_auc(df, "s", "y", group_by=["g"]).collect()}
    assert out["a"] is None
    assert out["b"] == 1.0


def test_calibration_weights_and_counts(spark):
    rows = [(i / 100.0, int(i >= 50)) for i in range(100)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = calibration_bins(df, "p", "y", n_bins=10).collect()
    assert sorted(r["bin"] for r in out) == list(range(10))
    assert sum(r["n"] for r in out) == 100
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-9
    # perfectly sharp labels: low bins accuracy 0, high bins accuracy 1
    by_bin = {r["bin"]: r for r in out}
    assert by_bin[0]["accuracy"] == 0.0 and by_bin[9]["accuracy"] == 1.0
    # p = 1.0 lands in the top bin, not an 11th
    top = calibration_bins(
        spark.createDataFrame([(1.0, 1)], "p double, y int"), "p", "y"
    ).collect()
    assert [r["bin"] for r in top] == [9]


def test_calibration_ece_from_bins(spark):
    # constant prediction 0.7 vs 50% base rate -> ECE = 0.2
    rows = [(0.7, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = calibration_bins(df, "p", "y").collect()
    ece = sum(r["weight"] * abs(r["gap"]) for r in out)
    assert abs(ece - 0.2) < 1e-6


def test_js_identical_mix_is_zero(spark):
    rows = [(g, l) for g in ("a", "b") for l in ("x", "x", "y")]
    df = spark.createDataFrame(rows, "g string, l string")
    out = js_mixture_divergence(df, "g", "l").collect()
    assert all(r["js_divergence"] == 0.0 for r in out)


def test_js_disjoint_mix_bounded_by_ln2(spark):
    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5, "g string, l string"
    )
    out = {r["g"]: r["js_divergence"] for r in js_mixture_divergence(df, "g", "l").collect()}
    # each group is fully disjoint from HALF the corpus:
    # JS = 0.5*ln2 + 0.5*(0.5*ln... ) — just assert symmetry + bounds
    assert out["a"] == out["b"]
    assert 0.0 < out["a"] <= round(math.log(2.0), 6)


def test_evaluation_plans_stay_jvm_side(spark):
    from image_matadata_batchprocessing_aws_spark.plans import assert_no_python_udf

    df = spark.createDataFrame([(1.0, 1), (0.5, 0)], "s double, y int")
    assert_no_python_udf(roc_auc(df, "s", "y"))
    assert_no_python_udf(calibration_bins(df, "s", "y"))


# --- confusion_metrics / cohens_kappa --------------------------------------


def test_confusion_hand_computed(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import confusion_metrics

    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a")],
        "y string, p string",
    )
    out = {r["cls"]: r for r in confusion_metrics(df, "p", "y").collect()}
    a, b = out["a"], out["b"]
    assert (a["support"], a["predicted"], a["tp"]) == (3, 3, 2)
    assert a["precision"] == round(2 / 3, 6) and a["recall"] == round(2 / 3, 6)
    assert a["f1"] == round(4 / 6, 6)
    assert (b["support"], b["predicted"], b["tp"]) == (2, 2, 1)


def test_confusion_never_predicted_class_null_precision(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import confusion_metrics

    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "b")], "y string, p string"
    )
    out = {r["cls"]: r for r in confusion_metrics(df, "p", "y").collect()}
    assert out["a"]["predicted"] == 0 and out["a"]["precision"] is None
    assert out["a"]["recall"] == 0.0  # 0 tp over 2 true rows
    assert out["b"]["recall"] == 1.0


def test_confusion_pred_only_class_null_recall(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import confusion_metrics

    df = spark.createDataFrame([("a", "c"), ("a", "a")], "y string, p string")
    out = {r["cls"]: r for r in confusion_metrics(df, "p", "y").collect()}
    assert out["c"]["support"] == 0 and out["c"]["recall"] is None
    assert out["c"]["precision"] == 0.0


def test_kappa_hand_computed(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import cohens_kappa

    # classic 2x2: agree=70%, pe=0.5 -> kappa=0.4
    rows = (
        [("x", "x")] * 35 + [("y", "y")] * 35 + [("x", "y")] * 15 + [("y", "x")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 100 and r["n_agree"] == 70
    assert r["kappa"] == round((70 * 100 - 5000) / (10000 - 5000), 6) == 0.4


def test_kappa_disjoint_label_sets_is_zero(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import cohens_kappa

    df = spark.createDataFrame([("x", "u"), ("y", "v")], "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n_agree"] == 0 and r["kappa"] == 0.0


def test_kappa_constant_identical_raters_null(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import cohens_kappa

    df = spark.createDataFrame([("x", "x"), ("x", "x")], "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] is None  # pe = 1: agreement is vacuous


# --- kcore_peel ------------------------------------------------------------


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_kcore_triangle_survives_pendant_peels(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import kcore_peel

    # triangle 1-2-3 plus pendant 4 hanging off 1
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4)])
    out = {r["node"]: r["degree"] for r in kcore_peel(e, k=2, rounds=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_needs_second_round(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import kcore_peel

    # chain 1-2-3-4-5: round 1 peels the endpoints, and round 2 empties
    # the graph (3 passes the degree test but its neighbors die, so no
    # edge survives — the true 2-core of a chain is empty)
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    e = _edges(spark, chain)
    r1 = {r["node"]: r["degree"] for r in kcore_peel(e, k=2, rounds=1).collect()}
    r2 = kcore_peel(e, k=2, rounds=2).collect()
    assert r1 == {2: 1, 3: 2, 4: 1}
    assert r2 == []


def test_kcore_k1_keeps_everything(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import kcore_peel

    e = _edges(spark, [(1, 2), (3, 4)])
    out = kcore_peel(e, k=1, rounds=3).collect()
    assert {r["node"] for r in out} == {1, 2, 3, 4}


# --- mrr_first_relevant ----------------------------------------------------


def _mk_pairs(spark, rows):
    return spark.createDataFrame(
        rows, "q long, c long, s long, rel boolean"
    )


def test_mrr_hand_computed(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import mrr_first_relevant

    pairs = _mk_pairs(
        spark,
        [
            # query 1: relevant candidate is 2nd-best -> rank 2
            (1, 10, 100, False),
            (1, 11, 90, True),
            (1, 12, 80, True),
            # query 2: relevant is the top hit -> rank 1
            (2, 10, 50, True),
            (2, 11, 40, False),
        ],
    )
    out = {r["q"]: r for r in mrr_first_relevant(pairs, "q", "c", "s", "rel").collect()}
    assert out[1]["first_rank"] == 2 and out[1]["rr_scaled"] == 500000000
    assert out[2]["first_rank"] == 1 and out[2]["rr_scaled"] == 1000000000


def test_mrr_tie_ranks_by_candidate_id(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import mrr_first_relevant

    # two candidates tie at 100; the relevant one has the LARGER id, so
    # the irrelevant (smaller-id) one outranks it -> rank 2
    pairs = _mk_pairs(spark, [(1, 5, 100, False), (1, 9, 100, True)])
    r = mrr_first_relevant(pairs, "q", "c", "s", "rel").collect()[0]
    assert r["first_rank"] == 2


def test_mrr_query_without_relevant_is_absent(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import mrr_first_relevant

    pairs = _mk_pairs(spark, [(1, 5, 10, False), (2, 5, 10, True)])
    out = mrr_first_relevant(pairs, "q", "c", "s", "rel").collect()
    assert [r["q"] for r in out] == [2]


# --- rouge_pair_scores -----------------------------------------------------


def test_rouge1_hand_computed(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import rouge_pair_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat lay on a rug")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = rouge_pair_scores(docs, pairs).collect()[0]
    # clipped unigram overlap: the(1 of 2), cat, on -> 3; la=6, lb=6
    assert r["overlap"] == 3
    assert r["rouge_p"] == 0.5 and r["rouge_r"] == 0.5 and r["rouge_f"] == 0.5


def test_rouge1_clips_repeated_tokens(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import rouge_pair_scores

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b b b")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = rouge_pair_scores(docs, pairs).collect()[0]
    # min(3,1) for 'a' + min(1,3) for 'b' = 2
    assert r["overlap"] == 2 and r["rouge_f"] == 0.5


def test_rouge2_bigram_grain(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import rouge_pair_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat down"), (2, "the cat sat up")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = rouge_pair_scores(docs, pairs, n=2).collect()[0]
    # shared bigrams: "the cat", "cat sat" -> 2 of 3 each side
    assert r["overlap"] == 2
    assert r["rouge_f"] == round(4 / 6, 6)


def test_rouge_zero_overlap_is_zero_not_null(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import rouge_pair_scores

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = rouge_pair_scores(docs, pairs).collect()[0]
    assert r["overlap"] == 0 and r["rouge_f"] == 0.0


def test_pr_curve_monotone_recall_and_known_point(spark):
    """Scores rank labels perfectly: at the bucket holding exactly the
    positives, precision is 1.0 and recall hits 1.0; recall is
    non-decreasing along buckets."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import pr_curve

    rows = [(i, float(100 - i), 1 if i < 4 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, score double, y long")
    out = sorted(pr_curve(df, "score", "y", "id", n_points=5).collect(),
                 key=lambda r: r.bucket)
    assert out[0].n_predicted == 4 and out[0].precision == 1.0
    assert out[0].recall == 1.0  # all 4 positives in the top bucket
    assert out[-1].recall == 1.0 and out[-1].precision == 0.2
    recs = [r.recall for r in out]
    assert recs == sorted(recs)


def test_pr_curve_f1_known_value(spark):
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import pr_curve

    # 2 positives, top-2 has 1 of them: prec 0.5, recall 0.5, f1 0.5
    rows = [(1, 9.0, 1), (2, 8.0, 0), (3, 7.0, 1), (4, 6.0, 0)]
    df = spark.createDataFrame(rows, "id long, score double, y long")
    out = {r.bucket: r for r in pr_curve(df, "score", "y", "id", n_points=2).collect()}
    assert out[1].precision == 0.5 and out[1].recall == 0.5 and out[1].f1 == 0.5


def test_average_precision_hand_case(spark):
    """Ranked labels [1,0,1,0]: AP = (1/1 + 2/3)/2; best F1 = 0.8 at
    rank 3 (both positives in, one false positive)."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        average_precision,
    )

    rows = [(1, 4.0, 1), (2, 3.0, 0), (3, 2.0, 1), (4, 1.0, 0)]
    df = spark.createDataFrame(rows, "id long, score double, y long")
    r = average_precision(df, "score", "y", "id").collect()[0]
    assert r.n == 4 and r.n_pos == 2
    assert r.average_precision == round((1 + 2 / 3) / 2, 6)
    assert r.best_f1 == 0.8 and r.best_f1_rank == 3


def test_delong_matches_rowlevel_numpy_reference(spark):
    """roc_auc_delong's sufficient-statistics form vs an independent
    row-level numpy implementation of the DeLong placement variances —
    ties included (the per-distinct-score placement sharing must equal
    per-row placements computed directly)."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.operators.evaluation import roc_auc_delong

    rng_rows = [
        (0.1, 0), (0.2, 0), (0.2, 1), (0.3, 0), (0.35, 1), (0.4, 1),
        (0.4, 0), (0.5, 1), (0.5, 1), (0.6, 0), (0.7, 1), (0.8, 1),
        (0.8, 0), (0.9, 1),
    ]
    df = spark.createDataFrame(rng_rows, "s double, y int")
    got = roc_auc_delong(df, "s", "y").collect()[0]

    scores = np.array([r[0] for r in rng_rows])
    labels = np.array([r[1] for r in rng_rows])
    pos, neg = scores[labels == 1], scores[labels == 0]
    m, n = len(pos), len(neg)
    v10 = np.array([((s > neg).sum() + 0.5 * (s == neg).sum()) / n for s in pos])
    v01 = np.array([((pos > s).sum() + 0.5 * (pos == s).sum()) / m for s in neg])
    auc = v10.mean()
    se = math.sqrt(v10.var(ddof=1) / m + v01.var(ddof=1) / n)
    assert got["n_pos"] == m and got["n_neg"] == n
    assert abs(got["auc"] - round(auc, 6)) < 1e-12
    assert abs(got["se"] - round(se, 6)) < 1e-12
    assert abs(got["ci_lo"] - round(auc - 1.96 * se, 6)) < 1e-12
    assert abs(got["ci_hi"] - round(auc + 1.96 * se, 6)) < 1e-12


def test_delong_degenerate_groups_null(spark):
    """<2 positives or <2 negatives: NULL variance columns, not a crash."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import roc_auc_delong

    df = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.3, 1)], "s double, y int"
    )
    r = roc_auc_delong(df, "s", "y").collect()[0]
    assert r["auc"] is None and r["se"] is None
