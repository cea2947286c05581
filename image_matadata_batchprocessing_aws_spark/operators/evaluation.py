"""Model-evaluation aggregates (extends SURVEY section 2.4).

The reference evaluates its trained model with a single rowwise
Euclidean-distance aggregate (``train.py:136-140``); these operators
are the other half of a training pipeline's eval loop, computed IN the
engine over arbitrarily large prediction tables instead of driver-side
numpy: threshold-free ranking quality (ROC AUC via the tie-corrected
Mann-Whitney rank-sum) and probability-calibration diagnostics
(reliability bins / expected calibration error).

Cross-engine determinism: AUC is an EXACT rational in the rank sums —
ranks are integers, tie groups contribute their integer average rank
(``2*rank + ties - 1`` halves, kept doubled so everything stays BIGINT
until one final double division).  Calibration bins quantize the
probability to a bin index with integer flooring; per-bin means are
single double divisions of exact sums.  No floating accumulation
anywhere, so partition order cannot change a bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_by: Sequence[str] = (),
    out: str = "auc",
) -> DataFrame:
    """Area under the ROC curve per group, exactly, in two exchanges.

    ``label_col`` must be a 0/1 integer column; higher ``score_col``
    should predict label 1.  Tied scores count half (the standard
    Mann-Whitney tie treatment), so AUC equals the probability a random
    positive outranks a random negative, ties splitting the credit.

    Scale shape: NEVER a row-level rank window (that sorts each whole
    group inside one partition — the keyless-window landmine at 100 TB).
    Instead the data-sized pass is a partial-agg ``groupBy(keys,
    score)`` — map-side combine shrinks it to distinct scores — and the
    prefix-sum window rides the aggregated per-score table, whose
    cardinality is bounded by distinct score values, not row count.
    U-statistic form: ``U2 = sum_s p_s * (2*cumneg_below(s) + n_s)``
    (doubled to stay integral), ``AUC = U2 / (2*P*N)`` — one final
    double division of exact BIGINT sums.  Groups with a single class
    yield NULL rather than a division by zero.
    """
    keys = list(group_by)
    per_score = df.groupBy(*keys, F.col(score_col).alias("__s")).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("__n"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn("__cumneg", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    agg = cum.groupBy(*keys).agg(
        F.sum(F.col("__p") * (2 * F.col("__cumneg") + F.col("__n"))).alias("__u2"),
        F.sum("__p").alias("n_pos"),
        F.sum("__n").alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__u2").cast("double") / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
    )
    return agg.select(
        *keys,
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(auc, 6).alias(out),
    )


def roc_auc_delong(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """ROC AUC with DeLong variance and a 95% normal CI, per group
    (DeLong, DeLong & Clarke-Pearson 1988 — the standard "is this AUC
    significantly better" machinery).

    Same scale shape as :func:`roc_auc`: the data-sized pass is the
    ``groupBy(keys, score)`` partial agg; every row in a score group
    shares one PLACEMENT (doubled to stay integral: positives at score
    s place ``2*neg_below + neg_tied`` out of ``2*N``; negatives place
    ``2*pos_above + pos_tied`` out of ``2*P``), so the DeLong
    placement variances reduce to exact BIGINT sufficient statistics
    (sum, sum-of-squares) over the per-score table — never a row-level
    window.  The closing arithmetic is one identically-structured
    double expression (mult/div/sub/sqrt — all correctly-rounded IEEE),
    so a DuckDB twin matches bitwise.  Overflow posture: placement sums
    grow as ~n^2/2 (tops int64 near n ~ 6e9 per group) and squared sums
    as ~n^3/2 (near n ~ 2.6M), so all four sufficient statistics
    accumulate as DECIMAL(38,0) with the per-row products taken on the
    decimal side (HUGEINT end to end in the DuckDB twin) — exact
    through n ~ 10^12 per group, past which DECIMAL(38) itself
    saturates and ANSI mode throws loudly.  Each converts to double
    exactly once at the close (correctly rounded from the same exact
    integer on both engines).

    Groups with fewer than 2 positives or 2 negatives return NULL
    variance columns (the estimator needs both sample variances).
    """
    keys = list(group_by)
    per_score = df.groupBy(*keys, F.col(score_col).alias("__s")).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("__n"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(*keys)
    cum = per_score.select(
        *keys,
        "__p",
        "__n",
        F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__cumneg"),
        F.coalesce(F.sum("__p").over(w), F.lit(0)).alias("__cumpos"),
        F.sum("__p").over(wall).alias("__ptot"),
    )
    vp = 2 * F.col("__cumneg") + F.col("__n")
    vn = 2 * (F.col("__ptot") - F.col("__cumpos") - F.col("__p")) + F.col("__p")
    agg = cum.groupBy(*keys).agg(
        F.sum("__p").alias("n_pos"),
        F.sum("__n").alias("n_neg"),
        F.sum(F.col("__p").cast("decimal(38,0)") * vp).alias("__svp"),
        F.sum(F.col("__p").cast("decimal(38,0)") * vp * vp).alias("__svp2"),
        F.sum(F.col("__n").cast("decimal(38,0)") * vn).alias("__svn"),
        F.sum(F.col("__n").cast("decimal(38,0)") * vn * vn).alias("__svn2"),
    )
    pd_, nd = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    svp, svp2 = F.col("__svp").cast("double"), F.col("__svp2").cast("double")
    svn, svn2 = F.col("__svn").cast("double"), F.col("__svn2").cast("double")
    auc = svp / (2.0 * pd_ * nd)
    s10 = (pd_ * svp2 - svp * svp) / (pd_ * (pd_ - 1.0)) / ((2.0 * nd) * (2.0 * nd))
    s01 = (nd * svn2 - svn * svn) / (nd * (nd - 1.0)) / ((2.0 * pd_) * (2.0 * pd_))
    se = F.sqrt(s10 / pd_ + s01 / nd)
    ok = (F.col("n_pos") > 1) & (F.col("n_neg") > 1)
    return agg.select(
        *keys,
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(F.when(ok, auc), 6).alias("auc"),
        F.round(F.when(ok, se), 6).alias("se"),
        F.round(F.when(ok, auc - F.lit(1.96) * se), 6).alias("ci_lo"),
        F.round(F.when(ok, auc + F.lit(1.96) * se), 6).alias("ci_hi"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] probability column.

    Returns one row per non-empty bin: ``bin`` (0-based), ``n``, the
    mean predicted probability (``confidence``), the empirical positive
    rate (``accuracy``), the signed ``gap`` (confidence - accuracy) and
    the bin's ``weight`` (share of rows) — ``sum(weight * abs(gap))``
    is the expected calibration error, left to the caller so the result
    stays single-grain.

    Scale shape: pure map-side bin assignment then one partial-agg
    groupBy on the bin index; probabilities are quantized to 1e-6
    BIGINTs before summing so the per-bin mean is an exact-integer sum
    divided once.
    """
    p6 = F.round(F.col(prob_col) * 1000000.0).cast("long")
    bin_idx = F.least(F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)).cast("long")
    total = df.agg(F.count("*").alias("__n_total"))
    binned = df.select(
        bin_idx.alias("bin"),
        p6.alias("__p6"),
        F.col(label_col).cast("long").alias("__y"),
    )
    agg = (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("__p6").alias("__sp6"),
            F.sum("__y").alias("__sy"),
        )
        .crossJoin(F.broadcast(total))
    )
    conf = F.col("__sp6").cast("double") / F.col("n").cast("double") / 1000000.0
    acc = F.col("__sy").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.round(conf, 6).alias("confidence"),
        F.round(acc, 6).alias("accuracy"),
        F.round(conf - acc, 6).alias("gap"),
        F.round(F.col("n").cast("double") / F.col("__n_total").cast("double"), 6).alias(
            "weight"
        ),
    )


def confusion_metrics(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-class precision/recall/F1 from the exact confusion matrix,
    optionally per group (a time window, a data source) via
    ``group_by``.

    One row per (group,) class appearing in EITHER column: ``support``
    (true rows), ``predicted`` (rows the classifier assigned here),
    ``tp``, then the three ratios.  F1 uses the count identity ``2*tp /
    (support + predicted)`` — one division of exact BIGINTs instead of
    the harmonic mean of two already-divided doubles, so both engines
    compute the identical double.  ``precision`` is NULL when the class
    is never predicted, ``recall`` NULL when it never occurs (sklearn
    warns and reports 0; NULL states "undefined" honestly).

    Scale shape: the only data-sized pass is the partial-agg
    ``groupBy(group, label, pred)`` cell table; marginals and the class
    join are re-aggregations of cells, bounded by
    |groups| x |classes|^2.
    """
    keys = list(group_by)
    cell = df.groupBy(
        *keys, F.col(label_col).alias("__y"), F.col(pred_col).alias("__p")
    ).agg(F.count("*").alias("__c"))
    truth = cell.groupBy(*keys, F.col("__y").alias("cls")).agg(
        F.sum("__c").alias("support")
    )
    pred = cell.groupBy(*keys, F.col("__p").alias("cls")).agg(
        F.sum("__c").alias("predicted")
    )
    tp = (
        cell.where(F.col("__y") == F.col("__p"))
        .groupBy(*keys, F.col("__y").alias("cls"))
        .agg(F.sum("__c").alias("tp"))
    )
    # the three marginal frames share lineage (all derive from `cell`),
    # which trips Spark's self-join attribute resolution under grouped
    # keys — rename each side to disjoint column names before joining
    jk = [*keys, "cls"]
    truth = truth.select(
        *[F.col(k).alias(f"__t_{k}") for k in jk], "support"
    )
    pred = pred.select(
        *[F.col(k).alias(f"__q_{k}") for k in jk], "predicted"
    )
    tp = tp.select(*[F.col(k).alias(f"__x_{k}") for k in jk], "tp")
    merged = truth.join(
        pred,
        [
            F.col(f"__t_{k}").eqNullSafe(F.col(f"__q_{k}")) for k in jk
        ],
        "full_outer",
    ).select(
        *[
            F.coalesce(F.col(f"__t_{k}"), F.col(f"__q_{k}")).alias(k)
            for k in jk
        ],
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("predicted", F.lit(0)).alias("predicted"),
    )
    out = merged.join(
        tp,
        [F.col(k).eqNullSafe(F.col(f"__x_{k}")) for k in jk],
        "left",
    ).select(
        *jk,
        "support",
        "predicted",
        F.coalesce("tp", F.lit(0)).alias("tp"),
    )
    prec = F.when(
        F.col("predicted") > 0,
        F.col("tp").cast("double") / F.col("predicted").cast("double"),
    )
    rec = F.when(
        F.col("support") > 0,
        F.col("tp").cast("double") / F.col("support").cast("double"),
    )
    f1 = F.when(
        F.col("support") + F.col("predicted") > 0,
        (2 * F.col("tp")).cast("double")
        / (F.col("support") + F.col("predicted")).cast("double"),
    )
    return out.select(
        *keys,
        "cls",
        F.col("support").cast("long").alias("support"),
        F.col("predicted").cast("long").alias("predicted"),
        F.col("tp").cast("long").alias("tp"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa: chance-corrected agreement between two categorical
    columns (two annotators, or a classifier against gold labels).

    Integer form all the way down: with ``agree`` the diagonal count,
    ``n`` the total and ``pe_num = sum_k row_k * col_k`` the chance
    term, ``kappa = (agree*n - pe_num) / (n*n - pe_num)`` — the
    standard ``(po-pe)/(1-pe)`` with both sides multiplied by ``n^2``,
    so the ONLY floating operation is the final division of two exact
    BIGINTs.  NULL when the denominator is 0 (both raters constant and
    identical — agreement is vacuous, pe = 1).

    Scale shape: one partial-agg ``groupBy(a, b)``; everything after is
    |classes|^2-bounded re-aggregation, the three 1-row frames combined
    with broadcast cross joins.
    """
    cell = df.groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b")).agg(
        F.count("*").alias("__c")
    )
    marg = (
        cell.groupBy("__a")
        .agg(F.sum("__c").alias("__ra"))
        .join(cell.groupBy("__b").agg(F.sum("__c").alias("__cb")),
              F.col("__a") == F.col("__b"))
        .agg(
            F.coalesce(F.sum(F.col("__ra") * F.col("__cb")), F.lit(0)).alias(
                "__pe_num"
            )
        )
    )
    tot = cell.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c")).otherwise(0)).alias(
            "__agree"
        ),
    )
    out = tot.crossJoin(F.broadcast(marg))
    kappa = F.when(
        F.col("__n") * F.col("__n") - F.col("__pe_num") != 0,
        (F.col("__agree") * F.col("__n") - F.col("__pe_num")).cast("double")
        / (F.col("__n") * F.col("__n") - F.col("__pe_num")).cast("double"),
    )
    return out.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__agree").cast("long").alias("n_agree"),
        F.round(kappa, 6).alias("kappa"),
    )


def mrr_first_relevant(
    pairs: DataFrame,
    query_col: str,
    cand_col: str,
    score_col: str,
    relevant_col: str,
    rr_scale: int = 10**9,
) -> DataFrame:
    """Reciprocal rank of the first relevant candidate per query —
    ``(query, first_rank, rr_scaled)`` with ``rr_scaled = rr_scale div
    first_rank`` (exact integer, so the mean over queries is a sum of
    identical BIGINTs in any engine).  Queries with no relevant
    candidate are absent (their RR is 0 by convention; the caller's
    left join restores them if needed).

    ``pairs`` is the scored (query x candidate) table; ``score_col``
    must already be an exact (integer) score so ordering is
    engine-independent; ties rank by ``cand_col`` ascending.

    Scale shape: NEVER a per-query ranking window (a query's candidate
    set is data-sized — the keyless-window landmine).  Two
    aggregate-shaped passes instead: (1) per-query argmax of the
    relevant candidates (one partial-agg max of a (score, -id) struct),
    (2) the first relevant's rank = 1 + count of strictly-better
    candidates, a partial-agg count against the broadcast per-query
    best.  Both shuffles are query-keyed aggregations; nothing sorts.
    """
    best = (
        pairs.where(F.col(relevant_col))
        .groupBy(query_col)
        .agg(
            F.max(
                F.struct(
                    F.col(score_col).alias("s"), (-F.col(cand_col)).alias("negid")
                )
            ).alias("__b")
        )
        .select(
            query_col,
            F.col("__b.s").alias("__bs"),
            (-F.col("__b.negid")).alias("__bid"),
        )
    )
    better = (
        pairs.join(F.broadcast(best), query_col)
        .where(
            (F.col(score_col) > F.col("__bs"))
            | ((F.col(score_col) == F.col("__bs")) & (F.col(cand_col) < F.col("__bid")))
        )
        .groupBy(query_col)
        .agg(F.count("*").alias("__nb"))
    )
    out = best.join(better, query_col, "left").select(
        query_col,
        (F.coalesce("__nb", F.lit(0)) + 1).cast("long").alias("first_rank"),
    )
    return out.withColumn(
        "rr_scaled", F.expr(f"{int(rr_scale)} div first_rank").cast("long")
    )


def rouge_pair_scores(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
) -> DataFrame:
    """ROUGE-N precision/recall/F1 between the texts of given
    ``(id_a, id_b)`` pairs — the overlap audit a summarization/dedup
    pipeline runs on candidate pairs (clipped n-gram counts, the
    standard multiset ROUGE).

    Directional convention: ``id_a`` is the reference — recall is
    overlap over a's length, precision over b's.  F1 uses the count
    identity ``2*overlap/(len_a + len_b)`` (one division of exact
    BIGINTs).  Zero-overlap pairs report 0, not NULL; empty texts
    yield NULL for the affected ratio.

    Scale shape: the data-sized passes are the n-gram explode and one
    partial-agg ``groupBy(doc, gram)``; the overlap join runs pairs ->
    a-grams -> b-grams keyed on (id, gram), so its volume is bounded by
    candidate-pair gram counts, never corpus^2.  ``least(ca, cb)`` is
    the multiset-intersection clip.
    """
    from image_matadata_batchprocessing_aws_spark.operators.text import tokens

    toks = tokens(text_col)
    if n == 1:
        grams = toks
    else:
        parts = [
            F.expr(
                f"slice(split(trim({text_col}), '\\\\s+'), {k + 1},"
                f" greatest(size(split(trim({text_col}), '\\\\s+')) - {n - 1}, 0))"
            )
            for k in range(n)
        ]
        grams = parts[0]
        for nxt in parts[1:]:
            grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    cnt = (
        docs.select(F.col(id_col).alias("__id"), F.explode(grams).alias("__g"))
        .groupBy("__id", "__g")
        .agg(F.count("*").alias("__c"))
    )
    lens = cnt.groupBy("__id").agg(F.sum("__c").alias("__len"))
    ca = cnt.select(
        F.col("__id").alias("id_a"), F.col("__g"), F.col("__c").alias("__ca")
    )
    cb = cnt.select(
        F.col("__id").alias("id_b"), F.col("__g"), F.col("__c").alias("__cb")
    )
    ov = (
        pairs.select("id_a", "id_b")
        .join(ca, "id_a")
        .join(cb, ["id_b", "__g"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("__ca", "__cb")).alias("__ov"))
    )
    la = lens.select(F.col("__id").alias("id_a"), F.col("__len").alias("__la"))
    lb = lens.select(F.col("__id").alias("id_b"), F.col("__len").alias("__lb"))
    out = (
        pairs.select("id_a", "id_b")
        .join(ov, ["id_a", "id_b"], "left")
        .join(la, "id_a", "left")
        .join(lb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce("__ov", F.lit(0)).alias("__ov"),
            F.coalesce("__la", F.lit(0)).alias("__la"),
            F.coalesce("__lb", F.lit(0)).alias("__lb"),
        )
    )
    prec = F.when(
        F.col("__lb") > 0, F.col("__ov").cast("double") / F.col("__lb").cast("double")
    )
    rec = F.when(
        F.col("__la") > 0, F.col("__ov").cast("double") / F.col("__la").cast("double")
    )
    f1 = F.when(
        F.col("__la") + F.col("__lb") > 0,
        (2 * F.col("__ov")).cast("double")
        / (F.col("__la") + F.col("__lb")).cast("double"),
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("__ov").cast("long").alias("overlap"),
        F.round(prec, 6).alias("rouge_p"),
        F.round(rec, 6).alias("rouge_r"),
        F.round(f1, 6).alias("rouge_f"),
    )


def mcnemar_test(
    df: DataFrame,
    gold: Column,
    pred_a: Column,
    pred_b: Column,
    round_digits: int = 6,
) -> DataFrame:
    """McNEMAR's paired test — THE statistic for "is classifier A
    actually better than B" when both scored the SAME examples:
    accuracy deltas ignore pairing, McNemar looks only at the
    discordant cells (b = A right & B wrong, c = A wrong & B right)
    with the continuity-corrected statistic (|b-c|-1)²/(b+c), ~χ²₁
    under exchangeability.

    One aggregate of integer cell counts; the closing arithmetic is
    one double division (NULL when b+c = 0 — no disagreements, no
    evidence).  Returns ``n, acc_a, acc_b, b_discordant,
    c_discordant, mcnemar_chi2``.
    """
    a_ok = (pred_a == gold).cast("int")
    b_ok = (pred_b == gold).cast("int")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a_ok).alias("na"),
        F.sum(b_ok).alias("nb"),
        F.sum(((a_ok == 1) & (b_ok == 0)).cast("int")).alias("b"),
        F.sum(((a_ok == 0) & (b_ok == 1)).cast("int")).alias("c"),
    )
    bc = F.col("b") + F.col("c")
    stat = F.when(
        bc > 0,
        (
            (F.abs(F.col("b") - F.col("c")) - F.lit(1)).cast("double")
            * (F.abs(F.col("b") - F.col("c")) - F.lit(1)).cast("double")
        )
        / bc.cast("double"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("na").cast("double") / F.col("n").cast("double"), round_digits).alias("acc_a"),
        F.round(F.col("nb").cast("double") / F.col("n").cast("double"), round_digits).alias("acc_b"),
        F.col("b").cast("long").alias("b_discordant"),
        F.col("c").cast("long").alias("c_discordant"),
        F.round(stat, round_digits).alias("mcnemar_chi2"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_points: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Precision-recall curve at ``n_points`` score-rank cutoffs — the
    threshold-sweep view ROC AUC (:func:`roc_auc`) compresses to one
    number: rows rank score-desc, split into ``n_points`` ntile
    buckets, and each bucket boundary reports CUMULATIVE precision /
    recall / F1 as if everything ranked above it were predicted
    positive.  On imbalanced labels this is the curve that actually
    moves (ROC saturates when negatives dominate).

    All counts are exact integers off one rank window (unique
    ``id_col`` tiebreak so both engines bucket identically); the curve
    table is ``n_points`` rows, cumulated with a second tiny window.
    """
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    bucketed = df.select(
        F.ntile(n_points).over(w).alias("bucket"),
        F.col(label_col).cast("long").alias("__y"),
    )
    per = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__tp"),
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = per.agg(F.sum("__tp").alias("__p"))
    cum = per.select(
        "bucket",
        F.sum("__n").over(wc).alias("__cn"),
        F.sum("__tp").over(wc).alias("__ctp"),
    ).crossJoin(F.broadcast(tot))
    prec = F.col("__ctp").cast("double") / F.col("__cn").cast("double")
    rec = F.col("__ctp").cast("double") / F.col("__p").cast("double")
    return cum.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("__cn").cast("long").alias("n_predicted"),
        F.col("__ctp").cast("long").alias("n_true_pos"),
        F.round(prec, round_digits).alias("precision"),
        F.round(F.when(F.col("__p") > 0, rec), round_digits).alias("recall"),
        F.round(
            F.when(
                (F.col("__p") + F.col("__cn")) > 0,
                F.lit(2.0)
                * F.col("__ctp").cast("double")
                / (F.col("__p") + F.col("__cn")).cast("double"),
            ),
            round_digits,
        ).alias("f1"),
    )


def pr_curve_sql(
    table: str,
    score_col: str,
    label_col: str,
    id_col: str,
    n_points: int = 10,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`pr_curve` (same ntile bucketing, same
    integer cumulation)."""
    return f"""
        WITH bucketed AS (
          SELECT ntile({n_points}) OVER (ORDER BY {score_col} DESC,
                                         {id_col} ASC) AS bucket,
                 CAST({label_col} AS BIGINT) AS y
          FROM {table}),
        per AS (
          SELECT bucket, count(*) AS n, sum(y) AS tp
          FROM bucketed GROUP BY bucket),
        tot AS (SELECT sum(tp) AS p FROM per),
        cum AS (
          SELECT bucket,
                 sum(n) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
                 sum(tp) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp
          FROM per)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(cn AS BIGINT) AS n_predicted,
               CAST(ctp AS BIGINT) AS n_true_pos,
               round(CAST(ctp AS DOUBLE) / CAST(cn AS DOUBLE), {round_digits})
                 AS precision,
               round(CASE WHEN p > 0 THEN
                 CAST(ctp AS DOUBLE) / CAST(p AS DOUBLE) END, {round_digits})
                 AS recall,
               round(CASE WHEN p + cn > 0 THEN
                 2.0 * CAST(ctp AS DOUBLE) / CAST(p + cn AS DOUBLE) END,
                 {round_digits}) AS f1
        FROM cum CROSS JOIN tot
    """


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Exact AVERAGE PRECISION (area under the PR curve at full
    resolution — the ranking metric, not :func:`pr_curve`'s 10-point
    summary): AP = (1/P) * sum over positives of precision@their rank.
    Also reports the best achievable F1 over ALL thresholds and the
    rank cutoff achieving it (the operating point a deployment would
    pick).

    Everything is exact integer counting off one unique-key rank
    window: precision@k = cumsum(label)/k, F1@k = 2*TP/(P + k); the
    per-positive precision terms quantize to BIGINT at 1e-9 before the
    sum so AP is partitioning-independent.
    """
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(label_col).cast("long").alias("__y"),
        F.row_number().over(w).alias("__k"),
    )
    wc = Window.orderBy("__k").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select(
        "__k", "__y", F.sum("__y").over(wc).alias("__tp")
    )
    tot = cum.agg(F.max("__tp").alias("__p"), F.max("__k").alias("__n"))
    prec_q = F.round(
        F.col("__tp").cast("double") / F.col("__k").cast("double") * F.lit(1e9)
    ).cast("long")
    f1 = (
        F.lit(2.0)
        * F.col("__tp").cast("double")
        / (F.col("__p") + F.col("__k")).cast("double")
    )
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("__p").alias("p"),
        F.max("__n").alias("n"),
        F.sum(F.when(F.col("__y") == 1, prec_q)).alias("__ap_q"),
        F.max(F.struct(F.round(f1, 9).alias("f1"), (-F.col("__k")).alias("negk"))).alias(
            "__best"
        ),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("p").cast("long").alias("n_pos"),
        F.round(
            F.col("__ap_q").cast("double") / (F.col("p").cast("double") * F.lit(1e9)),
            round_digits,
        ).alias("average_precision"),
        F.round(F.col("__best.f1"), round_digits).alias("best_f1"),
        (-F.col("__best.negk")).cast("long").alias("best_f1_rank"),
    )


def average_precision_sql(
    table: str,
    score_col: str,
    label_col: str,
    id_col: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`average_precision`."""
    return f"""
        WITH ranked AS (
          SELECT CAST({label_col} AS BIGINT) AS y,
                 row_number() OVER (ORDER BY {score_col} DESC,
                                    {id_col} ASC) AS k
          FROM {table}),
        cum AS (
          SELECT k, y,
                 sum(y) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
          FROM ranked),
        tot AS (SELECT max(tp) AS p, max(k) AS n FROM cum),
        agg AS (
          SELECT max(p) AS p, max(n) AS n,
                 sum(CASE WHEN y = 1 THEN
                   CAST(round(CAST(tp AS DOUBLE) / CAST(k AS DOUBLE) * 1e9)
                        AS BIGINT) END) AS ap_q,
                 max(struct_pack(
                   f1 := round(2.0 * CAST(tp AS DOUBLE)
                               / CAST(p + k AS DOUBLE), 9),
                   negk := -k)) AS best
          FROM cum CROSS JOIN tot)
        SELECT CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS n_pos,
               round(CAST(ap_q AS DOUBLE) / (CAST(p AS DOUBLE) * 1e9),
                     {round_digits}) AS average_precision,
               round(best.f1, {round_digits}) AS best_f1,
               CAST(-best.negk AS BIGINT) AS best_f1_rank
        FROM agg
    """


def bleu_pair_stats(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_n: int = 4,
) -> DataFrame:
    """BLEU-4 between the texts of given ``(id_a, id_b)`` pairs —
    ``id_a`` the reference, ``id_b`` the candidate — as EXACT sufficient
    statistics plus a float-parity-safe composite.

    Per order n=1..4: clipped n-gram matches (the multiset min) and the
    candidate's n-gram total, all BIGINT.  ``ref_len``/``cand_len`` are
    the unigram totals the brevity penalty reads.  The composite
    ``bleu_geo`` is the geometric mean of the four precisions computed
    as ``sqrt(sqrt(p1*p2*p3*p4))`` — products, divisions and sqrt are
    all correctly-rounded IEEE ops, so both engines produce the SAME
    double (exp/log would not be); the brevity penalty's exponent
    ``1 - r/c`` ships as its own column and the caller applies
    ``exp`` client-side when one scalar is wanted.

    Scale shape per order: one n-gram explode + partial-agg
    ``groupBy(doc, gram)``, then joins keyed on (id, gram) whose volume
    is bounded by candidate-pair gram counts — never corpus^2."""
    from image_matadata_batchprocessing_aws_spark.operators.text import tokens

    out = pairs.select("id_a", "id_b")

    def grams_col(n: int):
        if n == 1:
            return tokens(text_col)
        parts = [
            F.expr(
                f"slice(split(trim({text_col}), '\\\\s+'), {k + 1},"
                f" greatest(size(split(trim({text_col}), '\\\\s+')) - {n - 1}, 0))"
            )
            for k in range(n)
        ]
        g = parts[0]
        for nxt in parts[1:]:
            g = F.zip_with(g, nxt, lambda a, b: F.concat_ws(" ", a, b))
        return g

    for n in range(1, max_n + 1):
        cnt = (
            docs.select(F.col(id_col).alias("__id"), F.explode(grams_col(n)).alias("__g"))
            .groupBy("__id", "__g")
            .agg(F.count("*").alias("__c"))
        )
        ca = cnt.select(
            F.col("__id").alias("id_a"), "__g", F.col("__c").alias("__ca")
        )
        cb = cnt.select(
            F.col("__id").alias("id_b"), "__g", F.col("__c").alias("__cb")
        )
        ov = (
            pairs.select("id_a", "id_b")
            .join(ca, "id_a")
            .join(cb, ["id_b", "__g"])
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.least("__ca", "__cb")).alias(f"ov{n}"))
        )
        tot = cnt.groupBy("__id").agg(F.sum("__c").alias(f"tot{n}"))
        out = out.join(ov, ["id_a", "id_b"], "left").join(
            tot.select(F.col("__id").alias("id_b"), f"tot{n}"), "id_b", "left"
        )
        out = out.withColumns(
            {
                f"ov{n}": F.coalesce(f"ov{n}", F.lit(0)).cast("long"),
                f"tot{n}": F.coalesce(f"tot{n}", F.lit(0)).cast("long"),
            }
        )
        if n == 1:
            ref_tot = tot.select(
                F.col("__id").alias("id_a"), F.col("tot1").alias("ref_len")
            )
            out = out.join(ref_tot, "id_a", "left").withColumn(
                "ref_len", F.coalesce("ref_len", F.lit(0)).cast("long")
            )
    prec = [
        F.when(F.col(f"tot{n}") > 0, F.col(f"ov{n}").cast("double") / F.col(f"tot{n}"))
        for n in range(1, max_n + 1)
    ]
    prod = prec[0]
    for p in prec[1:]:
        prod = prod * p
    geo = F.sqrt(F.sqrt(prod))
    bp_exp = F.when(
        (F.col("tot1") > 0) & (F.col("tot1") < F.col("ref_len")),
        F.round(F.lit(1.0) - F.col("ref_len").cast("double") / F.col("tot1"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        "id_a",
        "id_b",
        "ref_len",
        F.col("tot1").alias("cand_len"),
        *[F.col(f"ov{n}") for n in range(1, max_n + 1)],
        *[F.col(f"tot{n}") for n in range(2, max_n + 1)],
        F.round(geo, 6).alias("bleu_geo"),
        bp_exp.alias("bp_exponent"),
    )


def confident_joint_scaled(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    scale: int = 10**6,
) -> DataFrame:
    """Confident-learning label-error statistics (Northcutt et al.'s
    confident joint, with class-centroid affinity standing in for model
    probabilities): count examples whose given label i would
    confidently be label j — the off-diagonal cells are the suspected
    label errors a curation pass reviews.

    All-integer construction so both engines agree bit-for-bit:
    components quantize to micro-scaled BIGINT, class centroids are
    floor-divided integer means, affinity S(example, class) is an
    integer dot product, the per-class confidence threshold t_j (mean
    self-affinity of class j) compares via cross-multiplication
    ``S * n_j >= T_j`` (no division), and the suggested label is the
    argmax over confident classes with label-ascending tie-break.
    Examples confident in no class are excluded (the standard CL rule).

    Scale shape: one posexplode + (label, pos) partial agg for
    centroids (64*L rows, broadcast), one pos-keyed join to score every
    example against every class (rows = n*L*d before the partial agg,
    map-side combined), one L-row threshold table, one window over
    L-row partitions per example."""
    from pyspark.sql import Window

    q = emb.select(
        F.col(id_col).alias("__vid"),
        F.col(label_col).alias("__given"),
        F.posexplode(vec_col).alias("__pos", "__x"),
    ).withColumn("__q", F.round(F.col("__x") * scale).cast("long")).drop("__x")
    cent = (
        q.groupBy("__given", "__pos")
        .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__n"))
        .select(
            F.col("__given").alias("__cls"),
            "__pos",
            F.floor(F.col("__s").cast("double") / F.col("__n"))
            .cast("long")
            .alias("__cmean"),
        )
    )
    scores = (
        q.join(F.broadcast(cent), "__pos")
        .groupBy("__vid", "__given", "__cls")
        .agg(F.sum(F.col("__q") * F.col("__cmean")).alias("__S"))
    )
    thresholds = (
        scores.where(F.col("__given") == F.col("__cls"))
        .groupBy("__cls")
        .agg(F.sum("__S").alias("__T"), F.count(F.lit(1)).alias("__cnt"))
    )
    confident = scores.join(F.broadcast(thresholds), "__cls").where(
        F.col("__S") * F.col("__cnt") >= F.col("__T")
    )
    w = Window.partitionBy("__vid").orderBy(F.col("__S").desc(), F.col("__cls"))
    best = confident.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") == 1
    )
    return (
        best.groupBy("__given", "__cls")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__given").cast("long").alias("given_label"),
            F.col("__cls").cast("long").alias("suggested_label"),
            F.col("n").cast("long").alias("n"),
            (F.col("__given") != F.col("__cls")).alias("is_suspect"),
        )
    )


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Brier score + Murphy (1973) decomposition over probability bins:
    ``brier = reliability - resolution + uncertainty``.

    Determinism shape: the probability quantizes to a micro-unit BIGINT
    (``p6``), so the per-row squared error ``(p6 - y*1e6)^2`` is an
    EXACT integer (< 1e12 per row — 9.2e6 rows per group before BIGINT
    pressure; at larger scale pre-aggregate by distinct p6 first, which
    the bin pass already does).  Only the final per-bin arithmetic —
    a dozen terms, not data-sized — runs in doubles, rounded on both
    engines.  One data-sized exchange: the ``groupBy(bin)`` partial agg.
    """
    one = F.lit(1_000_000).cast("long")
    binned = df.select(
        F.least(
            F.floor(F.col(prob_col) * n_bins).cast("long"), F.lit(n_bins - 1)
        ).alias("__bin"),
        F.round(F.col(prob_col) * one).cast("long").alias("__p6"),
        F.col(label_col).cast("long").alias("__y"),
    )
    per_bin = binned.groupBy("__bin").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__p6").alias("__sp6"),
        F.sum("__y").alias("__sy"),
        F.sum(
            (F.col("__p6") - F.col("__y") * one)
            * (F.col("__p6") - F.col("__y") * one)
        ).alias("__se12"),
    )
    n = F.sum("__n")
    sy = F.sum("__sy")
    # per-bin means are single divisions of exact sums
    pbar = F.col("__sp6").cast("double") / F.col("__n") / 1e6
    ybar = F.col("__sy").cast("double") / F.col("__n")
    agg = per_bin.agg(
        n.alias("__nt"),
        sy.alias("__syt"),
        F.sum("__se12").alias("__se12t"),
        F.sum(F.col("__n") * (pbar - ybar) * (pbar - ybar)).alias("__rel_n"),
        F.sum(F.col("__n") * ybar * ybar).alias("__res_a"),
    )
    ytot = F.col("__syt").cast("double") / F.col("__nt")
    return agg.select(
        F.col("__nt").cast("long").alias("n"),
        F.round(F.col("__se12t").cast("double") / F.col("__nt") / 1e12, digits).alias(
            "brier"
        ),
        F.round(F.col("__rel_n") / F.col("__nt"), digits).alias("reliability"),
        # resolution = sum n_k (ybar_k - ybar)^2 / n = sum n_k ybar_k^2/n - ybar^2
        F.round(F.col("__res_a") / F.col("__nt") - ytot * ytot, digits).alias(
            "resolution"
        ),
        F.round(ytot * (1.0 - ytot), digits).alias("uncertainty"),
    )


def log_loss(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    group_by: Sequence[str] = (),
    eps: float = 1e-6,
    digits: int = 6,
) -> DataFrame:
    """Grouped binary cross-entropy with probability clipping.

    The per-row ``-ln`` term is scaled to nano-units and rounded to a
    BIGINT before summing (the ``kaplan_meier`` idiom), so accumulation
    is integer-exact and partition-order-independent; one double
    division at the end."""
    p = F.greatest(F.least(F.col(prob_col), F.lit(1.0 - eps)), F.lit(eps))
    term = -(
        F.col(label_col) * F.log(p) + (1 - F.col(label_col)) * F.log(1.0 - p)
    )
    keys = list(group_by)
    agg = df.select(
        *keys, F.round(term * 1e9).cast("long").alias("__ll9")
    ).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__ll9").alias("__s9")
    )
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        F.round(F.col("__s9").cast("double") / F.col("__n") / 1e9, digits).alias(
            "log_loss"
        ),
    )


def matthews_corr(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    group_by: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Matthews correlation coefficient per group from exact confusion
    counts.  The denominator multiplies the four marginals as
    ``sqrt*sqrt*sqrt*sqrt`` (not ``sqrt(product)``) so the product of
    four ~n-sized BIGINTs never materializes — overflow-free at any
    scale, and the identical expression runs on both engines."""
    keys = list(group_by)
    agg = df.groupBy(*keys).agg(
        F.sum(((F.col(pred_col) == 1) & (F.col(label_col) == 1)).cast("long")).alias("tp"),
        F.sum(((F.col(pred_col) == 0) & (F.col(label_col) == 0)).cast("long")).alias("tn"),
        F.sum(((F.col(pred_col) == 1) & (F.col(label_col) == 0)).cast("long")).alias("fp"),
        F.sum(((F.col(pred_col) == 0) & (F.col(label_col) == 1)).cast("long")).alias("fn"),
    )
    tp, tn, fp, fn = (F.col(c).cast("double") for c in ("tp", "tn", "fp", "fn"))
    denom = (
        F.sqrt(tp + fp) * F.sqrt(tp + fn) * F.sqrt(tn + fp) * F.sqrt(tn + fn)
    )
    mcc = F.when(denom > 0, (tp * tn - fp * fn) / denom)
    return agg.select(
        *keys,
        F.col("tp").cast("long").alias("tp"),
        F.col("tn").cast("long").alias("tn"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(mcc, digits).alias("mcc"),
    )


def krippendorff_alpha_nominal(
    df: DataFrame,
    unit_col: str,
    rater_cols: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) for ``r`` raters per unit:
    ``alpha = 1 - Do/De`` with the coincidence-matrix observed and
    expected disagreements.  With a constant rater count everything is
    integer-exact until one double division:

      Do = S1 / (n (r-1))  with  S1 = sum_u sum_c n_uc (r - n_uc)
      De = S2 / (n (n-1))  with  S2 = sum_c n_c (n - n_c),  n = U*r

    Scale shape: melt is a ``stack`` projection (no shuffle), then two
    partial aggs — per (unit, category) and per category."""
    r = len(rater_cols)
    melt = df.select(
        F.col(unit_col).alias("__u"),
        F.explode(F.array(*[F.col(c).cast("string") for c in rater_cols])).alias(
            "__cat"
        ),
    )
    per_uc = melt.groupBy("__u", "__cat").agg(F.count(F.lit(1)).alias("__nuc"))
    s1 = per_uc.agg(
        F.sum(F.col("__nuc") * (F.lit(r) - F.col("__nuc"))).alias("__s1"),
        F.count_distinct(F.col("__u")).alias("__units"),
    )
    per_c = per_uc.groupBy("__cat").agg(F.sum("__nuc").alias("__nc"))
    tot = per_c.agg(F.sum("__nc").alias("__n"))
    s2 = per_c.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("__nc") * (F.col("__n") - F.col("__nc"))).alias("__s2"),
        F.first("__n").alias("__n"),
    )
    out = s1.crossJoin(F.broadcast(s2))
    do = F.col("__s1").cast("double") / (F.col("__n") * (r - 1)).cast("double")
    de = F.col("__s2").cast("double") / (F.col("__n") * (F.col("__n") - 1)).cast(
        "double"
    )
    return out.select(
        F.col("__units").cast("long").alias("n_units"),
        F.lit(r).cast("long").alias("n_raters"),
        F.round(do, digits).alias("observed_disagreement"),
        F.round(de, digits).alias("expected_disagreement"),
        F.round(1.0 - do / de, digits).alias("alpha"),
    )


def fdr_bh(
    df: DataFrame,
    p_col: str,
    key_cols: Sequence[str],
    q: float = 0.1,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a table of per-test
    p-values: rank ascending, find the largest k with
    ``p_(k) <= k*q/m``, mark ranks <= k discovered.

    The keyless window here rides the TEST table (one row per
    hypothesis — nations, cohorts, feature flags), which is
    category-product bounded, never data-sized; the data-sized work
    happened upstream in whatever produced the p-values.  The test
    count m stays IN-PLAN (1-row broadcast) so the upstream pipeline
    never executes twice."""
    m_df = df.agg(F.count(F.lit(1)).alias("__m"))
    w = Window.orderBy(F.col(p_col).asc(), *[F.col(k) for k in key_cols])
    ranked = (
        df.crossJoin(F.broadcast(m_df))
        .withColumn("__k", F.row_number().over(w))
        .withColumn(
            "__ok", (F.col(p_col) * F.col("__m") <= F.col("__k") * q).cast("int")
        )
    )
    cutoff = ranked.agg(
        F.max(F.when(F.col("__ok") == 1, F.col("__k")).otherwise(0)).alias("__cut")
    )
    return (
        ranked.crossJoin(F.broadcast(cutoff))
        .select(
            *key_cols,
            F.round(F.col(p_col), 9).alias("p_value"),
            F.col("__k").cast("long").alias("rank"),
            F.round(F.col("__k") * q / F.col("__m"), 9).alias("bh_threshold"),
            (F.col("__k") <= F.col("__cut")).alias("discovered"),
        )
        .orderBy("rank")
    )


def chrf_pair_stats(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_n: int = 3,
    beta: float = 2.0,
) -> DataFrame:
    """chrF (character n-gram F-beta, Popović 2015) between the texts
    of given ``(id_a, id_b)`` pairs — id_a the reference, id_b the
    candidate.  Whitespace is stripped and text lowercased (the
    sacrebleu default shape); per order n the clipped multiset overlap
    and both totals ship as exact BIGINTs, and the composite averages
    the per-order F-scores (orders where either side has no grams or
    P + R = 0 contribute 0, a documented simplification of effective
    ordering).  ``chrf = mean_n (1+b^2) P R / (b^2 P + R)``.

    Scale shape: per order one character-gram explode + partial-agg
    ``groupBy(doc, gram)`` and pair-keyed joins — volume bounded by
    candidate-pair gram counts, never corpus^2."""
    out = pairs.select("id_a", "id_b")
    s_expr = f"regexp_replace(lower({text_col}), '\\\\s+', '')"
    b2 = beta * beta
    f_cols = []
    for n in range(1, max_n + 1):
        gram = (
            f"CASE WHEN length({s_expr}) >= {n} THEN "
            f"transform(sequence(1, length({s_expr}) - {n} + 1),"
            f" i -> substring({s_expr}, i, {n})) "
            f"ELSE CAST(array() AS array<string>) END"
        )
        cnt = (
            docs.select(F.col(id_col).alias("__id"), F.explode(F.expr(gram)).alias("__g"))
            .groupBy("__id", "__g")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        tot = cnt.groupBy("__id").agg(F.sum("__c").alias("__tot"))
        ov = (
            pairs.join(
                cnt.select(
                    F.col("__id").alias("id_a"), F.col("__g"), F.col("__c").alias("__ca")
                ),
                "id_a",
            )
            .join(
                cnt.select(
                    F.col("__id").alias("id_b"),
                    F.col("__g"),
                    F.col("__c").alias("__cb"),
                ),
                ["id_b", "__g"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.least("__ca", "__cb")).alias(f"ov{n}"))
        )
        out = (
            out.join(ov, ["id_a", "id_b"], "left")
            .join(
                tot.select(F.col("__id").alias("id_a"), F.col("__tot").alias(f"tota{n}")),
                "id_a",
                "left",
            )
            .join(
                tot.select(F.col("__id").alias("id_b"), F.col("__tot").alias(f"totb{n}")),
                "id_b",
                "left",
            )
            .fillna(0, subset=[f"ov{n}", f"tota{n}", f"totb{n}"])
        )
        p = F.col(f"ov{n}").cast("double") / F.col(f"totb{n}").cast("double")
        r = F.col(f"ov{n}").cast("double") / F.col(f"tota{n}").cast("double")
        f_cols.append(
            F.when(
                (F.col(f"totb{n}") > 0) & (F.col(f"tota{n}") > 0) & (F.col(f"ov{n}") > 0),
                (1.0 + b2) * p * r / (b2 * p + r),
            ).otherwise(F.lit(0.0))
        )
    chrf = sum(f_cols[1:], f_cols[0]) / float(max_n)
    int_cols = [
        F.col(c).cast("long").alias(c)
        for n in range(1, max_n + 1)
        for c in (f"ov{n}", f"tota{n}", f"totb{n}")
    ]
    return out.select("id_a", "id_b", *int_cols, F.round(chrf, 6).alias("chrf"))
