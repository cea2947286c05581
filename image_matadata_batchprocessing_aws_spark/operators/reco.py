"""Item-item collaborative filtering over basket co-occurrence.

The classic "customers who bought X also bought Y" memory-based
recommender (Sarwar et al. 2001, item-based CF; Linden et al. 2003,
Amazon item-to-item), as pure DataFrame ops:

1. distinct (basket, item) pairs;
2. item support counts n_i (one partial-agg groupBy);
3. co-occurrence counts co_ij via a per-basket self-join with
   ``item_a < item_b`` (each unordered pair once);
4. cosine similarity co_ij / sqrt(n_i * n_j), symmetrized back to
   directed edges, top-k neighbors per item by a rank window.

Scale notes (100 TB): the self-join is keyed on the basket id — the
quadratic term is PER-BASKET size, not corpus size, so a
``max_basket_items`` guard drops pathological baskets (a cart with 10k
items contributes 50M pairs and no signal; the standard production
mitigation).  Support counts are broadcast-sized (item-cardinality)
joins.  The rank window is keyed by item and bounded by that item's
candidate count.  Nothing data-sized collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def item_cooccurrence_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_pair_count: int = 2,
    max_basket_items: int = 1000,
) -> DataFrame:
    """(item, neighbor, pair_count, cosine, rank): top-k most
    cosine-similar co-purchased neighbors per item.  Deterministic ties:
    (rounded cosine desc, pair count desc, neighbor asc)."""
    pairs = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    sizes = pairs.groupBy("__b").agg(F.count(F.lit(1)).alias("__bn"))
    bounded = pairs.join(
        F.broadcast(sizes.where(F.col("__bn") <= max_basket_items).select("__b")),
        "__b",
    )
    support = bounded.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    a = bounded.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = bounded.select(F.col("__b"), F.col("__i").alias("item_b"))
    co = (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    directed = co.unionByName(
        co.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "pair_count",
        )
    )
    scored = (
        directed.join(
            F.broadcast(support.select(F.col("__i").alias("item_a"), F.col("__n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(support.select(F.col("__i").alias("item_b"), F.col("__n").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.round(
                F.col("pair_count") / F.sqrt(F.col("n_a") * F.col("n_b")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("cosine").desc(), F.col("pair_count").desc(), F.col("item_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("item_a").alias("item"),
            F.col("item_b").alias("neighbor"),
            F.col("pair_count").cast("long").alias("pair_count"),
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 3,
    max_basket_items: int = 50,
    round_digits: int = 6,
) -> DataFrame:
    """ASSOCIATION RULES (Agrawal & Srikant 1994) over the same basket
    grain :func:`item_cooccurrence_topk` mines, but with the rules
    semantics that recommender cosine does not give you: per directed
    rule A -> B, ``support`` (joint basket fraction), ``confidence``
    (P(B|A)), and ``lift`` (confidence over B's base rate — the
    signal vs popularity-confound discriminator).

    Same scale posture as the CF operator: the quadratic term is
    per-basket (``max_basket_items`` guard), supports are
    item-cardinality aggregates, and ``min_pair_support`` prunes the
    rule table before the broadcast support joins.  All ratios divide
    exact integers; N (total baskets) rides a broadcast 1-row count.

    Returns ``antecedent, consequent, pair_n, support, confidence,
    lift`` — both directions of every surviving pair.
    """
    pairs_base = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    sizes = pairs_base.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))
    ok = pairs_base.join(
        F.broadcast(sizes.where(F.col("__sz") <= max_basket_items)), "__b"
    ).drop("__sz")
    support = ok.groupBy("__i").agg(F.count(F.lit(1)).alias("__n_i"))
    # lazy 1-row total (no eager action; broadcasts like the other fits)
    tot = ok.agg(F.count_distinct("__b").alias("__nb_total"))
    a, b = ok.alias("a"), ok.alias("b")
    co = (
        a.join(b, (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__i") < F.col("b.__i")))
        .groupBy(F.col("a.__i").alias("ia"), F.col("b.__i").alias("ib"))
        .agg(F.count(F.lit(1)).alias("__co"))
        .where(F.col("__co") >= min_pair_support)
    )
    both = co.unionByName(
        co.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), F.col("__co")
        )
    )
    sa = support.select(F.col("__i").alias("ia"), F.col("__n_i").alias("__na"))
    sb = support.select(F.col("__i").alias("ib"), F.col("__n_i").alias("__nb"))
    nd = F.col("__nb_total").cast("double")
    return (
        both.join(F.broadcast(sa), "ia")
        .join(F.broadcast(sb), "ib")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("ia").alias("antecedent"),
            F.col("ib").alias("consequent"),
            F.col("__co").cast("long").alias("pair_n"),
            F.round(F.col("__co") / nd, round_digits).alias("support"),
            F.round(
                F.col("__co").cast("double") / F.col("__na").cast("double"),
                round_digits,
            ).alias("confidence"),
            F.round(
                F.col("__co").cast("double")
                * nd
                / (F.col("__na").cast("double") * F.col("__nb").cast("double")),
                round_digits,
            ).alias("lift"),
        )
    )


def sequential_patterns(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    item_col: str,
    max_seq_len: int = 20,
    min_support: int = 5,
    top_k: int = 30,
) -> DataFrame:
    """Bounded sequential-pattern mining (the PrefixSpan idea, depth
    <= 3): which ordered item subsequences (not necessarily contiguous
    — `agg_event_transitions` only sees adjacency) recur across many
    sequences.  Support = number of KEYS containing the pattern at
    least once.

    The two bounds that make it distributable: (1) each sequence is
    capped at its first ``max_seq_len`` items (one keyed rank window),
    so per-key candidate pairs are <= C(M,2); (2) length-3 candidates
    generate ONLY through length-2 patterns that already passed
    ``min_support`` (the PrefixSpan projection, as a semi-join) — the
    a-priori pruning that keeps the triple join candidate-sized.
    Per-key DISTINCT runs before every support count, so a key
    contributes once per pattern.

    Returns ``pattern, length, support`` — top_k by (support desc,
    pattern).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    seq = (
        events.select(
            F.col(key_col).alias("__k"),
            F.col(item_col).alias("__it"),
            F.row_number().over(w).alias("__pos"),
        )
        .where(F.col("__pos") <= max_seq_len)
    )
    a, b = seq.alias("a"), seq.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__k") == F.col("b.__k")) & (F.col("a.__pos") < F.col("b.__pos")),
        )
        .select(
            F.col("a.__k").alias("__k"),
            F.col("a.__it").alias("__i1"),
            F.col("b.__it").alias("__i2"),
            F.col("a.__pos").alias("__p1"),
            F.col("b.__pos").alias("__p2"),
        )
    )
    l2 = (
        pairs.select("__k", "__i1", "__i2")
        .distinct()
        .groupBy("__i1", "__i2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    freq_pairs = pairs.join(F.broadcast(l2.select("__i1", "__i2")), ["__i1", "__i2"])
    c = seq.alias("c")
    l3 = (
        freq_pairs.alias("fp")
        .join(
            c,
            (F.col("fp.__k") == F.col("c.__k"))
            & (F.col("c.__pos") > F.col("fp.__p2")),
        )
        .select(
            F.col("fp.__k").alias("__k"),
            F.col("fp.__i1").alias("__i1"),
            F.col("fp.__i2").alias("__i2"),
            F.col("c.__it").alias("__i3"),
        )
        .distinct()
        .groupBy("__i1", "__i2", "__i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    out2 = l2.select(
        F.concat_ws(">", "__i1", "__i2").alias("pattern"),
        F.lit(2).cast("long").alias("length"),
        F.col("support").cast("long").alias("support"),
    )
    out3 = l3.select(
        F.concat_ws(">", "__i1", "__i2", "__i3").alias("pattern"),
        F.lit(3).cast("long").alias("length"),
        F.col("support").cast("long").alias("support"),
    )
    return (
        out2.unionByName(out3)
        .orderBy(F.col("support").desc(), "pattern")
        .limit(top_k)
    )
