"""Recall tests on crafted near-duplicate corpora (the driver tables have
no planted dups, so the oracle checks there prove math parity; these
prove the operators actually find duplicates)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.dedup import (
    exact_dedup_groups,
    exact_dedup_keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from image_matadata_batchprocessing_aws_spark.operators.similarity import (
    as_double_array,
    knn_bruteforce,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
NEAR = BASE.replace("warm", "cold")  # one-token edit -> high jaccard
FAR = (
    "completely different content about spark query engines and shuffle "
    "partitioning strategies for large scale distributed aggregation jobs"
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, NEAR), (3, FAR)], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    d = _docs(spark)
    groups = exact_dedup_groups(d).collect()
    assert {(r.canonical_id, r.n_dups) for r in groups} == {(0, 2), (2, 1), (3, 1)}
    kept = sorted(r.doc_id for r in exact_dedup_keep_first(d).collect())
    assert kept == [0, 2, 3]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (0, 1) in pairs  # identical
    assert (0, 2) in pairs and (1, 2) in pairs  # one-token edit
    assert not any(3 in p for p in pairs)  # unrelated doc excluded


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard_max_df_prunes_hot_shingles(spark):
    from image_matadata_batchprocessing_aws_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "terms and conditions apply to this offer"
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta gamma delta epsilon {boiler}"),
            (1, f"alpha beta gamma delta zeta {boiler}"),  # near-dup of 0
            (2, f"one two three four five {boiler}"),      # unrelated, shares boilerplate
            (3, f"six seven eight nine ten {boiler}"),     # unrelated, shares boilerplate
        ],
        "doc_id long, text string",
    )
    # without the guard the boilerplate connects everything at low jaccard
    all_pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert (2, 3) in all_pairs
    # with the guard, boilerplate shingles (df=4 > 2) are pruned: the true
    # near-dup (shares rare shingles) survives, coincidental pairs don't
    pruned = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.1, max_df=2).collect()}
    assert (0, 1) in pruned
    assert (2, 3) not in pruned


def test_minhash_lsh_xxhash64_fast_path(spark):
    # production hash: same recall, no md5 in the hot path
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(_docs(spark), threshold=0.5, hash_fn="xxhash64").collect()
    }
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_pairs_near_dup(spark):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(_docs(spark)).collect()}
    assert pairs.get((0, 1)) == 0  # identical docs, identical simhash
    assert (0, 2) in pairs  # near-dup within hamming budget
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_knn_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((30, 8)).astype("float32")
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qe")
    )
    c = df.where(F.col("vec_id") >= 2).select(
        F.col("vec_id").alias("neighbor_id"), as_double_array("embedding").alias("ce")
    )
    got = {
        (r.query_id, r.rn): r.neighbor_id
        for r in knn_bruteforce(q, c, k=3, metric="cosine").collect()
    }
    v64 = vecs.astype("float64")
    norms = np.linalg.norm(v64, axis=1)
    for qid in range(2):
        sims = (v64[2:] @ v64[qid]) / (norms[2:] * norms[qid])
        order = np.argsort(np.round(sims, 6))[::-1][:3] + 2
        for rank, nid in enumerate(order, start=1):
            assert got[(qid, rank)] == nid


# Connected components (dedup-group resolution) --------------------------


def test_components_chain_propagates_min_across_hops(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    # path graph 5-4-3-2-1: diameter 4 forces multiple propagation rounds
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_components_disjoint_groups_and_stats(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        connected_components,
        dedup_group_stats,
    )

    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)], "id_a long, id_b long"
    )
    comps = connected_components(edges)
    got = {r.id: r.component for r in comps.collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}
    sizes = {r.component: r.group_size for r in dedup_group_stats(comps).collect()}
    assert sizes == {10: 3, 20: 2, 30: 2}


def test_components_empty_edges(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_components_batched_probe_halves_collects(spark, monkeypatch):
    """r09 probe batching: two star rounds share ONE signature action
    (a union of the two rounds' aggregates), so a chain that converges
    at round 2 costs exactly 3 collects — initial signature, one
    batched probe, the final result — where the one-probe-per-round
    form took 4.  The fixpoint criterion still compares ADJACENT
    rounds, so the returned labeling is unchanged (the equality tests
    above pin that)."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    # 1-2-3 chain: round 1 yields the star forest {(2,1),(3,1)}, round 2
    # is idempotent -> converges at the round-2 signature
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    # patch the CONCRETE class (Spark 4: pyspark.sql.DataFrame is the
    # abstract base; classic sessions instantiate a subclass whose
    # collect overrides it)
    cls = type(edges)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    assert calls["n"] == 3


def test_components_raises_when_rounds_exhausted(spark):
    """The non-convergence guard survives probe batching: a graph that
    cannot reach its fixpoint inside max_iterations still raises."""
    import pytest

    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=1)


def test_components_odd_max_iterations_tail_probe(spark):
    """Odd budgets exercise the single-round tail probe: one edge
    converges at round 1, inside max_iterations=1."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(7, 3)], "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(edges, max_iterations=1).collect()}
    assert got == {3: 3, 7: 3}


def test_components_long_path_converges_in_log_rounds(spark):
    """large-star/small-star: a path graph far longer than the old
    diameter-bounded budget (200 hops >> 30) must converge — and in
    O(log n) rounds, which max_iterations=10 enforces for n=200."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(edges, max_iterations=10).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_components_random_graph_matches_union_find(spark):
    """Cross-check the distributed algorithm against a driver-side
    union-find oracle on a random sparse graph (fixed seed)."""
    import random

    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components

    rng = random.Random(42)
    n, m = 300, 260  # sparse: many components, varied shapes
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    seen = {v for p in pairs for v in p}
    expected = {v: find(v) for v in seen}
    # union-find roots are not guaranteed minimal under path compression;
    # normalize to min-of-component
    comp_min: dict[int, int] = {}
    for v, r in expected.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[r] for v, r in expected.items()}

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == expected


def test_decontamination_report(spark):
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        decontamination_report,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares the 4-grams "alpha beta gamma delta" and
            # "beta gamma delta epsilon" with the benchmark doc
            (0, "alpha beta gamma delta epsilon unrelated tail words here"),
            # no shared 4-gram (order scrambled)
            (1, "delta gamma beta alpha zeta epsilon something else"),
            # exact benchmark text -> every 4-gram hits
            (2, "alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in decontamination_report(train, bench, n=4, min_hits=1).collect()
    }
    assert set(rows) == {0, 2}
    assert rows[0].n_hits == 2 and rows[0].set_size == 6
    assert rows[2].n_hits == 3 and rows[2].set_size == 3
    assert rows[2].overlap_frac == 1.0


def test_incremental_dedup_statuses_on_planted_batch(spark):
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        incremental_dedup_report,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "completely different corpus material about spark planning"),
            (3, "the quick brown fox jumps over the lazy dog near the river"),  # dup of 1
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river"),  # exact
            (101, "the quick brown fox jumps over the lazy cat near the river"),  # near
            (102, "entirely novel text with no relation to anything stored"),     # unique
            (103, "xy"),                                                          # no shingles
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup_report(new, corpus).collect()}
    assert out[100].status == "exact_dup" and out[100].match_id == 1  # min id wins
    assert out[101].status == "near_dup" and out[101].match_id in (1, 3)
    assert out[102].status == "unique" and out[102].match_id is None
    assert out[103].status == "unique"
    assert len(out) == 4  # every new doc classified exactly once


# --- exact-substring duplicated spans ------------------------------------


def test_duplicated_spans_merges_maximal_runs(spark):
    """Two docs share one 7-token sentence embedded in distinct prose:
    every k-gram inside it duplicates, nothing outside does, and the
    consecutive run merges into exactly ONE maximal span per doc with
    span length 7 tokens (= 7 - k + 1 dup k-grams)."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        doc_dup_fraction,
        duplicated_spans,
    )

    shared = "pack my box with five dozen jugs"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta gamma {shared} delta epsilon"),
            (1, f"unrelated opening words here {shared} and a different tail"),
            (2, "no overlap with anything else at all in this document"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_dup_grams)
        for r in duplicated_spans(docs, k=5).collect()
    }
    # doc 0: shared starts at token 3; doc 1: at token 4
    assert spans == {0: (3, 9, 3), 1: (4, 10, 3)}
    frac = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in doc_dup_fraction(duplicated_spans(docs, k=5), docs).collect()
    }
    assert frac[0] == (12, 7) and frac[1] == (15, 7) and frac[2][1] == 0


def test_duplicated_spans_within_one_doc(spark):
    """A k-gram repeated INSIDE one document counts as duplication
    (occurrence-based, like the suffix-array definition)."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        duplicated_spans,
    )

    phrase = "one two three four five"
    docs = spark.createDataFrame(
        [(0, f"{phrase} filler words in between {phrase}")],
        "doc_id long, text string",
    )
    rows = duplicated_spans(docs, k=5).collect()
    starts = sorted((r.span_start, r.span_end) for r in rows)
    assert starts == [(0, 4), (9, 13)]


def test_duplicated_spans_short_and_empty_docs(spark):
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        doc_dup_fraction,
        duplicated_spans,
    )

    docs = spark.createDataFrame(
        [(0, "too short"), (1, "   "), (2, "a b c d e"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, k=5)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    assert got == {(2, 0, 4), (3, 0, 4)}
    frac = {r.doc_id: r.dup_fraction for r in doc_dup_fraction(spans, docs).collect()}
    assert frac[0] == 0.0 and frac[1] == 0.0 and frac[2] == 1.0 and frac[3] == 1.0


def test_dup_fraction_unions_overlapping_spans(spark):
    """Regression: 'a b a b a' at k=3 yields two position-runs whose
    token spans overlap (0-2 and 2-4); a raw sum would report 6/5 dup
    tokens — the interval union must report exactly 5/5."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        doc_dup_fraction,
        duplicated_spans,
    )

    docs = spark.createDataFrame([(0, "a b a b a")], "doc_id long, text string")
    spans = sorted(
        (r.span_start, r.span_end) for r in duplicated_spans(docs, k=3).collect()
    )
    assert spans == [(0, 2), (2, 4)]  # overlapping at token 2
    r = doc_dup_fraction(duplicated_spans(docs, k=3), docs).collect()[0]
    assert (r.n_tokens, r.dup_tokens, r.dup_fraction) == (5, 5, 1.0)


def test_remove_duplicated_spans_cuts_and_reassembles(spark):
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        remove_duplicated_spans,
    )

    shared = "pack my box with five dozen jugs"  # 7 tokens, duplicated
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta gamma {shared} delta epsilon"),
            (1, f"unrelated opening words here {shared} and a different tail"),
            (2, "no overlap with anything else at all in this document"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, k=5).collect()}
    assert out[0].clean_text == "alpha beta gamma delta epsilon"
    assert out[0].n_removed == 7
    assert out[1].clean_text == "unrelated opening words here and a different tail"
    assert out[2].n_removed == 0 and out[2].clean_text.startswith("no overlap")
    assert out[3].clean_text == "" and out[3].n_tokens == 0


def test_int8_quantize_error_bound(spark):
    """Symmetric scalar quantization contract: |x - q*scale| <= scale/2
    for every coordinate (round-to-nearest), codes within [-127, 127]."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        embedding_int8_quantize,
    )

    out = embedding_int8_quantize(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        # both columns are rounded to 6 decimals independently; allow a
        # half-ulp of that rounding on each side of the inequality
        assert r.max_err <= r.scale / 2 + 1e-6
        assert r.code_l1 <= 127 * 64  # 64 dims, |code| <= 127


def test_jaccard_prefix_equals_full_posting_join(spark):
    """Prefix filtering is LOSSLESS: on random low-vocabulary corpora
    (worst case for posting lists — heavy shingle sharing) the
    prefix-filtered join returns exactly the brute-force answer at
    several thresholds."""
    import random

    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    r = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(60):
        rows.append((i, " ".join(r.choice(vocab) for _ in range(r.randint(3, 40)))))
    # plant explicit near-dups: copy with one token changed
    for i, (src, txt) in enumerate(rows[:10]):
        toks = txt.split()
        toks[len(toks) // 2] = "ALTERED"
        rows.append((100 + i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        full = {tuple(x) for x in ngram_jaccard_pairs(df, threshold=t).collect()}
        pref = {tuple(x) for x in jaccard_prefix_pairs(df, threshold=t).collect()}
        assert pref == full, f"threshold {t}: prefix {len(pref)} vs full {len(full)}"
    assert full  # the planted near-dups make the t=0.8 set non-empty


def test_jaccard_prefix_candidates_shrink(spark):
    """The point of the prefix index: candidate pairs from the prefix
    self-join are a strict subset of the full posting-list join's on a
    corpus with shared shingles."""
    from pyspark.sql.window import Window

    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        _exploded_shingles,
    )

    import random

    r = random.Random(5)
    vocab = [f"w{i}" for i in range(8)]
    rows = [
        (i, " ".join(r.choice(vocab) for _ in range(r.randint(5, 30))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ex = _exploded_shingles(df, "text", "doc_id", 3)
    a, b = ex.alias("a"), ex.alias("b")
    n_full = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    ranked = (
        ex.join(dfreq, "shingle")
        .join(sizes, "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("dfreq").asc(), F.col("shingle").asc()
                )
            ),
        )
    )
    pref = ranked.where(
        F.col("pos") <= F.col("set_size") - F.ceil(F.lit(0.5) * F.col("set_size")) + 1
    )
    pa, pb = pref.alias("a"), pref.alias("b")
    n_pref = (
        pa.join(pb, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert n_pref < n_full


def test_item_cooccurrence_topk(spark):
    """Known baskets: exact cosines, max_basket guard drops the
    pathological basket entirely."""
    from image_matadata_batchprocessing_aws_spark.operators.reco import (
        item_cooccurrence_topk,
    )

    rows = [
        # x co-occurs with y twice, with z once
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "z"),
        (3, "x"), (3, "z"),
        (3, "x"),  # duplicate line collapses via distinct
        # a giant basket that must be dropped by the guard
        *[(9, f"junk{i}") for i in range(20)],
    ]
    df = spark.createDataFrame(rows, "b int, i string")
    out = item_cooccurrence_topk(
        df, "b", "i", k=2, min_pair_count=1, max_basket_items=10
    ).collect()
    got = {(r.item, r.neighbor): (r.pair_count, r.cosine, r.rank) for r in out}
    # supports: x=3, y=2, z=2; co(x,y)=2, co(x,z)=2, co(y,z)=1
    assert got[("x", "y")] == (2, round(2 / (3 * 2) ** 0.5, 6), 1)
    assert got[("x", "z")] == (2, round(2 / (3 * 2) ** 0.5, 6), 2)  # tie -> z second (y < z)
    assert got[("y", "x")][2] == 1 and got[("z", "x")][2] == 1
    assert not any(r.item.startswith("junk") for r in out)


def test_containment_catches_quote_that_jaccard_misses(spark):
    """A short doc quoted whole inside a long one: containment ~1 for
    the short side while Jaccard stays small — the asymmetric signal
    is the operator's reason to exist."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [(1, short), (2, filler + " " + short + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = containment_pairs(df, threshold=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.cont_ab == 1.0          # every shingle of 1 is inside 2
    assert r.cont_ba < 0.1           # but 2 is mostly NOT in 1
    # and symmetric Jaccard misses the pair entirely at the same bar
    assert ngram_jaccard_pairs(df, threshold=0.5).count() == 0


def test_association_rules_lift_separates_signal_from_popularity(spark):
    """A genuinely co-occurring pair gets lift > 1; a popular item
    paired with everything by chance sits near lift ~1 — the
    confound cosine/confidence alone can't separate."""
    from image_matadata_batchprocessing_aws_spark.operators.reco import (
        association_rules,
    )

    rows = []
    for b in range(20):
        rows.append((b, 100))           # item 100 in EVERY basket
        if b % 2 == 0:
            rows.append((b, 1))         # 1 and 2 always together
            rows.append((b, 2))
        else:
            rows.append((b, 3))
    df = spark.createDataFrame(rows, "basket long, item long")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "basket", "item", min_pair_support=3).collect()
    }
    strong = out[(1, 2)]
    assert strong.confidence == 1.0 and strong.lift == 2.0  # 1.0 / (10/20)
    chance = out[(1, 100)]
    assert chance.lift == 1.0  # 100's base rate is 1.0
    assert (2, 1) in out  # both directions emitted


def test_mutual_topk_keeps_only_reciprocal_pairs(spark):
    """L1 and R1 point the same way (mutual at k=1); R2 sits between
    both left vectors, so it picks L1 — but L1's top-1 is R1, so
    (L1, R2) is one-directional and must not survive."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import mutual_topk

    left = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "left_id long, le array<double>"
    )
    right = spark.createDataFrame(
        [(10, [1.0, 0.1]), (20, [5.0, 5.0]), (30, [0.1, 1.0])],
        "right_id long, re array<double>",
    )
    out = {(r.left_id, r.right_id): r for r in mutual_topk(left, right, k=1).collect()}
    assert set(out) == {(1, 10), (2, 30)}
    assert out[(1, 10)].rn_lr == 1 and out[(1, 10)].rn_rl == 1
    # k=1 means each side's top-k mean IS the pair score -> margin 1
    assert out[(1, 10)].margin == 1.0


def test_mutual_topk_margin_deflates_hubs(spark):
    """A hub close to everything gets a high top-k mean, so its mutual
    pair's margin sits below a pair that is uniquely aligned."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import mutual_topk

    left = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.7, 0.7, 0.2])],
        "left_id long, le array<double>",
    )
    right = spark.createDataFrame(
        [(10, [1.0, 0.05, 0.0]), (20, [0.7, 0.71, 0.2]), (30, [0.6, 0.75, 0.2])],
        "right_id long, re array<double>",
    )
    out = {(r.left_id, r.right_id): r for r in mutual_topk(left, right, k=2).collect()}
    # the uniquely-aligned pair carries a higher margin than the hub's
    assert out[(1, 10)].margin > out[(2, 20)].margin


def test_embedding_drift_isolates_shifted_dimension(spark):
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        embedding_drift_report,
    )

    old = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(10)], "id long, e array<double>"
    )
    new = spark.createDataFrame(
        [(i, [1.0, 2.5, 3.0]) for i in range(20)], "id long, e array<double>"
    )
    r = embedding_drift_report(old, new, "e", dim=3).collect()[0]
    assert r.n_old == 10 and r.n_new == 20
    assert r.centroid_shift == 0.5      # all drift in one dimension
    assert r.worst_dim == 2 and r.worst_dim_shift == 0.5
    assert r.mean_norm_delta > 0        # the new snapshot is longer


def test_bucketed_knn_outliers_flags_small_cells_and_far_points(spark):
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        knn_distance_outliers_bucketed,
    )

    # cell A: 8 clustered points + 1 far point; cell B: 2 points (< k+1)
    rows = [(i, [float(i % 3) * 0.01, 0.0], "A") for i in range(8)]
    rows.append((50, [30.0, 0.0], "A"))
    rows += [(60, [0.0, 1.0], "B"), (61, [0.0, 1.1], "B")]
    df = spark.createDataFrame(rows, "id long, e array<double>, cell string")
    out = knn_distance_outliers_bucketed(df, "id", "e", "cell", k=3, top_n=3).collect()
    # NULL-kdist (uncertifiable) small-cell members rank first,
    # then the genuinely far point
    assert {out[0].id, out[1].id} == {60, 61}
    assert out[0].kdist is None and out[1].kdist is None
    assert out[2].id == 50 and out[2].kdist > 10


def test_sequential_patterns_order_and_pruning(spark):
    """Subsequence (not adjacency) semantics: a>c is found even though
    b always sits between; support counts KEYS not occurrences; an
    infrequent length-2 prefix can never spawn a length-3 pattern."""
    from image_matadata_batchprocessing_aws_spark.operators.reco import (
        sequential_patterns,
    )

    rows = []
    for u in range(6):
        for pos, it in enumerate(["a", "b", "c", "a"]):  # a>c non-contiguous
            rows.append((u, pos, pos, it))
    rows += [(99, 0, 0, "x"), (99, 1, 1, "y")]  # one-user pattern: pruned
    df = spark.createDataFrame(rows, "u long, ts long, tb long, it string")
    out = {
        r.pattern: r.support
        for r in sequential_patterns(
            df, "u", ["ts", "tb"], "it", min_support=3, top_k=50
        ).collect()
    }
    assert out["a>c"] == 6          # non-contiguous pair found
    assert out["a>b>c"] == 6        # depth-3 through the frequent prefix
    assert "x>y" not in out         # support 1 < 3: pruned
    assert out["a>a"] == 6          # repeats allowed, counted once per key


def test_bbit_minhash_audit_unbiased_across_moduli(spark):
    """VERDICT r7 item 8: the b-bit estimator audit is a parameterized
    kernel whose pair-sampling modulus is an API knob.  Property: the
    bias-corrected b-bit estimator tracks the full-width estimator (its
    pairs-weighted mean bias is ~0) at EVERY modulus and b-width — the
    modulus only changes WHICH pairs are sampled, never the estimator's
    center — and the sample size scales ~1/m so the corpus^2 scaling
    rule (modulus_for_target_pairs) holds the audit's cost constant."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        bbit_minhash_audit,
        modulus_for_target_pairs,
    )
    from image_matadata_batchprocessing_aws_spark.queries.util import t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    stats = {}
    for m, b in ((53, 2), (97, 2), (53, 1)):
        rows = bbit_minhash_audit(
            docs, n=3, num_hashes=16, b_bits=b, pair_modulus=m
        ).collect()
        n_pairs = sum(r.n_pairs for r in rows)
        bias = (
            sum(r.n_pairs * (r.mean_est_bbit - r.est_full) for r in rows) / n_pairs
        )
        stats[(m, b)] = (n_pairs, bias)
        # unbiased: with ~16 slots the per-pair corrected estimate has
        # sd <= ~0.14 (b=2) / ~0.25 (b=1); thousands of pairs pull the
        # weighted mean bias well under 0.02
        assert abs(bias) < 0.02, (m, b, bias)
    # sample size scales inversely with the modulus (uniform ids)
    ratio = stats[(53, 2)][0] / stats[(97, 2)][0]
    assert 1.3 < ratio < 2.6, ratio  # 97/53 = 1.83 up to residue noise
    # the scaling rule is the closest-expected-sample inverse
    n_docs = docs.count()
    for target in (100, 1000):
        m = modulus_for_target_pairs(n_docs, target)
        assert abs(n_docs * (n_docs - 1) / (2.0 * m) - target) <= max(
            1.0, target * 0.02
        )
