"""Sketch operators (Bloom, Count-Min) and fixed-point PageRank:
structural guarantees that the SQL oracles can't state — no false
negatives, deterministic overcounts, mass conservation — plus the plan
shapes (map-side probe, broadcast counter join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.sketches import (
    bloom_build,
    bloom_capacity,
    bloom_dense,
    bloom_hit,
    bloom_hit_any,
    cms_build,
    cms_estimate,
)
from image_matadata_batchprocessing_aws_spark.operators.graph import (
    PR_SCALE,
    pagerank_scaled,
)
from image_matadata_batchprocessing_aws_spark.plans import formatted_plan


M, K = 65536, 3  # generous sizing: FP probability ~1e-8 at 50 keys


def _sketch(spark, keys, m=M):
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    return bloom_dense(bloom_build(df, "key", K, m).collect(), m)


def test_bloom_capacity_is_power_of_two_and_covers_keys(spark):
    assert bloom_capacity(500, 64) == 32768
    assert bloom_capacity(4845, 64) == 524288
    for n in (1, 255, 256, 257, 8192):
        m = bloom_capacity(n, 64)
        assert m & (m - 1) == 0 and m >= 64 * n


def test_bloom_no_false_negatives(spark):
    keys = [f"key-{i}" for i in range(50)]
    dense = _sketch(spark, keys)
    probe = spark.createDataFrame([(k,) for k in keys], "key string")
    hits = probe.where(bloom_hit(F.col("key"), dense, K, M)).count()
    assert hits == 50  # every inserted key MUST test positive


def test_bloom_rejects_disjoint_keys_at_generous_m(spark):
    dense = _sketch(spark, [f"key-{i}" for i in range(50)])
    other = spark.createDataFrame([(f"other-{i}",) for i in range(200)], "key string")
    fp = other.where(bloom_hit(F.col("key"), dense, K, M)).count()
    assert fp == 0  # deterministic: this seed/sizing has no collisions


def test_bloom_hit_any_is_joinless_map_side(spark):
    dense = _sketch(spark, ["alpha beta", "gamma delta"])
    docs = spark.createDataFrame(
        [(1, ["alpha beta", "zzz"]), (2, ["yyy", "xxx"])], "doc_id long, sh array<string>"
    )
    flagged = docs.where(bloom_hit_any(F.col("sh"), dense, K, M))
    assert [r.doc_id for r in flagged.collect()] == [1]
    assert "Join" not in formatted_plan(flagged)  # probe is pure codegen


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    # 20 keys with known frequencies 1..20
    rows = [(f"k{i}",) for i in range(1, 21) for _ in range(i)]
    df = spark.createDataFrame(rows, "key string")
    exact = {r.key: r.cnt for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    keys = df.select("key").distinct()

    # wide sketch: no collisions possible to matter -> est == exact
    wide = cms_estimate(keys, cms_build(df, "key", 3, 4096), "key", 3, 4096)
    got = {r.key: r.est_cnt for r in wide.collect()}
    assert got == exact

    # 8-cell rows force collisions -> still never undercounts
    tiny = cms_estimate(keys, cms_build(df, "key", 2, 8), "key", 2, 8)
    for r in tiny.collect():
        assert r.est_cnt >= exact[r.key]


def test_cms_estimate_broadcasts_counters(spark):
    df = spark.createDataFrame([(f"k{i % 5}",) for i in range(100)], "key string")
    est = cms_estimate(
        df.select("key").distinct(), cms_build(df, "key", 3, 64), "key", 3, 64
    )
    assert "BroadcastHashJoin" in formatted_plan(est)


def _pr(spark, edges, iters=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank_scaled for r in pagerank_scaled(e, iterations=iters).collect()}


def test_pagerank_cycle_is_uniform_and_conserves_mass(spark):
    ranks = _pr(spark, [(0, 1), (1, 2), (2, 0)])
    assert len(set(ranks.values())) == 1  # symmetry -> identical ranks
    total = sum(ranks.values())
    # truncating division leaks at most a few units per node per round
    assert PR_SCALE * 0.999 < total <= PR_SCALE


def test_pagerank_star_center_dominates(spark):
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = _pr(spark, edges)
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    leaf_ranks = {ranks[i] for i in range(1, 6)}
    assert len(leaf_ranks) == 1  # leaves are symmetric


def test_pagerank_converged_reaches_fixpoint(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        pagerank_converged,
    )

    # star + tail: asymmetric enough that convergence takes >1 round
    edges = (
        [(0, i) for i in range(1, 6)]
        + [(i, 0) for i in range(1, 6)]
        + [(5, 6), (6, 5)]
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    # the star couples with damping into a slowly-decaying oscillating
    # mode (~0.85^t): 5e7 of 1e12 converges in ~45 rounds
    ranks_df, iters = pagerank_converged(e, tol_scaled=5 * 10**7, max_iterations=80)
    ranks = {r.node: r.rank_scaled for r in ranks_df.collect()}
    assert 1 < iters <= 60
    total = sum(ranks.values())
    assert PR_SCALE * 0.999 < total <= PR_SCALE
    assert min(ranks.values()) > 0
    # one more round moves nothing by more than tol (true fixpoint)
    more = {
        r.node: r.rank_scaled
        for r in pagerank_converged(e, tol_scaled=5 * 10**7, max_iterations=81)[0].collect()
    }
    assert all(abs(more[n] - ranks[n]) <= 5 * 10**7 for n in ranks)
    # and it agrees with the fixed-iteration form run long enough
    deep = _pr(spark, edges, iters=60)
    assert all(abs(deep[n] - ranks[n]) <= 10**8 for n in ranks)


def test_pagerank_converged_raises_on_impossible_tol(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        pagerank_converged,
    )

    e = spark.createDataFrame([(0, 1), (1, 0), (0, 2), (2, 0)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not reach"):
        pagerank_converged(e, tol_scaled=0, max_iterations=2)


def test_bloom_prefilter_join_equals_plain_join(spark, tmp_path):
    # the runtime-filter pattern: prefilter by a bloom of the build-side
    # keys, then join — must be row-identical to the plain join because
    # the join re-verifies every FP
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        bloom_capacity,
    )

    big = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    keys = [str(i) for i in range(0, 5000, 17)]
    small = spark.createDataFrame([(int(x),) for x in keys], "k long")
    m = bloom_capacity(len(keys), 64)
    dense = _sketch(spark, keys, m=m)
    pre = big.where(bloom_hit(F.col("k").cast("string"), dense, K, m))
    got = sorted(map(tuple, pre.join(small, "k").collect()))
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want


def test_pq_encode_picks_nearest_codeword_and_adc_ranks_exact_match_first(spark):
    from image_matadata_batchprocessing_aws_spark.operators.pq import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal((12, 8))
    rows = [(int(i), [float(v) for v in base[i]]) for i in range(12)]
    vecs = spark.createDataFrame(rows, "vec_id long, e array<double>")
    cb = pq_codebook(vecs.where(F.col("vec_id") % 3 == 0), "vec_id", "e", 2, 4)
    codes = pq_encode(vecs, cb, "vec_id", "e", 2, 4)
    # a codeword-source vector must encode to ITSELF in every subspace
    self_codes = {
        (r.vec_id, r.s): r.cw_id
        for r in codes.where(F.col("vec_id") % 3 == 0).collect()
    }
    assert all(cw == vid for (vid, _s), cw in self_codes.items())
    # ADC: querying WITH a codeword vector ranks that vector first (its
    # quantization error is exactly 0)
    q = vecs.where(F.col("vec_id") == 6).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    top = pq_adc_topk(q, codes, cb, "query_id", "qe", "vec_id", 2, 4, 3)
    first = top.where(F.col("rn") == 1).collect()[0]
    assert first.neighbor_id == 6 and first.adc_scaled == 0


def test_new_query_plan_shapes(spark):
    """Plan-shape regression locks for the r03 additions: the bloom
    prefilter reaches the probe scan BEFORE the join, PQ's codebook and
    ADC tables broadcast, and the graph joins never degenerate to
    nested loops."""
    from image_matadata_batchprocessing_aws_spark.queries import all_queries
    from tests.conftest import SF_CORRECT

    qs = all_queries()
    p = formatted_plan(qs["join_bloom_prefilter"](spark, SF_CORRECT))
    # the md5-derived probe filter must sit on the orders branch (scan
    # side), not above the join
    join_pos = p.index("Join")
    assert "md5" in p[join_pos:], "bloom probe filter missing below the join"
    pq = formatted_plan(qs["ann_pq_adc"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in pq and "NestedLoop" not in pq
    for name in ("graph_pagerank", "graph_triangles", "funnel_conversion"):
        plan = formatted_plan(qs[name](spark, SF_CORRECT))
        assert "CartesianProduct" not in plan, name


def test_pagerank_matches_pure_python_reference(spark):
    """Independent check: the distributed fixed-point PageRank equals a
    pure-Python integer implementation of the same recurrence on a
    pseudo-random 60-node graph (same scale, damping, truncation)."""
    import random

    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
    )

    rng = random.Random(11)
    nodes = list(range(60))
    edges = set()
    for u in nodes:  # every node gets >= 1 outgoing edge (operator contract)
        for _ in range(rng.randint(1, 4)):
            v = rng.choice(nodes)
            if v != u:
                edges.add((u, v))
    edges = sorted(edges)

    got = _pr(spark, edges, iters=3)

    present = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(present)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {v: PR_SCALE // n for v in present}
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
    for _ in range(3):
        inc = {v: 0 for v in present}
        for u, v in edges:
            inc[v] += (rank[u] * PR_DAMP_NUM) // (PR_DAMP_DEN * deg[u])
        rank = {v: base + inc[v] for v in present}
    assert got == rank


# --- HyperLogLog ----------------------------------------------------------


def test_hll_merge_equals_union_sketch(spark):
    """Mergeability is the defining property: max-merging the register
    tables of two disjoint halves must give EXACTLY the registers (and
    hence the estimate) of sketching the union directly."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    rows = [(i, f"key-{i}", "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "i long, k string, half string")
    split = hll_registers(df, "k", ["half"], p=7)
    merged = hll_merge(split, [])
    direct = hll_registers(df, "k", [], p=7)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est = hll_estimate(direct, [], p=7).collect()[0]
    # 128 registers -> ~9% standard error; allow 4 sigma
    assert abs(est.est - 2000) / 2000 < 0.36


def test_hll_estimate_tracks_cardinality_order(spark):
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    # n >> 2.5m: the raw harmonic-mean formula's accurate regime (below
    # that, production HLL++ switches to linear counting — out of scope
    # for this explicit-register demo, whose queries sit in this regime)
    rows = [(f"g{g}-key-{i}", f"g{g}") for g in (1, 2) for i in range(4000 * g)]
    df = spark.createDataFrame(rows, "k string, g string")
    regs = hll_registers(df, "k", ["g"], p=9)
    out = {r.g: r.est for r in hll_estimate(regs, ["g"], p=9).collect()}
    assert out["g1"] < out["g2"]
    assert abs(out["g1"] - 4000) / 4000 < 0.2 and abs(out["g2"] - 8000) / 8000 < 0.2


def test_label_propagation_disjoint_cliques(spark):
    """Disjoint 4-cliques converge to their minimum member id within 2
    synchronous rounds (round 1: everyone adopts the min neighbor; round
    2: the min id itself gets it back by majority); rerun-deterministic."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import label_propagation

    cl1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a != b]
    cl2 = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a != b]
    edges = spark.createDataFrame(cl1 + cl2, "src long, dst long")
    lab = {r.node: r.label for r in label_propagation(edges, rounds=2).collect()}
    assert {lab[n] for n in (1, 2, 3, 4)} == {1}
    assert {lab[n] for n in (10, 11, 12, 13)} == {10}
    again = {r.node: r.label for r in label_propagation(edges, rounds=2).collect()}
    assert again == lab


def test_hits_scaled_matches_python_replica_and_numpy_order(spark):
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.operators.graph import hits_scaled

    # small directed bipartite-ish graph with a clear best authority (5)
    E = [(1, 5), (2, 5), (3, 5), (1, 6), (2, 6), (4, 7), (3, 6)]
    edges = spark.createDataFrame(E, "src long, dst long")
    scale = 10**9
    got = {
        r.node: (r.hub_scaled, r.auth_scaled)
        for r in hits_scaled(edges, iterations=3, scale=scale).collect()
    }

    # exact integer replica of the same rounds
    nodes = sorted({n for e in E for n in e})
    hub = {n: scale // len(nodes) for n in nodes}
    auth = {}
    for _ in range(3):
        raw = {n: 0 for n in nodes}
        for s, d in E:
            raw[d] += hub[s]
        tot = sum(raw.values())
        auth = {n: (raw[n] * scale) // tot for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d in E:
            raw[s] += auth[d]
        tot = sum(raw.values())
        hub = {n: (raw[n] * scale) // tot for n in nodes}
    for n in nodes:
        assert got[n] == (hub[n], auth[n]), n

    # float HITS agrees on the ordering: 5 is the top authority, and
    # hubs 1/2/3 (linked to both strong authorities) beat hub 4
    auths = sorted(nodes, key=lambda n: -got[n][1])
    assert auths[0] == 5
    assert got[1][0] > got[4][0] and got[2][0] > got[4][0]
    # zero cases: authorities have no out-edges -> hub 0; hubs have no
    # in-edges -> auth 0
    assert got[5][0] == 0 and got[1][1] == 0


def test_kmv_estimate_accuracy_and_mergeability(spark):
    """KMV on 5000 synthetic distinct keys: estimate within the
    theoretical ~1/sqrt(k) band, and merge-of-parts equals
    sketch-of-whole row for row (the mergeability contract)."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    n = 5000
    rows = [(i % 4, f"key-{i}") for i in range(n)]  # 4 parts, all keys distinct
    df = spark.createDataFrame(rows, "part int, key string")
    whole = df.withColumn("g", F.lit(1))
    k = 256
    sk_whole = kmv_sketch(whole, "key", ["g"], k=k)
    est = kmv_estimate(sk_whole, ["g"], k=k).collect()[0]
    assert abs(est.est_distinct - n) / n < 3.0 / (k ** 0.5)  # 3-sigma band
    # mergeability: union of per-part sketches == sketch of the union
    sk_parts = kmv_sketch(df, "key", ["part"], k=k).withColumn("g", F.lit(1))
    merged = kmv_merge(sk_parts, ["g"], k=k)
    a = {(r.pos, r.h) for r in merged.collect()}
    b = {(r.pos, r.h) for r in sk_whole.collect()}
    assert a == b


def test_kmv_jaccard_pair_overlap(spark):
    """Planted 50% overlap between two groups comes back within the
    sketch error band; disjoint groups come back ~0."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        kmv_jaccard_pair,
        kmv_sketch,
    )

    rows = []
    for i in range(2000):
        rows.append(("a", f"shared-{i}" if i < 1000 else f"a-{i}"))
        rows.append(("b", f"shared-{i}" if i < 1000 else f"b-{i}"))
    df = spark.createDataFrame(rows, "grp string, key string")
    sk = kmv_sketch(df, "key", ["grp"], k=256)
    r = kmv_jaccard_pair(sk, "grp", "a", "b", k=256).collect()[0]
    # true: |A|=|B|=2000, inter=1000, union=3000, J=1/3
    assert abs(r.jaccard_est - 1 / 3) < 0.12
    assert abs(r.inter_est - 1000) / 1000 < 0.35
    rows2 = [("a", f"a-{i}") for i in range(500)] + [("b", f"b-{i}") for i in range(500)]
    sk2 = kmv_sketch(spark.createDataFrame(rows2, "grp string, key string"), "key", ["grp"], k=256)
    r2 = kmv_jaccard_pair(sk2, "grp", "a", "b", k=256).collect()[0]
    assert r2.n_both == 0 and r2.inter_est == 0.0


def test_bfs_levels_min_distance_and_early_exit(spark):
    """BFS assigns MIN hop distance on a graph with a shortcut, stops
    at max_depth, and exits early on an exhausted component."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import bfs_levels

    #     0 -> 1 -> 2 -> 3 -> 4,  plus shortcut 0 -> 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)], "src int, dst int"
    )
    src = spark.createDataFrame([(0,)], "node int")
    got = {r.node: r.dist for r in bfs_levels(edges, src, max_depth=2).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}  # 3 via shortcut, 4 via 3
    # tiny component exhausts before max_depth; result is stable
    got2 = {r.node: r.dist for r in bfs_levels(edges, src, max_depth=10).collect()}
    assert got2 == got


def test_bottomk_sample_mergeable_and_quantile_accuracy(spark):
    from pyspark.sql import functions as F

    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        bottomk_merge,
        bottomk_quantiles,
        bottomk_sample,
    )

    # skewed values: v = (i % 100)^2 over 10k rows, one group
    df = spark.range(10_000).select(
        F.lit("g").alias("grp"),
        F.col("id"),
        ((F.col("id") % 100) * (F.col("id") % 100)).cast("double").alias("v"),
    )
    k = 256
    full = bottomk_sample(df, F.col("id").cast("string"), "v", ["grp"], k=k)
    # mergeability: sketch(all) == merge(sketch(chunk0), sketch(chunk1))
    c0 = bottomk_sample(
        df.where(F.col("id") % 2 == 0), F.col("id").cast("string"), "v", ["grp"], k=k
    )
    c1 = bottomk_sample(
        df.where(F.col("id") % 2 == 1), F.col("id").cast("string"), "v", ["grp"], k=k
    )
    merged = bottomk_merge(c0.unionByName(c1), ["grp"], k=k)
    a = sorted((r.pos, r.h) for r in full.collect())
    b = sorted((r.pos, r.h) for r in merged.collect())
    assert a == b and len(a) == k
    # accuracy: sample p50 near true p50 (true: (50)^2 = 2500 at q=0.5)
    qrow = bottomk_quantiles(full, ["grp"]).collect()[0]
    assert qrow.n_sketch == k
    true_p50 = 2500.0
    assert abs(qrow.p50 - true_p50) / true_p50 < 0.35  # k=256 sampling error
    # degenerate group smaller than k: sample IS the data, quantile exact
    tiny = spark.range(5).select(
        F.lit("t").alias("grp"), F.col("id"), F.col("id").cast("double").alias("v")
    )
    ts = bottomk_sample(tiny, F.col("id").cast("string"), "v", ["grp"], k=k)
    trow = bottomk_quantiles(ts, ["grp"]).collect()[0]
    assert trow.n_sketch == 5 and trow.p50 == 2.0 and trow.p90 == 4.0


def test_ams_f2_exact_arm_and_error_bound(spark):
    """f2_exact is sum of squared frequencies; the 16-counter
    median-of-means estimate is deterministic (md5 signs) and lands
    within the coarse concentration bound."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import ams_f2

    rows = [(v,) for v in [1] * 10 + [2] * 5 + [3] * 3 + list(range(4, 20))]
    df = spark.createDataFrame(rows, "k long")
    r = ams_f2(df, "k").collect()[0]
    assert r.f2_exact == 100 + 25 + 9 + 16
    assert r.rel_error == round(abs(r.f2_estimate - r.f2_exact) / r.f2_exact, 6)
    assert r.rel_error < 1.0


def test_personalized_pagerank_concentrates_near_seeds(spark):
    """Two disconnected 2-cycles; seeding one of them leaves the other
    at rank 0 while global PageRank ranks both equally."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        pagerank_scaled,
        personalized_pagerank_scaled,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    ppr = {r.node: r.rank_scaled
           for r in personalized_pagerank_scaled(edges, seeds, iterations=3).collect()}
    assert ppr[10] == 0 and ppr[11] == 0
    # all mass stays in the seeded cycle (a 2-cycle oscillates between
    # the nodes round to round, so compare the SUM, not the split)
    assert ppr[1] > 0 and ppr[2] > 0
    assert abs((ppr[1] + ppr[2]) - 10**12) < 10  # truncation leak only
    gpr = {r.node: r.rank_scaled for r in pagerank_scaled(edges, iterations=3).collect()}
    assert gpr[1] == gpr[10]  # the global walk can't tell the cycles apart


def test_cms_join_size_upper_bounds_and_tightens(spark):
    from image_matadata_batchprocessing_aws_spark.operators.sketches import cms_join_size

    left = spark.createDataFrame([(i % 20,) for i in range(200)], "k long")
    right = spark.createDataFrame([(i % 20,) for i in range(100)], "k long")
    r = cms_join_size(left, right, "k", "k", d=4, w=256).collect()[0]
    assert r.join_size_exact == 20 * 10 * 5  # 20 keys x (10 left * 5 right)
    assert r.join_size_est >= r.join_size_exact  # CM inner product never undershoots
    assert r.overestimate_ratio < 2.0  # w >> distinct keys -> tight


def test_knn_distance_outlier_finds_planted_point(spark):
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        knn_distance_outliers,
    )

    rows = [(i, [float(i % 7) * 0.01, 1.0]) for i in range(30)]
    rows.append((99, [50.0, -50.0]))  # far from the cluster
    df = spark.createDataFrame(rows, "id long, e array<double>")
    out = knn_distance_outliers(df, "id", "e", k=3, top_n=1).collect()
    assert out[0].id == 99 and out[0].kdist > 10


def test_markov_steady_concentrates_on_sticky_state(spark):
    """A chain where state b mostly self-loops: the stationary mass
    lands on b; a pure sink state gets the absorbing flag + self-loop
    and soaks mass instead of destroying it."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        PR_SCALE,
        markov_steady_scaled,
    )

    tr = spark.createDataFrame(
        [("a", "b", 9), ("a", "a", 1), ("b", "b", 9), ("b", "a", 1)],
        "src_state string, dst_state string, cnt long",
    )
    pi = {r.state: r for r in markov_steady_scaled(tr, iterations=6).collect()}
    assert pi["b"].pi_scaled > pi["a"].pi_scaled
    assert not pi["a"].is_absorbing
    total = sum(r.pi_scaled for r in pi.values())
    assert PR_SCALE * 0.999 < total <= PR_SCALE  # mass conserved mod truncation
    sink = spark.createDataFrame(
        [("a", "z", 1)], "src_state string, dst_state string, cnt long"
    )
    pz = {r.state: r for r in markov_steady_scaled(sink, iterations=4).collect()}
    assert pz["z"].is_absorbing and pz["a"].pi_scaled == 0
    assert pz["z"].pi_scaled > 0  # the self-loop holds the mass
