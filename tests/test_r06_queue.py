"""The r06 registration queue carries full oracle confidence NOW —
same discipline test_r05_queue.py applied before the r05 registration —
plus unit tests for the operators the queue exercises."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark.queries import r06_queue
from image_matadata_batchprocessing_aws_spark.schemas import DRIVER_TABLES
from tests.conftest import SF_SMOKE


def test_queue_keys_paired():
    assert set(r06_queue.QUERIES) == set(r06_queue.ORACLES)
    # registered in r06: every queue entry is IN the live registry
    # (all_queries() itself raises on any cross-module name collision)
    from image_matadata_batchprocessing_aws_spark.queries import all_queries, all_oracles

    reg = all_queries()
    assert set(r06_queue.QUERIES) <= set(reg)
    assert set(r06_queue.ORACLES) <= set(all_oracles())


@pytest.mark.parametrize("name", sorted(r06_queue.QUERIES))
def test_queue_query_matches_oracle(spark, name):
    from tools.check_oracle import normalize

    con = duckdb.connect()
    for tbl in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_SMOKE}/{tbl}.parquet'"
        )
    sdf = r06_queue.QUERIES[name](spark, SF_SMOKE)
    scols, srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(r06_queue.ORACLES[name])
    ocols, orows = normalize(res.fetchall(), [d[0] for d in res.description])
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    assert srows == orows


def test_ppr_converged_reaches_fixpoint(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        PR_SCALE,
        personalized_pagerank_converged,
        personalized_pagerank_scaled,
    )

    # star + tail, seeded at the tail tip: convergence takes >1 round
    edges = (
        [(0, i) for i in range(1, 6)]
        + [(i, 0) for i in range(1, 6)]
        + [(5, 6), (6, 5)]
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(6,)], "node long")
    ranks_df, iters = personalized_pagerank_converged(
        e, seeds, tol_scaled=5 * 10**7, max_iterations=80
    )
    ranks = {r.node: r.rank_scaled for r in ranks_df.collect()}
    assert 1 < iters <= 80
    total = sum(ranks.values())
    assert PR_SCALE * 0.99 < total <= PR_SCALE
    assert min(ranks.values()) >= 0
    # seed keeps at least its teleport floor (1 seed -> 0.15 * scale)
    assert ranks[6] >= PR_SCALE * 15 // 100
    # and out-ranks the symmetric far leaves (the hub node 0 may
    # legitimately out-rank the seed — degree buys rank)
    assert all(ranks[6] > ranks[i] for i in range(1, 5))
    # agrees with the unrolled oracle form run long enough
    deep = {
        r.node: r.rank_scaled
        for r in personalized_pagerank_scaled(e, seeds, iterations=60).collect()
    }
    assert all(abs(deep[n] - ranks[n]) <= 10**8 for n in ranks)


def test_ppr_converged_seed_gating(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        personalized_pagerank_converged,
    )

    # two disconnected 2-cycles; seed only in the first: the second
    # component must hold rank 0 at the fixpoint
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    ranks_df, _ = personalized_pagerank_converged(
        e, seeds, tol_scaled=5 * 10**7, max_iterations=80
    )
    ranks = {r.node: r.rank_scaled for r in ranks_df.collect()}
    assert ranks[10] == 0 and ranks[11] == 0
    assert ranks[0] > 0 and ranks[1] > 0


def test_ppr_converged_raises_on_impossible_tol(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        personalized_pagerank_converged,
    )

    e = spark.createDataFrame([(0, 1), (1, 0), (0, 2), (2, 0)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(RuntimeError, match="did not reach"):
        personalized_pagerank_converged(e, seeds, tol_scaled=0, max_iterations=2)


def test_boruvka_msf_hand_graph(spark):
    """Two components + a weight tie: the forest is the unique
    (w, a, b)-lexicographic MSF, cycle edges drop, forests stay forests."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import boruvka_msf

    edges = [
        # component {0,1,2,3}: square with one diagonal; MST = the 3
        # cheapest non-cycle edges
        (0, 1, 10),
        (1, 2, 20),
        (2, 3, 30),
        (0, 3, 40),   # closes the square: max on its cycle -> OUT
        (0, 2, 50),   # diagonal, heaviest -> OUT
        # component {7,8,9}: tie between (7,8) and (8,9) at w=5 — both
        # are in the MSF (no cycle); (7,9,5) ties too and closes the
        # cycle: lexicographic order keeps (7,8,5) and (7,9,5), drops
        # the lexicographically-last tie (8,9,5)
        (8, 7, 5),
        (8, 9, 5),
        (7, 9, 5),
    ]
    e = spark.createDataFrame(edges, "a long, b long, w long")
    got = sorted(
        tuple(r) for r in boruvka_msf(e, "a", "b", "w").collect()
    )
    assert got == [(0, 1, 10), (1, 2, 20), (2, 3, 30), (7, 8, 5), (7, 9, 5)]


def test_boruvka_msf_single_edge_and_empty(spark):
    from image_matadata_batchprocessing_aws_spark.operators.graph import boruvka_msf

    one = spark.createDataFrame([(4, 2, 7)], "a long, b long, w long")
    assert [tuple(r) for r in boruvka_msf(one).collect()] == [(2, 4, 7)]
    empty = one.where("a < 0")
    assert boruvka_msf(empty).count() == 0


def test_winnowing_guarantee(spark):
    """The paper's guarantee: two docs sharing a substring of
    >= K + W - 1 tokens share at least one selected fingerprint."""
    from image_matadata_batchprocessing_aws_spark.queries.r06_queue import (
        WINNOW_K,
        WINNOW_W,
    )
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        positional_kgrams,
    )
    from pyspark.sql import functions as F, Window

    shared = "alpha beta gamma delta epsilon zeta"  # K+W-1 = 6 tokens
    docs = spark.createDataFrame(
        [
            (1, "x1 y1 " + shared + " tail one two"),
            (2, "completely different head " + shared),
        ],
        "doc_id long, text string",
    )
    g = positional_kgrams(docs, "text", "doc_id", WINNOW_K)
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(WINNOW_W - 1), 0)
    sel = (
        g.select(
            "doc_id",
            "pos",
            F.min(F.struct(F.col("fp"), (-F.col("pos")).alias("np"))).over(w).alias("m"),
        )
        .where(F.col("pos") >= WINNOW_W - 1)
        .select("doc_id", F.col("m.fp").alias("fp"))
        .distinct()
    )
    a = {r["fp"] for r in sel.where("doc_id = 1").collect()}
    b = {r["fp"] for r in sel.where("doc_id = 2").collect()}
    assert a & b, "docs sharing a t-token substring must share a fingerprint"


def test_boruvka_matches_kruskal_on_random_graphs(spark):
    """boruvka_msf vs an in-test Kruskal (union-find) under the same
    (w, a, b) total order, on pseudo-random graphs with planted weight
    ties and multiple components — two algorithms, identical forest."""
    import hashlib

    from image_matadata_batchprocessing_aws_spark.operators.graph import boruvka_msf

    def kruskal(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for w, a, b in sorted((w, a, b) for a, b, w in edges):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                out.append((a, b, w))
        return sorted(out)

    for seed in ("g1", "g2", "g3"):
        h = lambda s: int.from_bytes(  # noqa: E731
            hashlib.md5(f"{seed}:{s}".encode()).digest()[:4], "big"
        )
        n = 10 + h("n") % 6
        edges = []
        for i in range(n * 2):
            a, b = h(f"a{i}") % n, h(f"b{i}") % n
            if a == b:
                continue
            a, b = min(a, b), max(a, b)
            # coarse weights so ties happen; two disjoint node blocks
            # (0..n-1 and 100..100+n-1) so the forest has >1 tree
            w = h(f"w{i}") % 5
            off = 100 if h(f"o{i}") % 2 else 0
            edges.append((a + off, b + off, w))
        edges = sorted(set(edges))
        df = spark.createDataFrame(edges, "a long, b long, w long")
        got = sorted(tuple(r) for r in boruvka_msf(df).collect())
        assert got == kruskal(edges), seed


def test_multitouch_credit_sums_to_1000(spark):
    """U-shaped credit on crafted 1/2/3/5-click purchases: per-purchase
    permille sums are exactly 1000 and the first touch absorbs the
    integer-division remainder."""
    import datetime as dt

    from image_matadata_batchprocessing_aws_spark.queries.r06_queue import (
        join_multitouch_attribution,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid, n_clicks in [(1, 1), (2, 2), (3, 3), (4, 5)]:
        for i in range(n_clicks):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(minutes=i), uid, "click", 0.0, None)
            )
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(minutes=30), uid, "purchase", 10.0, None)
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sf = os.path.join(d, "sf")
        os.makedirs(sf)
        df.write.parquet(os.path.join(sf, "events.parquet"))
        out = join_multitouch_attribution(spark, sf).collect()
    by_user_purchase = {}
    for r in out:
        by_user_purchase.setdefault(r.purchase_id, []).append(r)
    assert len(by_user_purchase) == 4
    for pid, credits in by_user_purchase.items():
        assert sum(c.credit_permille for c in credits) == 1000, pid
        n = credits[0].n_clicks
        by_pos = {c.position: c.credit_permille for c in credits}
        if n == 1:
            assert by_pos == {1: 1000}
        elif n == 2:
            assert by_pos == {1: 500, 2: 500}
        elif n == 3:
            assert by_pos == {1: 400, 2: 200, 3: 400}
        elif n == 5:
            # 200 div 3 = 66 per middle; remainder 2 pins to first touch
            assert by_pos == {1: 402, 2: 66, 3: 66, 4: 66, 5: 400}
        # credit_cents follows the same div arithmetic on the 1000-cent value
        assert sum(c.credit_cents for c in credits) <= 1000
        for c in credits:
            assert c.credit_cents == 1000 * c.credit_permille // 1000
