"""Graph analytics queries: PageRank over the customer-supplier
interaction graph.

Pairs with the connected-components operator (``operators/graph.py``, the
dedup group resolver) to cover the two classic iterative graph shapes:
label contraction and power iteration.  PageRank here is the
training-data-curation use case — scoring web-domain/document authority
to weight a crawl corpus — expressed on the TPC-H-ish tables the driver
ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_converged,
    pagerank_scaled,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

PR_ITERS = 3
PR_TOPK = 30


def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank on the bipartite customer-supplier graph (an edge when a
    customer's order contains a supplier's line item), made bidirectional
    so the walk alternates sides and every node has out-degree >= 1.
    Node encoding: customer -> 2*custkey, supplier -> 2*suppkey + 1.

    Fixed-point scaled-long arithmetic (operators/graph.pagerank_scaled)
    makes the result exact across engines: the oracle unrolls the same
    three iterations as CTEs.  Top-30 by rank with a unique
    (kind, entity) tiebreak."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    pr = pagerank_scaled(edges, iterations=PR_ITERS)
    return (
        pr.select(
            F.expr("node % 2").cast("long").alias("node_kind"),
            F.expr("node div 2").cast("long").alias("entity_id"),
            "rank_scaled",
        )
        .orderBy(F.col("rank_scaled").desc(), "node_kind", "entity_id")
        .limit(PR_TOPK)
    )


TRI_ORDER_MOD = 4  # sample 1/4 of orders so the co-purchase graph stays bounded


def graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts appearing
    in the same order), the third classic graph shape next to connected
    components and PageRank.  Edges are canonical (a < b, distinct); the
    count is the standard edge-edge-edge join with a < b < c so each
    triangle is enumerated exactly once.  Output: one row of graph-size
    stats plus the triangle count.

    Scale: the two joins key on single vertex columns — co-partitioned
    shuffles.  Production pushes enumeration to the low-degree endpoint
    first (degree-ordered orientation halves the worst-case join
    fan-out); the orientation here is vertex-id order, which the oracle
    can mirror exactly."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    li = li.where(F.col("l_orderkey") % TRI_ORDER_MOD == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "o")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = edges.select(F.col("a").alias("v")).union(edges.select("b")).distinct()
    stats = edges.agg(F.count("*").alias("n_edges")).crossJoin(
        nodes.agg(F.count("*").alias("n_nodes"))
    )
    return stats.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_triangles": graph_triangles,
}


def _pagerank_oracle(iters: int = PR_ITERS, scale: int = PR_SCALE) -> str:
    """Unrolled power-iteration CTE chain — one (contribution, rank) CTE
    pair per round, integer math throughout (DuckDB sums BIGINT into
    HUGEINT, so each round casts back)."""
    base = f"({scale} * {PR_DAMP_DEN - PR_DAMP_NUM}) // ({PR_DAMP_DEN} * nn.n)"
    ctes = [
        """pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        """edges AS (SELECT c AS src, s AS dst FROM pairs
                     UNION ALL SELECT s AS src, c AS dst FROM pairs)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        """nodes AS (SELECT DISTINCT node FROM
                     (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"""r0 AS (SELECT node, CAST({scale} // nn.n AS BIGINT) AS rank_scaled
                   FROM nodes CROSS JOIN nn)""",
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""i{it} AS (SELECT e.dst AS node,
                       sum((r.rank_scaled * {PR_DAMP_NUM}) // ({PR_DAMP_DEN} * d.deg)) AS inc
                FROM {prev} r JOIN deg d ON r.node = d.src
                JOIN edges e ON r.node = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{it} AS (SELECT nodes.node,
                       CAST({base} + coalesce(i.inc, 0) AS BIGINT) AS rank_scaled
                FROM nodes CROSS JOIN nn LEFT JOIN i{it} i ON nodes.node = i.node)"""
        )
        prev = f"r{it}"
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"""
        SELECT CAST(node % 2 AS BIGINT) AS node_kind,
               CAST(node // 2 AS BIGINT) AS entity_id,
               rank_scaled
        FROM {prev}
        ORDER BY rank_scaled DESC, node_kind, entity_id
        LIMIT {PR_TOPK}"""
    )


ORACLES = {
    "graph_pagerank": _pagerank_oracle(),
    "graph_triangles": f"""
        WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
                    WHERE l_orderkey % {TRI_ORDER_MOD} = 0),
        edges AS (SELECT DISTINCT x.p AS a, y.p AS b
                  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        nodes AS (SELECT DISTINCT v FROM
                  (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)),
        tri AS (SELECT count(*) AS n_triangles
                FROM edges e1
                JOIN edges e2 ON e1.b = e2.a
                JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b)
        SELECT (SELECT count(*) FROM nodes) AS n_nodes,
               (SELECT count(*) FROM edges) AS n_edges,
               (SELECT n_triangles FROM tri) AS n_triangles
    """,
}


# --- degree distribution ---------------------------------------------------


def graph_degree_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Degree distribution of the customer-supplier graph — the first
    diagnostic before any iterative graph job (max degree bounds the
    hottest key every per-vertex shuffle sees; the histogram predicts
    skew-split behavior).  Two keyed aggregations: degree per node, then
    node count per degree; output is the histogram plus per-side
    (customer/supplier) rows, degree-bounded, never node-bounded."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    nodes = pairs.select(F.col("c").alias("node")).unionByName(
        pairs.select(F.col("s").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy(F.expr("node % 2").cast("long").alias("node_kind"), "degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select("node_kind", F.col("degree").cast("long").alias("degree"), "n_nodes")
    )


QUERIES["graph_degree_stats"] = graph_degree_stats
ORACLES["graph_degree_stats"] = """
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT c AS node FROM pairs UNION ALL SELECT s AS node FROM pairs),
    deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY node)
    SELECT CAST(node % 2 AS BIGINT) AS node_kind,
           CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY node % 2, degree
"""


# --- neighbor-set similarity ----------------------------------------------

JACC_ORDER_MOD = 8  # denser sample than triangles would explode pairs
JACC_MIN_SIM = 0.25
JACC_TOPK = 30


def graph_jaccard_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """Structural node similarity on the co-purchase graph: Jaccard of
    NEIGHBOR SETS, |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — link-prediction's
    baseline feature and the graph cousin of shingle-Jaccard dedup.
    Candidate pairs come only from a shared-neighbor equi-join (two
    edges meeting at a common vertex — never all node pairs); degrees
    join in from a tiny per-node table; top-30 by similarity with an
    id tiebreak."""
    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % JACC_ORDER_MOD == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "o").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    # undirected adjacency: (node, neighbor) both ways
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    # pairs sharing neighbor n: co-membership in n's adjacency list
    p1 = adj.select(F.col("n").alias("w"), F.col("v").alias("x"))
    p2 = adj.select(F.col("n").alias("w"), F.col("v").alias("y"))
    common = (
        p1.join(p2, "w")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("deg").alias("__dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("deg").alias("__dy"))
    sim = (
        common.join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            F.col("__inter").cast("long").alias("n_common"),
            F.round(
                F.col("__inter")
                / (F.col("__dx") + F.col("__dy") - F.col("__inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACC_MIN_SIM)
    )
    return sim.orderBy(F.col("jaccard").desc(), "x", "y").limit(JACC_TOPK)


QUERIES["graph_jaccard_neighbors"] = graph_jaccard_neighbors
ORACLES["graph_jaccard_neighbors"] = f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey
                FROM lineitem WHERE l_orderkey % {JACC_ORDER_MOD} = 0),
    edges AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM li a JOIN li b ON a.o = b.o AND a.l_partkey < b.l_partkey),
    adj AS (SELECT a AS v, b AS n FROM edges
            UNION ALL SELECT b AS v, a AS n FROM edges),
    deg AS (SELECT v, count(*) AS deg FROM adj GROUP BY v),
    common AS (SELECT p1.v AS x, p2.v AS y, count(*) AS inter
               FROM adj p1 JOIN adj p2 ON p1.n = p2.n AND p1.v < p2.v
               GROUP BY p1.v, p2.v),
    sim AS (SELECT c.x, c.y, CAST(c.inter AS BIGINT) AS n_common,
                   round(c.inter / CAST(dx.deg + dy.deg - c.inter AS DOUBLE), 6)
                     AS jaccard
            FROM common c
            JOIN deg dx ON dx.v = c.x
            JOIN deg dy ON dy.v = c.y)
    SELECT x, y, n_common, jaccard FROM sim
    WHERE jaccard >= {JACC_MIN_SIM}
    ORDER BY jaccard DESC, x, y LIMIT {JACC_TOPK}
"""


# --- label propagation communities ------------------------------------------

LPA_ROUNDS = 2


def graph_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    """Two synchronous label-propagation rounds on the customer-supplier
    graph (deterministic min-tiebreak LPA — operators/graph.py), plus
    community sizes: the fourth iterative graph shape next to connected
    components, PageRank, and triangles.  The oracle unrolls the same
    two rounds as CTEs."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import label_propagation

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    lab = label_propagation(edges, rounds=LPA_ROUNDS)
    return lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").alias("min_node"),
    )


QUERIES["graph_label_prop"] = graph_label_prop

_LPA_ROUND = """
    nl{r} AS (SELECT e.src AS node, l{p}.label AS nl
              FROM edges e JOIN l{p} ON l{p}.node = e.dst),
    cnt{r} AS (SELECT node, nl, count(*) AS c FROM nl{r} GROUP BY node, nl),
    l{r} AS (SELECT node, nl AS label FROM (
               SELECT node, nl,
                      row_number() OVER (PARTITION BY node
                                         ORDER BY c DESC, nl) AS rn
               FROM cnt{r}) WHERE rn = 1)
"""

ORACLES["graph_label_prop"] = f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {_LPA_ROUND.format(r=1, p=0)},
    {_LPA_ROUND.format(r=2, p=1)}
    SELECT label, CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_node
    FROM l2 GROUP BY label
"""


# --- convergence-loop PageRank (invariant oracle) --------------------------

#: 5e7 units of 1e-12 = 5e-5 absolute rank tolerance: ~20 damped rounds
#: on this graph — a real convergence loop without a 40-job query.
PR_TOL_SCALED = 5 * 10**7
PR_MAX_ITERS = 60


def _cust_supp_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The bidirectional customer-supplier bipartite graph shared by
    graph_pagerank (fixed 3-iteration oracle form) and the converged
    variant."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def graph_pagerank_converged(spark: SparkSession, sf: str) -> DataFrame:
    """Tolerance-terminated PageRank (VERDICT r3 item 5): iterate until
    max |Δrank| <= 5e-5, then state the invariants a correct power
    iteration must satisfy — the oracle pins them as constants plus the
    SQL-computed node count, so a driver row turns red if the loop ever
    stops converging, leaks mass, or overruns its bound.

    - ``n_nodes``: both engines count the bipartite node set.
    - ``iters_in_bounds``: 1 <= iterations <= 60 (the operator RAISES on
      non-convergence, so a green row proves real termination).
    - ``rank_sum_ok``: total mass within [scale*999/1000, scale] — the
      teleport/share truncations leak < 1 unit per node per round and
      damping caps the steady-state leak at ~1e-6 of scale, so 0.1%% is
      a safe-but-meaningful band.
    - ``ranks_positive``: every node keeps at least the teleport floor.
    """
    edges = _cust_supp_edges(spark, sf)
    ranks, iters = pagerank_converged(
        edges, tol_scaled=PR_TOL_SCALED, max_iterations=PR_MAX_ITERS
    )
    return ranks.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.lit(1 <= iters <= PR_MAX_ITERS).alias("iters_in_bounds"),
        (
            (F.sum("rank_scaled") <= F.lit(PR_SCALE))
            & (F.sum("rank_scaled") >= F.lit(PR_SCALE * 999 // 1000))
        ).alias("rank_sum_ok"),
        (F.min("rank_scaled") > F.lit(0)).alias("ranks_positive"),
    )


QUERIES["pagerank_converged"] = graph_pagerank_converged

ORACLES["pagerank_converged"] = """
    WITH pairs AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    SELECT CAST((SELECT count(DISTINCT c) FROM pairs)
              + (SELECT count(DISTINCT s) FROM pairs) AS BIGINT) AS n_nodes,
           TRUE AS iters_in_bounds,
           TRUE AS rank_sum_ok,
           TRUE AS ranks_positive
"""
