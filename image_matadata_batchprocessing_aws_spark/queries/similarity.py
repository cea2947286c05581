"""Similarity-search queries over embeddings (Stage 5).

Brute-force kNN (cosine + L2) with bit-matched DuckDB oracles, the
LSH-bucketed ANN variant (deterministic hyperplanes inlined on both
sides), and embedding statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.functions import dot, l2_norm
from pyspark.sql import Window

from image_matadata_batchprocessing_aws_spark.operators.similarity import (
    add_lsh_bucket,
    as_double_array,
    cosine_sim,
    ivf_assign,
    knn_bruteforce,
    lsh_projections,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

K = 5
N_QUERIES = 10
CENT_MOD = 37  # centroids = corpus vectors with vec_id % CENT_MOD == 0
NPROBE = 2


def _qc(spark: SparkSession, sf: str):
    e = t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qe")
    )
    c = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), as_double_array("embedding").alias("ce")
    )
    return q, c


def knn_brute_cosine(spark: SparkSession, sf: str) -> DataFrame:
    q, c = _qc(spark, sf)
    return knn_bruteforce(q, c, k=K, metric="cosine")


def knn_brute_l2(spark: SparkSession, sf: str) -> DataFrame:
    q, c = _qc(spark, sf)
    return knn_bruteforce(q, c, k=K, metric="l2")


def ann_lsh_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """ANN via sign-random-projection buckets: candidates = same bucket;
    exact cosine re-scoring within the bucket only."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    b = add_lsh_bucket(e, "e", "bucket")
    q = b.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("bucket")
    )
    c = b.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("bucket")
    )
    return (
        c.join(F.broadcast(q), "bucket")
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket"),
            F.round(cosine_sim(F.col("qe"), F.col("ce")), 6).alias("score"),
        )
    )


def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids (corpus vectors with
    ``vec_id % CENT_MOD == 0``), corpus assigned to its nearest centroid
    map-side (broadcast), queries probe the NPROBE nearest cells, exact
    cosine re-scoring + top-k inside the probed cells only.

    Scale path vs brute force: per query the scan shrinks from |corpus| to
    the probed cells (~ NPROBE/k_cents of the data), and every join is on
    the tiny ``cent_id`` key.  (Mod-sampled centroids keep this query
    SQL-oracle-able; the production centroid source is
    ``operators/clustering.kmeans_train`` — same broadcast shape.)"""
    e = t(spark, sf, "embeddings").select("vec_id", as_double_array("embedding").alias("e"))
    corpus = e.where(F.col("vec_id") >= N_QUERIES)
    cents = corpus.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("cv")
    )
    cells = ivf_assign(
        corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")),
        cents,
        id_col="neighbor_id",
        vec_col="ce",
        nprobe=1,
    )
    qs = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    probes = ivf_assign(qs, cents, id_col="query_id", vec_col="qe", nprobe=NPROBE)
    scored = (
        probes.withColumn("__nq", l2_norm(F.col("qe")))
        .join(cells.withColumn("__nc", l2_norm(F.col("ce"))), "cent_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qe"), F.col("ce")) / (F.col("__nq") * F.col("__nc")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "score", F.col("rn").cast("long").alias("rn"))
    )


def embedding_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus: map-side
    literal-centroid assignment (zero shuffle), slim per-dimension avg
    update (one shuffle/round), deterministic farthest-first init.

    FULL invariant oracle (upgraded from rows-only, VERDICT r3 item 7):
    the genuinely-iterative fit can't be a CTE, but its defining
    properties CAN be stated as constants the driver hash-checks —
    every row's assignment is the argmin over the FINAL centroids
    (``element_at(dists, cluster_id) == array_min(dists)``, exact: both
    sides read one computed array), SSE is monotone vs the fit's own
    init, the cluster count stays <= k, and every corpus row is
    assigned (n_total is SQL-computed).  Algorithmic correctness on
    planted clusters stays property-tested (tests/test_clustering.py)."""
    from image_matadata_batchprocessing_aws_spark.operators.clustering import (
        kmeans_init,
        kmeans_predict,
        kmeans_train,
        nearest_sq_dist,
        sq_dists_array,
    )

    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        track_persist,
    )

    K_FIT = 4
    # the fit re-scans this frame ~k+iterations times (init traversal +
    # one Lloyd round each) — persist the pruned (id, vec) projection so
    # every pass reads cached columns instead of re-decoding parquet
    # (released by the caller's release_persisted(), the house pattern)
    e = track_persist(
        t(spark, sf, "embeddings").select(
            "vec_id", as_double_array("embedding").alias("e")
        )
    )
    # small k / few rounds: each round recompiles the literal-centroid
    # codegen expression, so the fixed cost per round dominates at test
    # scale (at production scale it amortizes over the scan)
    init = kmeans_init(e, K_FIT, vec_col="e", id_col="vec_id")
    cents, iters = kmeans_train(
        e,
        k=K_FIT,
        vec_col="e",
        id_col="vec_id",
        max_iterations=6,
        tol=1e-4,
        init_centroids=init,
    )
    assigned = kmeans_predict(e, cents, "e", "cluster_id").withColumn(
        "__dists", sq_dists_array("e", cents)
    )
    per_cluster = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n"),
        F.sum(
            (
                F.element_at("__dists", (F.col("cluster_id") + 1).cast("int"))  # 0-based id
                != F.array_min("__dists")
            ).cast("long")
        ).alias("viol"),
    )
    sse = e.agg(
        F.sum(nearest_sq_dist("e", init)).alias("sse_init"),
        F.sum(nearest_sq_dist("e", cents)).alias("sse_final"),
    )
    return per_cluster.agg(
        F.sum("n").cast("long").alias("n_total"),
        (F.count("*") <= F.lit(K_FIT)).alias("k_bounded"),
        F.sum("viol").cast("long").alias("argmin_violations"),
        F.lit(1 <= iters <= 6).alias("iters_bounded"),
    ).crossJoin(
        F.broadcast(
            sse.select((F.col("sse_final") <= F.col("sse_init")).alias("sse_monotone"))
        )
    )


def embedding_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end: k-means cluster the
    corpus, near-identical pairs searched WITHIN clusters only (N^2/k
    pair evaluations, equi-join on cluster_id), star-contraction group
    resolution, keep-min-per-group.  Iterative k-means inside — rows-only
    driver check; recall on planted near-copies is property-tested
    (tests/test_semdedup.py)."""
    from image_matadata_batchprocessing_aws_spark.operators.clustering import kmeans_train
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import semantic_dedup

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    cents, _ = kmeans_train(
        e, k=4, vec_col="e", id_col="vec_id", max_iterations=4, tol=1e-4
    )
    out = semantic_dedup(e, cents, vec_col="e", id_col="vec_id", threshold=0.95)
    return out.select("vec_id", "component", "keep")


CENT_MOD_KM = 100  # deterministic centroids: vec_id % 100 == 0 (5 of 500)
#: Within-cluster pair cut.  The synthetic embeddings carry no planted
#: near-copies, so production-style 0.95 yields ZERO pairs and the
#: components/keep stages would never run — 0.3 densifies the graph into
#: real multi-member groups (same move as dedup_components'
#: CC_COSINE_THRESHOLD) so the oracle exercises the whole pipeline.
SEM_THRESHOLD = 0.3


def _fixed_centroids(e: DataFrame) -> list[list[float]]:
    """Mod-sampled deterministic centroids, collected driver-side (k x dim
    doubles — the same broadcast-sized state kmeans_train produces).
    SQL-expressible, so queries built on them get FULL oracles."""
    rows = (
        e.where(F.col("vec_id") % CENT_MOD_KM == 0)
        .orderBy("vec_id")
        .select("e")
        .collect()
    )
    return [[float(x) for x in r["e"]] for r in rows]


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )


def kmeans_round_update(spark: SparkSession, sf: str) -> DataFrame:
    """ONE Lloyd round with a full oracle: deterministic mod-sampled
    centroids, the real map-side literal-centroid assignment
    (:func:`assign_clusters` — zero shuffle), and the real slim update
    shuffle (groupBy + per-dimension avg, map-side partials), exactly the
    per-round plan :func:`kmeans_train` executes.  The ITERATION is the
    only part left to the rows-only/property-tested ``embedding_kmeans``;
    every building block gets an exact DuckDB row here.  Output per
    cluster: size + the updated centroid compressed to two exact scalars
    (L2 norm and coordinate sum, round-6 both sides)."""
    from image_matadata_batchprocessing_aws_spark.operators.clustering import (
        assign_clusters,
    )

    e = _emb(spark, sf)
    cents = _fixed_centroids(e)
    dim = len(cents[0])
    assigned = assign_clusters(e, cents, "e", "cluster_id")
    agg = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n"),
        *[
            F.avg(F.element_at(F.col("e"), i + 1)).alias(f"__m{i}")
            for i in range(dim)
        ],
    )
    norm_sq = None
    coord_sum = None
    for i in range(dim):
        m = F.col(f"__m{i}")
        norm_sq = m * m if norm_sq is None else norm_sq + m * m
        coord_sum = m if coord_sum is None else coord_sum + m
    return agg.select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("n").cast("long").alias("n"),
        F.round(F.sqrt(norm_sq), 6).alias("centroid_norm"),
        F.round(coord_sum, 6).alias("centroid_sum"),
    )


def semdedup_fixed_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup with the iterative fit factored out: the full
    cluster-bounded pipeline (map-side assignment, within-cluster pair
    equi-join, star-contraction components, keep-min) runs on
    deterministic mod-sampled centroids, which makes every stage
    SQL-expressible — the driver gets an EXACT oracle row for the whole
    semantic-dedup machinery (components via DuckDB recursive CTE).
    ``embedding_semdedup`` keeps the kmeans-trained, rows-only variant."""
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import (
        semantic_dedup,
    )

    e = _emb(spark, sf)
    cents = _fixed_centroids(e)
    out = semantic_dedup(e, cents, vec_col="e", id_col="vec_id", threshold=SEM_THRESHOLD)
    return out.select("vec_id", "component", "keep")


def kmeans_invariants(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-checkable invariants of the FULL iterative fit: Lloyd's
    defining property is monotone SSE improvement over its own init, and
    the deterministic farthest-first init plus non-empty-cluster fallback
    pin the cluster count to exactly k.  The oracle states the invariants
    as constants (plus the SQL-computed corpus size), so a driver row
    turns red if the iteration ever regresses — strictly stronger than
    the rows-only check the trained variant used to carry."""
    from image_matadata_batchprocessing_aws_spark.operators.clustering import (
        kmeans_init,
        kmeans_predict,
        kmeans_train,
        nearest_sq_dist,
    )

    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        track_persist,
    )

    K_FIT = 4
    e = track_persist(_emb(spark, sf))
    init = kmeans_init(e, K_FIT, vec_col="e", id_col="vec_id")
    final, _ = kmeans_train(
        e,
        k=K_FIT,
        vec_col="e",
        id_col="vec_id",
        max_iterations=6,
        tol=1e-4,
        init_centroids=init,
    )
    sse = e.agg(
        F.sum(nearest_sq_dist("e", init)).alias("sse_init"),
        F.sum(nearest_sq_dist("e", final)).alias("sse_final"),
    )
    sizes = (
        kmeans_predict(e, final, "e", "cluster_id")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .agg(F.count("*").alias("k_clusters"), F.sum("n").alias("n_total"))
    )
    return sizes.crossJoin(sse).select(
        F.col("n_total").cast("long").alias("n_total"),
        (F.col("k_clusters") <= F.lit(K_FIT)).alias("k_bounded"),
        (F.col("sse_final") <= F.col("sse_init")).alias("sse_monotone"),
    )


#: PQ geometry for the 64-dim embeddings: 4 subspaces of 16 dims;
#: codewords = corpus vectors with vec_id % 29 == 3 (deterministic
#: mod-sample keeps the oracle exact; production = per-subspace k-means).
PQ_SUB = 4
PQ_SUBDIM = 16
PQ_CW_MOD = 29
PQ_CW_REM = 3


def ann_pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (operators/pq.py): corpus vectors compress to 4 codeword ids; each
    query precomputes a broadcast distance table to every codeword and
    ranks candidates by the SUM of 4 scaled-long table lookups — no
    per-candidate float vector math, bit-exact across engines because
    the ADC sum is integer.  Complements ann_ivf (pruning) as the
    compression half of the published IVFPQ construction."""
    from image_matadata_batchprocessing_aws_spark.operators.pq import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    corpus = e.where(F.col("vec_id") >= N_QUERIES)
    cb = pq_codebook(
        corpus.where(F.col("vec_id") % PQ_CW_MOD == PQ_CW_REM),
        "vec_id",
        "e",
        PQ_SUB,
        PQ_SUBDIM,
    )
    codes = pq_encode(corpus, cb, "vec_id", "e", PQ_SUB, PQ_SUBDIM)
    qs = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return pq_adc_topk(
        qs, codes, cb, "query_id", "qe", "vec_id", PQ_SUB, PQ_SUBDIM, K
    )


def ann_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """The composed IVFPQ construction (Jégou et al., public): IVF cells
    prune WHICH vectors each query touches (nprobe of the coarse cells),
    PQ/ADC compresses HOW the survivors are scored (scaled-long table
    lookups, no per-candidate float math).  Per query the ADC work is
    nprobe/k_cents of the corpus; every join key is a tiny id (cent_id /
    (s, cw_id)); the codebook and query-distance tables broadcast.  The
    whole composition stays SQL-expressible, so the driver gets an exact
    oracle row for the full index shape."""
    from image_matadata_batchprocessing_aws_spark.operators.pq import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    corpus = e.where(F.col("vec_id") >= N_QUERIES)
    cents = corpus.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("cv")
    )
    cells = ivf_assign(
        corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")),
        cents,
        id_col="neighbor_id",
        vec_col="ce",
        nprobe=1,
    ).select("cent_id", "neighbor_id")
    cb = pq_codebook(
        corpus.where(F.col("vec_id") % PQ_CW_MOD == PQ_CW_REM),
        "vec_id",
        "e",
        PQ_SUB,
        PQ_SUBDIM,
    )
    codes = pq_encode(corpus, cb, "vec_id", "e", PQ_SUB, PQ_SUBDIM)
    qs = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    probes = ivf_assign(qs, cents, id_col="query_id", vec_col="qe", nprobe=NPROBE)
    cand = probes.select("cent_id", "query_id").join(cells, "cent_id").select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    return pq_adc_topk(
        qs, codes, cb, "query_id", "qe", "vec_id", PQ_SUB, PQ_SUBDIM, K,
        candidates=cand,
    )


def embedding_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings").select(
        "label", l2_norm(as_double_array("embedding")).alias("norm")
    )
    return e.groupBy("label").agg(
        F.count("*").alias("n"), F.round(F.avg("norm"), 4).alias("avg_norm")
    )


QUERIES = {
    "knn_brute_cosine": knn_brute_cosine,
    "knn_brute_l2": knn_brute_l2,
    "ann_lsh_bucket": ann_lsh_bucket,
    "ann_ivf": ann_ivf,
    "ann_pq_adc": ann_pq_adc,
    "ann_ivfpq": ann_ivfpq,
    "embedding_kmeans": embedding_kmeans,
    "embedding_stats": embedding_stats,
    "embedding_semdedup": embedding_semdedup,
    "kmeans_round_update": kmeans_round_update,
    "kmeans_invariants": kmeans_invariants,
    "semdedup_fixed_centroids": semdedup_fixed_centroids,
}

# Shared CTE prefix: deterministic mod-sampled centroids (cid = dense rank
# by vec_id, matching the collect-then-index order on the Spark side) and
# nearest-centroid assignment by L2 with lowest-cid tie-break — the SQL
# twin of assign_clusters over _fixed_centroids.
_ASSIGN_CTES = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS cv
              FROM v WHERE vec_id % {CENT_MOD_KM} = 0),
    dists AS (SELECT v.vec_id, c.cid,
                     row_number() OVER (PARTITION BY v.vec_id
                                        ORDER BY list_distance(v.e, c.cv), c.cid) AS rn
              FROM v CROSS JOIN cents c),
    assigned AS (SELECT vec_id, cid FROM dists WHERE rn = 1)"""


def _proj_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"


def _ann_oracle() -> str:
    planes = lsh_projections()
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, {_proj_sql(p)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        b AS (SELECT vec_id, e, CAST({terms} AS BIGINT) AS bucket FROM v),
        q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, e AS ce, bucket FROM b WHERE vec_id >= {N_QUERIES})
        SELECT q.query_id, c.neighbor_id, q.bucket,
               round(list_cosine_similarity(qe, ce), 6) AS score
        FROM c JOIN q ON c.bucket = q.bucket
    """


ORACLES = {
    "knn_brute_cosine": f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id >= {N_QUERIES}),
        s AS (SELECT query_id, neighbor_id,
                     round(list_cosine_similarity(qe, ce), 6) AS score
              FROM q CROSS JOIN c),
        r AS (SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rn
              FROM s)
        SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= {K}
    """,
    "knn_brute_l2": f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id >= {N_QUERIES}),
        s AS (SELECT query_id, neighbor_id,
                     round(list_distance(qe, ce), 6) AS score
              FROM q CROSS JOIN c),
        r AS (SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score ASC, neighbor_id) AS rn
              FROM s)
        SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= {K}
    """,
    "ann_lsh_bucket": _ann_oracle(),
    "ann_ivfpq": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, e AS cv FROM v
                  WHERE vec_id >= {N_QUERIES} AND vec_id % {CENT_MOD} = 0),
        corpus AS (SELECT vec_id, e FROM v WHERE vec_id >= {N_QUERIES}),
        ca AS (SELECT vec_id, cent_id,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY round(list_cosine_similarity(e, cv), 6) DESC,
                                                  cent_id) AS rn
               FROM corpus CROSS JOIN cents),
        cells AS (SELECT vec_id AS neighbor_id, cent_id FROM ca WHERE rn <= 1),
        q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < {N_QUERIES}),
        qa AS (SELECT query_id, cent_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY round(list_cosine_similarity(e, cv), 6) DESC,
                                                  cent_id) AS rn
               FROM q CROSS JOIN cents),
        probes AS (SELECT query_id, cent_id FROM qa WHERE rn <= {NPROBE}),
        cand AS (SELECT p.query_id, c.neighbor_id
                 FROM probes p JOIN cells c USING (cent_id)),
        subs AS (SELECT CAST(unnest(range({PQ_SUB})) AS INTEGER) AS s),
        cw AS (SELECT s, vec_id AS cw_id, e[s*{PQ_SUBDIM}+1 : s*{PQ_SUBDIM}+{PQ_SUBDIM}] AS cv
               FROM corpus CROSS JOIN subs
               WHERE vec_id % {PQ_CW_MOD} = {PQ_CW_REM}),
        csub AS (SELECT vec_id, s, e[s*{PQ_SUBDIM}+1 : s*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sv
                 FROM corpus CROSS JOIN subs),
        cdist AS (SELECT vec_id, s, cw_id,
                         round(list_distance(sv, cv), 6) AS d
                  FROM csub JOIN cw USING (s)),
        codes AS (SELECT vec_id, s, cw_id FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                                  ORDER BY d, cw_id) AS rn
                     FROM cdist)
                  WHERE rn = 1),
        qsub AS (SELECT query_id, s, e[s*{PQ_SUBDIM}+1 : s*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sv
                 FROM q CROSS JOIN subs),
        qdist AS (SELECT query_id, s, cw_id,
                         CAST(round(list_distance(sv, cv) * {1_000_000}) AS BIGINT) AS qd
                  FROM qsub JOIN cw USING (s)),
        adc AS (SELECT cand.query_id, cand.neighbor_id,
                       CAST(sum(qd) AS BIGINT) AS adc_scaled
                FROM cand
                JOIN codes ON cand.neighbor_id = codes.vec_id
                JOIN qdist ON cand.query_id = qdist.query_id
                          AND codes.s = qdist.s AND codes.cw_id = qdist.cw_id
                GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adc_scaled, rn FROM
          (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_scaled, neighbor_id) AS BIGINT) AS rn
           FROM adc)
        WHERE rn <= {K}
    """,
    "ann_pq_adc": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        corpus AS (SELECT * FROM v WHERE vec_id >= {N_QUERIES}),
        subs AS (SELECT CAST(unnest(range({PQ_SUB})) AS INTEGER) AS s),
        cw AS (SELECT s, vec_id AS cw_id, e[s*{PQ_SUBDIM}+1 : s*{PQ_SUBDIM}+{PQ_SUBDIM}] AS cv
               FROM corpus CROSS JOIN subs
               WHERE vec_id % {PQ_CW_MOD} = {PQ_CW_REM}),
        csub AS (SELECT vec_id, s, e[s*{PQ_SUBDIM}+1 : s*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sv
                 FROM corpus CROSS JOIN subs),
        cdist AS (SELECT vec_id, s, cw_id,
                         round(list_distance(sv, cv), 6) AS d
                  FROM csub JOIN cw USING (s)),
        codes AS (SELECT vec_id, s, cw_id FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                                  ORDER BY d, cw_id) AS rn
                     FROM cdist)
                  WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < {N_QUERIES}),
        qsub AS (SELECT query_id, s, e[s*{PQ_SUBDIM}+1 : s*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sv
                 FROM q CROSS JOIN subs),
        qdist AS (SELECT query_id, s, cw_id,
                         CAST(round(list_distance(sv, cv) * {1_000_000}) AS BIGINT) AS qd
                  FROM qsub JOIN cw USING (s)),
        adc AS (SELECT query_id, c.vec_id AS neighbor_id,
                       CAST(sum(qd) AS BIGINT) AS adc_scaled
                FROM codes c JOIN qdist USING (s, cw_id)
                GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adc_scaled, rn FROM
          (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_scaled, neighbor_id) AS BIGINT) AS rn
           FROM adc)
        WHERE rn <= {K}
    """,
    "ann_ivf": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        cents AS (SELECT vec_id AS cent_id, e AS cv FROM v
                  WHERE vec_id >= {N_QUERIES} AND vec_id % {CENT_MOD} = 0),
        corpus AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= {N_QUERIES}),
        ca AS (SELECT neighbor_id, ce, cent_id,
                      row_number() OVER (PARTITION BY neighbor_id
                                         ORDER BY round(list_cosine_similarity(ce, cv), 6) DESC,
                                                  cent_id) AS rn
               FROM corpus CROSS JOIN cents),
        cells AS (SELECT neighbor_id, ce, cent_id FROM ca WHERE rn <= 1),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
        qa AS (SELECT query_id, qe, cent_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY round(list_cosine_similarity(qe, cv), 6) DESC,
                                                  cent_id) AS rn
               FROM q CROSS JOIN cents),
        probes AS (SELECT query_id, qe, cent_id FROM qa WHERE rn <= {NPROBE}),
        s AS (SELECT p.query_id, c.neighbor_id,
                     round(list_cosine_similarity(p.qe, c.ce), 6) AS score
              FROM probes p JOIN cells c ON p.cent_id = c.cent_id),
        r AS (SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rn
              FROM s)
        SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= {K}
    """,
    "embedding_stats": """
        SELECT label, count(*) AS n,
               round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
        FROM embeddings GROUP BY label
    """,
    "kmeans_round_update": f"""
        WITH {_ASSIGN_CTES},
        dims AS (SELECT a.cid, t.i, avg(v.e[CAST(t.i AS INT)]) AS m
                 FROM assigned a JOIN v USING (vec_id)
                 CROSS JOIN range(1, 65) t(i)
                 GROUP BY a.cid, t.i),
        upd AS (SELECT cid, sqrt(sum(m * m)) AS nrm, sum(m) AS s
                FROM dims GROUP BY cid),
        sz AS (SELECT cid, count(*) AS n FROM assigned GROUP BY cid)
        SELECT CAST(sz.cid AS BIGINT) AS cluster_id, CAST(sz.n AS BIGINT) AS n,
               round(upd.nrm, 6) AS centroid_norm, round(upd.s, 6) AS centroid_sum
        FROM sz JOIN upd USING (cid)
    """,
    "semdedup_fixed_centroids": f"""
        WITH RECURSIVE {_ASSIGN_CTES},
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM assigned a
              JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
              JOIN v va ON va.vec_id = a.vec_id
              JOIN v vb ON vb.vec_id = b.vec_id
              WHERE list_dot_product(va.e, va.e) <> 0
                AND list_dot_product(vb.e, vb.e) <> 0
                AND round(list_cosine_similarity(va.e, vb.e), 6) >= {SEM_THRESHOLD}),
        edges AS (SELECT id_a AS ea, id_b AS eb FROM p
                  UNION ALL SELECT id_b AS ea, id_a AS eb FROM p),
        reach(src, node) AS (
            SELECT ea AS src, ea AS node FROM edges
            UNION
            SELECT r.src, g.eb FROM reach r JOIN edges g ON r.node = g.ea),
        comp AS (SELECT src AS vec_id, min(node) AS component
                 FROM reach GROUP BY src)
        SELECT v.vec_id,
               CAST(coalesce(c.component, v.vec_id) AS BIGINT) AS component,
               v.vec_id = coalesce(c.component, v.vec_id) AS keep
        FROM v LEFT JOIN comp c ON v.vec_id = c.vec_id
    """,
    "kmeans_invariants": """
        SELECT (SELECT count(*) FROM embeddings) AS n_total,
               TRUE AS k_bounded,
               TRUE AS sse_monotone
    """,
    "embedding_kmeans": """
        SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_total,
               TRUE AS k_bounded,
               CAST(0 AS BIGINT) AS argmin_violations,
               TRUE AS iters_bounded,
               TRUE AS sse_monotone
    """,
}


def eval_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Index-quality evaluation as a first-class query: recall@k of the
    composed IVFPQ index against exact L2 ground truth, per query.  The
    approximation error has two controlled sources (cells not probed,
    ADC quantization), and both engines compute the identical pair of
    rankings, so the recall numbers are bit-exact — the evaluation
    harness a production ANN deployment runs after every index build.

    Expected magnitude on THIS corpus: the synthetic embeddings are
    i.i.d. gaussian (no cluster structure for IVF to exploit), so
    recall@5 sits near the probed-fraction baseline (~0.14 at sf0.01
    with nprobe=2 of ~13 cells) — low recall here is a property of
    unstructured data, exactly what the harness should report; on
    clustered real embeddings the same index shape recovers high
    recall, and that difference is the point of measuring."""
    truth = knn_brute_l2(spark, sf).select("query_id", "neighbor_id")
    approx = ann_ivfpq(spark, sf).select("query_id", "neighbor_id")
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    per_q = (
        truth.select("query_id")
        .distinct()
        .join(hits.groupBy("query_id").agg(F.count("*").alias("n_hits")), "query_id", "left")
    )
    n = F.coalesce("n_hits", F.lit(0))
    return per_q.select(
        "query_id",
        n.cast("long").alias("n_hits"),
        F.round(n / K, 2).alias("recall"),
    )


QUERIES["eval_ann_recall"] = eval_ann_recall
ORACLES["eval_ann_recall"] = f"""
    WITH truth AS ({ORACLES["knn_brute_l2"]}),
    approx AS ({ORACLES["ann_ivfpq"]}),
    hits AS (SELECT t.query_id, count(*) AS n_hits
             FROM truth t JOIN approx a
               ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
             GROUP BY 1)
    SELECT q.query_id,
           CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
           round(coalesce(n_hits, 0) / {K}, 2) AS recall
    FROM (SELECT DISTINCT query_id FROM truth) q
    LEFT JOIN hits USING (query_id)
"""


# --- NDCG@K of the IVFPQ ranking ------------------------------------------

#: Rank discounts 1/log2(rank+1), quantized to exact 2^40-scaled BIGINTs
#: computed ONCE in Python and embedded as literals in both engines — the
#: DCG sum is then pure integer arithmetic (associative, order-free) and
#: the only float op is the final dcg/idcg division.  No engine-side
#: log() anywhere, so no cross-engine last-ulp roulette.
import math

NDCG_SCALE = 1 << 40
NDCG_DISCOUNT = [round(NDCG_SCALE / math.log2(i + 1)) for i in range(1, K + 1)]
#: Ideal DCG: the true top-K in perfect order (graded relevance K..1).
NDCG_IDEAL = sum((K - i) * NDCG_DISCOUNT[i] for i in range(K))


def eval_ann_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """Graded ranking quality of the IVFPQ index: NDCG@K against exact
    L2 ground truth (relevance of true rank r = K-r+1, 0 for misses) —
    the order-sensitive companion to recall@k (`eval_ann_recall`): recall
    only counts set overlap; NDCG also pays for returning the right
    neighbors in the wrong order."""
    truth = knn_brute_l2(spark, sf).select(
        "query_id", "neighbor_id", (F.lit(K) - F.col("rn") + 1).alias("rel")
    )
    approx = ann_ivfpq(spark, sf).select("query_id", "neighbor_id", "rn")
    disc = F.array(*[F.lit(d) for d in NDCG_DISCOUNT])
    scored = approx.join(truth, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        (
            F.coalesce("rel", F.lit(0)) * F.element_at(disc, F.col("rn").cast("int"))
        ).alias("__gain"),
    )
    per_q = (
        approx.select("query_id")
        .distinct()
        .join(scored.groupBy("query_id").agg(F.sum("__gain").alias("__dcg")), "query_id", "left")
    )
    dcg = F.coalesce("__dcg", F.lit(0))
    return per_q.select(
        "query_id",
        dcg.cast("long").alias("dcg_q"),
        F.round(dcg / F.lit(float(NDCG_IDEAL)), 6).alias("ndcg"),
    )


QUERIES["eval_ann_ndcg"] = eval_ann_ndcg

_NDCG_DISC_CASE = " ".join(
    f"WHEN {i + 1} THEN CAST({d} AS BIGINT)" for i, d in enumerate(NDCG_DISCOUNT)
)

ORACLES["eval_ann_ndcg"] = f"""
    WITH truth AS ({ORACLES["knn_brute_l2"]}),
    approx AS ({ORACLES["ann_ivfpq"]}),
    scored AS (
      SELECT a.query_id,
             coalesce({K} - t.rn + 1, 0)
               * (CASE a.rn {_NDCG_DISC_CASE} END) AS gain
      FROM approx a LEFT JOIN truth t
        ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id),
    dcg AS (SELECT query_id, sum(gain) AS dcg_q FROM scored GROUP BY query_id)
    SELECT q.query_id,
           CAST(coalesce(dcg_q, 0) AS BIGINT) AS dcg_q,
           round(CAST(coalesce(dcg_q, 0) AS DOUBLE) / {float(NDCG_IDEAL)!r}, 6) AS ndcg
    FROM (SELECT DISTINCT query_id FROM approx) q
    LEFT JOIN dcg USING (query_id)
"""


# --- int8 scalar quantization ---------------------------------------------


def embedding_int8_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus — the 4x storage
    cut every vector store applies before PQ: per-vector symmetric scale
    (maxabs/127), quantized codes q = round(x/scale), map-side only.
    Output per vector: the scale, the quantized L1 mass (an
    integer-exact code checksum), and the max absolute reconstruction
    error |x - q*scale| (rounded 6) — the fidelity bound callers
    threshold on.  Every op is a fixed scalar sequence on both engines;
    no shuffle, no UDF."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    maxabs = F.array_max(F.transform("e", F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform("e", lambda x: F.round(x / scale).cast("int"))
    recon_err = F.array_max(
        F.zip_with("e", q, lambda x, c: F.abs(x - c.cast("double") * scale))
    )
    l1 = F.aggregate(q, F.lit(0).cast("long"), lambda acc, c: acc + F.abs(c))
    return e.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        l1.alias("code_l1"),
        F.round(recon_err, 6).alias("max_err"),
    )


QUERIES["embedding_int8_quantize"] = embedding_int8_quantize
ORACLES["embedding_int8_quantize"] = """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
          FROM v),
    q AS (SELECT vec_id, e, scale,
                 list_transform(e, x -> CAST(round(x / scale) AS INT)) AS codes
          FROM s)
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) AS code_l1,
           round(list_max(list_transform(list_zip(e, codes),
                 p -> abs(p[1] - CAST(p[2] AS DOUBLE) * scale))), 6) AS max_err
    FROM q
"""
