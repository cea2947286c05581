"""Similarity search over embedding columns (Stage 5 / north star).

Brute-force top-k is the exactness baseline: broadcast the (small) query
set against the partitioned corpus — a map-side crossJoin, no corpus
shuffle, linear scan per query.  The scale path is sign-random-projection
LSH: a deterministic 8-plane projection assigns every vector a bucket id;
candidate generation is an equi-join on the bucket (shuffle on a tiny
key), and exact scoring runs only within buckets.

All vector math uses JVM higher-order functions over array<double> —
no Python UDFs in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

from image_matadata_batchprocessing_aws_spark.functions import cosine_sim, dot, l2_dist, l2_norm


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def lsh_projections(num_planes: int = 8, dim: int = 64, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes for sign-random-projection LSH (shared
    with SQL oracles — full-precision float literals on both sides)."""
    rng = np.random.RandomState(seed)
    return [[float(v) for v in row] for row in rng.standard_normal((num_planes, dim))]


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "e",
    out: str = "bucket",
    planes: list[list[float]] | None = None,
) -> Column:
    planes = planes or lsh_projections()
    vec = F.col(vec_col)
    bucket = None
    for j, plane in enumerate(planes):
        lits = F.array(*[F.lit(v) for v in plane])
        d = F.aggregate(
            F.zip_with(vec, lits, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        )
        term = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        bucket = term if bucket is None else bucket + term
    return df.withColumn(out, bucket)


def ivf_assign(
    df: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    cent_id: str = "cent_id",
    cent_vec: str = "cv",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (IVF coarse quantization).  ``cents`` must be broadcast-sized (k
    centroids); the assignment is a map-side broadcast crossJoin — the
    corpus is never shuffled, only the small (id, cent_id) output.
    Deterministic tie-break on centroid id.

    Norms are precomputed per side before the crossJoin (cosine =
    dot/(||a||*||b||)) so each pair costs one array pass, not three —
    bit-identical to the naive form (same expression tree per factor)."""
    dn = df.withColumn("__na", l2_norm(F.col(vec_col)))
    cn = cents.withColumn("__nc", l2_norm(F.col(cent_vec)))
    pairs = dn.crossJoin(F.broadcast(cn))
    # Keep ONLY (id, cent_id, sim) through the argmax shuffle — shuffling
    # the vectors themselves would move |df| * k_cents embeddings; the
    # slim projection moves 16-byte rows, and the vectors come back via a
    # broadcast-able join on the id.
    slim = pairs.select(
        F.col(id_col),
        F.col(cent_id),
        F.round(
            dot(F.col(vec_col), F.col(cent_vec)) / (F.col("__na") * F.col("__nc")), 6
        ).alias("__csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__csim").desc(), F.col(cent_id))
    picked = (
        slim.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select(id_col, cent_id)
    )
    return df.join(picked, id_col)


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    metric: str = "cosine",
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_q: str = "qe",
    vec_c: str = "ce",
) -> DataFrame:
    """Exact top-k per query.  ``queries`` must be broadcast-sized;
    ``corpus`` stays partitioned (map-side join, partial top-k per
    partition via the window after AQE coalesces).

    Precondition (``metric="cosine"``): vectors must be non-zero — a
    zero norm makes the score 0/0 = NaN, which both Spark and DuckDB
    rank ABOVE every real score, so a zero corpus vector would top
    every result list.  Filter zero norms upstream (the semantic-dedup
    family does this internally; here the ranking contract makes the
    caller decide).  ``metric="l2"`` is defined for all vectors."""
    pairs = corpus.withColumn("__nc", l2_norm(F.col(vec_c))).crossJoin(
        F.broadcast(queries.withColumn("__nq", l2_norm(F.col(vec_q))))
    )
    return _topk_per_query(pairs, k, metric, query_id, corpus_id, vec_q, vec_c)


def _topk_per_query(
    pairs: DataFrame,
    k: int,
    metric: str,
    query_id: str,
    corpus_id: str,
    vec_q: str,
    vec_c: str,
) -> DataFrame:
    """Exact scoring + deterministic top-k over candidate (query, corpus)
    pairs.  Expects precomputed ``__nq``/``__nc`` norm columns for the
    cosine path (one array pass per pair)."""
    if metric == "cosine":
        # norms precomputed per side: bit-identical to dot/(||q||*||c||)
        score = F.round(
            dot(F.col(vec_q), F.col(vec_c)) / (F.col("__nq") * F.col("__nc")), 6
        )
        order = [F.col("score").desc(), F.col(corpus_id)]
    elif metric == "l2":
        score = F.round(l2_dist(F.col(vec_q), F.col(vec_c)), 6)
        order = [F.col("score").asc(), F.col(corpus_id)]
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = pairs.select(query_id, corpus_id, score.alias("score"))
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            query_id, corpus_id, F.col("score"), F.col("rn").cast("long").alias("rn")
        )
    )


def estimated_rows(df: DataFrame) -> int:
    """Plan-time row estimate from Catalyst statistics — launches NO job.

    Uses the optimized plan's ``rowCount`` when the source provides one
    (CBO stats, local relations), else ``sizeInBytes / schema.defaultSize``
    (file sources report scan bytes).  An estimate is exactly right for a
    strategy pick: a 2x error cannot turn a billion-row corpus into a
    brute-force candidate.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    stats = plan.stats()
    rc = stats.rowCount()
    if rc.isDefined():
        return int(str(rc.get()))
    width = max(1, plan.schema().defaultSize())
    return int(str(stats.sizeInBytes())) // width


def knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    metric: str = "cosine",
    strategy: str = "auto",
    brute_force_limit: int = 100_000,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_q: str = "qe",
    vec_c: str = "ce",
) -> DataFrame:
    """Strategy-selecting kNN — the SURVEY section-4 'custom rewrite rule',
    expressed at the API layer where PySpark can restructure the plan:
    exact brute force while the corpus fits the linear-scan budget, else
    sign-projection LSH bucketing so candidate generation becomes an
    equi-join and each query scans ~1/2^planes of the corpus
    (approximate: recall < 1 for neighbors straddling a hyperplane)."""
    if strategy == "auto":
        # plan-time statistics, never an eager count() job
        strategy = "brute" if estimated_rows(corpus) <= brute_force_limit else "lsh"
    if strategy == "brute":
        return knn_bruteforce(queries, corpus, k, metric, query_id, corpus_id, vec_q, vec_c)
    if strategy != "lsh":
        raise ValueError(f"unknown strategy {strategy!r}")
    qb = add_lsh_bucket(queries.withColumn("__nq", l2_norm(F.col(vec_q))), vec_q, "__bucket")
    cb = add_lsh_bucket(corpus.withColumn("__nc", l2_norm(F.col(vec_c))), vec_c, "__bucket")
    pairs = cb.join(F.broadcast(qb), "__bucket")
    return _topk_per_query(pairs, k, metric, query_id, corpus_id, vec_q, vec_c)


def jl_projections(k: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian projection rows for Johnson-Lindenstrauss
    dimension reduction, scaled 1/sqrt(k) so squared norms are
    preserved in expectation (shared with SQL oracles as full-precision
    literals, the :func:`lsh_projections` convention)."""
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((k, dim)) / np.sqrt(k)
    return [[float(v) for v in row] for row in m]


def jl_project(
    df: DataFrame,
    vec_col: str = "e",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """JOHNSON-LINDENSTRAUSS random projection to ``k`` dims — the
    embedding-side scale lever: pairwise distances survive within
    (1±eps) whp (the JL lemma, property-tested), so brute-force kNN,
    clustering, and dedup candidate generation can run on a k-dim
    sketch at dim/k of the cost BEFORE any trained reducer (PCA/PQ)
    exists.  Pure JVM fold expressions (zip_with + left-fold sum per
    output dim, same IEEE sequence the DuckDB twin runs via
    list_reduce); map-side, no shuffle.

    Returns exploded ``(id, dim_idx, proj_val)`` rows — the layout the
    IVF/PQ operators consume.
    """
    rows = jl_projections(k, dim)
    v = F.col(vec_col)
    dims = [
        F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(x) for x in row]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            round_digits,
        ).alias(f"__p{j}")
        for j, row in enumerate(rows)
    ]
    wide = df.select(F.col(id_col), *dims)
    pairs = F.array(
        *[
            F.struct(F.lit(j).cast("long").alias("dim_idx"), F.col(f"__p{j}").alias("proj_val"))
            for j in range(k)
        ]
    )
    ex = wide.select(id_col, F.explode(pairs).alias("p"))
    return ex.select(
        id_col,
        F.col("p.dim_idx").alias("dim_idx"),
        F.col("p.proj_val").alias("proj_val"),
    )


def jl_project_sql(
    table: str,
    vec_expr: str,
    id_col: str,
    k: int = 8,
    dim: int = 64,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`jl_project` — identical left-fold IEEE
    sequence per output dim via ``list_reduce`` (NOT list_dot_product,
    whose accumulation order is unspecified)."""
    rows = jl_projections(k, dim)

    def fold(row: list[float]) -> str:
        lits = "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"
        return (
            f"round(list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(({vec_expr})[i] AS DOUBLE) * ({lits})[i]), "
            f"(a, b) -> a + b), {round_digits})"
        )

    selects = " UNION ALL ".join(
        f"SELECT {id_col}, CAST({j} AS BIGINT) AS dim_idx, {fold(row)} AS proj_val FROM {table}"
        for j, row in enumerate(rows)
    )
    return selects


def mutual_topk(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "left_id",
    right_id: str = "right_id",
    vec_l: str = "le",
    vec_r: str = "re",
    round_digits: int = 6,
) -> DataFrame:
    """Mutual-nearest-neighbor pair mining with MARGIN scoring — the
    bitext/alignment-mining primitive (Artetxe & Schwenk 2019): a pair
    (l, r) survives only if r is in l's cosine top-k AND l is in r's
    top-k, and the ratio margin
    ``2*cos(l,r) / (mean_topk(l) + mean_topk(r))`` separates genuinely
    aligned pairs from hubs that sit near everything (a hub's own
    top-k mean is high, deflating its margins).

    Built as two :func:`knn_bruteforce` passes (so each side must be
    broadcast-sized here) joined on the pair; at corpus scale swap the
    candidate generator for the IVF/LSH path — the mutual join and the
    margin arithmetic are unchanged, which is the point of composing it
    from the top-k table rather than scoring inside a custom kernel.
    Cosine is symmetric (elementwise products commute, same fold
    order), so the two directions carry the SAME rounded score and the
    join keeps one.

    Returns ``left_id, right_id, score, rn_lr, rn_rl, margin``.
    """
    lq = left.select(F.col(left_id), F.col(vec_l).alias("qe"))
    rc = right.select(F.col(right_id), F.col(vec_r).alias("ce"))
    lr = knn_bruteforce(
        lq, rc, k=k, metric="cosine", query_id=left_id, corpus_id=right_id
    )
    rq = right.select(F.col(right_id), F.col(vec_r).alias("qe"))
    lc = left.select(F.col(left_id), F.col(vec_l).alias("ce"))
    rl = knn_bruteforce(
        rq, lc, k=k, metric="cosine", query_id=right_id, corpus_id=left_id
    )
    # scores are round(x, 6): re-scale to exact BIGINTs so the k-row
    # mean is an integer sum (order-free), THEN divide once
    score_int = F.round(F.col("score") * F.lit(1e6)).cast("long")
    lr_mean = lr.groupBy(left_id).agg(
        (
            F.sum(score_int).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e6))
        ).alias("__mean_l")
    )
    rl_mean = rl.groupBy(right_id).agg(
        (
            F.sum(score_int).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e6))
        ).alias("__mean_r")
    )
    return (
        lr.select(left_id, right_id, "score", F.col("rn").alias("rn_lr"))
        .join(
            rl.select(right_id, left_id, F.col("rn").alias("rn_rl")),
            [left_id, right_id],
        )
        .join(F.broadcast(lr_mean), left_id)
        .join(F.broadcast(rl_mean), right_id)
        .select(
            left_id,
            right_id,
            "score",
            "rn_lr",
            "rn_rl",
            F.round(
                F.lit(2.0) * F.col("score")
                / (F.col("__mean_l") + F.col("__mean_r")),
                round_digits,
            ).alias("margin"),
        )
    )


def knn_distance_outliers(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """Embedding outlier scores by k-NN DISTANCE (Ramaswamy et al.
    2000): a point's distance to its k-th nearest neighbor — large
    k-dist = isolated = mislabeled / off-distribution / garbage
    embedding, the standard pre-training-corpus vector sanity screen.
    Returns the ``top_n`` most isolated points with their k-dist.

    Demo form scores the set against itself with the broadcast
    all-pairs kernel (self-pairs excluded); at corpus scale the
    candidate set comes from the IVF/LSH path instead — k-dist only
    needs the k nearest, which cell probing preserves — and the final
    top-n is the same bounded sort.
    """
    q = vectors.select(F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv"))
    c = vectors.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"))
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("__qid") != F.col("__cid"))
    dist = F.round(l2_dist(F.col("__qv"), F.col("__cv")), 6)
    w = Window.partitionBy("__qid").orderBy(F.col("score").asc(), F.col("__cid"))
    kth = (
        pairs.select("__qid", "__cid", dist.alias("score"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == k)
    )
    return (
        kth.select(
            F.col("__qid").alias(id_col),
            F.col("score").alias("kdist"),
        )
        .orderBy(F.col("kdist").desc(), F.col(id_col))
        .limit(top_n)
    )


def embedding_drift_report(
    old: DataFrame,
    new: DataFrame,
    vec_col: str,
    dim: int,
    value_digits: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Vector-space drift between two embedding snapshots (model
    retrain, new encoder version, corpus shift): centroid L2 shift,
    mean-norm delta, and the single worst-drifting DIMENSION — the
    embedding-space member of the drift family (value-space TV/KS/PSI
    can't see a rotation that preserves marginals).

    Per-dimension sums quantize to scaled BIGINTs (exact, associative);
    centroids divide by counts once; the dim-wise shift argmax ranks a
    dim-sized array.  Two scan aggregates, one 1-row join — scan-bound
    at any scale.
    """
    scale = float(10**value_digits)

    def moments(df, tag):
        qsum = F.array(
            *[
                F.sum(
                    F.round(F.element_at(F.col(vec_col), i + 1) * F.lit(scale)).cast(
                        "long"
                    )
                )
                for i in range(dim)
            ]
        )
        return df.agg(
            F.count(F.lit(1)).alias(f"__n_{tag}"),
            qsum.alias(f"__s_{tag}"),
            F.sum(
                F.round(l2_norm(F.col(vec_col)) * F.lit(scale)).cast("long")
            ).alias(f"__norm_{tag}"),
        )

    j = moments(old, "o").crossJoin(F.broadcast(moments(new, "n")))
    cent_o = F.transform(
        F.col("__s_o"),
        lambda x: x.cast("double") / (F.col("__n_o").cast("double") * F.lit(scale)),
    )
    cent_n = F.transform(
        F.col("__s_n"),
        lambda x: x.cast("double") / (F.col("__n_n").cast("double") * F.lit(scale)),
    )
    diff = F.zip_with(cent_n, cent_o, lambda a, b: a - b)
    shift = F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # worst dim: max over (|diff|, -index) so ties pick the lowest dim
    absdiff = F.transform(diff, lambda x: F.abs(x))
    worst = F.array_max(
        F.zip_with(
            absdiff,
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d, i: F.struct(d.alias("d"), (-i).alias("negi")),
        )
    )
    norm_mean_o = F.col("__norm_o").cast("double") / (
        F.col("__n_o").cast("double") * F.lit(scale)
    )
    norm_mean_n = F.col("__norm_n").cast("double") / (
        F.col("__n_n").cast("double") * F.lit(scale)
    )
    return j.select(
        F.col("__n_o").cast("long").alias("n_old"),
        F.col("__n_n").cast("long").alias("n_new"),
        F.round(shift, round_digits).alias("centroid_shift"),
        F.round(norm_mean_n - norm_mean_o, round_digits).alias("mean_norm_delta"),
        F.round(worst["d"], round_digits).alias("worst_dim_shift"),
        (-worst["negi"]).cast("long").alias("worst_dim"),
    )


def knn_distance_outliers_bucketed(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    k: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """The corpus-scale form of :func:`knn_distance_outliers`:
    candidate pairs come only from the same coarse cell (IVF
    assignment, LSH bucket — any equi-joinable locality key), so the
    pair count is sum of cell-size^2 instead of N^2.  k-dist is then
    an UPPER bound (true neighbors outside the cell are unseen), which
    for outlier SCREENING is the right direction — isolated points
    only look more isolated.  Vectors in cells with <= k members emit
    kdist = NULL (not silently dropped): a cell too small to certify k
    neighbors is itself an isolation signal, reported as such.
    """
    v = vectors.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), F.col(cell_col).alias("__cell")
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__cell") == F.col("b.__cell")) & (F.col("a.__id") != F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("__qid"),
        F.col("b.__id").alias("__cid"),
        F.round(l2_dist(F.col("a.__v"), F.col("b.__v")), 6).alias("score"),
    )
    w = Window.partitionBy("__qid").orderBy(F.col("score").asc(), F.col("__cid"))
    kth = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == k)
        .select(F.col("__qid").alias("__id"), F.col("score").alias("kdist"))
    )
    scored = v.select("__id").join(kth, "__id", "left")
    return (
        scored.select(F.col("__id").alias(id_col), "kdist")
        .orderBy(F.col("kdist").desc_nulls_first(), F.col(id_col))
        .limit(top_n)
    )
