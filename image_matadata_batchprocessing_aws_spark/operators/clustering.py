"""Distributed k-means (Lloyd's) over embedding columns — the trainer
behind an IVF index (SURVEY north star: similarity search at scale).

The reference has no clustering; its nearest analogue is the global-fit
scalers (``Image_Train_Model/train.py:124,127``) whose fit/transform
split this follows: fit = iterative driver loop over tiny aggregates,
transform = one map-side pass.

Spark shape per round (all JVM-side, no Python UDFs):

- **Assignment is a zero-shuffle map pass**: the k centroids are
  collected driver-side (k x dim doubles — broadcast-sized by
  definition), inlined as array literals, and the arg-min over k squared
  L2 distances is a single whole-stage-codegen expression
  (``array_position(dists, array_min(dists))``; first-match = lowest
  centroid id breaks ties deterministically).
- **Update is one slim shuffle**: ``groupBy(cent_id)`` with per-dimension
  ``avg`` — map-side partial aggregation, so the shuffle moves
  k x dim running sums per partition, never vectors.
- Convergence = max centroid L2 shift below ``tol`` (computed on the
  driver from the k-row aggregate), or ``max_iterations``.
- Empty clusters keep their previous centroid (standard Lloyd fallback).

Determinism: init picks the k rows with the smallest ``md5(id, salt)``
(the same engine-portable reproducible-sample primitive as
``operators/sampling.py``) — no RNG, so the whole fit is reproducible
run-to-run given the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64


def _sq_l2_to_literal(vec_col, centroid: list[float]):
    lits = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lits, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def nearest_sq_dist(vec_col, centroids: list[list[float]]):
    """Squared L2 distance to the nearest literal centroid — the per-row
    SSE contribution, as one map-side codegen expression."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array_min(F.array(*[_sq_l2_to_literal(v, c) for c in centroids]))


def sq_dists_array(vec_col, centroids: list[list[float]]):
    """Squared L2 distance to EVERY literal centroid as one array
    expression — lets callers verify an assignment is the argmin
    (``element_at(dists, cluster_id) == array_min(dists)`` is exact:
    both sides read the same computed array)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array(*[_sq_l2_to_literal(v, c) for c in centroids])


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
    out: str = "cluster_id",
) -> DataFrame:
    """Map-side nearest-centroid assignment (squared L2) against literal
    centroids — zero shuffles, one codegen'd expression."""
    vec = F.col(vec_col)
    dists = F.array(*[_sq_l2_to_literal(vec, c) for c in centroids])
    # array_position returns the FIRST index of the minimum (1-based):
    # deterministic lowest-id tie-break
    cid = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn(out, cid)


def kmeans_init(
    df: DataFrame,
    k: int,
    vec_col: str = "e",
    id_col: str = "vec_id",
    salt: str = "kmeans-init",
) -> list[list[float]]:
    """Deterministic farthest-first init (Gonzalez k-center traversal):
    seed 1 = the min-md5(id, salt) row (reproducible, no RNG); each next
    seed = the point farthest from its nearest chosen seed.  One
    map-side pass + 1-row max_by aggregate per seed — k-1 tiny jobs.
    Unlike a pure hash sample, this cannot drop two seeds into the same
    dense blob, so well-separated clusters each get exactly one seed."""
    h = md5_int64(F.concat(F.col(id_col).cast("string"), F.lit("\x1f"), F.lit(salt)))
    # one job serves both the row-count guard and the first seed (r09:
    # previously a limit(k).count() job THEN an orderBy.first() job) —
    # take(k) returns up to k rows, so fewer than k rows IS the guard
    # and row 0 is the min-hash seed, exactly as before
    head = df.select(F.col(vec_col).alias("v"), h.alias("__h")).orderBy("__h").take(k)
    if len(head) < k:
        raise ValueError(f"kmeans_init: k={k} exceeds input row count")
    centroids = [[float(x) for x in head[0]["v"]]]
    vec = F.col(vec_col)
    tie = F.col(id_col)
    while len(centroids) < k:
        nearest = F.array_min(
            F.array(*[_sq_l2_to_literal(vec, c) for c in centroids])
        )
        far = df.select(
            F.max_by(F.struct(vec.alias("v"), tie.alias("i")), F.struct(nearest, -tie))
            .alias("p")
        ).first()
        centroids.append([float(x) for x in far["p"]["v"]])
    return centroids


def kmeans_train(
    df: DataFrame,
    k: int,
    vec_col: str = "e",
    id_col: str = "vec_id",
    max_iterations: int = 20,
    tol: float = 1e-6,
    salt: str = "kmeans-init",
    init_centroids: list[list[float]] | None = None,
) -> tuple[list[list[float]], int]:
    """Fit k centroids with Lloyd's algorithm; returns ``(centroids,
    iterations_run)``.  Centroids are plain Python lists — broadcast-sized
    state that downstream callers inline into :func:`assign_clusters` or
    feed to ``similarity.ivf_assign`` as a centroid frame.  Init is the
    deterministic :func:`kmeans_init` traversal; a caller that already
    ran that traversal (e.g. to report SSE against the init) passes the
    result as ``init_centroids`` so the k+1 init jobs run once, not
    twice — the fit is identical because the traversal is deterministic."""
    centroids = (
        [list(c) for c in init_centroids]
        if init_centroids is not None
        else kmeans_init(df, k, vec_col, id_col, salt)
    )
    if len(centroids) != k:
        raise ValueError(
            f"kmeans_train: init_centroids has {len(centroids)} rows, expected k={k}"
        )
    # dimension comes from the centroids (init is a row of the input, so
    # they agree by construction) — the old select(size(vec)).first()
    # probe job is gone (r09); mixed-dimension centroids would train the
    # wrong model silently, so validate instead of probing
    dim = len(centroids[0])
    if any(len(c) != dim for c in centroids):
        raise ValueError("kmeans_train: init_centroids dimensions disagree")

    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        assigned = assign_clusters(df, centroids, vec_col, "__cid")
        agg = (
            assigned.groupBy("__cid")
            .agg(
                F.count("*").alias("__n"),
                *[
                    F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"__m{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cluster -> keep
        for r in agg:
            new_centroids[r["__cid"]] = [float(r[f"__m{i}"]) for i in range(dim)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new)) ** 0.5
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, iterations


def kmeans_predict(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
    out: str = "cluster_id",
) -> DataFrame:
    """Transform pass: one map-side assignment against the fitted
    centroids (zero shuffles — the IVF write-path building block)."""
    return assign_clusters(df, centroids, vec_col, out)
