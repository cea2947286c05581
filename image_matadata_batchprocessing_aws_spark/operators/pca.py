"""Distributed PCA: top principal component by power iteration over the
scatter matrix, in deterministic fixed-point arithmetic.

The training-data use case: find the dominant direction of an embedding
corpus (for whitening, anisotropy diagnostics — "all-but-the-top" style
postprocessing — or as the split axis for spill-free partitioning).
MLlib's RowMatrix.computePrincipalComponents collects a covariance
matrix and runs LAPACK driver-side; the shape here is the same —
dxd scatter built distributed, iteration over the tiny matrix — but
every arithmetic step is scaled-BIGINT so the result is bit-identical
across engines AND partitionings (the ``pagerank_scaled`` /
``hits_scaled`` playbook; floats would differ in final ulps between
Spark and the DuckDB oracle).

Determinism rules used throughout:
- values quantize to 1e6-scaled BIGINTs BEFORE any accumulation
  (float -> double widening is exact; round() of a double is exact);
- every division is integer ``div`` — Spark's ``div`` and DuckDB's
  ``//`` both truncate toward zero (verified for negatives), so no
  sign-splitting is needed;
- the start vector is uniform positive, which pins the eigenvector's
  sign (power iteration is sign-stable from a fixed start).

Scale shape: the one data-sized pass is the per-row outer-product
explode — d^2 struct rows per vector, shrunk by map-side combine to
d^2 rows PER PARTITION before the only data-sized shuffle.  The means
pass is a d-row aggregate (the collected mean literal is a bounded fit
statistic, the k-means-centroid precedent).  The d^2-bounded scatter
collects to the driver and the power iteration runs there in exact
integer arithmetic — the MLlib computePrincipalComponents shape
(distributed covariance, local eigensolve); the scatter renormalizes
to a fixed magnitude first so matvec arithmetic cannot overflow at ANY
row count.  At 100 TB the explode amplification (x d^2 pre-combine) is
the known cost of exact covariance — production would treeAggregate
per-partition numpy outer products via mapInPandas (the accepted
Python slow path); the data passes stay JVM-side for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Input quantization: embedding values -> 1e6-scaled BIGINTs.
PCA_Q = 10**6

#: The scatter matrix is renormalized so its max |entry| is this —
#: decouples matvec magnitudes from the corpus row count.
PCA_S_SCALE = 10**6

#: Eigenvector components are tracked at this scale (max |component|).
PCA_V_SCALE = 10**7


def pca_top_component_scaled(
    df: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 4,
    q: int = PCA_Q,
    s_scale: int = PCA_S_SCALE,
    v_scale: int = PCA_V_SCALE,
    mean_q: list[int] | None = None,
) -> DataFrame:
    """Top principal component of ``vec_col`` (fixed-length numeric
    arrays) after mean-centering, as ``(dim_idx, loading_scaled)`` —
    ``iterations`` power-iteration rounds, loadings normalized so the
    largest |component| is ``v_scale``.

    Overflow budget (int64 max ~9.2e18): |S'| <= s_scale = 1e6 after
    renormalization, |v| <= v_scale = 1e7, so a matvec term is <= 1e13
    and a d-term sum <= d * 1e13 — 5 orders of headroom at d = 64 and
    safe to d ~ 1e5 dims.

    ``mean_q`` — a caller that already ran the d-row means pass (e.g.
    the whitening query, which collects it for its own projection
    literals) passes the q-scaled means so the corpus is scanned once
    for means, not twice (r08; the ``kmeans_train(init_centroids=...)``
    move).  The fit is identical: the means pass is deterministic.
    """
    qarr = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * q).cast("long")
    )
    base = df.select(qarr.alias("__q"))

    # d-row mean table -> bounded literal (the k-means centroid precedent)
    if mean_q is None:
        means = (
            base.select(F.posexplode("__q").alias("i", "x"))
            .groupBy("i")
            .agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
            .select("i", F.expr("sx div n").alias("m"))
            .collect()
        )
        mean_q = [int(r["m"]) for r in sorted(means, key=lambda r: r["i"])]
    mean_lit = F.array(*[F.lit(int(m)) for m in mean_q])

    cent = base.select(F.zip_with("__q", mean_lit, lambda a, b: a - b).alias("__c"))

    # per-row outer products — UPPER TRIANGLE ONLY (the matrix is
    # symmetric; the mirror is reconstructed for free driver-side).
    # r08 (guide §4.2): the d^2-per-row explode becomes a vectorized
    # numpy pass — each task folds its rows' outer products into ONE
    # d x d int64 accumulator and emits d(d+1)/2 partial rows, so the
    # only shuffle is partials x partitions (at 100 TB this is the
    # documented treeAggregate-style production path; the JVM explode
    # shipped d^2 struct rows PER VECTOR to the hash aggregate).
    # Bit-exact: products and the truncating div are exact int64 ops
    # (numpy // floors, so trunc = sign * (|x| // q)), and integer
    # partial sums are associative — same BIGINTs as the SQL twin.
    import numpy as np

    def _outer_partials(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["__c"]])
            if acc is None:
                acc = np.zeros((A.shape[1], A.shape[1]), dtype=np.int64)
            # chunk rows so the (rows, d, d) intermediate stays small
            for lo in range(0, A.shape[0], 256):
                C = A[lo : lo + 256]
                P = np.einsum("ri,rj->rij", C, C)
                acc += (np.sign(P) * (np.abs(P) // int(q))).sum(axis=0)
        if acc is None:
            return
        iu = np.triu_indices(acc.shape[0])
        yield pd.DataFrame(
            {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"), "p": acc[iu]}
        )

    pairs = cent.mapInPandas(_outer_partials, "i int, j int, p long")
    scatter = pairs.groupBy("i", "j").agg(F.sum("p").alias("s")).collect()

    # The scatter is d^2-bounded — collect it and iterate driver-side
    # (the MLlib computePrincipalComponents shape: distributed
    # covariance, local eigensolve).  A DataFrame-join iteration was
    # measurably worse here: 32-task micro-jobs per round dominated by
    # scheduling, and the lazy lineage re-evaluates the previous round
    # twice (matvec + its own max) so plans compound geometrically.
    # Python ints are arbitrary-precision but every value stays in the
    # int64 budget above, and _tdiv reproduces the engines' truncating
    # division exactly, so the result is bit-identical to the SQL twin.
    def _tdiv(a: int, b: int) -> int:
        q_ = abs(a) // abs(b)
        return q_ if (a >= 0) == (b >= 0) else -q_

    s_map = {(int(r["i"]), int(r["j"])): int(r["s"]) for r in scatter}
    s_map.update(
        {(j, i): s for (i, j), s in list(s_map.items()) if i != j}
    )  # symmetric mirror
    d_norm = max(_tdiv(max(abs(x) for x in s_map.values()), s_scale), 1)
    sn = {k: _tdiv(x, d_norm) for k, x in s_map.items()}
    dims = sorted({i for i, _ in sn})
    vvec = {i: int(v_scale) for i in dims}
    for _ in range(iterations):
        w = {i: sum(sn.get((i, j), 0) * vvec[j] for j in dims) for i in dims}
        dw = max(_tdiv(max(abs(x) for x in w.values()), v_scale), 1)
        vvec = {i: _tdiv(w[i], dw) for i in dims}
    return df.sparkSession.createDataFrame(
        [(int(i), int(vvec[i])) for i in dims],
        "dim_idx long, loading_scaled long",
    )


#: Projection coefficients are tracked at this scale.
PCA_COEFF_SCALE = 10**6


def remove_top_component_scaled(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    mean_q: list[int],
    loadings: list[int],
    q: int = PCA_Q,
    coeff_scale: int = PCA_COEFF_SCALE,
) -> DataFrame:
    """'All-but-the-top' postprocessing (Mu & Viswanath 2018): subtract
    the projection of each mean-centered vector onto the dominant
    component, reporting per-vector squared norms before/after — the
    anisotropy-correction diagnostic (how much of each embedding's
    energy the common direction holds).

    ``mean_q`` / ``loadings`` are the bounded fit statistics the PCA
    pass collected (q-scaled means, v_scale-scaled loadings) passed as
    plain ints so both engines consume identical literals.

    Fixed-point overflow budget: |c_i| ~ 1e6, |v_i| <= 1e7+eps;
    dot(c,v) <= d * 1e13, dot(v,v) <= d * 1e14 — both safe;
    ``coeff = dot_cv div (dot_vv div coeff_scale)`` keeps every product
    under 1e13.  Map-side only: zip_with/aggregate over the row's own
    array, no shuffle at all (the output is row-per-vector).
    """
    dvv = sum(int(v) * int(v) for v in loadings)
    dvv_r = max(dvv // coeff_scale, 1)
    mean_lit = F.array(*[F.lit(int(m)) for m in mean_q])
    v_lit = F.array(*[F.lit(int(v)) for v in loadings])
    qarr = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * q).cast("long")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    base = df.select(
        F.col(id_col), F.zip_with(qarr, mean_lit, lambda a, b: a - b).alias("__c")
    )
    # integer div truncates identically in both engines (verified for
    # negatives), so coeff is the same BIGINT everywhere
    corrected = base.select(
        id_col, "__c", _dot(F.col("__c"), v_lit).alias("__dcv")
    ).withColumn(
        "__x",
        F.expr(
            f"transform(__c, (ci, i) -> ci - ((__dcv div {int(dvv_r)})"
            f" * element_at(array({', '.join(str(int(v)) + 'L' for v in loadings)}), i + 1))"
            f" div {int(coeff_scale)})"
        ),
    )
    return corrected.select(
        F.col(id_col),
        F.expr(f"aggregate(__c, 0L, (acc, x) -> acc + x * x) div {int(q)}").alias(
            "norm2_before_scaled"
        ),
        F.expr(f"aggregate(__x, 0L, (acc, x) -> acc + x * x) div {int(q)}").alias(
            "norm2_after_scaled"
        ),
    )
