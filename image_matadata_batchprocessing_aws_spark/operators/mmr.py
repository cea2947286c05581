"""Maximal Marginal Relevance (Carbonell & Goldstein 1998) diverse
top-k selection over an embedding column, in deterministic fixed-point
arithmetic.

The retrieval use case: after a similarity search returns candidates,
pick k results that balance relevance to the query against redundancy
with what's already picked — ``score = lam*rel - (1-lam)*max_sim`` per
round, greedy argmax.  In a training-data pipeline the same loop picks
diverse exemplars for few-shot prompts or anchor sets for semantic
dedup.

Determinism: vectors quantize to 1e6-scaled BIGINTs; every dot product
is an integer sum divided once (``div`` truncates identically in Spark
and DuckDB); with lam = lam_num/lam_den the round score stays the
integer ``lam_num*rel - (lam_den-lam_num)*max_sim`` (argmax is
scale-invariant, so the /lam_den never happens); ties break on the id.

Scale shape: each round is MAP-SIDE ONLY over the candidate set — the
selected vectors ride along as d-sized literals, so ``max_sim`` is a
``greatest`` over <= k-1 in-row dot products, and the argmax is a
TakeOrdered(1) (no full sort).  The k per-round collects are 1-row fit
statistics (the k-means-centroid precedent).  Candidate count can be
100 TB; k and d are the only multipliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Input quantization, matching operators/pca.PCA_Q.
MMR_Q = 10**6


def _q(vec_col: str, q: int):
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * q).cast("long")
    )


def _dot_lit(arr_col, lit_ints, q: int):
    return F.expr(
        f"aggregate(zip_with({arr_col}, array({', '.join(str(int(v)) + 'L' for v in lit_ints)}),"
        f" (a, b) -> a * b), 0L, (acc, x) -> acc + x) div {int(q)}"
    )


def mmr_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec_q: list[int],
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
    q: int = MMR_Q,
) -> list[dict]:
    """Greedy MMR: returns the k selections in pick order as dicts
    ``{rank, id, score10}`` where ``score10`` is the UNnormalized
    integer ``lam_num*rel - (lam_den-lam_num)*max_sim`` (round 1 has no
    selected set, so ``max_sim`` contributes 0 and ``score10 =
    lam_num*rel``).

    Returns driver-side rows (k of them — this IS a fit/selection
    statistic, like k-means centroids); wrap in a DataFrame for query
    registration.
    """
    base = df.select(
        F.col(id_col).alias("__id"), _q(vec_col, q).alias("__v")
    ).withColumn("__rel", _dot_lit("__v", query_vec_q, q))

    picked: list[dict] = []
    picked_vecs: list[list[int]] = []
    for rank in range(1, k + 1):
        cand = base.where(
            ~F.col("__id").isin([p["id"] for p in picked]) if picked else F.lit(True)
        )
        if picked_vecs:
            sims = [F.expr(
                f"aggregate(zip_with(__v, array({', '.join(str(int(x)) + 'L' for x in pv)}),"
                f" (a, b) -> a * b), 0L, (acc, x) -> acc + x) div {int(q)}"
            ) for pv in picked_vecs]
            max_sim = F.greatest(*sims) if len(sims) > 1 else sims[0]
        else:
            max_sim = F.lit(0)
        scored = cand.withColumn(
            "__score",
            F.lit(int(lam_num)) * F.col("__rel")
            - F.lit(int(lam_den - lam_num)) * max_sim,
        )
        top = (
            scored.orderBy(F.col("__score").desc(), F.col("__id").asc())
            .limit(1)
            .select("__id", "__score", "__v")
            .collect()[0]
        )
        picked.append(
            {"rank": rank, "id": top["__id"], "score10": int(top["__score"])}
        )
        picked_vecs.append([int(x) for x in top["__v"]])
    return picked
