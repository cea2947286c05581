"""Product quantization (PQ) for approximate nearest neighbor at scale.

The IVF path (operators/ivf.py) prunes WHICH vectors a query scans; PQ
compresses HOW each vector is stored and compared: the embedding splits
into S subvectors, each quantized to the id of its nearest codeword in a
per-subspace codebook, so a 64-dim float vector becomes S small ints.
Query-side, asymmetric distance computation (ADC) precomputes the
query's distance to every codeword (an S x |codebook| table — a few
hundred rows, broadcast) and scores a candidate as the SUM of table
lookups — no float vector math per candidate.

Scale design:

- Encoding is one explode(S) + broadcast codebook join + per-(vector,
  subspace) min — map-side except the tiny min combine; run once at
  ingest, stored as S ints per vector (16x smaller than the raw floats
  at S=4, dim=64, float32).
- ADC scoring shuffles only (query, candidate, subspace) rows whose
  join key is the (subspace, codeword) pair — the codebook table is
  broadcast-sized by construction.
- Distances quantize to scaled BIGINTs before the ADC sum, so the
  S-term addition is order-independent — bit-exact across engines and
  partitionings (float partial sums would differ in final ulps).

Composes with IVF (encode per cell, probe then ADC-score) exactly like
the published IVFPQ construction (Jégou et al., TPAMI 2011 — public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.functions import l2_dist

#: ADC distances are compared as round(d * 1e6) scaled longs.
ADC_SCALE = 1_000_000


def subvector(vec, s: int, sub_dim: int):
    """1-based slice of subspace ``s`` from an array column."""
    return F.slice(vec, s * sub_dim + 1, sub_dim)


def pq_codebook(
    vectors: DataFrame, id_col: str, vec_col: str, n_sub: int, sub_dim: int
) -> DataFrame:
    """(s, cw_id, cv) codebook rows: every input vector contributes its
    s-th subvector as codeword ``cw_id`` of subspace s.  Callers pick the
    codeword source (a deterministic mod-sample keeps the SQL oracle
    exact; production uses per-subspace k-means centroids — same shape,
    same broadcast size)."""
    subs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).cast("int").alias("s"),
                    subvector(F.col(vec_col), s, sub_dim).alias("cv"),
                )
                for s in range(n_sub)
            ]
        )
    ).alias("sub")
    return vectors.select(F.col(id_col).alias("cw_id"), subs).select(
        "sub.s", "cw_id", "sub.cv"
    )


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int,
    sub_dim: int,
) -> DataFrame:
    """(id, s, cw_id) PQ codes: per subspace, the codeword minimizing
    round(L2, 6) with a codeword-id tiebreak (deterministic in every
    engine).  Explode is S-wide; the codebook joins broadcast; the min
    combines map-side."""
    subs = vectors.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("s"),
                        subvector(F.col(vec_col), s, sub_dim).alias("sv"),
                    )
                    for s in range(n_sub)
                ]
            )
        ).alias("sub"),
    ).select(id_col, "sub.s", "sub.sv")
    scored = subs.join(F.broadcast(codebook), "s").select(
        id_col,
        "s",
        F.struct(
            F.round(l2_dist(F.col("sv"), F.col("cv")), 6).alias("d"),
            F.col("cw_id"),
        ).alias("dc"),
    )
    return (
        scored.groupBy(id_col, "s")
        .agg(F.min("dc").alias("best"))
        .select(id_col, "s", F.col("best.cw_id").alias("cw_id"))
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    query_id: str,
    query_vec: str,
    code_id: str,
    n_sub: int,
    sub_dim: int,
    k: int,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: per query, the distance table to every
    codeword (scaled-long quantized), joined to candidate codes on the
    (s, cw_id) key, summed, ranked.  Returns (query_id, neighbor_id,
    adc_scaled, rn <= k).

    ``candidates`` (optional): a (query_id, code_id) pair table
    restricting which corpus items each query scores — the IVFPQ
    composition passes the probed cells' members here, so ADC work is
    nprobe/k_cents of the corpus per query instead of all of it."""
    qsubs = queries.select(
        F.col(query_id),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("s"),
                        subvector(F.col(query_vec), s, sub_dim).alias("sv"),
                    )
                    for s in range(n_sub)
                ]
            )
        ).alias("sub"),
    ).select(query_id, "sub.s", "sub.sv")
    qdist = qsubs.join(F.broadcast(codebook), "s").select(
        query_id,
        "s",
        "cw_id",
        F.round(l2_dist(F.col("sv"), F.col("cv")) * ADC_SCALE)
        .cast("long")
        .alias("qd"),
    )
    if candidates is not None:
        scored = candidates.join(codes, code_id).join(
            F.broadcast(qdist), [query_id, "s", "cw_id"]
        )
    else:
        scored = codes.join(F.broadcast(qdist), ["s", "cw_id"])
    adc = scored.groupBy(query_id, code_id).agg(F.sum("qd").alias("adc_scaled"))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy("adc_scaled", code_id)
    return (
        adc.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select(
            query_id,
            F.col(code_id).alias("neighbor_id"),
            F.col("adc_scaled").cast("long").alias("adc_scaled"),
            "rn",
        )
    )
