"""Oracle-ready queries staged during r05 for r06 registration.

Same discipline as ``queries/r05_queue.py`` was under in r04: the
registry drains 50 driver slots per round, so new queries stage here —
fully oracled and exact-verified (``tests/test_r06_queue.py`` at
sf0.001, ``tools/check_oracle.py --staged`` at any sf dir) — and
register only when the never-driver-checked backlog allows (the r03
lesson: keep registry growth <= window drain rate).

Float-parity rules are the house ones (see ``queries/etl.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.queries.util import t

QUERIES: dict = {}
ORACLES: dict = {}


PPR_SEED_MOD = 50  # same seed cohort as graph_ppr (r05_queue)
PPR_TOL_SCALED = 5 * 10**7
PPR_MAX_ITERS = 60


def graph_ppr_converged(spark: SparkSession, sf: str) -> DataFrame:
    """Tolerance-terminated personalized PageRank (VERDICT r4 item 4):
    `operators/graph.personalized_pagerank_converged` iterates the same
    seed-gated fixed-point rounds as `graph_ppr` (which stays the
    unrolled-CTE bit-exact oracle form) until max |Δrank| <= 5e-5, then
    states the invariants a correct run must satisfy — the oracle pins
    them as constants plus SQL-computed node/seed counts, so a driver
    row turns red if the loop stops converging, leaks mass, goes
    negative, or drops the unreachable-node accounting.

    - ``n_nodes`` / ``n_seed_nodes``: both engines count the bipartite
      node set and the seed cohort actually present in it.
    - ``iters_in_bounds``: 1 <= iterations <= 60 (the operator RAISES
      on non-convergence, so a green row proves real termination).
    - ``rank_sum_ok``: total mass within [scale*99/100, scale] — all
      teleport mass returns to seeds, truncations leak < 1 unit per
      node per round, and the steady-state leak stays ~1e-6 of scale;
      the band is wider than global PageRank's because start mass is
      concentrated on the (possibly tiny) seed set, so early rounds
      truncate against larger per-node values.
    - ``ranks_nonnegative``: the walk can't mint negative proximity.
    - ``seed_floor_ok``: every seed keeps at least its restart share —
      seeds always receive teleport mass, whatever the graph does.
    """
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
        personalized_pagerank_converged,
    )

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
    seeds = (
        o.where(F.col("o_custkey") % PPR_SEED_MOD == 0)
        .select((F.col("o_custkey") * 2).alias("node"))
        .distinct()
    )
    ranks, iters = personalized_pagerank_converged(
        edges, seeds, tol_scaled=PPR_TOL_SCALED, max_iterations=PPR_MAX_ITERS
    )
    n_seeds = ranks.join(F.broadcast(seeds), "node", "left_semi").count()
    # restart floor: (scale * (1-d)) div (den * n_seeds), n_seeds >= 1
    # on every sf dir (custkey 50 always orders)
    floor = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_seeds)
    seed_min = (
        ranks.join(F.broadcast(seeds), "node", "left_semi")
        .agg(F.min("rank_scaled").alias("m"))
        .collect()[0]["m"]
    )
    return ranks.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.lit(int(n_seeds)).cast("long").alias("n_seed_nodes"),
        F.lit(1 <= iters <= PPR_MAX_ITERS).alias("iters_in_bounds"),
        (
            (F.sum("rank_scaled") <= F.lit(PR_SCALE))
            & (F.sum("rank_scaled") >= F.lit(PR_SCALE * 99 // 100))
        ).alias("rank_sum_ok"),
        (F.min("rank_scaled") >= F.lit(0)).alias("ranks_nonnegative"),
        F.lit(bool(seed_min is not None and seed_min >= floor)).alias("seed_floor_ok"),
    )


QUERIES["graph_ppr_converged"] = graph_ppr_converged

ORACLES["graph_ppr_converged"] = f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    SELECT CAST((SELECT count(DISTINCT c) FROM pairs)
              + (SELECT count(DISTINCT s) FROM pairs) AS BIGINT) AS n_nodes,
           CAST((SELECT count(DISTINCT c) FROM pairs
                 WHERE (c // 2) % {PPR_SEED_MOD} = 0) AS BIGINT) AS n_seed_nodes,
           TRUE AS iters_in_bounds,
           TRUE AS rank_sum_ok,
           TRUE AS ranks_nonnegative,
           TRUE AS seed_floor_ok
"""


VP8_FIXDIR = "/root/repo/tests/fixtures/vp8"


def multimodal_vp8_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Pure RFC 6386 lossy-VP8 decode through the Arrow pipeline
    (`multimodal/vp8.py`, r05 — replaces the system-libwebp seam).  The
    committed fixtures span the keyframe feature space — simple AND
    normal loop filters, sharpness 5, 8 token partitions, 4-segment
    maps, odd dimensions, qualities 20-90 — and the manifest pins the
    per-channel sums of the RGB the SYSTEM decoder produced at minting
    time, so a green row proves the from-scratch decoder (boolean
    arithmetic coder, token trees, intra predictors, loop filters,
    fancy upsampler, fixed-point YUV->RGB) matches libwebp bit-exactly
    end to end inside Spark."""
    import json
    import os
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    manifest = json.load(open(os.path.join(VP8_FIXDIR, "manifest.json")))
    rows = [
        (name, bytearray(open(os.path.join(VP8_FIXDIR, name), "rb").read()))
        for name, *_ in manifest
    ]
    entries = spark.createDataFrame(rows, "entry_name string, content binary")

    def sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                out.append(
                    (name, img.shape[1], img.shape[0],
                     int(img[:, :, 0].sum()), int(img[:, :, 1].sum()),
                     int(img[:, :, 2].sum()))
                )
        yield pd.DataFrame(
            out, columns=["entry_name", "w", "h", "r_sum", "g_sum", "b_sum"]
        )

    return entries.mapInPandas(
        sums,
        "entry_name string, w long, h long, r_sum long, g_sum long, b_sum long",
    )


QUERIES["multimodal_vp8_decode"] = multimodal_vp8_decode


def _vp8_oracle() -> str:
    import json
    import os

    manifest = json.load(open(os.path.join(VP8_FIXDIR, "manifest.json")))
    rows = ",\n        ".join(
        f"('{name}', CAST({w} AS BIGINT), CAST({h} AS BIGINT), "
        f"CAST({r} AS BIGINT), CAST({g} AS BIGINT), CAST({b} AS BIGINT))"
        for name, w, h, r, g, b, _sha in manifest
    )
    return f"""
    SELECT * FROM (VALUES
        {rows}
    ) AS t(entry_name, w, h, r_sum, g_sum, b_sum)
    """


ORACLES["multimodal_vp8_decode"] = _vp8_oracle()
