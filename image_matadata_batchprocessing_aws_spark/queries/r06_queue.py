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


def dedup_lsh_tuning(spark: SparkSession, sf: str) -> DataFrame:
    """LSH parameter planner over the documents corpus
    (`operators/dedup.lsh_tuning_report`): the pre-job query that prices
    each (bands, rows-per-band) split of the 8-hash signature — implied
    S-curve threshold vs observed candidate pairs / bucket skew — so a
    100 TB dedup picks its banding from data, not folklore.  The DuckDB
    twin rebuilds the identical md5-derived signatures and band keys
    (the `dedup_minhash_lsh` oracle machinery) and recomputes every
    bucket statistic exactly."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        lsh_tuning_report,
    )

    return lsh_tuning_report(t(spark, sf, "documents"))


QUERIES["dedup_lsh_tuning"] = dedup_lsh_tuning


def _lsh_tuning_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.dedup import (
        _SHINGLES_CTE,
        _minhash_hash_sql,
    )

    per_config = []
    for bands, rpb in ((8, 1), (4, 2), (2, 4)):
        thr = int(round(1000 * (1.0 / bands) ** (1.0 / rpb)))
        # r=1 has no '|' separator to coerce the BIGINT slot, so cast
        key = " || '|' || ".join(
            f"CAST(sig[{rpb} * bi + {j + 1}] AS VARCHAR)" for j in range(rpb)
        )
        per_config.append(f"""
        SELECT 'b{bands}r{rpb}' AS config,
               CAST({bands} AS BIGINT) AS bands,
               CAST({rpb} AS BIGINT) AS rows_per_band,
               CAST({thr} AS BIGINT) AS threshold_milli,
               CAST(sum(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs,
               CAST(count(*) AS BIGINT) AS buckets,
               CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS colliding_buckets,
               CAST(max(c) AS BIGINT) AS max_bucket
        FROM (SELECT bi, band_key, count(*) AS c
              FROM (SELECT doc_id, bi, md5({key}) AS band_key
                    FROM sig CROSS JOIN
                         (SELECT unnest(range({bands})) AS bi))
              GROUP BY bi, band_key)""")
    union = "\n        UNION ALL\n".join(per_config)
    return f"""
        WITH {_SHINGLES_CTE},
        seeds AS (SELECT unnest(range(8)) AS seed),
        mh AS (SELECT doc_id, seed, min({_minhash_hash_sql()}) AS h
               FROM ex CROSS JOIN seeds GROUP BY doc_id, seed),
        sig AS (SELECT doc_id, list(h ORDER BY seed) AS sig
                FROM mh GROUP BY doc_id)
        {union}
    """


ORACLES["dedup_lsh_tuning"] = _lsh_tuning_oracle()


BOOT_REPS = 32
BOOT_LO_RANK = 4   # ~10th percentile of 32 replicate means
BOOT_HI_RANK = 29  # ~90th


def agg_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Bootstrap confidence intervals for per-flag mean revenue: 32
    deterministic hash-weighted replicates — the `sample_bootstrap`
    Poisson proxy as a FAMILY of draws, each row's 32 weights sliced as
    disjoint 2-bit fields of TWO md5 hashes (16 replicates per 60-bit
    hash; one hash per row per family instead of one md5 per
    (row, replicate) — 16x less hashing, the dominant cost in the r08
    bench at 14.6 s) — each
    replicate's mean computed from exact integer sufficient statistics
    (cents BIGINT / weight BIGINT -> one double division), CI bounds
    picked as order statistics of the 32 rounded means (rank 4 / 29 ~
    the 10th/90th percentile) — element SELECTION, not float
    interpolation, so both engines choose the identical double.  The
    inference layer the drift dashboards were missing: is a mean shift
    bigger than resampling noise?"""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("__cents"),
        F.concat_ws(":", "l_orderkey", "l_linenumber").alias("__id"),
    ).select(
        "l_returnflag",
        "__cents",
        md5_int64(F.col("__id")).alias("__h0"),
        md5_int64(F.concat_ws(":", "__id", F.lit("~"))).alias("__h1"),
    )
    half = BOOT_REPS // 2
    reps = li.withColumn(
        "__b", F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1)))
    ).withColumn(
        "__w",
        F.expr(
            f"CASE WHEN __b < {half} THEN shiftright(__h0, cast(__b * 2 AS int)) % 4 "
            f"ELSE shiftright(__h1, cast((__b - {half}) * 2 AS int)) % 4 END"
        ),
    )
    per_rep = (
        reps.groupBy("l_returnflag", "__b")
        .agg(
            F.sum(F.col("__w") * F.col("__cents")).alias("__s"),
            F.sum("__w").alias("__n"),
        )
        .select(
            "l_returnflag",
            "__b",
            F.round(
                F.col("__s").cast("double") / 100.0 / F.col("__n"), 6
            ).alias("__mean"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy("__mean", "__b")
    ranked = per_rep.withColumn("__r", F.row_number().over(w))
    full = li.groupBy("l_returnflag").agg(
        F.round(
            F.sum("__cents").cast("double") / 100.0 / F.count(F.lit(1)), 6
        ).alias("mean_full")
    )
    lo = ranked.where(F.col("__r") == BOOT_LO_RANK).select(
        "l_returnflag", F.col("__mean").alias("ci_lo")
    )
    hi = ranked.where(F.col("__r") == BOOT_HI_RANK).select(
        "l_returnflag", F.col("__mean").alias("ci_hi")
    )
    return (
        full.join(lo, "l_returnflag")
        .join(hi, "l_returnflag")
        .select(
            "l_returnflag",
            "mean_full",
            "ci_lo",
            "ci_hi",
            F.lit(BOOT_REPS).cast("long").alias("n_reps"),
        )
    )


QUERIES["agg_bootstrap_ci"] = agg_bootstrap_ci

from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql as _mi64  # noqa: E402

ORACLES["agg_bootstrap_ci"] = f"""
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey || ':' || l_linenumber AS id
      FROM lineitem),
    hashed AS (
      SELECT l_returnflag, cents,
             ({_mi64("id")}) AS h0,
             ({_mi64("id || ':~'")}) AS h1
      FROM li),
    reps AS (
      SELECT l_returnflag, cents, b,
             (CASE WHEN b < {BOOT_REPS // 2} THEN h0 >> (2 * b)
                   ELSE h1 >> (2 * (b - {BOOT_REPS // 2})) END) % 4 AS w
      FROM hashed CROSS JOIN (SELECT unnest(range({BOOT_REPS})) AS b)),
    per_rep AS (
      SELECT l_returnflag, b,
             round(CAST(sum(w * cents) AS DOUBLE) / 100.0 / sum(w), 6)
                 AS mean_b
      FROM reps GROUP BY l_returnflag, b),
    ranked AS (
      SELECT l_returnflag, mean_b,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY mean_b, b) AS r
      FROM per_rep),
    fullstats AS (
      SELECT l_returnflag,
             round(CAST(sum(cents) AS DOUBLE) / 100.0 / count(*), 6)
                 AS mean_full
      FROM li GROUP BY l_returnflag)
    SELECT f.l_returnflag, f.mean_full, lo.mean_b AS ci_lo,
           hi.mean_b AS ci_hi, CAST({BOOT_REPS} AS BIGINT) AS n_reps
    FROM fullstats f
    JOIN ranked lo ON lo.l_returnflag = f.l_returnflag
                   AND lo.r = {BOOT_LO_RANK}
    JOIN ranked hi ON hi.l_returnflag = f.l_returnflag
                   AND hi.r = {BOOT_HI_RANK}
"""


STL_WINDOW = 25  # centered moving-average width (odd), ~one day of hours


def ts_stl_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Additive seasonal-trend decomposition of the per-type hourly
    event-value series (`operators/timeseries.stl_decompose_scaled`):
    trend = centered 25-row moving average, seasonal = hour-of-day mean
    of the detrended series, residual = the anomaly signal a monitor
    thresholds.  ALL-INTEGER (micro-scaled BIGINT, floor divisions), so
    the DuckDB twin reproduces every cell bit-for-bit — no float
    accumulation order anywhere.  Row-based windows over observed
    buckets; compose with the gap-fill resampler when calendar
    alignment matters."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        stl_decompose_scaled,
    )

    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    series = (
        e.withColumn("__hb", F.floor(F.unix_millis("ts") / 3600000).cast("long"))
        .groupBy("event_type", "__hb")
        .agg(
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
                "__vmicro"
            )
        )
        .withColumn("__phase", F.pmod(F.col("__hb"), F.lit(24)).cast("long"))
    )
    out = stl_decompose_scaled(
        series, "event_type", "__hb", "__vmicro", "__phase", window=STL_WINDOW
    )
    return out.select(
        "event_type",
        F.col("__hb").alias("hour_bucket"),
        F.col("__phase").alias("hour_of_day"),
        "value_micro",
        "trend_micro",
        "seasonal_micro",
        "residual_micro",
    )


QUERIES["ts_stl_decompose"] = ts_stl_decompose

ORACLES["ts_stl_decompose"] = f"""
    WITH series AS (
      SELECT event_type,
             CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS hb,
             CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
                 AS vmicro
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, hb),
    trended AS (
      SELECT event_type, hb, hb % 24 AS phase, vmicro,
             CASE WHEN count(*) OVER w = {STL_WINDOW}
                  THEN CAST(floor(CAST(sum(vmicro) OVER w AS DOUBLE)
                                  / {STL_WINDOW}) AS BIGINT)
             END AS trend
      FROM series
      WINDOW w AS (PARTITION BY event_type ORDER BY hb
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    seasonal AS (
      SELECT event_type, phase,
             CAST(floor(CAST(sum(vmicro - trend) AS DOUBLE) / count(*))
                  AS BIGINT) AS seas
      FROM trended WHERE trend IS NOT NULL
      GROUP BY event_type, phase)
    SELECT t.event_type,
           t.hb AS hour_bucket,
           t.phase AS hour_of_day,
           t.vmicro AS value_micro,
           t.trend AS trend_micro,
           CASE WHEN t.trend IS NOT NULL THEN s.seas END AS seasonal_micro,
           CASE WHEN t.trend IS NOT NULL THEN t.vmicro - t.trend - s.seas END
               AS residual_micro
    FROM trended t
    LEFT JOIN seasonal s ON s.event_type = t.event_type
                         AND s.phase = t.phase
"""


def eval_bleu_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """BLEU-4 sufficient statistics over the near-dup candidate pairs
    (`operators/evaluation.bleu_pair_stats`): clipped n-gram matches and
    candidate totals for n=1..4 (exact BIGINTs), the brevity-penalty
    exponent, and a float-parity-safe composite (geometric mean via
    sqrt(sqrt(p1*p2*p3*p4)) — every op correctly-rounded IEEE, so the
    DuckDB twin reproduces the double bit-for-bit where exp/log-based
    BLEU could not).  The generation-eval counterpart of
    `eval_rouge_pairs`."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        bleu_pair_stats,
    )
    from image_matadata_batchprocessing_aws_spark.queries.dedup import (
        JACCARD_THRESHOLD,
    )

    docs = t(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    return bleu_pair_stats(docs, pairs).orderBy("id_a", "id_b")


QUERIES["eval_bleu_pairs"] = eval_bleu_pairs


def _bleu_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.dedup import (
        _SHINGLES_CTE,
        JACCARD_THRESHOLD,
    )

    gram_ctes, stat_ctes = [], []
    for n in range(1, 5):
        if n == 1:
            expr = "t"
        else:
            joined = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
            expr = (
                f"CASE WHEN len(t) >= {n} THEN "
                f"list_transform(range(1, len(t) - {n} + 2), i -> {joined}) "
                f"ELSE CAST([] AS VARCHAR[]) END"
            )
        gram_ctes.append(
            f"g{n} AS (SELECT doc_id, unnest({expr}) AS g FROM toks)"
        )
        stat_ctes.append(
            f"""c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY 1, 2),
        tt{n} AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM c{n} GROUP BY 1),
        o{n} AS (SELECT p.id_a, p.id_b,
                        CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
                 FROM cand p
                 JOIN c{n} a ON a.doc_id = p.id_a
                 JOIN c{n} b ON b.doc_id = p.id_b AND b.g = a.g
                 GROUP BY 1, 2)"""
        )
    precs = " * ".join(
        f"(CASE WHEN coalesce(tt{n}.tot, 0) > 0 THEN "
        f"CAST(coalesce(o{n}.ov, 0) AS DOUBLE) / tt{n}.tot END)"
        for n in range(1, 5)
    )
    ov_cols = ", ".join(
        f"CAST(coalesce(o{n}.ov, 0) AS BIGINT) AS ov{n}" for n in range(1, 5)
    )
    tot_cols = ", ".join(
        f"CAST(coalesce(tt{n}.tot, 0) AS BIGINT) AS tot{n}" for n in range(2, 5)
    )
    joins = "\n    ".join(
        f"LEFT JOIN o{n} ON o{n}.id_a = cand.id_a AND o{n}.id_b = cand.id_b\n"
        f"    LEFT JOIN tt{n} ON tt{n}.doc_id = cand.id_b"
        for n in range(1, 5)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    cand AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
    {', '.join(gram_ctes)},
    {', '.join(stat_ctes)},
    ref AS (SELECT doc_id, tot FROM tt1)
    SELECT cand.id_a, cand.id_b,
           CAST(coalesce(ref.tot, 0) AS BIGINT) AS ref_len,
           CAST(coalesce(tt1.tot, 0) AS BIGINT) AS cand_len,
           {ov_cols},
           {tot_cols},
           round(sqrt(sqrt({precs})), 6) AS bleu_geo,
           CASE WHEN coalesce(tt1.tot, 0) > 0
                     AND tt1.tot < coalesce(ref.tot, 0)
                THEN round(1.0 - CAST(ref.tot AS DOUBLE) / tt1.tot, 6)
                ELSE 0.0 END AS bp_exponent
    FROM cand
    {joins}
    LEFT JOIN ref ON ref.doc_id = cand.id_a
    ORDER BY cand.id_a, cand.id_b
"""


ORACLES["eval_bleu_pairs"] = _bleu_oracle()


def etl_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ORC sink -> source round-trip fidelity: the documents table
    writes as ORC (Spark's second built-in columnar format — the
    interchange surface for Hive-era estates), reads back, and the
    per-(lang, source) report — counts, char sums, an order-independent
    md5 text fingerprint sum, and a doc_id XOR fold — must match DuckDB
    computing the same directly from the parquet.  Any type or encoding
    loss in either direction breaks the fingerprints.  Predicate
    pushdown and column pruning work on the ORC scan exactly as on
    parquet (both are Spark-native vectorized readers)."""
    import tempfile

    from image_matadata_batchprocessing_aws_spark.functions import md5_int32

    docs = t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="orc_rt_")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(md5_int32(F.col("text"))).cast("long").alias("text_fp_sum"),
        # bitwise id fold: catches row duplication/loss that sums hide
        F.bit_xor("doc_id").cast("long").alias("id_xor"),
    )


QUERIES["etl_orc_roundtrip"] = etl_orc_roundtrip

from image_matadata_batchprocessing_aws_spark.functions import (  # noqa: E402
    md5_int32_sql as _md5_32,
)

ORACLES["etl_orc_roundtrip"] = f"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum({_md5_32("text")}) AS BIGINT) AS text_fp_sum,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
    FROM documents GROUP BY 1, 2
"""


CLOSENESS_SEEDS = (1, 2, 3)  # supplier keys -> nodes 2k+1
CLOSENESS_DEPTH = 4


def graph_closeness_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """Sampled closeness/harmonic centrality: bounded-depth BFS
    (`operators/graph.bfs_levels`) from each probe seed over the
    bidirectional customer-supplier graph, reporting nodes reached,
    total hop distance, and harmonic centrality (sum of 1000//dist —
    integer division, engine-exact).  Exact closeness is O(V*E); the
    sampled-probe form is the scalable estimator (Eppstein-Wang style:
    k probes, each O(E) frontier expansion).  The DuckDB twin unrolls
    the same level sets (distinct frontier minus visited per depth), so
    no recursive walk enumeration ever happens."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        bfs_levels_multi,
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
    ).localCheckpoint(eager=False)
    # all probe seeds ride ONE BFS loop (r08 optimization: one set of
    # CLOSENESS_DEPTH rounds instead of one per seed — identical level
    # sets per seed, so the aggregate below is row-for-row the same)
    seeds = spark.createDataFrame(
        [(k, 2 * k + 1) for k in CLOSENESS_SEEDS], "seed_id long, node long"
    )
    levels = bfs_levels_multi(edges, seeds, CLOSENESS_DEPTH)
    per_seed = (
        levels.where(F.col("dist") > 0)
        .groupBy("seed_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("dist").cast("long").alias("sum_dist"),
            F.sum(F.expr("1000 div dist")).cast("long").alias("harmonic_milli"),
        )
    )
    # left join back onto the seed list so a seed reaching nothing still
    # reports (0, NULL, NULL) — the per-seed agg-without-groupBy shape
    # this replaced
    return seeds.select("seed_id").join(per_seed, "seed_id", "left").select(
        F.col("seed_id").cast("long").alias("seed_suppkey"),
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_reached"),
        "sum_dist",
        "harmonic_milli",
    )


QUERIES["graph_closeness_sampled"] = graph_closeness_sampled


def _closeness_oracle() -> str:
    per_seed = []
    for k in CLOSENESS_SEEDS:
        lvl_ctes = [f"l0_{k} AS (SELECT {2 * k + 1}::BIGINT AS node)"]
        vis = f"SELECT node FROM l0_{k}"
        for d in range(1, CLOSENESS_DEPTH + 1):
            lvl_ctes.append(
                f"""l{d}_{k} AS (
              SELECT DISTINCT e.dst AS node
              FROM l{d - 1}_{k} f JOIN edges e ON e.src = f.node
              WHERE e.dst NOT IN ({vis}))"""
            )
            vis += f" UNION SELECT node FROM l{d}_{k}"
        rows = " UNION ALL ".join(
            f"SELECT node, {d} AS dist FROM l{d}_{k}"
            for d in range(1, CLOSENESS_DEPTH + 1)
        )
        per_seed.append((k, lvl_ctes, rows))
    all_ctes = ",\n        ".join(c for _, ctes, _ in per_seed for c in ctes)
    selects = "\n        UNION ALL\n".join(
        f"""SELECT CAST({k} AS BIGINT) AS seed_suppkey,
               CAST(count(*) AS BIGINT) AS n_reached,
               CAST(sum(dist) AS BIGINT) AS sum_dist,
               CAST(sum(1000 // dist) AS BIGINT) AS harmonic_milli
        FROM ({rows})"""
        for k, _, rows in per_seed
    )
    return f"""
        WITH pairs AS (
            SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT c AS src, s AS dst FROM pairs
                  UNION ALL SELECT s, c FROM pairs),
        {all_ctes}
        {selects}
    """


ORACLES["graph_closeness_sampled"] = _closeness_oracle()


def eval_label_errors(spark: SparkSession, sf: str) -> DataFrame:
    """Label-error detection over the labeled embedding corpus
    (`operators/evaluation.confident_joint_scaled`): the confident
    joint of Northcutt et al.'s confident learning, with class-centroid
    affinity as the deterministic stand-in for model probabilities —
    off-diagonal cells are the label errors a curation pass reviews
    before training.  All-integer (quantized components, floor-mean
    centroids, integer dot products, cross-multiplied thresholds), so
    the DuckDB twin rebuilds every cell exactly."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        confident_joint_scaled,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e"), "label"
    )
    return confident_joint_scaled(e, vec_col="e")


QUERIES["eval_label_errors"] = eval_label_errors

ORACLES["eval_label_errors"] = """
    WITH q AS (
      SELECT vec_id AS vid, label AS given,
             generate_subscripts(embedding, 1) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM embeddings),
    cent AS (
      SELECT given AS cls, pos,
             CAST(floor(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT)
                 AS cmean
      FROM q GROUP BY given, pos),
    scores AS (
      SELECT q.vid, q.given, c.cls, CAST(sum(q.q * c.cmean) AS BIGINT) AS s
      FROM q JOIN cent c USING (pos)
      GROUP BY q.vid, q.given, c.cls),
    thresholds AS (
      SELECT cls, CAST(sum(s) AS BIGINT) AS t, count(*) AS cnt
      FROM scores WHERE given = cls GROUP BY cls),
    confident AS (
      SELECT sc.*, row_number() OVER (
                 PARTITION BY sc.vid ORDER BY sc.s DESC, sc.cls) AS r
      FROM scores sc JOIN thresholds th ON th.cls = sc.cls
      WHERE sc.s * th.cnt >= th.t)
    SELECT CAST(given AS BIGINT) AS given_label,
           CAST(cls AS BIGINT) AS suggested_label,
           CAST(count(*) AS BIGINT) AS n,
           given <> cls AS is_suspect
    FROM confident WHERE r = 1
    GROUP BY given, cls
"""


def text_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: distinct-token count as the
    corpus grows decile by decile (doc_id order) — the measurement
    behind tokenizer vocab budgeting and "how much more data until the
    vocab saturates" planning.  One explode + one token-keyed min
    (first-occurrence doc), one 10-row cumulative window — all integer.
    At 100 TB: the groupBy(token) partial-aggregates map-side and the
    curve itself is 10 rows — the one unkeyed window here runs over
    that 10-row aggregate, bounded by construction, never over data."""
    from image_matadata_batchprocessing_aws_spark.operators.text import tokens
    from pyspark.sql import Window

    docs = t(spark, sf, "documents")
    n1 = docs.agg(F.count(F.lit(1)).alias("__n"))
    first = (
        docs.select("doc_id", F.explode(tokens("text")).alias("__tok"))
        .groupBy("__tok")
        .agg(F.min("doc_id").alias("__first"))
        .crossJoin(F.broadcast(n1))
        .select(
            (F.col("__first") * 10 / F.col("__n"))
            .cast("long")
            .alias("decile")
        )
    )
    per = first.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("new_tokens")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "new_tokens",
        F.sum("new_tokens").over(w).cast("long").alias("cum_vocab"),
    )


QUERIES["text_vocab_growth"] = text_vocab_growth

ORACLES["text_vocab_growth"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    first AS (
      SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
    n AS (SELECT count(*) AS n FROM documents),
    per AS (
      SELECT CAST(first_doc * 10 // n.n AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS new_tokens
      FROM first, n GROUP BY 1)
    SELECT decile, new_tokens,
           CAST(sum(new_tokens) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_vocab
    FROM per
"""


def sample_pack_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Packing-efficiency audit of the 512-token context-window stream
    (`pack_context_windows`'s exact packing, summarized per language):
    window count vs the LP lower bound ceil(total/budget), tokens
    packed, boundary-CROSSING docs (attention-mask / document-boundary
    hygiene cares), and integer fill efficiency (permille).  The report
    a training-data packer checks before shipping shards — all integer,
    one pass over the same keyed window the packer itself uses."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        pack_documents,
    )
    from image_matadata_batchprocessing_aws_spark.operators.text import token_count
    from image_matadata_batchprocessing_aws_spark.queries.sampling import PACK_BUDGET

    d = t(spark, sf, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("n_tokens")
    )
    packed = pack_documents(
        d, token_col="n_tokens", order_by="doc_id",
        budget=PACK_BUDGET, partition_by="lang",
    )
    crossing = (
        (F.col("pack_offset") + F.col("n_tokens") - 1) / PACK_BUDGET
    ).cast("long") != F.col("pack_id")
    return packed.groupBy("lang").agg(
        F.countDistinct("pack_id").cast("long").alias("n_windows"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(f"(sum(n_tokens) + {PACK_BUDGET} - 1) div {PACK_BUDGET}")
        .cast("long")
        .alias("lp_lower_bound"),
        F.sum(crossing.cast("long")).cast("long").alias("crossing_docs"),
        # exact integer division (`div`), not a double quotient cast:
        # a near-integer double could round across the floor boundary
        # differently from DuckDB's `//`
        (F.sum("n_tokens") * 1000).cast("long").alias("__num"),
        (F.countDistinct("pack_id") * PACK_BUDGET).cast("long").alias("__den"),
    ).select(
        "lang", "n_windows", "total_tokens", "lp_lower_bound",
        "crossing_docs",
        F.expr("__num div __den").cast("long").alias("fill_permille"),
    )


QUERIES["sample_pack_audit"] = sample_pack_audit

from image_matadata_batchprocessing_aws_spark.queries.sampling import (  # noqa: E402
    PACK_BUDGET as _PB,
)

ORACLES["sample_pack_audit"] = rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
      FROM documents),
    offs AS (
      SELECT doc_id, lang, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS pack_offset
      FROM toks),
    packed AS (
      SELECT lang, n_tokens, pack_offset,
             CAST(floor(pack_offset / {_PB}) AS BIGINT) AS pack_id,
             CAST(floor((pack_offset + n_tokens - 1) / {_PB}) AS BIGINT)
                 AS end_pack
      FROM offs)
    SELECT lang,
           CAST(count(DISTINCT pack_id) AS BIGINT) AS n_windows,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_tokens) + {_PB} - 1) // {_PB} AS BIGINT)
               AS lp_lower_bound,
           CAST(sum(CASE WHEN end_pack <> pack_id THEN 1 ELSE 0 END)
                AS BIGINT) AS crossing_docs,
           CAST(sum(n_tokens) * 1000 // (count(DISTINCT pack_id) * {_PB})
                AS BIGINT) AS fill_permille
    FROM packed GROUP BY lang
"""


def graph_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity of the customer->supplier purchase graph:
    the Pearson correlation between the endpoint degrees across edges —
    do high-activity customers concentrate on popular suppliers
    (r > 0) or spread across the tail (r < 0)?  The one-number mixing
    diagnostic next to `graph_degree_stats`.  Integer sufficient
    statistics (degree sums/squares/cross-products as BIGINTs), closing
    Pearson arithmetic in identical textual doubles on both engines
    (mult/div/sqrt only — all correctly-rounded IEEE)."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    cdeg = edges.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__dc"))
    sdeg = edges.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("__ds"))
    ed = edges.join(cdeg, "o_custkey").join(sdeg, "l_suppkey")
    stats = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("__dc").cast("long").alias("sx"),
        F.sum("__ds").cast("long").alias("sy"),
        F.sum(F.col("__dc") * F.col("__dc")).cast("long").alias("sxx"),
        F.sum(F.col("__ds") * F.col("__ds")).cast("long").alias("syy"),
        F.sum(F.col("__dc") * F.col("__ds")).cast("long").alias("sxy"),
    )
    r = (
        (F.col("n_edges") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt(
            (F.col("n_edges") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            * (F.col("n_edges") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        )
    )
    return stats.select(
        "n_edges", "sx", "sy", "sxx", "syy", "sxy",
        F.round(r, 6).alias("assortativity"),
    )


QUERIES["graph_assortativity"] = graph_assortativity

ORACLES["graph_assortativity"] = """
    WITH edges AS (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    cdeg AS (SELECT o_custkey, count(*) AS dc FROM edges GROUP BY 1),
    sdeg AS (SELECT l_suppkey, count(*) AS ds FROM edges GROUP BY 1),
    ed AS (SELECT e.*, c.dc, s.ds
           FROM edges e JOIN cdeg c USING (o_custkey)
                        JOIN sdeg s USING (l_suppkey)),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(dc) AS BIGINT) AS sx,
             CAST(sum(ds) AS BIGINT) AS sy,
             CAST(sum(dc * dc) AS BIGINT) AS sxx,
             CAST(sum(ds * ds) AS BIGINT) AS syy,
             CAST(sum(dc * ds) AS BIGINT) AS sxy
      FROM ed)
    SELECT n_edges, sx, sy, sxx, syy, sxy,
           round(CAST(n_edges * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)
                        * CAST(n_edges * syy - sy * sy AS DOUBLE)), 6)
               AS assortativity
    FROM stats
"""


# --- Boruvka minimum spanning forest --------------------------------------


def graph_mst_boruvka(spark: SparkSession, sf: str) -> DataFrame:
    """Minimum spanning forest of the nation-level trade graph (edge
    weight = total inter-nation revenue cents), computed by the real
    distributed algorithm — :func:`operators.graph.boruvka_msf`, O(log V)
    hook-and-contract rounds — while the oracle derives the SAME unique
    forest from Kruskal's cycle property in one recursive CTE (an edge
    is in the MSF iff its endpoints are not connected by strictly
    earlier edges under the (w, a, b) total order).  Two independent
    algorithms, one bit-exact answer: the strongest oracle form a
    graph operator can carry.  Integer weights (cent sums) keep the
    edge order engine-independent."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import boruvka_msf

    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").cast("long").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").cast("long").alias("b"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    edges = pairs.groupBy("a", "b").agg(F.sum("cents").cast("long").alias("w"))
    msf = boruvka_msf(edges, "a", "b", "w")
    return msf.select(
        F.col("a").alias("nation_a"),
        F.col("b").alias("nation_b"),
        F.col("w").alias("weight_cents"),
    )


QUERIES["graph_mst_boruvka"] = graph_mst_boruvka

ORACLES["graph_mst_boruvka"] = """
    WITH RECURSIVE pairs AS (
      SELECT least(c.c_nationkey, s.s_nationkey) AS a,
             greatest(c.c_nationkey, s.s_nationkey) AS b,
             CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS cents
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey),
    edges AS (
      SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(sum(cents) AS BIGINT) AS w
      FROM pairs GROUP BY a, b),
    ranked AS (
      SELECT a, b, w, row_number() OVER (ORDER BY w, a, b) AS rnk
      FROM edges),
    -- nodes reachable from edge rnk's endpoint a using STRICTLY earlier
    -- edges; Kruskal cycle property: the edge joins the forest iff its
    -- other endpoint b is never reached
    reach(er, node) AS (
      SELECT rnk AS er, a AS node FROM ranked
      UNION
      SELECT r.er, CASE WHEN f.a = r.node THEN f.b ELSE f.a END AS node
      FROM reach r
      JOIN ranked e ON e.rnk = r.er
      JOIN ranked f ON f.rnk < e.rnk AND (f.a = r.node OR f.b = r.node))
    SELECT e.a AS nation_a, e.b AS nation_b, e.w AS weight_cents
    FROM ranked e
    WHERE NOT EXISTS (SELECT 1 FROM reach r
                      WHERE r.er = e.rnk AND r.node = e.b)
"""


# --- winnowing fingerprints (MOSS) ----------------------------------------

WINNOW_K = 3  # token k-grams hashed
WINNOW_W = 4  # hashes per window -> guarantee threshold t = K + W - 1


def _winnow_selected(spark: SparkSession, sf: str):
    """Shared winnowing selector: the distinct (doc_id, fp, sel_pos)
    fingerprints every winnowing query builds on — ONE definition so
    the fingerprint summary, the pair generator, and the dedup pipeline
    can never desynchronize on K/W or the tie-break.  Returns
    (selected, grams): the grams frame is the positional k-gram table
    the selection rode (callers that need per-doc gram counts reuse it
    instead of re-shingling)."""
    from pyspark.sql import Window

    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        positional_kgrams,
    )

    docs = t(spark, sf, "documents")
    g = positional_kgrams(docs, "text", "doc_id", WINNOW_K)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    sel = (
        g.select(
            "doc_id",
            "pos",
            F.min(F.struct(F.col("fp"), (-F.col("pos")).alias("np")))
            .over(w)
            .alias("m"),
        )
        .where(F.col("pos") >= WINNOW_W - 1)
        .select(
            "doc_id", F.col("m.fp").alias("fp"), (-F.col("m.np")).alias("sel_pos")
        )
        .distinct()
    )
    return sel, g


def _winnow_sel_ctes() -> str:
    """The DuckDB twin of :func:`_winnow_selected`: toks/pos/grams/
    winmin/sel CTE chain ending in sel(doc_id, fp, sel_pos)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    fp = md5_int64_sql(
        f"array_to_string(list_slice(t, pos + 1, pos + {WINNOW_K}), ' ')"
    )
    return rf"""toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE trim(text) <> ''),
    pos AS (
      SELECT doc_id, t, unnest(range(len(t) - {WINNOW_K - 1})) AS pos
      FROM toks WHERE len(t) >= {WINNOW_K}),
    grams AS (SELECT doc_id, pos, {fp} AS fp FROM pos),
    -- (fp asc, pos desc) lexicographic min as a zero-padded varchar:
    -- the rightmost-minimum selector of the winnowing paper
    winmin AS (
      SELECT doc_id, pos,
             min(lpad(CAST(fp AS VARCHAR), 19, '0')
                 || lpad(CAST(99999999 - pos AS VARCHAR), 8, '0'))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
               AS m
      FROM grams),
    sel AS (
      SELECT DISTINCT doc_id,
             CAST(substr(m, 1, 19) AS BIGINT) AS fp,
             99999999 - CAST(substr(m, 20, 8) AS BIGINT) AS sel_pos
      FROM winmin WHERE pos >= {WINNOW_W - 1})"""


def text_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS selector): over the positional token-3-gram hash
    stream, every window of 4 consecutive hashes selects its RIGHTMOST
    MINIMUM, and the distinct selected (position, hash) pairs are the
    document's fingerprints — any shared substring of >= K+W-1 tokens
    between two documents is GUARANTEED to share a fingerprint, at an
    expected density of only 2/(W+1) of positions.

    Spark shape: one narrow (id, pos, fp) stream (the exact
    :func:`operators.substrings.positional_kgrams` table the Lee-et-al
    dedup rides — text never shuffles), ONE doc-keyed window pass where
    ``min(struct(fp, -pos))`` is the rightmost-min selector (struct min
    partial-aggregates inside the window frame), then a per-doc count
    rollup.  The oracle encodes the same (fp, -pos) order as a
    zero-padded varchar so DuckDB's window min agrees bitwise.  Docs
    with fewer than W k-grams have no full window and drop on both
    sides (the paper's guarantee only speaks from window W up)."""
    sel, g = _winnow_selected(spark, sf)
    n_grams = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    summary = sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.countDistinct("fp").cast("long").alias("n_distinct_fp"),
        F.min("sel_pos").cast("long").alias("first_pos"),
        F.max("sel_pos").cast("long").alias("last_pos"),
    )
    return n_grams.join(summary, "doc_id").select(
        "doc_id", "n_grams", "n_fingerprints", "n_distinct_fp",
        "first_pos", "last_pos",
    )


QUERIES["text_winnow_fingerprints"] = text_winnow_fingerprints


def _winnow_oracle() -> str:
    return rf"""
    WITH {_winnow_sel_ctes()},
    ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           FROM grams GROUP BY doc_id),
    summary AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_fingerprints,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
             CAST(min(sel_pos) AS BIGINT) AS first_pos,
             CAST(max(sel_pos) AS BIGINT) AS last_pos
      FROM sel GROUP BY doc_id)
    SELECT ng.doc_id, n_grams, n_fingerprints, n_distinct_fp,
           first_pos, last_pos
    FROM ng JOIN summary USING (doc_id)
"""


ORACLES["text_winnow_fingerprints"] = _winnow_oracle()


# --- clustering evaluation: purity + adjusted Rand ------------------------


def eval_cluster_rand(spark: SparkSession, sf: str) -> DataFrame:
    """External clustering evaluation of the fixed-centroid assignment
    against the ground-truth ``label`` column: PURITY (share of points
    whose cluster's majority label is their own) and the ADJUSTED RAND
    INDEX (Hubert & Arabie 1985) — the two standard "did the clustering
    find the classes" numbers a curation pipeline checks before trusting
    cluster-level decisions (SemDeDup budgets, cluster-balanced
    sampling).

    Everything reduces over the k x c contingency table (tiny), built
    with one (cid, label) groupBy after the map-side literal-centroid
    assignment — no shuffle carries a vector.  All pair counts are exact
    BIGINT binomials; ARI closes in one identically-written double
    expression on both engines (mult/div/sub only, all correctly-rounded
    IEEE), purity closes in integer permille."""
    from image_matadata_batchprocessing_aws_spark.operators.clustering import (
        assign_clusters,
    )
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        _emb,
        _fixed_centroids,
    )

    e = _emb(spark, sf)
    cents = _fixed_centroids(e)
    assigned = assign_clusters(e, cents, vec_col="e", out="cid").select(
        "vec_id", F.col("cid").cast("long").alias("cid")
    )
    lab = t(spark, sf, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    ct = (
        assigned.join(lab, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=False)  # three reductions read it
    )

    def comb2(c):
        return F.expr(f"{c} * ({c} - 1) div 2")

    cells = ct.agg(
        F.sum(comb2("nij")).cast("long").alias("sum_pair_cells"),
        F.sum("nij").cast("long").alias("n"),
    )
    rows_ = (
        ct.groupBy("cid")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.sum(comb2("ai")).cast("long").alias("sum_pair_rows"))
    )
    cols_ = (
        ct.groupBy("label")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(comb2("bj")).cast("long").alias("sum_pair_cols"))
    )
    pur = (
        ct.groupBy("cid")
        .agg(F.max("nij").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("purity_num"))
    )
    one = (
        cells.crossJoin(F.broadcast(rows_))
        .crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(pur))
    )
    tot = F.expr("n * (n - 1) div 2").cast("double")
    sc = F.col("sum_pair_cells").cast("double")
    sa = F.col("sum_pair_rows").cast("double")
    sb = F.col("sum_pair_cols").cast("double")
    ari = (sc - sa * sb / tot) / ((sa + sb) / F.lit(2.0) - sa * sb / tot)
    return one.select(
        "n",
        "sum_pair_cells",
        "sum_pair_rows",
        "sum_pair_cols",
        "purity_num",
        F.expr("purity_num * 1000 div n").cast("long").alias("purity_permille"),
        F.round(ari, 6).alias("ari"),
    )


QUERIES["eval_cluster_rand"] = eval_cluster_rand


def _cluster_rand_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        _ASSIGN_CTES,
    )

    return f"""
    WITH {_ASSIGN_CTES},
    ct AS (
      SELECT a.cid, e.label, CAST(count(*) AS BIGINT) AS nij
      FROM assigned a JOIN embeddings e USING (vec_id)
      GROUP BY a.cid, e.label),
    cells AS (
      SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sum_pair_cells,
             CAST(sum(nij) AS BIGINT) AS n
      FROM ct),
    rows_ AS (
      SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS sum_pair_rows
      FROM (SELECT sum(nij) AS ai FROM ct GROUP BY cid)),
    cols_ AS (
      SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS sum_pair_cols
      FROM (SELECT sum(nij) AS bj FROM ct GROUP BY label)),
    pur AS (
      SELECT CAST(sum(mx) AS BIGINT) AS purity_num
      FROM (SELECT max(nij) AS mx FROM ct GROUP BY cid))
    SELECT n, sum_pair_cells, sum_pair_rows, sum_pair_cols, purity_num,
           CAST(purity_num * 1000 // n AS BIGINT) AS purity_permille,
           round((CAST(sum_pair_cells AS DOUBLE)
                  - CAST(sum_pair_rows AS DOUBLE) * CAST(sum_pair_cols AS DOUBLE)
                    / CAST(n * (n - 1) // 2 AS DOUBLE))
                 / ((CAST(sum_pair_rows AS DOUBLE) + CAST(sum_pair_cols AS DOUBLE))
                      / 2.0
                    - CAST(sum_pair_rows AS DOUBLE) * CAST(sum_pair_cols AS DOUBLE)
                      / CAST(n * (n - 1) // 2 AS DOUBLE)), 6) AS ari
    FROM cells, rows_, cols_, pur
"""


ORACLES["eval_cluster_rand"] = _cluster_rand_oracle()


# --- length-bucketed batching pad-waste audit ------------------------------

LEN_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096]
LEN_OVERSIZE = 1 << 20  # docs beyond the last boundary: own overflow bucket


def sample_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Pad-waste audit for length-bucketed batching (the seq2seq /
    encoder trick: group sequences into power-of-two-ish length buckets
    so each batch pads to its bucket cap, not the global max).  Per
    bucket: doc count, real tokens, padded slots, integer fill
    permille — and the naive global-max-pad slot count alongside, so
    the report quantifies exactly what bucketing saves.  One map-side
    CASE + one tiny groupBy; the global max is a 1-row broadcast."""
    from image_matadata_batchprocessing_aws_spark.operators.text import token_count

    d = t(spark, sf, "documents").select(
        token_count("text").cast("long").alias("n_tokens")
    )
    cap = F.lit(LEN_OVERSIZE)
    for b in reversed(LEN_BUCKETS):
        cap = F.when(F.col("n_tokens") <= b, F.lit(b)).otherwise(cap)
    gmax = d.agg(F.max("n_tokens").alias("__gmax"))
    per = (
        d.select(cap.cast("long").alias("bucket_cap"), "n_tokens")
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .crossJoin(F.broadcast(gmax))
    )
    return per.select(
        "bucket_cap",
        "n_docs",
        "total_tokens",
        (F.col("n_docs") * F.col("bucket_cap") - F.col("total_tokens"))
        .cast("long")
        .alias("padded_slots"),
        F.expr("total_tokens * 1000 div (n_docs * bucket_cap)")
        .cast("long")
        .alias("fill_permille"),
        (F.col("n_docs") * F.col("__gmax") - F.col("total_tokens"))
        .cast("long")
        .alias("naive_padded_slots"),
    )


QUERIES["sample_length_buckets"] = sample_length_buckets


def _len_bucket_oracle() -> str:
    case = "CASE "
    for b in LEN_BUCKETS:
        case += f"WHEN n_tokens <= {b} THEN {b} "
    case += f"ELSE {LEN_OVERSIZE} END"
    return rf"""
    WITH d AS (
      SELECT CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END
             AS BIGINT) AS n_tokens
      FROM documents),
    gmax AS (SELECT max(n_tokens) AS gm FROM d),
    per AS (
      SELECT CAST({case} AS BIGINT) AS bucket_cap,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM d GROUP BY 1)
    SELECT bucket_cap, n_docs, total_tokens,
           CAST(n_docs * bucket_cap - total_tokens AS BIGINT) AS padded_slots,
           CAST(total_tokens * 1000 // (n_docs * bucket_cap) AS BIGINT)
               AS fill_permille,
           CAST(n_docs * gm - total_tokens AS BIGINT) AS naive_padded_slots
    FROM per, gmax
"""


ORACLES["sample_length_buckets"] = _len_bucket_oracle()


# --- l-diversity privacy audit ---------------------------------------------

L_DIV_L = 3  # equivalence classes need >= 3 distinct sensitive values


def etl_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) on the same
    (nation, market-segment) quasi-identifier as ``etl_k_anonymity``:
    k-anonymity alone still leaks when an equivalence class is sensitive-
    homogeneous, so this reports each class's count of DISTINCT
    sensitive values (account-balance kilobucket) and flags classes
    below l=3.  One groupBy with a distinct-count — the release gate
    runs it next to the k-audit."""
    c = t(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("__band"),
    )
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.countDistinct("__band").cast("long").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "l_distinct",
            (F.col("l_distinct") < L_DIV_L).alias("at_risk"),
        )
    )


QUERIES["etl_l_diversity"] = etl_l_diversity

ORACLES["etl_l_diversity"] = f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                AS BIGINT) AS l_distinct,
           count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
               < {L_DIV_L} AS at_risk
    FROM customer GROUP BY 1, 2
"""


# --- DeLong AUC variance + CI ----------------------------------------------


def eval_auc_delong(spark: SparkSession, sf: str) -> DataFrame:
    """ROC AUC with DeLong variance and 95% CI per order status
    (:func:`operators.evaluation.roc_auc_delong`) — the "is this AUC
    actually better" significance machinery next to the point estimate
    ``eval_roc_auc`` already reports.  Placements stay integral per
    DISTINCT score (never a row-level rank window); both engines close
    the variance from the same four BIGINT sufficient statistics in one
    identically-structured double expression."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        roc_auc_delong,
    )

    o = t(spark, sf, "orders").withColumn(
        "__y",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0),
    )
    return roc_auc_delong(o, "o_totalprice", "__y", group_by=["o_orderstatus"])


QUERIES["eval_auc_delong"] = eval_auc_delong

ORACLES["eval_auc_delong"] = """
    WITH per AS (
      SELECT o_orderstatus, o_totalprice AS s,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN 1 ELSE 0 END) AS p,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN 0 ELSE 1 END) AS n
      FROM orders GROUP BY 1, 2),
    cum AS (
      SELECT o_orderstatus, p, n,
             coalesce(sum(n) OVER (PARTITION BY o_orderstatus ORDER BY s ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg,
             coalesce(sum(p) OVER (PARTITION BY o_orderstatus ORDER BY s ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumpos,
             sum(p) OVER (PARTITION BY o_orderstatus) AS ptot
      FROM per),
    agg AS (
      -- all four placement statistics stay HUGEINT (sums grow ~n^2/2
      -- and ~n^3/2, topping int64 at ~6e9 / ~2.6M rows per group); the
      -- close converts each exact integer to DOUBLE once, matching
      -- Spark's DECIMAL(38,0) accumulation path
      SELECT o_orderstatus,
             CAST(sum(p) AS BIGINT) AS np, CAST(sum(n) AS BIGINT) AS nn,
             sum(p * (2 * cumneg + n)) AS svp,
             sum(p * (2 * cumneg + n) * (2 * cumneg + n)) AS svp2,
             sum(n * (2 * (ptot - cumpos - p) + p)) AS svn,
             sum(n * (2 * (ptot - cumpos - p) + p)
                   * (2 * (ptot - cumpos - p) + p)) AS svn2
      FROM cum GROUP BY 1),
    closed AS (
      SELECT o_orderstatus, np AS n_pos, nn AS n_neg,
             CAST(svp AS DOUBLE)
               / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc,
             sqrt((CAST(np AS DOUBLE) * CAST(svp2 AS DOUBLE)
                     - CAST(svp AS DOUBLE) * CAST(svp AS DOUBLE))
                   / (CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) - 1.0))
                   / ((2.0 * CAST(nn AS DOUBLE)) * (2.0 * CAST(nn AS DOUBLE)))
                   / CAST(np AS DOUBLE)
                 + (CAST(nn AS DOUBLE) * CAST(svn2 AS DOUBLE)
                     - CAST(svn AS DOUBLE) * CAST(svn AS DOUBLE))
                   / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))
                   / ((2.0 * CAST(np AS DOUBLE)) * (2.0 * CAST(np AS DOUBLE)))
                   / CAST(nn AS DOUBLE)) AS se,
             np > 1 AND nn > 1 AS ok
      FROM agg)
    SELECT o_orderstatus, n_pos, n_neg,
           round(CASE WHEN ok THEN auc END, 6) AS auc,
           round(CASE WHEN ok THEN se END, 6) AS se,
           round(CASE WHEN ok THEN auc - 1.96 * se END, 6) AS ci_lo,
           round(CASE WHEN ok THEN auc + 1.96 * se END, 6) AS ci_hi
    FROM closed
"""


# --- referentially-consistent pseudonymization ------------------------------


def etl_pseudonym_referential(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity-preserving pseudonymization: mask the
    customer key with the SAME keyed 60-bit md5 on both sides of the
    customer<->orders foreign key, then PROVE the masked join still
    carries the workload — per nation, orders joined through the masked
    key must equal orders joined through the natural key, and the
    masked key space must stay collision-free.  The audit a privacy
    pass ships with its masking job (masking each table independently
    is the classic way to silently break every downstream join)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    def mask(col):
        return md5_int64(F.concat(F.lit("cust\x1f"), F.col(col).cast("string")))

    c = t(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", mask("c_custkey").alias("c_masked")
    )
    o = t(spark, sf, "orders").select(
        "o_custkey", mask("o_custkey").alias("o_masked")
    )
    natural = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("orders_natural"))
    )
    masked = (
        o.join(c, o["o_masked"] == c["c_masked"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("orders_masked"))
    )
    keys = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.countDistinct("c_masked").cast("long").alias("n_masked_distinct"),
    )
    return (
        keys.join(natural, "c_nationkey")
        .join(masked, "c_nationkey")
        .select(
            "c_nationkey",
            "n_customers",
            "n_masked_distinct",
            "orders_natural",
            "orders_masked",
            (
                (F.col("n_customers") == F.col("n_masked_distinct"))
                & (F.col("orders_natural") == F.col("orders_masked"))
            ).alias("referential_ok"),
        )
    )


QUERIES["etl_pseudonym_referential"] = etl_pseudonym_referential


def _pseudonym_ref_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    cm = md5_int64_sql("'cust' || chr(31) || CAST(c_custkey AS VARCHAR)")
    om = md5_int64_sql("'cust' || chr(31) || CAST(o_custkey AS VARCHAR)")
    return f"""
    WITH c AS (SELECT c_custkey, c_nationkey, {cm} AS c_masked FROM customer),
    o AS (SELECT o_custkey, {om} AS o_masked FROM orders),
    natural_j AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS orders_natural
      FROM o JOIN c ON o.o_custkey = c.c_custkey GROUP BY 1),
    masked_j AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS orders_masked
      FROM o JOIN c ON o.o_masked = c.c_masked GROUP BY 1),
    keys AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(count(DISTINCT c_masked) AS BIGINT) AS n_masked_distinct
      FROM c GROUP BY 1)
    SELECT k.c_nationkey, n_customers, n_masked_distinct,
           orders_natural, orders_masked,
           n_customers = n_masked_distinct
             AND orders_natural = orders_masked AS referential_ok
    FROM keys k
    JOIN natural_j USING (c_nationkey)
    JOIN masked_j USING (c_nationkey)
"""


ORACLES["etl_pseudonym_referential"] = _pseudonym_ref_oracle()


# --- Herfindahl concentration ----------------------------------------------


def agg_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation, on the standard 0-10000 basis-point scale (HHI =
    sum of squared integer share-bp) — the antitrust-style "is this
    market one supplier in a trenchcoat" number, and for data work the
    skew diagnostic for any key's value concentration.  Exact integer
    cent sums -> integer share basis points (div) -> integer HHI; no
    floats anywhere."""
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    li = t(spark, sf, "lineitem").select(
        "l_suppkey", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("cents").alias("__rev"))
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("__rev").alias("__tot"))
    shares = rev.join(tot, "s_nationkey").select(
        "s_nationkey", F.expr("__rev * 10000 div __tot").alias("__bp")
    )
    return shares.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.max("__bp").cast("long").alias("top_share_bp"),
        F.sum(F.col("__bp") * F.col("__bp")).cast("long").alias("hhi"),
    )


QUERIES["agg_hhi"] = agg_hhi

ORACLES["agg_hhi"] = """
    WITH rev AS (
      SELECT s_nationkey, s_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                  AS BIGINT) AS r
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    tot AS (SELECT s_nationkey, CAST(sum(r) AS BIGINT) AS t
            FROM rev GROUP BY 1),
    shares AS (
      SELECT rev.s_nationkey, CAST(rev.r * 10000 // tot.t AS BIGINT) AS bp
      FROM rev JOIN tot USING (s_nationkey))
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(max(bp) AS BIGINT) AS top_share_bp,
           CAST(sum(bp * bp) AS BIGINT) AS hhi
    FROM shares GROUP BY 1
"""


# --- k-anonymity generalization ladder --------------------------------------


def etl_k_generalize(spark: SparkSession, sf: str) -> DataFrame:
    """Generalization ladder to REACH k-anonymity (the fix the
    ``etl_k_anonymity`` audit demands): equivalence classes under k=8 on
    (nation, segment) escalate to (region, segment); still-small classes
    escalate to (segment); whatever remains is suppressed outright.
    Deterministic global recoding — three grouped passes over a
    shrinking escalation set, broadcast-joined against the small-key
    lists, publishing one row per released class with its
    generalization level."""
    from image_matadata_batchprocessing_aws_spark.queries.r05_queue import K_ANON_K

    n = t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf, "region").select("r_regionkey", "r_name")
    rows = (
        t(spark, sf, "customer")
        .select("c_nationkey", "c_mktsegment")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_name").alias("g_nation"),
            F.col("r_name").alias("g_region"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    g0 = rows.groupBy("g_nation", "seg").agg(F.count(F.lit(1)).alias("c"))
    pub0 = g0.where(F.col("c") >= K_ANON_K).select(
        F.lit(0).cast("long").alias("level"),
        F.col("g_nation").alias("g1"),
        F.col("seg").alias("g2"),
        F.col("c").cast("long").alias("n"),
    )
    esc1 = rows.join(
        F.broadcast(g0.where(F.col("c") < K_ANON_K).select("g_nation", "seg")),
        ["g_nation", "seg"],
    )
    g1 = esc1.groupBy("g_region", "seg").agg(F.count(F.lit(1)).alias("c"))
    pub1 = g1.where(F.col("c") >= K_ANON_K).select(
        F.lit(1).cast("long").alias("level"),
        F.col("g_region").alias("g1"),
        F.col("seg").alias("g2"),
        F.col("c").cast("long").alias("n"),
    )
    esc2 = esc1.join(
        F.broadcast(g1.where(F.col("c") < K_ANON_K).select("g_region", "seg")),
        ["g_region", "seg"],
    )
    g2 = esc2.groupBy("seg").agg(F.count(F.lit(1)).alias("c"))
    pub2 = g2.where(F.col("c") >= K_ANON_K).select(
        F.lit(2).cast("long").alias("level"),
        F.lit("*").alias("g1"),
        F.col("seg").alias("g2"),
        F.col("c").cast("long").alias("n"),
    )
    pub3 = (
        g2.where(F.col("c") < K_ANON_K)
        .agg(F.sum("c").alias("c"))
        .where(F.col("c").isNotNull())
        .select(
            F.lit(3).cast("long").alias("level"),
            F.lit("*").alias("g1"),
            F.lit("*").alias("g2"),
            F.col("c").cast("long").alias("n"),
        )
    )
    return pub0.unionByName(pub1).unionByName(pub2).unionByName(pub3)


QUERIES["etl_k_generalize"] = etl_k_generalize


def _k_generalize_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.r05_queue import K_ANON_K

    return f"""
    WITH rows_ AS (
      SELECT n_name AS g_nation, r_name AS g_region, c_mktsegment AS seg
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    g0 AS (SELECT g_nation, seg, count(*) AS c FROM rows_ GROUP BY 1, 2),
    esc1 AS (SELECT r.* FROM rows_ r
             JOIN g0 ON r.g_nation = g0.g_nation AND r.seg = g0.seg
             WHERE g0.c < {K_ANON_K}),
    g1 AS (SELECT g_region, seg, count(*) AS c FROM esc1 GROUP BY 1, 2),
    esc2 AS (SELECT e.* FROM esc1 e
             JOIN g1 ON e.g_region = g1.g_region AND e.seg = g1.seg
             WHERE g1.c < {K_ANON_K}),
    g2 AS (SELECT seg, count(*) AS c FROM esc2 GROUP BY 1)
    SELECT CAST(0 AS BIGINT) AS level, g_nation AS g1, seg AS g2,
           CAST(c AS BIGINT) AS n
    FROM g0 WHERE c >= {K_ANON_K}
    UNION ALL
    SELECT CAST(1 AS BIGINT), g_region, seg, CAST(c AS BIGINT)
    FROM g1 WHERE c >= {K_ANON_K}
    UNION ALL
    SELECT CAST(2 AS BIGINT), '*', seg, CAST(c AS BIGINT)
    FROM g2 WHERE c >= {K_ANON_K}
    UNION ALL
    SELECT CAST(3 AS BIGINT), '*', '*', CAST(sum(c) AS BIGINT)
    FROM g2 WHERE c < {K_ANON_K} HAVING sum(c) IS NOT NULL
"""


ORACLES["etl_k_generalize"] = _k_generalize_oracle()


# --- streaming bottom-k sample (batch twin) ---------------------------------

BOTTOMK_SAMPLE_K = 64


def stream_bottomk_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING deterministic bottom-k sample
    (`streaming/sampling.py`): a uniform sample of an unbounded stream
    kept exactly, as the k smallest keyed-md5 ranks.  Bottom-k is
    mergeable (min-k of a union = min-k of carried min-k's), so the
    foreachBatch sink's state after any stream prefix equals THIS query
    over the same rows bit-for-bit (tests/test_streaming.py asserts
    stream == batch across micro-batches).  Spark plans the batch form
    as TakeOrderedAndProject — per-partition top-k then a k-row merge,
    never a global sort."""
    from image_matadata_batchprocessing_aws_spark.streaming.sampling import (
        bottomk_sample,
    )

    e = t(spark, sf, "events").select("event_id", "user_id", "event_type")
    return bottomk_sample(e, BOTTOMK_SAMPLE_K)


QUERIES["stream_bottomk_sample"] = stream_bottomk_sample


def _bottomk_sample_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    h = md5_int64_sql("CAST(event_id AS VARCHAR)")
    return f"""
    SELECT event_id, user_id, event_type, {h} AS h
    FROM events WHERE event_id IS NOT NULL
    ORDER BY h, event_id LIMIT {BOTTOMK_SAMPLE_K}
"""


ORACLES["stream_bottomk_sample"] = _bottomk_sample_oracle()


# --- rank-biased overlap of the ANN ranking ---------------------------------

RBO_P = 0.9
RBO_SCALE = 1 << 40
#: Per-depth weights (1-p)*p^(d-1)/d on the 2^40 integer scale, computed
#: ONCE in Python and embedded as literals in both engines (the
#: eval_ann_ndcg discount recipe) — a matched pair at truth-rank t and
#: approx-rank a is inside every prefix of depth >= max(t, a), so its
#: total weight is the suffix sum CUMW[max(t, a)] and the per-query RBO
#: fold is pure integer arithmetic.
_RBO_W = [
    round(RBO_SCALE * (1 - RBO_P) * RBO_P ** (d - 1) / d) for d in range(1, 6)
]
RBO_CUMW = [sum(_RBO_W[m:]) for m in range(5)]  # CUMW[m-1] = sum_{d=m..K}


def eval_rank_rbo(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010, truncated-@K
    lower-bound form) between the exact L2 top-5 ranking and the IVFPQ
    ranking, per query — the ranking-similarity companion to
    `eval_ann_recall` (set overlap) and `eval_ann_ndcg` (graded order):
    RBO weights agreement at the TOP of the lists, which is what an ANN
    serving path actually returns to users.  One equi-join of the two
    rankings + an integer suffix-weight lookup; the only float op is the
    final descale."""
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        ann_ivfpq,
        knn_brute_l2,
    )

    truth = knn_brute_l2(spark, sf).select(
        "query_id", "neighbor_id", F.col("rn").alias("rn_t")
    )
    approx = ann_ivfpq(spark, sf).select(
        "query_id", "neighbor_id", F.col("rn").alias("rn_a")
    )
    cumw = F.array(*[F.lit(w) for w in RBO_CUMW])
    matched = truth.join(approx, ["query_id", "neighbor_id"]).select(
        "query_id",
        F.element_at(
            cumw, F.greatest("rn_t", "rn_a").cast("int")
        ).alias("__w"),
    )
    per_q = (
        approx.select("query_id")
        .distinct()
        .join(
            matched.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("__n"), F.sum("__w").alias("__s")
            ),
            "query_id",
            "left",
        )
    )
    s = F.coalesce("__s", F.lit(0))
    return per_q.select(
        "query_id",
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_matched"),
        s.cast("long").alias("rbo_scaled"),
        F.round(s.cast("double") / F.lit(float(RBO_SCALE)), 6).alias("rbo"),
    )


QUERIES["eval_rank_rbo"] = eval_rank_rbo


def _rbo_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.similarity import ORACLES as SIM

    case = " ".join(
        f"WHEN {m + 1} THEN CAST({w} AS BIGINT)" for m, w in enumerate(RBO_CUMW)
    )
    return f"""
    WITH truth AS ({SIM["knn_brute_l2"]}),
    approx AS ({SIM["ann_ivfpq"]}),
    matched AS (
      SELECT t.query_id,
             CASE greatest(t.rn, a.rn) {case} END AS w
      FROM truth t JOIN approx a
        ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
    folded AS (
      SELECT query_id, count(*) AS n_matched, sum(w) AS s
      FROM matched GROUP BY query_id)
    SELECT q.query_id,
           CAST(coalesce(n_matched, 0) AS BIGINT) AS n_matched,
           CAST(coalesce(s, 0) AS BIGINT) AS rbo_scaled,
           round(CAST(coalesce(s, 0) AS DOUBLE) / {float(RBO_SCALE)!r}, 6) AS rbo
    FROM (SELECT DISTINCT query_id FROM approx) q
    LEFT JOIN folded USING (query_id)
"""


ORACLES["eval_rank_rbo"] = _rbo_oracle()


# --- DAU/MAU stickiness ------------------------------------------------------


def agg_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    """Engagement stickiness per calendar month: monthly active users,
    the average daily-active count across the month's observed days,
    and the DAU/MAU ratio in integer permille — the product-analytics
    staple next to `agg_engagement_daily` and the retention cohorts.
    Two distinct-count aggregates on calendar keys; the ratio closes in
    exact integer `div` arithmetic."""
    e = (
        t(spark, sf, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_millis(F.date_trunc("month", "ts")).alias("month_ms"),
            F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
        )
    )
    dau = e.groupBy("month_ms", "day_ms").agg(
        F.countDistinct("user_id").alias("__dau")
    )
    daily = dau.groupBy("month_ms").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__dau").cast("long").alias("__dau_sum"),
    )
    mau = e.groupBy("month_ms").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    return daily.join(mau, "month_ms").select(
        "month_ms",
        "mau",
        "n_days",
        F.expr("__dau_sum div n_days").cast("long").alias("avg_dau"),
        F.expr("__dau_sum * 1000 div (n_days * mau)")
        .cast("long")
        .alias("stickiness_permille"),
    )


QUERIES["agg_dau_mau"] = agg_dau_mau

ORACLES["agg_dau_mau"] = """
    WITH e AS (
      SELECT user_id,
             CAST(epoch_ms(date_trunc('month', ts)) AS BIGINT) AS month_ms,
             CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms
      FROM events WHERE user_id IS NOT NULL),
    dau AS (
      SELECT month_ms, day_ms, count(DISTINCT user_id) AS d
      FROM e GROUP BY 1, 2),
    daily AS (
      SELECT month_ms, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(d) AS BIGINT) AS dau_sum
      FROM dau GROUP BY 1),
    mau AS (
      SELECT month_ms, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM e GROUP BY 1)
    SELECT month_ms, mau, n_days,
           CAST(dau_sum // n_days AS BIGINT) AS avg_dau,
           CAST(dau_sum * 1000 // (n_days * mau) AS BIGINT)
               AS stickiness_permille
    FROM daily JOIN mau USING (month_ms)
"""


# --- MOSS-style near-dup pairs over winnowed fingerprints --------------------

WINNOW_PAIR_MIN = 3  # pairs must share >= 3 selected fingerprints


def dedup_winnow_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The MOSS similarity report built on `text_winnow_fingerprints`:
    candidate document pairs sharing >= 3 winnowed fingerprints, with
    the shared count — what a plagiarism/near-dup screen reviews.  The
    posting-list self-join runs over the SELECTED fingerprints only
    (~2/(W+1) of positions, winnowing's whole point: the index is
    2.5x smaller than the full k-gram posting list for the same
    t-token-match guarantee), and a frequency cap drops stop-gram
    posting lists before the join — the same hot-key guard the MinHash
    banding uses."""
    selected, _ = _winnow_selected(spark, sf)
    sel = selected.select("doc_id", "fp").distinct()
    # stop-gram guard: fingerprints in >32 docs join quadratically and
    # carry no discrimination — cap before the self-join
    hot = sel.groupBy("fp").agg(F.count(F.lit(1)).alias("__df")).where(
        F.col("__df") <= 32
    )
    posting = sel.join(hot.select("fp"), "fp")
    a = posting.select("fp", F.col("doc_id").alias("id_a"))
    b = posting.select("fp", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_PAIR_MIN)
    )


QUERIES["dedup_winnow_pairs"] = dedup_winnow_pairs


def _winnow_pairs_oracle() -> str:
    return rf"""
    WITH {_winnow_sel_ctes()},
    sd AS (SELECT DISTINCT doc_id, fp FROM sel),
    hot AS (SELECT fp FROM sd GROUP BY fp HAVING count(*) <= 32),
    posting AS (SELECT s.doc_id, s.fp FROM sd s JOIN hot USING (fp))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM posting a JOIN posting b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {WINNOW_PAIR_MIN}
"""


ORACLES["dedup_winnow_pairs"] = _winnow_pairs_oracle()


# --- multi-touch attribution credit split ------------------------------------


def join_multitouch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution over the
    click->purchase pairs of the watermarked attribution join: per
    purchase, the first and last in-window clicks take 40% credit each
    and the middles share 20% — in exact integer PERMILLE, with the
    integer-division remainder pinned to the first touch so every
    purchase's credits sum to exactly 1000 (single click = 1000,
    two clicks = 500/500).  Credit in cents of the purchase value
    follows the same `div` arithmetic.  One purchase-keyed window pair
    (row_number + count) over the join output — the credit ledger a
    marketing warehouse materializes next to the raw attribution
    pairs."""
    from image_matadata_batchprocessing_aws_spark.streaming import attribution_join
    from pyspark.sql import Window

    e = t(spark, sf, "events")
    pairs = attribution_join(
        e.where(F.col("event_type") == "click"),
        e.where(F.col("event_type") == "purchase"),
        max_delay="1 hour",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("lag_ms").desc(), "click_id"
    )
    ranked = pairs.select(
        "purchase_id",
        "click_id",
        "value",
        F.row_number().over(w).alias("position"),
        F.count(F.lit(1))
        .over(Window.partitionBy("purchase_id"))
        .alias("n_clicks"),
    )
    n = F.col("n_clicks")
    credit = (
        F.when(n == 1, F.lit(1000))
        .when(
            F.col("position") == 1,
            F.when(n == 2, F.lit(500)).otherwise(400 + F.lit(200) % (n - 2)),
        )
        .when(
            F.col("position") == n,
            F.when(n == 2, F.lit(500)).otherwise(F.lit(400)),
        )
        .otherwise(F.expr("200 div (n_clicks - 2)"))
    )
    return ranked.select(
        "purchase_id",
        "click_id",
        F.col("position").cast("long").alias("position"),
        n.cast("long").alias("n_clicks"),
        credit.cast("long").alias("credit_permille"),
        F.expr(
            "CAST(round(value * 100.0) AS BIGINT)"
        ).alias("__cents"),
    ).select(
        "purchase_id",
        "click_id",
        "position",
        "n_clicks",
        "credit_permille",
        (F.col("__cents") * F.col("credit_permille"))
        .cast("long")
        .alias("__num"),
    ).select(
        "purchase_id",
        "click_id",
        "position",
        "n_clicks",
        "credit_permille",
        F.expr("__num div 1000").cast("long").alias("credit_cents"),
    )


QUERIES["join_multitouch_attribution"] = join_multitouch_attribution

ORACLES["join_multitouch_attribution"] = """
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts AS cts
      FROM events WHERE event_type = 'click'),
    purch AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'),
    pairs AS (
      SELECT purchase_id, click_id,
             CAST(epoch_ms(pts) - epoch_ms(cts) AS BIGINT) AS lag_ms,
             round(value, 2) AS value
      FROM purch p JOIN clicks c ON c.user_id = p.user_id
       AND cts BETWEEN pts - INTERVAL 1 HOUR AND pts),
    ranked AS (
      SELECT purchase_id, click_id, value,
             CAST(row_number() OVER (PARTITION BY purchase_id
                  ORDER BY lag_ms DESC, click_id) AS BIGINT) AS position,
             CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
               AS n_clicks
      FROM pairs),
    credited AS (
      SELECT *,
             CAST(CASE WHEN n_clicks = 1 THEN 1000
                  WHEN position = 1 THEN
                    CASE WHEN n_clicks = 2 THEN 500
                         ELSE 400 + 200 % (n_clicks - 2) END
                  WHEN position = n_clicks THEN
                    CASE WHEN n_clicks = 2 THEN 500 ELSE 400 END
                  ELSE 200 // (n_clicks - 2) END AS BIGINT)
               AS credit_permille
      FROM ranked)
    SELECT purchase_id, click_id, position, n_clicks, credit_permille,
           CAST(CAST(round(value * 100.0) AS BIGINT) * credit_permille
                // 1000 AS BIGINT) AS credit_cents
    FROM credited
"""


# --- growth accounting (new / retained / resurrected / churned) --------------

DAY_MS = 86400000


def agg_growth_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Daily growth accounting of the event stream's user base: every
    active day decomposes into NEW (first-ever day), RETAINED (also
    active the previous calendar day) and RESURRECTED (returning after
    a gap), with CHURNED (active yesterday, silent today) alongside —
    the canonical DAU decomposition (active = new + retained +
    resurrected holds by construction and both engines must agree on
    every count).  Shapes: one distinct (user, day) projection feeds a
    per-user min (first day), a self-join shifted by one day, and one
    day-keyed rollup — all partial-agg-friendly, nothing keyless.
    Churn on a day with zero activity has no output row to land on and
    is dropped identically on both sides (gap days are rare at any
    realistic event volume)."""
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    ud = e.select(
        "user_id", F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).distinct()
    fd = ud.groupBy("user_id").agg(F.min("day_ms").alias("__fd"))
    prev = ud.select(
        "user_id", (F.col("day_ms") + DAY_MS).alias("day_ms"),
        F.lit(1).alias("__was_active"),
    )
    flagged = (
        ud.join(fd, "user_id")
        .join(prev, ["user_id", "day_ms"], "left")
        .select(
            "day_ms",
            (F.col("__fd") == F.col("day_ms")).cast("long").alias("__new"),
            F.coalesce("__was_active", F.lit(0)).cast("long").alias("__ret"),
        )
    )
    per_day = flagged.groupBy("day_ms").agg(
        F.count(F.lit(1)).cast("long").alias("active"),
        F.sum("__new").cast("long").alias("new_users"),
        F.sum("__ret").cast("long").alias("retained"),
        F.sum(
            (1 - F.col("__new")) * (1 - F.col("__ret"))
        ).cast("long").alias("resurrected"),
    )
    churned = (
        prev.join(ud, ["user_id", "day_ms"], "left_anti")
        .groupBy("day_ms")
        .agg(F.count(F.lit(1)).cast("long").alias("__churned"))
    )
    return per_day.join(churned, "day_ms", "left").select(
        "day_ms",
        "active",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce("__churned", F.lit(0)).cast("long").alias("churned"),
    )


QUERIES["agg_growth_accounting"] = agg_growth_accounting

ORACLES["agg_growth_accounting"] = f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms
      FROM events WHERE user_id IS NOT NULL),
    fd AS (SELECT user_id, min(day_ms) AS f FROM ud GROUP BY 1),
    prev AS (SELECT user_id, day_ms + {DAY_MS} AS day_ms FROM ud),
    flagged AS (
      SELECT u.day_ms,
             CASE WHEN fd.f = u.day_ms THEN 1 ELSE 0 END AS is_new,
             CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS is_ret
      FROM ud u
      JOIN fd ON fd.user_id = u.user_id
      LEFT JOIN prev p ON p.user_id = u.user_id AND p.day_ms = u.day_ms),
    per_day AS (
      SELECT day_ms,
             CAST(count(*) AS BIGINT) AS active,
             CAST(sum(is_new) AS BIGINT) AS new_users,
             CAST(sum(is_ret) AS BIGINT) AS retained,
             CAST(sum((1 - is_new) * (1 - is_ret)) AS BIGINT) AS resurrected
      FROM flagged GROUP BY 1),
    churned AS (
      SELECT p.day_ms, CAST(count(*) AS BIGINT) AS c
      FROM prev p LEFT JOIN ud u
        ON u.user_id = p.user_id AND u.day_ms = p.day_ms
      WHERE u.user_id IS NULL GROUP BY 1)
    SELECT d.day_ms, active, new_users, retained, resurrected,
           CAST(coalesce(c.c, 0) AS BIGINT) AS churned
    FROM per_day d LEFT JOIN churned c ON c.day_ms = d.day_ms
"""


# --- deterministic random-walk corpus (DeepWalk) -----------------------------

WALK_SEED_MOD = 50  # the PPR seed cohort: custkey % 50 == 0
WALK_STEPS = 4


def _walk_step_spark(cur: DataFrame, edges: DataFrame, step: int) -> DataFrame:
    """One walk step: among the current node's neighbors pick the one
    with the smallest md5(walk, step, neighbor) — a deterministic,
    replayable stand-in for the uniform step of DeepWalk (the hash is
    uniform over neighbors, and reruns/partitionings can't change it)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    h = md5_int64(
        F.concat_ws(
            ":",
            F.col("walk_id").cast("string"),
            F.lit(str(step)),
            F.col("dst").cast("string"),
        )
    )
    nxt = (
        cur.join(edges, cur["node"] == edges["src"])
        .select("walk_id", h.alias("__h"), "dst")
        .groupBy("walk_id")
        .agg(F.min(F.struct(F.col("__h"), F.col("dst"))).alias("__m"))
        .select("walk_id", F.col("__m.dst").alias("node"))
    )
    return nxt


def graph_walk_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """DeepWalk-style random-walk corpus over the bipartite purchase
    graph (Perozzi et al. 2014): fixed-length walks from the seed
    cohort, each step choosing the neighbor with the minimum keyed md5 —
    deterministic "randomness", so the corpus is reproducible across
    reruns, partitionings and engines, and the oracle can replay every
    step.  This is the sentence generator graph-embedding training
    feeds; each step is one equi-join + one per-walk struct-min groupBy
    (map-side partials), WALK_STEPS exchanges total, no windows."""
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        _cust_supp_edges,
    )

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    edges = _cust_supp_edges(spark, sf).localCheckpoint(eager=False)
    seeds = (
        o.where(F.col("o_custkey") % WALK_SEED_MOD == 0)
        .select((F.col("o_custkey") * 2).alias("node"))
        .distinct()
        # seeds with no edges walk nowhere: keep graph members only
        .join(edges.select(F.col("src").alias("node")).distinct(), "node")
        .select(F.col("node").alias("walk_id"), F.col("node"))
    )
    out = seeds.select(
        "walk_id", F.lit(0).cast("long").alias("step"), F.col("node")
    )
    cur = seeds
    for step in range(1, WALK_STEPS + 1):
        cur = _walk_step_spark(cur, edges, step)
        out = out.unionByName(
            cur.select(
                "walk_id", F.lit(step).cast("long").alias("step"), "node"
            )
        )
    return out


QUERIES["graph_walk_corpus"] = graph_walk_corpus


def _walk_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    h = lambda step: md5_int64_sql(  # noqa: E731
        f"CAST(walk_id AS VARCHAR) || ':' || '{step}' || ':' || CAST(dst AS VARCHAR)"
    )
    steps_sql = []
    prev = "s0"
    for step in range(1, WALK_STEPS + 1):
        steps_sql.append(f"""
    s{step} AS (
      SELECT walk_id, node FROM (
        SELECT {prev}.walk_id, e.dst AS node,
               row_number() OVER (PARTITION BY {prev}.walk_id
                   ORDER BY {h(step)}, e.dst) AS rn
        FROM {prev} JOIN edges e ON e.src = {prev}.node)
      WHERE rn = 1)""")
        prev = f"s{step}"
    selects = "\n    UNION ALL\n".join(
        f"    SELECT walk_id, CAST({i} AS BIGINT) AS step, node FROM s{i}"
        for i in range(WALK_STEPS + 1)
    )
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL SELECT s AS src, c AS dst FROM pairs),
    s0 AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS walk_id,
             CAST(o_custkey * 2 AS BIGINT) AS node
      FROM orders
      WHERE o_custkey % {WALK_SEED_MOD} = 0
        AND o_custkey * 2 IN (SELECT src FROM edges)),{",".join(steps_sql)}
{selects}
"""


ORACLES["graph_walk_corpus"] = _walk_oracle()


# --- two-proportion z-test (A/B conversion) ----------------------------------


AB_CONV_VALUE = 130.0  # conversion = user's biggest purchase tops this


def _ab_arms(spark: SparkSession, sf: str) -> DataFrame:
    """The ONE experiment definition both A/B queries share (the z-test
    and the power analysis must price the same split and metric or the
    pairing silently breaks): md5-parity arm assignment, per-user
    conversion, and the (n_a, k_a, n_b, k_b) one-row pivot."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    users = (
        e.groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > AB_CONV_VALUE)
                ).cast("long")
            ).alias("__conv")
        )
        .select(
            (
                md5_int64(
                    F.concat(F.lit("ab\x1f"), F.col("user_id").cast("string"))
                ) % 2
            ).alias("arm"),
            "__conv",
        )
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__conv").alias("__k")
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("__n").alias("n_a"), F.col("__k").alias("k_a")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("__n").alias("n_b"), F.col("__k").alias("k_b")
    )
    return a.crossJoin(F.broadcast(b))


def _ab_arms_ctes() -> str:
    """DuckDB twin of :func:`_ab_arms`, ending in
    one(n_a, k_a, n_b, k_b)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    h = md5_int64_sql("'ab' || chr(31) || CAST(user_id AS VARCHAR)")
    return f"""users AS (
      SELECT ({h}) % 2 AS arm,
             max(CASE WHEN event_type = 'purchase' AND value > {AB_CONV_VALUE}
                 THEN 1 ELSE 0 END) AS conv
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    arms AS (
      SELECT arm, count(*) AS n, sum(conv) AS k FROM users GROUP BY arm),
    one AS (
      SELECT a.n AS n_a, a.k AS k_a, b.n AS n_b, b.k AS k_b
      FROM (SELECT n, k FROM arms WHERE arm = 0) a
      CROSS JOIN (SELECT n, k FROM arms WHERE arm = 1) b)"""


def agg_ab_proportions(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test on a hash-split A/B assignment: users split
    into arms by md5 parity (deterministic, rerun-stable — the
    experiment-assignment primitive `sample_predicate` rides), the
    conversion metric is "user's biggest purchase tops 130" (every user
    on this stream purchases eventually, so bare did-purchase saturates
    at 100% and the test degenerates — the value threshold keeps the
    rates interior), and the pooled z-stat decides the arm difference —
    THE A/B significance primitive next to the Welch/means family.
    The experiment definition itself (split, metric, pivot) is the
    shared :func:`_ab_arms`, so this and `agg_power_analysis` can never
    price different experiments.  Exact integer counts all the way; the
    z closes in one identically-written double expression
    (mult/div/sqrt), the p<0.05 verdict compares |z| against the
    literal 1.96, and an all-converted or none-converted pool returns
    NULL z rather than dividing by zero."""
    one = _ab_arms(spark, sf)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ka, kb = F.col("k_a").cast("double"), F.col("k_b").cast("double")
    p_pool = (ka + kb) / (na + nb)
    ok = (F.col("k_a") + F.col("k_b") > 0) & (
        F.col("k_a") + F.col("k_b") < F.col("n_a") + F.col("n_b")
    )
    z = F.when(
        ok,
        (ka / na - kb / nb)
        / F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / na + 1.0 / nb)),
    )
    return one.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("k_a").cast("long").alias("k_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("k_b").cast("long").alias("k_b"),
        F.round(ka / na, 6).alias("rate_a"),
        F.round(kb / nb, 6).alias("rate_b"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("significant_05"),
    )


QUERIES["agg_ab_proportions"] = agg_ab_proportions


def _ab_oracle() -> str:
    return f"""
    WITH {_ab_arms_ctes()},
    closed AS (
      SELECT n_a, k_a, n_b, k_b,
             CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
             CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
             (CAST(k_a AS DOUBLE) + CAST(k_b AS DOUBLE))
               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
      FROM one)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(k_a AS BIGINT) AS k_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(k_b AS BIGINT) AS k_b,
           round(ra, 6) AS rate_a, round(rb, 6) AS rate_b,
           round(CASE WHEN k_a + k_b > 0 AND k_a + k_b < n_a + n_b THEN
                 (ra - rb) / sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                 END, 6) AS z,
           abs(CASE WHEN k_a + k_b > 0 AND k_a + k_b < n_a + n_b THEN
               (ra - rb) / sqrt(pp * (1.0 - pp)
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
               END) > 1.96 AS significant_05
    FROM closed
"""


ORACLES["agg_ab_proportions"] = _ab_oracle()


# --- OHLC bars ---------------------------------------------------------------


def ts_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly OHLC candles of the event value stream per event type —
    open/close as argmin/argmax over a zero-padded (ts, event_id)
    varchar key (deterministic under same-timestamp ties; a string
    because DuckDB's arg_min won't order by a struct), high/low as
    plain min/max.  No arithmetic touches the values at all (raw
    parquet doubles pass through), so the candles are bit-exact by
    construction; one calendar-keyed partial agg, no windows."""
    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    hour = F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms")
    key = F.concat(
        F.lpad(F.unix_millis("ts").cast("string"), 15, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.select(hour, "event_type", key.alias("__k"), "value")
        .groupBy("hour_ms", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min_by("value", F.col("__k")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("__k")).alias("close"),
        )
    )


QUERIES["ts_ohlc_bars"] = ts_ohlc_bars

ORACLES["ts_ohlc_bars"] = """
    SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           arg_min(value, lpad(CAST(epoch_ms(ts) AS VARCHAR), 15, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, lpad(CAST(epoch_ms(ts) AS VARCHAR), 15, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
"""


# --- resource-allocation link prediction --------------------------------------

RA_SCALE = 10**6
RA_TOPK = 30


def graph_resource_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Resource-allocation link-prediction index (Zhou, Lu & Zhang
    2009) on the co-purchase graph: RA(x,y) = sum over shared neighbors
    w of 1/deg(w) — the stronger cousin of Jaccard/common-neighbors
    that discounts promiscuous hubs.  Same bounded candidate shape as
    `graph_jaccard_neighbors` (pairs only from the shared-neighbor
    equi-join), and the score stays an exact integer: each shared
    neighbor contributes RA_SCALE div deg(w), so both engines fold the
    same BIGINTs — top-30 with an id tiebreak."""
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        JACC_ORDER_MOD,
    )

    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % JACC_ORDER_MOD == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "o").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    p1 = adj.select(F.col("n").alias("w"), F.col("v").alias("x"))
    p2 = adj.select(F.col("n").alias("w"), F.col("v").alias("y"))
    dw = deg.select(F.col("v").alias("w"), F.col("deg").alias("__dw"))
    scored = (
        p1.join(p2, "w")
        .where(F.col("x") < F.col("y"))
        .join(dw, "w")
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(F.expr(f"{RA_SCALE} div __dw")).cast("long").alias("ra_scaled"),
        )
    )
    return scored.orderBy(
        F.col("ra_scaled").desc(), "x", "y"
    ).limit(RA_TOPK)


QUERIES["graph_resource_allocation"] = graph_resource_allocation


def _ra_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        JACC_ORDER_MOD,
    )

    return f"""
    WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_orderkey % {JACC_ORDER_MOD} = 0),
    edges AS (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
    adj AS (SELECT a AS v, b AS n FROM edges
            UNION ALL SELECT b AS v, a AS n FROM edges),
    deg AS (SELECT v, count(*) AS deg FROM adj GROUP BY v),
    scored AS (
      SELECT p1.v AS x, p2.v AS y,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum({RA_SCALE} // d.deg) AS BIGINT) AS ra_scaled
      FROM adj p1
      JOIN adj p2 ON p1.n = p2.n AND p1.v < p2.v
      JOIN deg d ON d.v = p1.n
      GROUP BY 1, 2)
    SELECT x, y, n_common, ra_scaled FROM scored
    ORDER BY ra_scaled DESC, x, y LIMIT {RA_TOPK}
"""


ORACLES["graph_resource_allocation"] = _ra_oracle()


# --- TextRank keyphrases ------------------------------------------------------

TEXTRANK_WINDOW = 2  # co-occurrence within +/-2 token positions
TEXTRANK_ITERS = 3
TEXTRANK_TOPK = 30


def text_textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the corpus word co-occurrence graph (an undirected edge when
    two >=4-letter lowercase words appear within 2 positions in a
    document), top-30 words by rank — the graph-centrality counterpart
    to RAKE's degree heuristic and tf-idf's frequency ratio, and a
    composition proof: the SAME `pagerank_scaled` fixed-point kernel
    the purchase-graph queries run, re-pointed at a text-derived edge
    list with string nodes.  Exact: scaled-long power iteration, oracle
    unrolled as integer CTEs."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        pagerank_scaled,
    )
    from image_matadata_batchprocessing_aws_spark.operators.text import tokens

    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "w"),
    ).where(F.col("w").rlike("^[a-z]{4,}$"))
    pair_parts = []
    for k in range(1, TEXTRANK_WINDOW + 1):
        a = toks.select("doc_id", F.col("pos").alias("p"), F.col("w").alias("w1"))
        b = toks.select(
            "doc_id", (F.col("pos") - k).alias("p"), F.col("w").alias("w2")
        )
        pair_parts.append(
            a.join(b, ["doc_id", "p"]).where(F.col("w1") != F.col("w2"))
        )
    pairs = pair_parts[0].unionByName(pair_parts[1])
    und = pairs.select(
        F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
    ).distinct()
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pr = pagerank_scaled(edges, iterations=TEXTRANK_ITERS)
    return (
        pr.select(F.col("node").alias("word"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), "word")
        .limit(TEXTRANK_TOPK)
    )


QUERIES["text_textrank_keywords"] = text_textrank_keywords


def _textrank_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
    )

    base = f"({PR_SCALE} * {PR_DAMP_DEN - PR_DAMP_NUM}) // ({PR_DAMP_DEN} * nn.n)"
    shifts = " UNION ALL ".join(
        f"""SELECT a.doc_id, a.w AS w1, b.w AS w2
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + {k}"""
        for k in range(1, TEXTRANK_WINDOW + 1)
    )
    ctes = [
        r"""td AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                   FROM documents WHERE trim(text) <> '')""",
        f"""toks AS (SELECT doc_id, pos, t[pos + 1] AS w
                     FROM (SELECT doc_id, t, unnest(range(len(t))) AS pos FROM td)
                     WHERE regexp_matches(t[pos + 1], '^[a-z]{{4,}}$'))""",
        f"shifted AS ({shifts})",
        """und AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
                   FROM shifted WHERE w1 <> w2)""",
        """edges AS (SELECT a AS src, b AS dst FROM und
                     UNION ALL SELECT b AS src, a AS dst FROM und)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        """nodes AS (SELECT DISTINCT node FROM
                     (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"""r0 AS (SELECT node, CAST({PR_SCALE} // nn.n AS BIGINT) AS rank_scaled
                   FROM nodes CROSS JOIN nn)""",
    ]
    prev = "r0"
    for it in range(1, TEXTRANK_ITERS + 1):
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
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS word, rank_scaled
    FROM {prev}
    ORDER BY rank_scaled DESC, word LIMIT {TEXTRANK_TOPK}"""
    )


ORACLES["text_textrank_keywords"] = _textrank_oracle()


# --- decile lift & gains table -------------------------------------------------


def eval_lift_gains(spark: SparkSession, sf: str) -> DataFrame:
    """Decile lift/gains chart for a score column (order price scoring
    urgency, the `eval_roc_auc` setup): equal-frequency deciles via the
    broadcast exact-percentile binner (`operators/scale.quantile_bin` —
    never a global ntile window over the data), then per decile the
    positive count, cumulative GAINS permille (share of all positives
    captured walking down from the best decile) and LIFT permille
    (decile positive rate over base rate) — the model-targeting chart
    next to ROC/PR.  The one unkeyed cumulative window runs over the
    10-row decile table, bounded by construction; all ratios close in
    integer `div`."""
    from pyspark.sql import Window

    from image_matadata_batchprocessing_aws_spark.operators.scale import quantile_bin

    o = t(spark, sf, "orders").select(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("__y"),
    )
    binned = quantile_bin(o, ["o_totalprice"], n_bins=10)
    per = binned.groupBy(
        F.col("o_totalprice_bin").cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("pos"),
    )
    # the 10-row decile table feeds both the totals agg and the output —
    # checkpoint it so the scan+bin+groupBy runs once, not twice (r08)
    per = per.localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("n").alias("__nn"), F.sum("pos").alias("__pp")
    )
    w = (
        Window.orderBy(F.col("decile").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "pos",
            F.sum("pos").over(w).cast("long").alias("cum_pos"),
            F.col("__nn"),
            F.col("__pp"),
        )
        .select(
            "decile",
            "n",
            "pos",
            "cum_pos",
            F.expr("cum_pos * 1000 div __pp").cast("long").alias("gains_permille"),
            F.expr("pos * __nn * 1000 div (n * __pp)")
            .cast("long")
            .alias("lift_permille"),
        )
    )


QUERIES["eval_lift_gains"] = eval_lift_gains


def _lift_gains_oracle() -> str:
    qs = ", ".join(
        f"quantile_cont(s, {i / 10}) AS q{i}" for i in range(1, 10)
    )
    bins = " + ".join(f"CAST(s > q{i} AS INT)" for i in range(1, 10))
    return f"""
    WITH o AS (
      SELECT o_totalprice AS s,
             CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders),
    q AS (SELECT {qs} FROM o),
    b AS (SELECT CAST({bins} AS BIGINT) AS decile, y FROM o, q),
    per AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM b GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(pos) AS BIGINT) AS pp FROM per),
    cum AS (
      SELECT decile, n, pos,
             CAST(sum(pos) OVER (ORDER BY decile DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_pos
      FROM per)
    SELECT decile, n, pos, cum_pos,
           CAST(cum_pos * 1000 // pp AS BIGINT) AS gains_permille,
           CAST(pos * nn * 1000 // (n * pp) AS BIGINT) AS lift_permille
    FROM cum, tot
"""


ORACLES["eval_lift_gains"] = _lift_gains_oracle()


# --- SSIM verify stage over decoded image pairs --------------------------------

SSIM_N_PAIRS = 20
SSIM_C1 = 6.5025   # (0.01 * 255)^2 — the standard SSIM stabilizers
SSIM_C2 = 58.5225  # (0.03 * 255)^2
SSIM_N_PIX = 3 * 224 * 224


def _ssim_colors(pair_id: int) -> tuple[tuple[int, int, int], tuple[int, int, int]]:
    va = (pair_id % 251, (pair_id * 7) % 251, (pair_id * 13) % 251)
    if pair_id % 2 == 0:
        return va, va  # planted duplicate
    vb = ((pair_id * 3 + 1) % 251, (pair_id * 11 + 2) % 251, (pair_id * 17 + 3) % 251)
    return va, vb


def multimodal_image_ssim(spark: SparkSession, sf: str) -> DataFrame:
    """Global SSIM (Wang et al. 2004) between decoded image pairs — the
    VERIFY stage of an image-dedup funnel (pHash bands generate
    candidates; SSIM confirms before a merge).  Solid-color PNG pairs
    (even pair ids planted as exact duplicates) decode through the real
    pure-numpy codec + Arrow pipeline, and the five SSIM sufficient
    statistics (sum, two sums of squares, cross sum over the padded
    224x224 CHW tensors) fold ENTIRELY in JVM expressions
    (transform/zip_with/aggregate) — integer-valued doubles, exact —
    so the oracle derives the same sums in closed form (value x
    content-pixel count) and the SSIM formula closes in one
    identically-written double expression.  Identical pairs hit
    ssim = 1.0 bitwise."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    rows = []
    for pair_id in range(SSIM_N_PAIRS):
        h, w = PNG_DIMS[pair_id % len(PNG_DIMS)]
        va, vb = _ssim_colors(pair_id)
        for side, v in (("a", va), ("b", vb)):
            img = np.zeros((h, w, 3), dtype=np.uint8)
            img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
            rows.append(
                (pair_id, side, f"{pair_id}_{side}.png", bytearray(encode_png(img)))
            )
    entries = spark.createDataFrame(
        rows, "pair_id long, side string, entry_name string, content binary"
    )
    decoded = decode_images(
        entries.select("entry_name", "content"),
        use_real_codec=True,
        normalize=False,
    ).join(
        entries.select(
            "pair_id", "side", F.col("entry_name").alias("file_name")
        ),
        "file_name",
    )
    dbl = F.transform("image", lambda v: v.cast("double"))
    summed = decoded.select(
        "pair_id",
        "side",
        F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x).alias("s"),
        F.aggregate(
            F.zip_with(dbl, dbl, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ss"),
        dbl.alias("__img"),
    )
    a = summed.where(F.col("side") == "a").select(
        "pair_id", F.col("s").alias("sx"), F.col("ss").alias("sxx"),
        F.col("__img").alias("__xa"),
    )
    b = summed.where(F.col("side") == "b").select(
        "pair_id", F.col("s").alias("sy"), F.col("ss").alias("syy"),
        F.col("__img").alias("__xb"),
    )
    j = a.join(b, "pair_id").select(
        "pair_id", "sx", "sxx", "sy", "syy",
        F.aggregate(
            F.zip_with("__xa", "__xb", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sxy"),
    )
    n = F.lit(float(SSIM_N_PIX))
    mx, my = F.col("sx") / n, F.col("sy") / n
    vx = F.col("sxx") / n - mx * mx
    vy = F.col("syy") / n - my * my
    cov = F.col("sxy") / n - mx * my
    ssim = ((2.0 * mx * my + SSIM_C1) * (2.0 * cov + SSIM_C2)) / (
        (mx * mx + my * my + SSIM_C1) * (vx + vy + SSIM_C2)
    )
    return j.select(
        "pair_id",
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.col("sxx").cast("long").alias("sxx"),
        F.col("syy").cast("long").alias("syy"),
        F.col("sxy").cast("long").alias("sxy"),
        F.round(ssim, 6).alias("ssim"),
        (F.round(ssim, 6) >= 0.999999).alias("is_dup"),
    )


QUERIES["multimodal_image_ssim"] = multimodal_image_ssim


def _ssim_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import (
        PNG_DIMS,
        _png_content_pixels,
    )

    px_case = " ".join(
        f"WHEN {i} THEN {px}" for i, px in enumerate(_png_content_pixels())
    )
    n = float(SSIM_N_PIX)
    return f"""
    WITH p AS (SELECT unnest(range({SSIM_N_PAIRS})) AS pair_id),
    c AS (
      SELECT pair_id,
             CASE pair_id % {len(PNG_DIMS)} {px_case} END AS px,
             pair_id % 251 AS ra, (pair_id * 7) % 251 AS ga,
             (pair_id * 13) % 251 AS ba,
             CASE WHEN pair_id % 2 = 0 THEN pair_id % 251
                  ELSE (pair_id * 3 + 1) % 251 END AS rb,
             CASE WHEN pair_id % 2 = 0 THEN (pair_id * 7) % 251
                  ELSE (pair_id * 11 + 2) % 251 END AS gb,
             CASE WHEN pair_id % 2 = 0 THEN (pair_id * 13) % 251
                  ELSE (pair_id * 17 + 3) % 251 END AS bb
      FROM p),
    sums AS (
      SELECT pair_id,
             CAST((ra + ga + ba) * px AS BIGINT) AS sx,
             CAST((rb + gb + bb) * px AS BIGINT) AS sy,
             CAST((ra*ra + ga*ga + ba*ba) * px AS BIGINT) AS sxx,
             CAST((rb*rb + gb*gb + bb*bb) * px AS BIGINT) AS syy,
             CAST((ra*rb + ga*gb + ba*bb) * px AS BIGINT) AS sxy
      FROM c),
    closed AS (
      SELECT pair_id, sx, sy, sxx, syy, sxy,
             CAST(sx AS DOUBLE) / {n!r} AS mx,
             CAST(sy AS DOUBLE) / {n!r} AS my,
             CAST(sxx AS DOUBLE) / {n!r} AS exx,
             CAST(syy AS DOUBLE) / {n!r} AS eyy,
             CAST(sxy AS DOUBLE) / {n!r} AS exy
      FROM sums)
    SELECT pair_id, sx, sy, sxx, syy, sxy,
           round(((2.0 * mx * my + {SSIM_C1}) * (2.0 * (exy - mx * my) + {SSIM_C2}))
                 / ((mx * mx + my * my + {SSIM_C1})
                    * ((exx - mx * mx) + (eyy - my * my) + {SSIM_C2})), 6)
               AS ssim,
           round(((2.0 * mx * my + {SSIM_C1}) * (2.0 * (exy - mx * my) + {SSIM_C2}))
                 / ((mx * mx + my * my + {SSIM_C1})
                    * ((exx - mx * mx) + (eyy - my * my) + {SSIM_C2})), 6)
               >= 0.999999 AS is_dup
    FROM closed
"""


ORACLES["multimodal_image_ssim"] = _ssim_oracle()


# --- expected calibration error (one-number rollup) ---------------------------


def eval_ece(spark: SparkSession, sf: str) -> DataFrame:
    """Expected + maximum calibration error over the `eval_calibration`
    reliability bins, as ONE row — the number a model gate thresholds.
    The whole fold is exact integers: per bin |sum(p6) - 10^6 * sum(y)|
    is n_b * |confidence - accuracy| on the 1e-6 scale, so ECE = the
    BIGINT sum of those divided ONCE by 10^6 * N (and MCE is the max of
    per-bin doubles computed identically on both engines)."""
    o = t(spark, sf, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("__mn"), F.max("o_totalprice").alias("__mx")
    )
    p = (F.col("o_totalprice") - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
    base = o.crossJoin(F.broadcast(mm)).select(
        F.least(F.floor(p * 10), F.lit(9)).cast("long").alias("bin"),
        F.round(p * 1000000.0).cast("long").alias("__p6"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("__y"),
    )
    bins = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__p6").alias("__sp6"),
        F.sum("__y").alias("__sy"),
    )
    dev = F.abs(F.col("__sp6") - 1000000 * F.col("__sy"))
    folded = bins.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("__n").cast("long").alias("n_total"),
        F.sum(dev).cast("long").alias("ece_num"),
        F.max(
            dev.cast("double") / (1000000.0 * F.col("__n").cast("double"))
        ).alias("__mce"),
    )
    return folded.select(
        "n_bins",
        "n_total",
        "ece_num",
        F.round(
            F.col("ece_num").cast("double")
            / (1000000.0 * F.col("n_total").cast("double")),
            6,
        ).alias("ece"),
        F.round("__mce", 6).alias("mce"),
    )


QUERIES["eval_ece"] = eval_ece

ORACLES["eval_ece"] = """
    WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    b AS (
      SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10) AS BIGINT), 9) AS bin,
             CAST(round((o_totalprice - mn) / (mx - mn) * 1000000.0) AS BIGINT) AS p6,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders CROSS JOIN mm),
    a AS (SELECT bin, count(*) AS n, sum(p6) AS sp6, sum(y) AS sy
          FROM b GROUP BY bin),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bins,
             CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(abs(sp6 - 1000000 * sy)) AS BIGINT) AS ece_num,
             max(CAST(abs(sp6 - 1000000 * sy) AS DOUBLE)
                 / (1000000.0 * CAST(n AS DOUBLE))) AS mce
      FROM a)
    SELECT n_bins, n_total, ece_num,
           round(CAST(ece_num AS DOUBLE)
                 / (1000000.0 * CAST(n_total AS DOUBLE)), 6) AS ece,
           round(mce, 6) AS mce
    FROM folded
"""


# --- Mann-Kendall trend test ----------------------------------------------------


def ts_mann_kendall(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type over the DAILY
    value sums (Mann 1945; Kendall's S with the tie-corrected variance)
    — the nonparametric "is this metric drifting" screen that needs no
    distributional assumptions, the trend cousin of the CUSUM/changepoint
    family.  The pairwise i<j sign sum runs over the per-key DAILY
    aggregate (calendar-bounded — ~30 rows per key whatever the data
    volume), so the quadratic join is bounded by construction, exactly
    like the bounded SemDeDup cells.  Daily sums are exact scaled-cent
    BIGINTs, S and the tie term are integers, and z closes in one
    identically-written double expression."""
    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    daily = e.groupBy(
        "event_type",
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("__x")
    )
    a = daily.select(
        "event_type", F.col("day_ms").alias("di"), F.col("__x").alias("xi")
    )
    b = daily.select(
        "event_type", F.col("day_ms").alias("dj"), F.col("__x").alias("xj")
    )
    s = (
        a.join(b, "event_type")
        .where(F.col("di") < F.col("dj"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.signum((F.col("xj") - F.col("xi")).cast("double")).cast("long")
            ).alias("s")
        )
    )
    nrow = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "__x")
        .agg(F.count(F.lit(1)).alias("__t"))
        .where(F.col("__t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
            ).alias("tie_term")
        )
    )
    j = (
        nrow.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("s").cast("long").alias("s"),
            F.coalesce("tie_term", F.lit(0)).cast("long").alias("tie_term"),
        )
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    sd = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (sd - 1.0) / F.sqrt(var18)).when(
        F.col("s") < 0, (sd + 1.0) / F.sqrt(var18)
    ).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        "n",
        "s",
        "tie_term",
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 1.96).alias("trend_05"),
    )


QUERIES["ts_mann_kendall"] = ts_mann_kendall

ORACLES["ts_mann_kendall"] = """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
             CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    s AS (
      SELECT a.event_type,
             CAST(sum(CAST(sign(CAST(b.x - a.x AS DOUBLE)) AS BIGINT))
                  AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day_ms < b.day_ms
      GROUP BY 1),
    nrow AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
             FROM daily GROUP BY 1),
    ties AS (
      SELECT event_type,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, x, count(*) AS t FROM daily
            GROUP BY 1, 2 HAVING count(*) > 1)
      GROUP BY 1),
    j AS (
      SELECT nrow.event_type, n, s,
             CAST(coalesce(tie_term, 0) AS BIGINT) AS tie_term
      FROM nrow JOIN s USING (event_type)
      LEFT JOIN ties USING (event_type)),
    closed AS (
      SELECT event_type, n, s, tie_term,
             CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                    / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                           / 18.0)
                  WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                    / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                           / 18.0)
                  ELSE 0.0 END AS z
      FROM j)
    SELECT event_type, n, s, tie_term, round(z, 6) AS z,
           abs(round(z, 6)) > 1.96 AS trend_05
    FROM closed
"""


# --- Cohen's d effect size --------------------------------------------------------


def eval_cohens_d(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's d effect size between urgent/high and normal/low order
    values — the magnitude companion to the Welch significance test
    (significance says "real", d says "big enough to care").  Exact
    scaled-cent integer sufficient statistics (sum, sum of squares) per
    arm; the pooled SD and d close in one identically-written double
    expression."""
    o = t(spark, sf, "orders").select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    # sum of squared cents tops int64 around 10^5 orders (ANSI mode
    # throws rather than wraps — measured at sf0.1): DECIMAL(38,0)
    # keeps the sufficient statistic exact, and its one conversion to
    # double at the close is correctly rounded on both engines
    arms = o.groupBy("g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("c").alias("__s"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("__ss"),
    )
    a = arms.where(F.col("g") == 1).select(
        F.col("__n").alias("n1"), F.col("__s").alias("s1"), F.col("__ss").alias("ss1")
    )
    b = arms.where(F.col("g") == 0).select(
        F.col("__n").alias("n2"), F.col("__s").alias("s2"), F.col("__ss").alias("ss2")
    )
    one = a.crossJoin(F.broadcast(b))
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1 / 100.0
    m2 = F.col("s2").cast("double") / n2 / 100.0
    v1 = (F.col("ss1").cast("double") / 10000.0 - m1 * m1 * n1) / (n1 - 1.0)
    v2 = (F.col("ss2").cast("double") / 10000.0 - m2 * m2 * n2) / (n2 - 1.0)
    sp = F.sqrt(((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0))
    return one.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(m1, 6).alias("mean1"),
        F.round(m2, 6).alias("mean2"),
        F.round((m1 - m2) / sp, 6).alias("cohens_d"),
    )


QUERIES["eval_cohens_d"] = eval_cohens_d

ORACLES["eval_cohens_d"] = """
    WITH o AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 1 ELSE 0 END AS g,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS c
      FROM orders),
    arms AS (
      -- ss stays HUGEINT (sum of squared cents tops int64 at scale);
      -- the close converts the exact integer to DOUBLE once, matching
      -- the Spark side's DECIMAL(38,0) -> double conversion bitwise
      SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
             sum(c * c) AS ss
      FROM o GROUP BY g),
    one AS (
      SELECT a.n AS n1, a.s AS s1, a.ss AS ss1,
             b.n AS n2, b.s AS s2, b.ss AS ss2
      FROM (SELECT * FROM arms WHERE g = 1) a
      CROSS JOIN (SELECT * FROM arms WHERE g = 0) b),
    closed AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS m1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS m2,
             (CAST(ss1 AS DOUBLE) / 10000.0
                - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                  * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                  * CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
             (CAST(ss2 AS DOUBLE) / 10000.0
                - (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                  * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                  * CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
      FROM one)
    SELECT n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
           round((m1 - m2)
                 / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1
                         + (CAST(n2 AS DOUBLE) - 1.0) * v2)
                        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6)
               AS cohens_d
    FROM closed
"""


# --- full MOSS dedup pipeline: winnow -> pairs -> components -> keep ------------


def pipeline_winnow_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The winnowing-based near-dup pipeline end to end — the MOSS
    alternative to the MinHash funnel: winnowed fingerprints ->
    posting-list candidate pairs (>= 3 shared) -> large-star/small-star
    connected components -> the keep/drop ledger (component minimum is
    canonical, with group sizes).  Same one-lazy-plan composition
    discipline as `pipeline_pretraining_corpus`; the oracle replays the
    pair generation and resolves components with a recursive
    reachability CTE."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        connected_components,
    )

    pairs = dedup_winnow_pairs(spark, sf).select("id_a", "id_b")
    comp = connected_components(
        pairs, "id_a", "id_b", out_id="doc_id", out_component="component"
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return comp.join(sizes, "component").select(
        "doc_id",
        F.col("component").cast("long").alias("component"),
        "group_size",
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


QUERIES["pipeline_winnow_dedup"] = pipeline_winnow_dedup


def _winnow_dedup_oracle() -> str:
    # the dedup_winnow_pairs chain, then recursive-CTE component resolve
    pair_sql = _winnow_pairs_oracle()
    # strip the trailing SELECT into a CTE: reuse by wrapping
    return f"""
    WITH RECURSIVE pairs_out AS ({pair_sql}),
    edges AS (SELECT id_a AS ea, id_b AS eb FROM pairs_out
              UNION ALL SELECT id_b AS ea, id_a AS eb FROM pairs_out),
    reach(src, node) AS (
      SELECT ea AS src, ea AS node FROM edges
      UNION
      SELECT r.src, g.eb FROM reach r JOIN edges g ON r.node = g.ea),
    comp AS (SELECT src AS doc_id, min(node) AS component
             FROM reach GROUP BY src),
    sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS group_size
              FROM comp GROUP BY component)
    SELECT c.doc_id, CAST(c.component AS BIGINT) AS component,
           s.group_size, c.doc_id = c.component AS keep
    FROM comp c JOIN sizes s USING (component)
"""


ORACLES["pipeline_winnow_dedup"] = _winnow_dedup_oracle()


# --- audio resample (linear), closed-form ramp oracle --------------------------

RS_N_DOCS = 12
RS_SRC, RS_DST = 8000, 16000


def multimodal_audio_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Sample-rate normalization for an audio corpus: 8 kHz -> 16 kHz
    linear resampling (`multimodal/audio.resample_linear`) through the
    Arrow pipeline over genuine PCM16 WAV fixtures.  The fixtures are
    integer RAMPS, and linear interpolation of a linear signal is the
    signal — so the doubled output sum has the closed form
    (2n-1) * (2a + b(n-1)) and the oracle pins the whole decode ->
    interpolate -> audit path bit-exactly.  Per-row error isolation,
    real header parsing, real interpolation; only the audit statistic
    is fixture-simplified."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        encode_wav_pcm16,
        resample_linear,
    )

    rows = []
    for d in range(RS_N_DOCS):
        n = 100 + 37 * d
        a, b = 5 * d - 20, d % 7 + 1
        samples = a + b * np.arange(n, dtype=np.int64)
        rows.append(
            (d, f"{d}.wav", bytearray(encode_wav_pcm16(samples, RS_SRC)))
        )
    audio = spark.createDataFrame(
        rows, "doc_id long, file_name string, content binary"
    )
    out = resample_linear(audio.select("file_name", "content"), RS_DST)
    return out.join(
        audio.select("doc_id", "file_name"), "file_name"
    ).select("doc_id", "src_rate", "dst_rate", "n_in", "n_out", "sum2")


QUERIES["multimodal_audio_resample"] = multimodal_audio_resample

ORACLES["multimodal_audio_resample"] = f"""
    SELECT d AS doc_id,
           CAST({RS_SRC} AS BIGINT) AS src_rate,
           CAST({RS_DST} AS BIGINT) AS dst_rate,
           CAST(100 + 37 * d AS BIGINT) AS n_in,
           CAST(2 * (100 + 37 * d) - 1 AS BIGINT) AS n_out,
           CAST((2 * (100 + 37 * d) - 1)
                * (2 * (5 * d - 20) + (d % 7 + 1) * (100 + 37 * d - 1))
                AS BIGINT) AS sum2
    FROM (SELECT unnest(range({RS_N_DOCS})) AS d)
"""


# --- SQL-defined scalar function (SQL UDF surface) -----------------------------


def sql_api_udf(spark: SparkSession, sf: str) -> DataFrame:
    """API-parity proof for the SQL-UDF surface: a scalar function
    DEFINED IN SQL (``CREATE TEMPORARY FUNCTION ... RETURN expr`` — a
    pure Catalyst expression, inlined at plan time, so zero Python and
    no serialization cost anywhere) used by a plain ``spark.sql`` query
    over the registered views.  The oracle runs the macro-expanded SQL
    on DuckDB — one definition, two engines, same cents.  This is the
    house way to ship reusable business logic to SQL users without
    leaving whole-stage codegen."""
    from image_matadata_batchprocessing_aws_spark.sources.tables import register_views

    register_views(spark, sf)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discounted_cents"
        "(price DOUBLE, disc DOUBLE) RETURNS BIGINT "
        "RETURN cents(price) - CAST(round(cents(price) * disc) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(cents(l_extendedprice)) AS BIGINT) AS gross_cents,
               CAST(sum(discounted_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS net_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
        """
    )


QUERIES["sql_api_udf"] = sql_api_udf

#: The macro-expanded form of the SQL UDFs above — what Catalyst inlines.
ORACLES["sql_api_udf"] = """
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS gross_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    - CAST(round(CAST(round(l_extendedprice * 100) AS BIGINT)
                                 * l_discount) AS BIGINT))
                AS BIGINT) AS net_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
"""


# --- A/B sample-size planning (power analysis) -----------------------------------

POWER_Z_ALPHA = 1.959963984540054  # two-sided 0.05
POWER_Z_BETA = 0.8416212335729143  # 80% power


def agg_power_analysis(spark: SparkSession, sf: str) -> DataFrame:
    """Required per-arm sample size to detect the OBSERVED arm
    difference of the `agg_ab_proportions` experiment at alpha=0.05 /
    80% power — the "how long must this test run" planning number,
    computed from literally the same experiment definition (the shared
    :func:`_ab_arms` split/metric/pivot).  n = (z_a + z_b)^2
    (p1(1-p1) + p2(1-p2)) / (p1-p2)^2, ceil'd; the z constants are
    shared literals, the close is one identical double expression, the
    observed rates are exact count ratios, and exactly-tied arms
    (cross-multiplied integer equality) return NULL rather than
    dividing by zero."""
    one = _ab_arms(spark, sf)
    p1 = F.col("k_a").cast("double") / F.col("n_a").cast("double")
    p2 = F.col("k_b").cast("double") / F.col("n_b").cast("double")
    z = F.lit(POWER_Z_ALPHA) + F.lit(POWER_Z_BETA)
    n_req = F.ceil(
        z * z * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) / ((p1 - p2) * (p1 - p2))
    )
    ok = (F.col("k_a") * F.col("n_b")) != (F.col("k_b") * F.col("n_a"))
    return one.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        F.when(ok, n_req).cast("long").alias("n_required_per_arm"),
    )


QUERIES["agg_power_analysis"] = agg_power_analysis


def _power_oracle() -> str:
    z = POWER_Z_ALPHA + POWER_Z_BETA
    return f"""
    WITH {_ab_arms_ctes()},
    closed AS (
      SELECT n_a, n_b, k_a, k_b,
             CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
             CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2
      FROM one)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(p1, 6) AS rate_a, round(p2, 6) AS rate_b,
           CAST(CASE WHEN k_a * n_b <> k_b * n_a THEN
                ceil({z!r} * {z!r} * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
                     / ((p1 - p2) * (p1 - p2))) END AS BIGINT)
               AS n_required_per_arm
    FROM closed
"""


ORACLES["agg_power_analysis"] = _power_oracle()


# --- deterministic SMOTE oversampling ----------------------------------------------

SMOTE_SCALE = 10**6


def embedding_smote_synth(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic SMOTE (Chawla et al. 2002, lambda pinned at 1/2):
    for every vector of the MINORITY class, synthesize the midpoint
    with its nearest same-class neighbor — the class-rebalancing
    oversampler, made replayable by quantizing dimensions to exact
    1e-6 BIGINTs BEFORE the distance ranking, so the nearest-neighbor
    choice and the synthetic-vector audit are pure integer arithmetic
    on both engines (no float-ordering roulette anywhere).  Minority
    sets are small by definition, so the pair ranking is
    minority-bounded, never corpus-quadratic."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            as_double_array("embedding"),
            lambda x: F.round(x * SMOTE_SCALE).cast("long"),
        ).alias("q"),
    )
    minority = (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("__n", "label")
        .first()["label"]
    )
    m = e.where(F.col("label") == minority)
    a = m.select(F.col("vec_id").alias("src"), F.col("q").alias("qa"))
    b = m.select(F.col("vec_id").alias("nn"), F.col("q").alias("qb"))
    pairs = a.join(F.broadcast(b), F.col("src") != F.col("nn")).select(
        "src",
        "nn",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("dist_q"),
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x + y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("synth_sum2q"),
    )
    best = pairs.groupBy("src").agg(
        F.min(F.struct("dist_q", "nn", "synth_sum2q")).alias("m")
    )
    return best.select(
        F.col("src").alias("vec_id"),
        F.col("m.nn").alias("nn_id"),
        F.col("m.dist_q").alias("dist_q"),
        F.lit(minority).cast("long").alias("label"),
        F.col("m.synth_sum2q").alias("synth_sum2q"),
    )


QUERIES["embedding_smote_synth"] = embedding_smote_synth

ORACLES["embedding_smote_synth"] = f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {SMOTE_SCALE}) AS BIGINT)) AS q
      FROM embeddings),
    mlabel AS (SELECT label FROM q GROUP BY label
               ORDER BY count(*), label LIMIT 1),
    m AS (SELECT q.* FROM q JOIN mlabel USING (label)),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS nn,
             CAST(list_sum(list_transform(range(len(a.q)),
                  i -> (a.q[i + 1] - b.q[i + 1]) * (a.q[i + 1] - b.q[i + 1])))
               AS BIGINT) AS dist_q,
             CAST(list_sum(list_transform(range(len(a.q)),
                  i -> a.q[i + 1] + b.q[i + 1]))
               AS BIGINT) AS synth_sum2q
      FROM m a JOIN m b ON a.vec_id <> b.vec_id),
    best AS (
      SELECT src, nn, dist_q, synth_sum2q,
             row_number() OVER (PARTITION BY src
                                ORDER BY dist_q, nn) AS rn
      FROM pairs)
    SELECT src AS vec_id, nn AS nn_id, dist_q,
           CAST((SELECT label FROM mlabel) AS BIGINT) AS label,
           synth_sum2q
    FROM best WHERE rn = 1
"""


# --- Good-Turing unseen-mass estimate ------------------------------------------


def text_good_turing(spark: SparkSession, sf: str) -> DataFrame:
    """Good-Turing coverage estimate per language: hapax/dis legomena
    counts and the Turing estimate of UNSEEN vocabulary mass
    (p0 = N1/N) — the "how much more vocabulary is out there" number a
    corpus planner reads next to the Heaps curve
    (`text_vocab_growth`).  Two keyed partial aggs (token counts, then
    frequency-of-frequencies); the estimate closes in integer
    permille."""
    from image_matadata_batchprocessing_aws_spark.operators.text import tokens

    d = t(spark, sf, "documents")
    tok = d.select(
        "lang", F.explode(tokens("text")).alias("__tok")
    )
    counts = tok.groupBy("lang", "__tok").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy("lang").agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias("hapax"),
        F.sum((F.col("__c") == 2).cast("long")).cast("long").alias("dis"),
    ).select(
        "lang",
        "n_tokens",
        "vocab",
        "hapax",
        "dis",
        F.expr("hapax * 1000 div n_tokens").cast("long").alias("p0_permille"),
    )


QUERIES["text_good_turing"] = text_good_turing

ORACLES["text_good_turing"] = r"""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''),
    counts AS (SELECT lang, tok, count(*) AS c FROM tok GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // sum(c)
                AS BIGINT) AS p0_permille
    FROM counts GROUP BY lang
"""


# --- Katz centrality --------------------------------------------------------------

KATZ_BETA_NUM, KATZ_BETA_DEN = 1, 10  # attenuation 0.1
KATZ_ITERS = 3
KATZ_SCALE = 10**12
KATZ_TOPK = 30


def graph_katz(spark: SparkSession, sf: str) -> DataFrame:
    """Katz centrality (Katz 1953) on the bipartite purchase graph:
    rank = sum over path lengths k of beta^k (A^k 1) — unlike degree it
    credits long-range reachability, unlike PageRank it does not
    normalize by out-degree (hubs radiate full weight).  Same
    scaled-long fixed-point kernel family as `pagerank_scaled`: 3
    unrolled rounds of one edge join + one integer groupBy, oracle as
    unrolled CTEs, top-30 with the (kind, entity) tiebreak."""
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        _cust_supp_edges,
    )

    edges = _cust_supp_edges(spark, sf).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # x0 = scale * 1 per node; each round: x_{k} = beta * A x_{k-1}
    # (scaled integer div); katz = sum of rounds 1..K
    x = nodes.select("node", F.lit(KATZ_SCALE).cast("long").alias("v"))
    total = nodes.select("node", F.lit(0).cast("long").alias("katz_scaled"))
    for _ in range(KATZ_ITERS):
        x = (
            edges.join(x, edges["src"] == x["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(f"v * {KATZ_BETA_NUM} div {KATZ_BETA_DEN}").alias("__m"),
            )
            .groupBy("node")
            .agg(F.sum("__m").alias("v"))
            .localCheckpoint(eager=False)
        )
        total = (
            total.join(x, "node", "left")
            .select(
                "node",
                (F.col("katz_scaled") + F.coalesce("v", F.lit(0))).alias(
                    "katz_scaled"
                ),
            )
        )
    return (
        total.select(
            (F.col("node") % 2).cast("long").alias("node_kind"),
            F.expr("node div 2").cast("long").alias("entity_id"),
            F.col("katz_scaled").cast("long").alias("katz_scaled"),
        )
        .orderBy(F.col("katz_scaled").desc(), "node_kind", "entity_id")
        .limit(KATZ_TOPK)
    )


QUERIES["graph_katz"] = graph_katz


def _katz_oracle() -> str:
    ctes = [
        """pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        """edges AS (SELECT c AS src, s AS dst FROM pairs
                     UNION ALL SELECT s AS src, c AS dst FROM pairs)""",
        """nodes AS (SELECT DISTINCT node FROM
                     (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))""",
        f"x0 AS (SELECT node, CAST({KATZ_SCALE} AS BIGINT) AS v FROM nodes)",
    ]
    prev = "x0"
    sums = []
    for it in range(1, KATZ_ITERS + 1):
        ctes.append(
            f"""x{it} AS (SELECT e.dst AS node,
                   CAST(sum((x.v * {KATZ_BETA_NUM}) // {KATZ_BETA_DEN}) AS BIGINT) AS v
                   FROM {prev} x JOIN edges e ON x.node = e.src GROUP BY e.dst)"""
        )
        sums.append(f"SELECT node, v FROM x{it}")
        prev = f"x{it}"
    ctes.append(f"allx AS ({' UNION ALL '.join(sums)})")
    ctes.append(
        """katz AS (SELECT n.node, CAST(coalesce(sum(a.v), 0) AS BIGINT)
                       AS katz_scaled
                    FROM nodes n LEFT JOIN allx a ON a.node = n.node
                    GROUP BY n.node)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(node % 2 AS BIGINT) AS node_kind,
           CAST(node // 2 AS BIGINT) AS entity_id, katz_scaled
    FROM katz
    ORDER BY katz_scaled DESC, node_kind, entity_id LIMIT {KATZ_TOPK}"""
    )


ORACLES["graph_katz"] = _katz_oracle()


# --- Fleiss' kappa over rule raters ---------------------------------------------


def eval_fleiss_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Fleiss' kappa (1971) across three deterministic quality "raters"
    (char-length, token-count, and mean-word-length rules) labeling
    every document keep/drop — the inter-annotator agreement number a
    labeling pipeline reads before trusting majority votes, here
    measuring how much the cheap quality heuristics actually agree
    beyond chance.  Per-item agreement reduces to the integer
    pos^2 + (3-pos)^2 - 3 fold, chance agreement to one integer ratio
    pair, and kappa closes in one identical double expression."""
    from image_matadata_batchprocessing_aws_spark.operators.text import token_count

    d = t(spark, sf, "documents").select(
        F.col("n_chars"),
        F.length("text").alias("__len"),
        token_count("text").alias("__tok"),
    )
    pos = (
        (F.col("n_chars") > 150).cast("long")
        + (F.col("__tok") > 30).cast("long")
        + (F.col("__len") < F.col("__tok") * 7).cast("long")
    )
    per = d.select(pos.alias("__pos"))
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__pos").cast("long").alias("sum_pos"),
        F.sum(
            F.col("__pos") * F.col("__pos")
            + (3 - F.col("__pos")) * (3 - F.col("__pos"))
            - 3
        ).cast("long").alias("sum_pi_num"),
    )
    nd = F.col("n_docs").cast("double")
    pbar = F.col("sum_pi_num").cast("double") / (6.0 * nd)
    ppos = F.col("sum_pos").cast("double") / (3.0 * nd)
    pe = ppos * ppos + (1.0 - ppos) * (1.0 - ppos)
    kappa = (pbar - pe) / (1.0 - pe)
    return agg.select(
        "n_docs",
        "sum_pos",
        "sum_pi_num",
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_e"),
        F.round(kappa, 6).alias("fleiss_kappa"),
    )


QUERIES["eval_fleiss_kappa"] = eval_fleiss_kappa

ORACLES["eval_fleiss_kappa"] = r"""
    WITH d AS (
      SELECT n_chars, length(text) AS len,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END
               AS BIGINT) AS tok
      FROM documents),
    per AS (
      SELECT (CASE WHEN n_chars > 150 THEN 1 ELSE 0 END
              + CASE WHEN tok > 30 THEN 1 ELSE 0 END
              + CASE WHEN len < tok * 7 THEN 1 ELSE 0 END) AS pos
      FROM d),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(pos) AS BIGINT) AS sum_pos,
             CAST(sum(pos * pos + (3 - pos) * (3 - pos) - 3) AS BIGINT)
               AS sum_pi_num
      FROM per),
    closed AS (
      SELECT n_docs, sum_pos, sum_pi_num,
             CAST(sum_pi_num AS DOUBLE) / (6.0 * CAST(n_docs AS DOUBLE))
               AS pbar,
             CAST(sum_pos AS DOUBLE) / (3.0 * CAST(n_docs AS DOUBLE)) AS ppos
      FROM agg)
    SELECT n_docs, sum_pos, sum_pi_num,
           round(pbar, 6) AS p_bar,
           round(ppos * ppos + (1.0 - ppos) * (1.0 - ppos), 6) AS p_e,
           round((pbar - (ppos * ppos + (1.0 - ppos) * (1.0 - ppos)))
                 / (1.0 - (ppos * ppos + (1.0 - ppos) * (1.0 - ppos))), 6)
               AS fleiss_kappa
    FROM closed
"""


# --- energy distance (two-sample embedding test) ---------------------------------

ENERGY_MOD = 3  # mod-sample both classes so the pair grid stays bounded


def embedding_energy_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Energy distance (Szekely & Rizzo 2004) between the label-0 and
    label-1 embedding samples: E = 2*mean d(X,Y) - mean d(X,X') -
    mean d(Y,Y') — the metric two-sample homogeneity test for "did the
    embedding distribution move", stronger than per-dimension KS
    because it sees the joint geometry.  Determinism recipe: dimensions
    quantize to 1e-6 BIGINTs, each pair's euclidean distance is
    sqrt(integer) (one correctly-rounded IEEE op on an identical
    integer, so both engines get the same double) re-rounded to a
    1e-6-scaled BIGINT, and all means are integer sums divided once —
    no float accumulation order anywhere.  Both classes mod-sample to
    keep the pair grids bounded (the estimator is valid on subsamples;
    the knob trades variance for cost)."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )

    e = t(spark, sf, "embeddings").where(
        (F.col("label").isin(0, 1)) & (F.col("vec_id") % ENERGY_MOD == 0)
    ).select(
        "vec_id",
        "label",
        F.transform(
            as_double_array("embedding"),
            lambda x: F.round(x * 1000000).cast("long"),
        ).alias("q"),
    )

    def pair_sum(left, right, cond):
        j = left.join(right, cond)
        d_int = F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        dq = F.round(F.sqrt(d_int.cast("double"))).cast("long")
        return j.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(dq).cast("long").alias("s"),
        )

    x = e.where(F.col("label") == 0).select(
        F.col("vec_id").alias("ia"), F.col("q").alias("qa")
    )
    y = e.where(F.col("label") == 1).select(
        F.col("vec_id").alias("ib"), F.col("q").alias("qb")
    )
    xy = pair_sum(x, y.withColumnRenamed("ib", "ib2"), F.lit(True)).select(
        F.col("n").alias("n_xy"), F.col("s").alias("s_xy")
    )
    xx = pair_sum(
        x,
        x.select(F.col("ia").alias("ia2"), F.col("qa").alias("qb")),
        F.col("ia") < F.col("ia2"),
    ).select(F.col("n").alias("n_xx"), F.col("s").alias("s_xx"))
    yy = pair_sum(
        y.select("ib", F.col("qb").alias("qa")),
        y.select(F.col("ib").alias("ib2"), "qb"),
        F.col("ib") < F.col("ib2"),
    ).select(F.col("n").alias("n_yy"), F.col("s").alias("s_yy"))
    one = xy.crossJoin(F.broadcast(xx)).crossJoin(F.broadcast(yy))
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    energy = (
        2.0 * mean("s_xy", "n_xy") - mean("s_xx", "n_xx") - mean("s_yy", "n_yy")
    ) / 1000000.0
    return one.select(
        "n_xy", "s_xy", "n_xx", "s_xx", "n_yy", "s_yy",
        F.round(energy, 6).alias("energy_distance"),
    )


QUERIES["embedding_energy_distance"] = embedding_energy_distance

ORACLES["embedding_energy_distance"] = f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS q
      FROM embeddings
      WHERE label IN (0, 1) AND vec_id % {ENERGY_MOD} = 0),
    x AS (SELECT vec_id, q FROM q WHERE label = 0),
    y AS (SELECT vec_id, q FROM q WHERE label = 1),
    dxy AS (
      SELECT CAST(count(*) AS BIGINT) AS n_xy,
             CAST(sum(CAST(round(sqrt(CAST(list_sum(
                  list_transform(range(len(a.q)),
                    i -> (a.q[i + 1] - b.q[i + 1]) * (a.q[i + 1] - b.q[i + 1])))
                  AS DOUBLE))) AS BIGINT)) AS BIGINT) AS s_xy
      FROM x a CROSS JOIN y b),
    dxx AS (
      SELECT CAST(count(*) AS BIGINT) AS n_xx,
             CAST(sum(CAST(round(sqrt(CAST(list_sum(
                  list_transform(range(len(a.q)),
                    i -> (a.q[i + 1] - b.q[i + 1]) * (a.q[i + 1] - b.q[i + 1])))
                  AS DOUBLE))) AS BIGINT)) AS BIGINT) AS s_xx
      FROM x a JOIN x b ON a.vec_id < b.vec_id),
    dyy AS (
      SELECT CAST(count(*) AS BIGINT) AS n_yy,
             CAST(sum(CAST(round(sqrt(CAST(list_sum(
                  list_transform(range(len(a.q)),
                    i -> (a.q[i + 1] - b.q[i + 1]) * (a.q[i + 1] - b.q[i + 1])))
                  AS DOUBLE))) AS BIGINT)) AS BIGINT) AS s_yy
      FROM y a JOIN y b ON a.vec_id < b.vec_id)
    SELECT n_xy, s_xy, n_xx, s_xx, n_yy, s_yy,
           round((2.0 * (CAST(s_xy AS DOUBLE) / CAST(n_xy AS DOUBLE))
                  - CAST(s_xx AS DOUBLE) / CAST(n_xx AS DOUBLE)
                  - CAST(s_yy AS DOUBLE) / CAST(n_yy AS DOUBLE))
                 / 1000000.0, 6) AS energy_distance
    FROM dxy, dxx, dyy
"""


# --- new vs repeat revenue split ---------------------------------------------------


def agg_new_repeat_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Daily purchase revenue split into NEW-customer vs REPEAT
    revenue (a purchase is "new" iff it lands on the user's first-ever
    purchase DAY) — the commerce twin of `agg_growth_accounting`'s user
    decomposition, in exact cents with an integer new-share permille."""
    p = (
        t(spark, sf, "events")
        .where((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    first = p.groupBy("user_id").agg(F.min("day_ms").alias("__fd"))
    flagged = p.join(first, "user_id").select(
        "day_ms",
        "cents",
        (F.col("day_ms") == F.col("__fd")).cast("long").alias("__new"),
    )
    return flagged.groupBy("day_ms").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("cents") * F.col("__new")).cast("long").alias("new_cents"),
        F.expr("sum(cents * __new) * 1000 div sum(cents)")
        .cast("long")
        .alias("new_share_permille"),
    )


QUERIES["agg_new_repeat_revenue"] = agg_new_repeat_revenue

ORACLES["agg_new_repeat_revenue"] = """
    WITH p AS (
      SELECT user_id,
             CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
             CAST(round(value * 100.0) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    first AS (SELECT user_id, min(day_ms) AS fd FROM p GROUP BY 1),
    flagged AS (
      SELECT p.day_ms, p.cents,
             CASE WHEN p.day_ms = f.fd THEN 1 ELSE 0 END AS is_new
      FROM p JOIN first f ON f.user_id = p.user_id)
    SELECT day_ms,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(cents * is_new) AS BIGINT) AS new_cents,
           CAST(sum(cents * is_new) * 1000 // sum(cents) AS BIGINT)
               AS new_share_permille
    FROM flagged GROUP BY day_ms
"""


# --- modularity of the LPA communities --------------------------------------------


def graph_modularity(spark: SparkSession, sf: str) -> DataFrame:
    """Newman modularity Q of the label-propagation communities on the
    purchase graph — the "did the community detector find real
    structure" number (Q > 0 means denser-than-chance inside the
    labels).  Q = (1/M2^2) * sum_c (in_c * M2 - D_c^2) over the DOUBLED
    directed edge list (M2 = |directed edges|, in_c = intra-community
    directed edges, D_c = community degree sum) — the numerator folds
    as exact BIGINTs per community, one division closes.  Reuses the
    identical deterministic 2-round LPA the driver already checks
    (`graph_label_prop`), so a red row here isolates the MODULARITY
    arithmetic, not the labels."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        label_propagation,
    )
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        LPA_ROUNDS,
        _cust_supp_edges,
    )

    edges = _cust_supp_edges(spark, sf).localCheckpoint(eager=False)
    lab = label_propagation(edges, rounds=LPA_ROUNDS)
    m2df = edges.agg(F.count(F.lit(1)).alias("__m2"))
    ls = lab.select(F.col("node").alias("src"), F.col("label").alias("cs"))
    ld = lab.select(F.col("node").alias("dst"), F.col("label").alias("cd"))
    tagged = edges.join(ls, "src").join(ld, "dst")
    per_c = (
        tagged.groupBy("cs")
        .agg(
            F.count(F.lit(1)).alias("__deg"),
            F.sum((F.col("cs") == F.col("cd")).cast("long")).alias("__in"),
        )
        .crossJoin(F.broadcast(m2df))
    )
    folded = per_c.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.max("__m2").cast("long").alias("m2"),
        F.sum(
            F.col("__in") * F.col("__m2") - F.col("__deg") * F.col("__deg")
        ).cast("long").alias("q_num"),
    )
    q = F.col("q_num").cast("double") / (
        F.col("m2").cast("double") * F.col("m2").cast("double")
    )
    return folded.select(
        "n_communities", "m2", "q_num", F.round(q, 6).alias("modularity")
    )


QUERIES["graph_modularity"] = graph_modularity


def _modularity_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.graphq import _LPA_ROUND

    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {_LPA_ROUND.format(r=1, p=0)},
    {_LPA_ROUND.format(r=2, p=1)},
    m2t AS (SELECT count(*) AS m2 FROM edges),
    tagged AS (
      SELECT ls.label AS cs, ld.label AS cd
      FROM edges e
      JOIN l2 ls ON ls.node = e.src
      JOIN l2 ld ON ld.node = e.dst),
    per_c AS (
      SELECT cs, count(*) AS deg,
             sum(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS ic
      FROM tagged GROUP BY cs),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_communities,
             CAST(max(m2) AS BIGINT) AS m2,
             CAST(sum(ic * m2 - deg * deg) AS BIGINT) AS q_num
      FROM per_c CROSS JOIN m2t)
    SELECT n_communities, m2, q_num,
           round(CAST(q_num AS DOUBLE)
                 / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6) AS modularity
    FROM folded
"""


ORACLES["graph_modularity"] = _modularity_oracle()


# --- Lorenz-curve deciles ------------------------------------------------------------


def agg_lorenz_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """The Lorenz curve behind `agg_gini_wealth`: customers binned into
    account-balance deciles by the broadcast exact-percentile binner,
    each row reporting the cumulative population and balance-cent share
    in integer permille — the plottable inequality curve, where Gini is
    one number.  Balances can be negative (the curve may dip below
    zero); shares stay exact integer `div` ratios.  The cumulative
    window rides the 10-row decile table."""
    from pyspark.sql import Window

    from image_matadata_batchprocessing_aws_spark.operators.scale import quantile_bin

    c = t(spark, sf, "customer").select(
        "c_acctbal",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("__cents"),
    )
    binned = quantile_bin(c, ["c_acctbal"], n_bins=10)
    per = binned.groupBy(
        F.col("c_acctbal_bin").cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__cents").cast("long").alias("cents"),
    )
    tot = per.agg(F.sum("n").alias("__nn"), F.sum("cents").alias("__cc"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "cents",
            F.sum("n").over(w).cast("long").alias("cum_n"),
            F.sum("cents").over(w).cast("long").alias("cum_cents"),
            F.col("__nn"),
            F.col("__cc"),
        )
        .select(
            "decile",
            "n",
            "cents",
            F.expr("cum_n * 1000 div __nn").cast("long").alias("cum_pop_permille"),
            F.expr("cum_cents * 1000 div __cc")
            .cast("long")
            .alias("cum_wealth_permille"),
        )
    )


QUERIES["agg_lorenz_deciles"] = agg_lorenz_deciles


def _lorenz_oracle() -> str:
    qs = ", ".join(
        f"quantile_cont(c_acctbal, {i / 10}) AS q{i}" for i in range(1, 10)
    )
    bins = " + ".join(f"CAST(c_acctbal > q{i} AS INT)" for i in range(1, 10))
    return f"""
    WITH q AS (SELECT {qs} FROM customer),
    b AS (SELECT CAST({bins} AS BIGINT) AS decile,
                 CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents
          FROM customer, q),
    per AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM b GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(cents) AS BIGINT) AS cc FROM per),
    cum AS (
      SELECT decile, n, cents,
             CAST(sum(n) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(sum(cents) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents
      FROM per)
    SELECT decile, n, cents,
           CAST(cum_n * 1000 // nn AS BIGINT) AS cum_pop_permille,
           CAST(cum_cents * 1000 // cc AS BIGINT) AS cum_wealth_permille
    FROM cum, tot
"""


ORACLES["agg_lorenz_deciles"] = _lorenz_oracle()


# --- community conductance -----------------------------------------------------------


def graph_conductance(spark: SparkSession, sf: str) -> DataFrame:
    """Per-community conductance of the LPA partition — phi(c) =
    cut(c) / min(vol(c), vol(rest)), the "how leaky is this community"
    companion to `graph_modularity`'s global Q (low phi = a real
    cluster; phi near 1 = a label artifact).  Same tagged-edge table as
    the modularity query: cut = degree volume minus internal edges, all
    BIGINT, conductance in integer permille."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        label_propagation,
    )
    from image_matadata_batchprocessing_aws_spark.queries.graphq import (
        LPA_ROUNDS,
        _cust_supp_edges,
    )

    edges = _cust_supp_edges(spark, sf).localCheckpoint(eager=False)
    lab = label_propagation(edges, rounds=LPA_ROUNDS)
    m2df = edges.agg(F.count(F.lit(1)).alias("__m2"))
    ls = lab.select(F.col("node").alias("src"), F.col("label").alias("cs"))
    ld = lab.select(F.col("node").alias("dst"), F.col("label").alias("cd"))
    tagged = edges.join(ls, "src").join(ld, "dst")
    per_c = (
        tagged.groupBy("cs")
        .agg(
            F.count(F.lit(1)).alias("__vol"),
            F.sum((F.col("cs") != F.col("cd")).cast("long")).alias("__cut"),
        )
        .crossJoin(F.broadcast(m2df))
    )
    denom = F.least(F.col("__vol"), F.col("__m2") - F.col("__vol"))
    return per_c.select(
        F.col("cs").cast("long").alias("community"),
        F.col("__vol").cast("long").alias("volume"),
        F.col("__cut").cast("long").alias("cut_edges"),
        F.when(
            denom > 0,
            F.expr("__cut * 1000 div least(__vol, __m2 - __vol)"),
        )
        .cast("long")
        .alias("conductance_permille"),
    )


QUERIES["graph_conductance"] = graph_conductance


def _conductance_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.graphq import _LPA_ROUND

    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {_LPA_ROUND.format(r=1, p=0)},
    {_LPA_ROUND.format(r=2, p=1)},
    m2t AS (SELECT count(*) AS m2 FROM edges),
    tagged AS (
      SELECT ls.label AS cs, ld.label AS cd
      FROM edges e
      JOIN l2 ls ON ls.node = e.src
      JOIN l2 ld ON ld.node = e.dst),
    per_c AS (
      SELECT cs, count(*) AS vol,
             sum(CASE WHEN cs <> cd THEN 1 ELSE 0 END) AS cut
      FROM tagged GROUP BY cs)
    SELECT CAST(cs AS BIGINT) AS community,
           CAST(vol AS BIGINT) AS volume,
           CAST(cut AS BIGINT) AS cut_edges,
           CAST(CASE WHEN least(vol, m2 - vol) > 0
                THEN cut * 1000 // least(vol, m2 - vol) END AS BIGINT)
               AS conductance_permille
    FROM per_c CROSS JOIN m2t
"""


ORACLES["graph_conductance"] = _conductance_oracle()
