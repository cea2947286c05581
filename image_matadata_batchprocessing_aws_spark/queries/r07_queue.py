"""Oracle-ready queries staged during r06 for r07 registration.

Same discipline as ``queries/r06_queue.py`` was under in r05: the
registry drains 50 driver slots per round, so new queries stage here —
fully oracled and exact-verified (``tests/test_r07_queue.py`` at
sf0.001, ``tools/check_oracle.py --staged`` at any sf dir) — and
register only when the never-driver-checked backlog allows (the r03
lesson: keep registry growth <= window drain rate).  Capped at <= 50
pairs per the drain plan in ``queries/__init__.py``.

Float-parity rules are the house ones (see ``queries/etl.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.queries.util import t

QUERIES: dict = {}
ORACLES: dict = {}

#: even-dimension logical screens shared by the animation fixtures
#: (even h/w/h÷2/w÷2 keep every checkerboard count an exact half)
ANIM_DIMS = [(32, 48), (24, 40), (40, 32), (28, 36), (36, 28), (48, 24)]

_ANIM_DIMS_H = " ".join(f"WHEN {i} THEN {h}" for i, (h, _) in enumerate(ANIM_DIMS))
_ANIM_DIMS_W = " ".join(f"WHEN {i} THEN {w}" for i, (_, w) in enumerate(ANIM_DIMS))


def stream_engagement_panel(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING engagement panel
    (`streaming/engagement.py`, VERDICT r5 item 6): the DAU/MAU
    dashboard kept live over an unbounded stream as a mergeable
    (month, user) day-bitmap state — one BIGINT whose bit d-1 means
    "active on day-of-month d"; ``bit_or`` merges micro-batches, so the
    foreachBatch sink's state after any stream prefix equals THIS query
    over the same rows bit-for-bit (tests/test_streaming.py asserts
    stream == batch across micro-batch boundaries AND that every
    intermediate epoch equals its prefix).  The closing arithmetic is
    the ``agg_dau_mau`` integer recipe: mau, observed days
    (popcount of the OR-union bitmap), DAU total (Σ popcounts), integer
    ``div`` for avg DAU and permille stickiness."""
    from image_matadata_batchprocessing_aws_spark.streaming.engagement import (
        engagement_panel,
        user_day_bits,
    )

    e = t(spark, sf, "events").select("user_id", "ts")
    return engagement_panel(user_day_bits(e))


QUERIES["stream_engagement_panel"] = stream_engagement_panel

ORACLES["stream_engagement_panel"] = """
    WITH e AS (
      SELECT user_id,
             CAST(epoch_ms(date_trunc('month', ts)) AS BIGINT) AS month_ms,
             day(ts) AS dom
      FROM events WHERE user_id IS NOT NULL),
    bits AS (
      SELECT month_ms, user_id,
             bit_or(CAST(1 AS BIGINT) << (dom - 1)) AS day_bits
      FROM e GROUP BY 1, 2),
    panel AS (
      SELECT month_ms,
             CAST(count(*) AS BIGINT) AS mau,
             CAST(bit_count(bit_or(day_bits)) AS BIGINT) AS n_days,
             CAST(sum(bit_count(day_bits)) AS BIGINT) AS dau_total
      FROM bits GROUP BY 1)
    SELECT month_ms, mau, n_days, dau_total,
           CAST(dau_total // n_days AS BIGINT) AS avg_dau,
           CAST(dau_total * 1000 // (n_days * mau) AS BIGINT)
               AS stickiness_permille
    FROM panel
"""


# --- REAL animated-GIF decode + composite with a closed-form oracle --------

GIF_ANIM_N_DOCS = 24


def multimodal_gif_animation(spark: SparkSession, sf: str) -> DataFrame:
    """REAL animated-GIF decode + disposal/transparency COMPOSITING
    (S9 extension; reference reads animated GIFs through PIL's
    ``Image.open`` seam, process_test_train_Images.py:45), oracle-checked
    frame by frame.  Each synthetic doc is a 4-frame animation through
    the pure 89a pipeline (``multimodal/gif_anim.py``, giflib-parity
    tested): full-screen paint (disposal 1), a checkerboard-transparent
    sub-rect (disposal 3, restore-to-previous), an opaque sub-rect
    (disposal 2, restore-to-background), and an interlaced full repaint
    — so the per-frame channel sums have exact closed forms the DuckDB
    twin recomputes from ``doc_id`` arithmetic alone."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.gif_anim import (
        encode_gif_animation,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        animation_frame_stats,
    )

    rows = []
    for d in range(GIF_ANIM_N_DOCS):
        h, w = ANIM_DIMS[d % len(ANIM_DIMS)]
        rh, rw, y, x = h // 2, w // 2, h // 4, w // 4
        pal = np.array(
            [
                [(d * 3) % 251, (d * 5) % 251, (d * 7) % 251],   # 0: background
                [(d * 11) % 251, (d * 17) % 251, (d * 23) % 251],  # 1: cA
                [(d * 29) % 251, (d * 31) % 251, (d * 37) % 251],  # 2: cB
                [(d * 41) % 251, (d * 43) % 251, (d * 47) % 251],  # 3: cC
                [0, 0, 0],  # 4: transparent slot (color never shown)
            ],
            dtype=np.uint8,
        )
        rr, cc = np.mgrid[0:rh, 0:rw]
        checker = np.where((rr + cc) % 2 == 0, 2, 4).astype(np.uint8)
        frames = [
            dict(indices=np.full((h, w), 1, np.uint8), delay_cs=10, disposal=1),
            dict(indices=checker, x=x, y=y, delay_cs=20, disposal=3, transparent=4),
            dict(indices=np.full((rh, rw), 3, np.uint8), x=x, y=y, delay_cs=30, disposal=2),
            dict(indices=np.full((h, w), 1, np.uint8), delay_cs=40, interlace=True),
        ]
        rows.append((d, f"{d}.gif", bytearray(encode_gif_animation(frames, w, h, pal))))
    entries = spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")
    stats = animation_frame_stats(entries.select("entry_name", "content"))
    out = stats.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id", "frame_idx", "duration_ms", "height", "width",
        "r_sum", "g_sum", "b_sum", "a_sum",
    ).orderBy("doc_id", "frame_idx")


QUERIES["multimodal_gif_animation"] = multimodal_gif_animation

ORACLES["multimodal_gif_animation"] = f"""
    WITH d AS (SELECT unnest(range({GIF_ANIM_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_H} END AS h,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_W} END AS w
      FROM d),
    geo AS (
      SELECT doc_id, h, w, h * w AS hw, (h // 2) * (w // 2) AS rect
      FROM dims),
    fr AS (SELECT unnest(range(4)) AS frame_idx)
    SELECT g.doc_id,
           fr.frame_idx,
           CAST(CASE fr.frame_idx WHEN 0 THEN 100 WHEN 1 THEN 200
                                  WHEN 2 THEN 300 ELSE 400 END AS BIGINT)
               AS duration_ms,
           CAST(g.h AS BIGINT) AS height,
           CAST(g.w AS BIGINT) AS width,
           CAST(CASE fr.frame_idx
             WHEN 0 THEN (g.doc_id * 11 % 251) * g.hw
             WHEN 1 THEN (g.doc_id * 11 % 251) * (g.hw - g.rect // 2)
                         + (g.doc_id * 29 % 251) * (g.rect // 2)
             WHEN 2 THEN (g.doc_id * 11 % 251) * (g.hw - g.rect)
                         + (g.doc_id * 41 % 251) * g.rect
             ELSE (g.doc_id * 11 % 251) * g.hw END AS BIGINT) AS r_sum,
           CAST(CASE fr.frame_idx
             WHEN 0 THEN (g.doc_id * 17 % 251) * g.hw
             WHEN 1 THEN (g.doc_id * 17 % 251) * (g.hw - g.rect // 2)
                         + (g.doc_id * 31 % 251) * (g.rect // 2)
             WHEN 2 THEN (g.doc_id * 17 % 251) * (g.hw - g.rect)
                         + (g.doc_id * 43 % 251) * g.rect
             ELSE (g.doc_id * 17 % 251) * g.hw END AS BIGINT) AS g_sum,
           CAST(CASE fr.frame_idx
             WHEN 0 THEN (g.doc_id * 23 % 251) * g.hw
             WHEN 1 THEN (g.doc_id * 23 % 251) * (g.hw - g.rect // 2)
                         + (g.doc_id * 37 % 251) * (g.rect // 2)
             WHEN 2 THEN (g.doc_id * 23 % 251) * (g.hw - g.rect)
                         + (g.doc_id * 47 % 251) * g.rect
             ELSE (g.doc_id * 23 % 251) * g.hw END AS BIGINT) AS b_sum,
           CAST(255 * g.hw AS BIGINT) AS a_sum
    FROM geo g CROSS JOIN fr
    ORDER BY g.doc_id, fr.frame_idx
"""


# --- REAL animated-WebP decode + composite with a closed-form oracle -------

WEBP_ANIM_N_DOCS = 18


def multimodal_webp_anim(spark: SparkSession, sf: str) -> DataFrame:
    """REAL animated-WebP (VP8X/ANIM/ANMF) decode + blend/dispose
    COMPOSITING — the seam VERDICT r5 item 7 asked to close: this
    box's libwebp has no demuxer, so the pure path
    (``multimodal/webp_anim.py``; VP8L payloads + ALPH, both validated
    against libwebp elsewhere) is the ONLY animated-WebP decode.  Each
    doc: full-canvas paint, an alpha-checkerboard blended sub-rect
    disposed to background, an overwrite sub-rect, and a full-canvas
    checkerboard blend over the composite — all VP8L-lossless, so the
    per-frame channel sums are exact integer closed forms."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        animation_frame_stats,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.webp_anim import (
        encode_webp_animation,
    )

    rows = []
    for d in range(WEBP_ANIM_N_DOCS):
        h, w = ANIM_DIMS[d % len(ANIM_DIMS)]
        rh, rw, y, x = h // 2, w // 2, 2 * (h // 8), 2 * (w // 8)
        cA = ((d * 11) % 251, (d * 17) % 251, (d * 23) % 251)
        cB = ((d * 29) % 251, (d * 31) % 251, (d * 37) % 251)
        cC = ((d * 41) % 251, (d * 43) % 251, (d * 47) % 251)
        cD = ((d * 53) % 251, (d * 59) % 251, (d * 61) % 251)

        def solid(hh, ww, rgb, alpha):
            fr = np.empty((hh, ww, 4), np.uint8)
            fr[:, :, 0], fr[:, :, 1], fr[:, :, 2] = rgb
            fr[:, :, 3] = alpha
            return fr

        rr, cc = np.mgrid[0:rh, 0:rw]
        f1 = solid(rh, rw, cB, 255)
        f1[:, :, 3] = np.where((rr + cc) % 2 == 0, 255, 0).astype(np.uint8)
        rr2, cc2 = np.mgrid[0:h, 0:w]
        f3 = solid(h, w, cD, 255)
        f3[:, :, 3] = np.where((rr2 + cc2) % 2 == 0, 255, 0).astype(np.uint8)
        frames = [
            dict(rgba=solid(h, w, cA, 255), duration_ms=100, blend=False),
            dict(rgba=f1, x=x, y=y, duration_ms=50, blend=True, dispose_bg=True),
            dict(rgba=solid(rh, rw, cC, 255), x=x, y=y, duration_ms=70, blend=False),
            dict(rgba=f3, duration_ms=30, blend=True),
        ]
        blob = encode_webp_animation(
            frames, w, h,
            bg_rgba=((d * 3) % 251, (d * 5) % 251, (d * 7) % 251, 255),
            loop_count=d % 4,
        )
        rows.append((d, f"{d}.webp", bytearray(blob)))
    entries = spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")
    stats = animation_frame_stats(entries.select("entry_name", "content"))
    out = stats.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id", "frame_idx", "duration_ms", "height", "width",
        "r_sum", "g_sum", "b_sum", "a_sum",
    ).orderBy("doc_id", "frame_idx")


QUERIES["multimodal_webp_anim"] = multimodal_webp_anim


def _webp_anim_chan(mults: tuple[int, int, int, int]) -> str:
    """Closed-form per-channel sum CASE for (cA, cB, cC, cD) channel
    multipliers: frame 0 full cA; frame 1 blends a half-opaque
    checkerboard cB rect over cA; frame 2 disposes the rect to
    background then overwrites it with cC; frame 3 blends a
    half-opaque full-canvas cD checkerboard over frame 2's composite
    (binary alpha -> overwrite-or-keep, integer-exact)."""
    a, b, c, dd = mults
    return f"""CASE fr.frame_idx
             WHEN 0 THEN (g.doc_id * {a} % 251) * g.hw
             WHEN 1 THEN (g.doc_id * {a} % 251) * (g.hw - g.rect // 2)
                         + (g.doc_id * {b} % 251) * (g.rect // 2)
             WHEN 2 THEN (g.doc_id * {a} % 251) * (g.hw - g.rect)
                         + (g.doc_id * {c} % 251) * g.rect
             ELSE (g.doc_id * {dd} % 251) * (g.hw // 2)
                  + (g.doc_id * {a} % 251) * ((g.hw - g.rect) // 2)
                  + (g.doc_id * {c} % 251) * (g.rect // 2)
             END"""


ORACLES["multimodal_webp_anim"] = f"""
    WITH d AS (SELECT unnest(range({WEBP_ANIM_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_H} END AS h,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_W} END AS w
      FROM d),
    geo AS (
      SELECT doc_id, h, w, h * w AS hw, (h // 2) * (w // 2) AS rect
      FROM dims),
    fr AS (SELECT unnest(range(4)) AS frame_idx)
    SELECT g.doc_id,
           fr.frame_idx,
           CAST(CASE fr.frame_idx WHEN 0 THEN 100 WHEN 1 THEN 50
                                  WHEN 2 THEN 70 ELSE 30 END AS BIGINT)
               AS duration_ms,
           CAST(g.h AS BIGINT) AS height,
           CAST(g.w AS BIGINT) AS width,
           CAST({_webp_anim_chan((11, 29, 41, 53))} AS BIGINT) AS r_sum,
           CAST({_webp_anim_chan((17, 31, 43, 59))} AS BIGINT) AS g_sum,
           CAST({_webp_anim_chan((23, 37, 47, 61))} AS BIGINT) AS b_sum,
           CAST(255 * g.hw AS BIGINT) AS a_sum
    FROM geo g CROSS JOIN fr
    ORDER BY g.doc_id, fr.frame_idx
"""


# --- probability-quality eval family (Brier / log-loss / MCC) ---------------


def eval_brier_decomp(spark: SparkSession, sf: str) -> DataFrame:
    """Brier score + Murphy decomposition (reliability - resolution +
    uncertainty) of the min-max-price pseudo-probability predicting
    order finalization — the proper-scoring-rule companion to
    ``eval_calibration`` (same binning, deeper diagnostic)."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        brier_decomposition,
    )

    o = t(spark, sf, "orders")
    mm = o.agg(F.min("o_totalprice").alias("__mn"), F.max("o_totalprice").alias("__mx"))
    base = o.crossJoin(F.broadcast(mm)).select(
        ((F.col("o_totalprice") - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))).alias("p"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    return brier_decomposition(base, "p", "y", n_bins=10)


QUERIES["eval_brier_decomp"] = eval_brier_decomp

ORACLES["eval_brier_decomp"] = """
    WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    b AS (
      SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10) AS BIGINT), 9) AS bin,
             CAST(round((o_totalprice - mn) / (mx - mn) * 1000000.0) AS BIGINT) AS p6,
             CASE WHEN o_orderstatus = 'F' THEN CAST(1 AS BIGINT) ELSE 0 END AS y
      FROM orders CROSS JOIN mm),
    per AS (
      SELECT bin, count(*) AS n, sum(p6) AS sp6, sum(y) AS sy,
             sum((p6 - y * 1000000) * (p6 - y * 1000000)) AS se12
      FROM b GROUP BY bin),
    agg AS (
      SELECT sum(n) AS nt, sum(sy) AS syt, sum(se12) AS se12t,
             sum(n * (CAST(sp6 AS DOUBLE) / n / 1000000.0 - CAST(sy AS DOUBLE) / n)
                   * (CAST(sp6 AS DOUBLE) / n / 1000000.0 - CAST(sy AS DOUBLE) / n))
               AS rel_n,
             sum(n * (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) AS res_a
      FROM per)
    SELECT CAST(nt AS BIGINT) AS n,
           round(CAST(se12t AS DOUBLE) / nt / 1000000000000.0, 6) AS brier,
           round(rel_n / nt, 6) AS reliability,
           round(res_a / nt - (CAST(syt AS DOUBLE) / nt) * (CAST(syt AS DOUBLE) / nt), 6)
               AS resolution,
           round((CAST(syt AS DOUBLE) / nt) * (1.0 - CAST(syt AS DOUBLE) / nt), 6)
               AS uncertainty
    FROM agg
"""


def eval_log_loss(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped binary cross-entropy of the min-max-price
    pseudo-probability vs order finalization, per order priority —
    per-row ln terms quantized to nano-unit BIGINTs before summing
    (the ``kaplan_meier`` idiom) so accumulation is order-independent."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import log_loss

    o = t(spark, sf, "orders")
    mm = o.agg(F.min("o_totalprice").alias("__mn"), F.max("o_totalprice").alias("__mx"))
    base = o.crossJoin(F.broadcast(mm)).select(
        "o_orderpriority",
        ((F.col("o_totalprice") - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))).alias("p"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    return log_loss(base, "p", "y", group_by=["o_orderpriority"]).orderBy(
        "o_orderpriority"
    )


QUERIES["eval_log_loss"] = eval_log_loss

ORACLES["eval_log_loss"] = """
    WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    b AS (
      SELECT o_orderpriority,
             greatest(least((o_totalprice - mn) / (mx - mn), 1.0 - 0.000001),
                      0.000001) AS p,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders CROSS JOIN mm),
    s AS (
      SELECT o_orderpriority,
             CAST(round(-(y * ln(p) + (1 - y) * ln(1.0 - p)) * 1000000000.0) AS BIGINT)
               AS ll9
      FROM b)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(ll9) AS DOUBLE) / count(*) / 1000000000.0, 6) AS log_loss
    FROM s GROUP BY 1 ORDER BY 1
"""


def eval_matthews_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Matthews correlation per line status: does a bulk-quantity rule
    (qty > 25) predict returns?  Exact confusion integers; the
    denominator stays overflow-free as a product of square roots."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        matthews_corr,
    )

    li = t(spark, sf, "lineitem").select(
        "l_linestatus",
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("pred"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    return matthews_corr(li, "pred", "y", group_by=["l_linestatus"]).orderBy(
        "l_linestatus"
    )


QUERIES["eval_matthews_corr"] = eval_matthews_corr

ORACLES["eval_matthews_corr"] = """
    WITH c AS (
      SELECT l_linestatus,
             sum(CASE WHEN l_quantity > 25 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN l_quantity <= 25 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS tn,
             sum(CASE WHEN l_quantity > 25 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN l_quantity <= 25 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS fn
      FROM lineitem GROUP BY 1)
    SELECT l_linestatus, CAST(tp AS BIGINT) AS tp, CAST(tn AS BIGINT) AS tn,
           CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
           round(CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0
                 THEN (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                      / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))
                         * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE)))
                 END, 6) AS mcc
    FROM c ORDER BY l_linestatus
"""


def eval_krippendorff(spark: SparkSession, sf: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over three deterministic rule
    raters labeling documents long/short — the ``eval_fleiss_kappa``
    family's missing-data-capable sibling, integer-exact coincidence
    sums (constant rater count) with one double division."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        krippendorff_alpha_nominal,
    )

    d = t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") > 300, "long").otherwise("short").alias("r1"),
        F.when(F.col("n_chars") > 350, "long").otherwise("short").alias("r2"),
        F.when(F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) > 45, "long")
        .otherwise("short")
        .alias("r3"),
    )
    return krippendorff_alpha_nominal(d, "doc_id", ["r1", "r2", "r3"])


QUERIES["eval_krippendorff"] = eval_krippendorff

ORACLES["eval_krippendorff"] = """
    WITH raters AS (
      SELECT doc_id,
             CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS r1,
             CASE WHEN n_chars > 350 THEN 'long' ELSE 'short' END AS r2,
             CASE WHEN length(text) - length(replace(text, ' ', '')) > 45
                  THEN 'long' ELSE 'short' END AS r3
      FROM documents),
    melt AS (
      SELECT doc_id, unnest([r1, r2, r3]) AS cat FROM raters),
    per_uc AS (SELECT doc_id, cat, count(*) AS nuc FROM melt GROUP BY 1, 2),
    s1 AS (SELECT sum(nuc * (3 - nuc)) AS s1, count(DISTINCT doc_id) AS units
           FROM per_uc),
    per_c AS (SELECT cat, sum(nuc) AS nc FROM per_uc GROUP BY 1),
    tot AS (SELECT sum(nc) AS n FROM per_c),
    s2 AS (SELECT sum(nc * (n - nc)) AS s2, any_value(n) AS n
           FROM per_c CROSS JOIN tot)
    SELECT CAST(units AS BIGINT) AS n_units, CAST(3 AS BIGINT) AS n_raters,
           round(CAST(s1 AS DOUBLE) / (n * 2), 6) AS observed_disagreement,
           round(CAST(s2 AS DOUBLE) / (n * (n - 1)), 6) AS expected_disagreement,
           round(1.0 - (CAST(s1 AS DOUBLE) / (n * 2))
                     / (CAST(s2 AS DOUBLE) / (n * (n - 1))), 6) AS alpha
    FROM s1 CROSS JOIN s2
"""


def eval_fdr_bh(spark: SparkSession, sf: str) -> DataFrame:
    """Benjamini-Hochberg FDR over per-nation chi-squared tests (3
    market segments x urgent flag -> df = 2, where ``p = exp(-x/2)``
    is EXACT, not a table lookup).  The data-sized pass is one
    partial-agg count; the BH window rides the 25-row test table."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import fdr_bh

    c = t(spark, sf, "customer").where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY")
    )
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("urgent"),
    )
    joined = c.select("c_custkey", "c_nationkey", "c_mktsegment").join(
        o, c.c_custkey == o.o_custkey
    )
    cells = joined.groupBy("c_nationkey", "c_mktsegment", "urgent").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = cells.groupBy("c_nationkey", "c_mktsegment").agg(F.sum("n").alias("rn"))
    cols = cells.groupBy("c_nationkey", "urgent").agg(F.sum("n").alias("cn"))
    tot = cells.groupBy("c_nationkey").agg(F.sum("n").alias("nt"))
    grid = (
        rows.join(cols, "c_nationkey")
        .join(tot, "c_nationkey")
        .join(cells, ["c_nationkey", "c_mktsegment", "urgent"], "left")
        .fillna(0, subset=["n"])
    )
    chi2 = grid.groupBy("c_nationkey").agg(
        F.sum(
            (F.col("n") - F.col("rn") * F.col("cn") / F.col("nt"))
            * (F.col("n") - F.col("rn") * F.col("cn") / F.col("nt"))
            / (F.col("rn") * F.col("cn") / F.col("nt"))
        ).alias("chi2")
    )
    tests = chi2.select(
        "c_nationkey", F.exp(-F.col("chi2") / 2).alias("p")
    )
    return fdr_bh(tests, "p", ["c_nationkey"], q=0.1)


QUERIES["eval_fdr_bh"] = eval_fdr_bh

ORACLES["eval_fdr_bh"] = """
    WITH j AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END
               AS urgent
      FROM customer JOIN orders ON c_custkey = o_custkey
      WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY')),
    cells AS (SELECT c_nationkey, c_mktsegment, urgent, count(*) AS n
              FROM j GROUP BY 1, 2, 3),
    rows_ AS (SELECT c_nationkey, c_mktsegment, sum(n) AS rn
              FROM cells GROUP BY 1, 2),
    cols_ AS (SELECT c_nationkey, urgent, sum(n) AS cn FROM cells GROUP BY 1, 2),
    tot AS (SELECT c_nationkey, sum(n) AS nt FROM cells GROUP BY 1),
    grid AS (
      SELECT r.c_nationkey, r.c_mktsegment, c.urgent, r.rn, c.cn, t.nt,
             coalesce(x.n, 0) AS n
      FROM rows_ r
      JOIN cols_ c ON r.c_nationkey = c.c_nationkey
      JOIN tot t ON r.c_nationkey = t.c_nationkey
      LEFT JOIN cells x ON x.c_nationkey = r.c_nationkey
                        AND x.c_mktsegment = r.c_mktsegment
                        AND x.urgent = c.urgent),
    chi AS (
      SELECT c_nationkey,
             sum((n - rn * cn / CAST(nt AS DOUBLE))
                 * (n - rn * cn / CAST(nt AS DOUBLE))
                 / (rn * cn / CAST(nt AS DOUBLE))) AS chi2
      FROM grid GROUP BY 1),
    tests AS (SELECT c_nationkey, exp(-chi2 / 2) AS p FROM chi),
    m AS (SELECT count(*) AS m FROM tests),
    ranked AS (
      SELECT c_nationkey, p,
             row_number() OVER (ORDER BY p ASC, c_nationkey) AS k
      FROM tests),
    cut AS (
      SELECT max(CASE WHEN p * m <= k * 0.1 THEN k ELSE 0 END) AS cutoff
      FROM ranked CROSS JOIN m)
    SELECT c_nationkey, round(p, 9) AS p_value, CAST(k AS BIGINT) AS rank,
           round(k * 0.1 / m, 9) AS bh_threshold,
           k <= cutoff AS discovered
    FROM ranked CROSS JOIN m CROSS JOIN cut
    ORDER BY rank
"""


# --- experimentation / inference family (Tukey, CUPED, DiD, SPRT, BH) ------


def agg_tukey_hsd(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey-Kramer HSD pairwise q statistics over return-flag groups
    of extended price — the post-hoc step ``agg_anova_oneway`` stops
    short of; split-BIGINT within-group sums, k-row pairwise join."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import tukey_hsd

    return tukey_hsd(t(spark, sf, "lineitem"), "l_returnflag", "l_extendedprice")


QUERIES["agg_tukey_hsd"] = agg_tukey_hsd

ORACLES["agg_tukey_hsd"] = """
    WITH s AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_extendedprice * 100.0) AS BIGINT) AS xs
      FROM lineitem),
    per AS (
      SELECT grp, count(*) AS n, sum(xs) AS sm,
             sum(xs * xs >> 30) AS q_hi, sum(xs * xs & 1073741823) AS q_lo
      FROM s GROUP BY grp),
    perx AS (
      SELECT grp, n, CAST(sm AS DOUBLE) / 100.0 AS sd,
             (CAST(q_hi AS DOUBLE) * 1073741824.0 + CAST(q_lo AS DOUBLE)) / 10000.0
               AS qd
      FROM per),
    stats AS (
      SELECT grp, n, sd AS sm, qd - sd * sd / n AS ss_within FROM perx),
    mse AS (
      SELECT sum(ss_within) / CAST(sum(n) - count(*) AS DOUBLE) AS mse FROM stats)
    SELECT a.grp AS group_a, b.grp AS group_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.sm / a.n, 6) AS mean_a,
           round(b.sm / b.n, 6) AS mean_b,
           round(abs(a.sm / a.n - b.sm / b.n)
                 / sqrt(mse / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
    FROM stats a JOIN stats b ON a.grp < b.grp CROSS JOIN mse
    ORDER BY group_a, group_b
"""


def agg_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: order value as the metric,
    the customer's account balance as the pre-period covariate,
    odd/even custkey as the deterministic variant split."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import cuped_adjust

    o = t(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return cuped_adjust(
        j, F.col("o_custkey") % 2 == 1, "o_totalprice", "c_acctbal"
    )


QUERIES["agg_cuped"] = agg_cuped

ORACLES["agg_cuped"] = """
    WITH b AS (
      SELECT CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END AS tr,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS ys,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS xs
      FROM orders JOIN customer ON o_custkey = c_custkey),
    g AS (
      SELECT count(*) AS n, sum(ys) AS sy, sum(xs) AS sx,
             sum(xs * xs >> 30) AS qxx_hi, sum(xs * xs & 1073741823) AS qxx_lo,
             sum(xs * ys >> 30) AS qxy_hi, sum(xs * ys & 1073741823) AS qxy_lo,
             sum(ys * ys >> 30) AS qyy_hi, sum(ys * ys & 1073741823) AS qyy_lo
      FROM b),
    gg AS (
      SELECT n, CAST(sy AS DOUBLE) / 100.0 AS syd, CAST(sx AS DOUBLE) / 100.0 AS sxd,
             (CAST(qxx_hi AS DOUBLE) * 1073741824.0 + CAST(qxx_lo AS DOUBLE)) / 10000.0 AS qxx,
             (CAST(qxy_hi AS DOUBLE) * 1073741824.0 + CAST(qxy_lo AS DOUBLE)) / 10000.0 AS qxy,
             (CAST(qyy_hi AS DOUBLE) * 1073741824.0 + CAST(qyy_lo AS DOUBLE)) / 10000.0 AS qyy
      FROM g),
    th AS (
      SELECT (qxy - sxd * syd / n) / (qxx - sxd * sxd / n) AS theta,
             (qxy - sxd * syd / n) * (qxy - sxd * syd / n)
               / ((qxx - sxd * sxd / n) * (qyy - syd * syd / n)) AS rho2,
             sxd / n AS xbar
      FROM gg),
    per AS (
      SELECT tr, count(*) AS n, sum(ys) AS sy, sum(xs) AS sx FROM b GROUP BY tr),
    m AS (
      SELECT tr, n,
             CAST(sy AS DOUBLE) / 100.0 / n AS my,
             CAST(sx AS DOUBLE) / 100.0 / n AS mx
      FROM per)
    SELECT
      CAST(max(CASE WHEN tr = 1 THEN n END) AS BIGINT) AS n_treat,
      CAST(max(CASE WHEN tr = 0 THEN n END) AS BIGINT) AS n_ctrl,
      round(any_value(theta), 6) AS theta,
      round(max(CASE WHEN tr = 1 THEN my END)
            - max(CASE WHEN tr = 0 THEN my END), 6) AS raw_effect,
      round(max(CASE WHEN tr = 1 THEN my - theta * (mx - xbar) END)
            - max(CASE WHEN tr = 0 THEN my - theta * (mx - xbar) END), 6)
        AS cuped_effect,
      round(any_value(rho2), 6) AS variance_reduction
    FROM m CROSS JOIN th
"""


def agg_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences over the odd/even-custkey pseudo
    cohorts before/after 1998-01-01 — exact 2x2 cell sums."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import diff_in_diff

    o = t(spark, sf, "orders")
    return diff_in_diff(
        o,
        F.col("o_custkey") % 2 == 1,
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"),
        "o_totalprice",
    )


QUERIES["agg_diff_in_diff"] = agg_diff_in_diff

ORACLES["agg_diff_in_diff"] = """
    WITH b AS (
      SELECT CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END AS tr,
             CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS xs
      FROM orders),
    cells AS (
      SELECT tr, post, count(*) AS n, sum(xs) AS s FROM b GROUP BY 1, 2),
    m AS (SELECT tr, post, n, CAST(s AS DOUBLE) / 100.0 / n AS mm FROM cells)
    SELECT
      CAST(sum(CASE WHEN tr = 1 THEN n ELSE 0 END) AS BIGINT) AS n_treat,
      CAST(sum(CASE WHEN tr = 0 THEN n ELSE 0 END) AS BIGINT) AS n_ctrl,
      round(max(CASE WHEN tr = 1 AND post = 0 THEN mm END), 6) AS m_treat_pre,
      round(max(CASE WHEN tr = 1 AND post = 1 THEN mm END), 6) AS m_treat_post,
      round(max(CASE WHEN tr = 0 AND post = 0 THEN mm END), 6) AS m_ctrl_pre,
      round(max(CASE WHEN tr = 0 AND post = 1 THEN mm END), 6) AS m_ctrl_post,
      round((max(CASE WHEN tr = 1 AND post = 1 THEN mm END)
             - max(CASE WHEN tr = 1 AND post = 0 THEN mm END))
            - (max(CASE WHEN tr = 0 AND post = 1 THEN mm END)
               - max(CASE WHEN tr = 0 AND post = 0 THEN mm END)), 6) AS did
    FROM m
"""


def agg_mutual_info(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information + NMI between return flag and line status —
    the feature-selection staple, exact joint counts, ln epilogue on
    the category-bounded cell table."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        mutual_information,
    )

    return mutual_information(t(spark, sf, "lineitem"), "l_returnflag", "l_linestatus")


QUERIES["agg_mutual_info"] = agg_mutual_info

ORACLES["agg_mutual_info"] = """
    WITH joint AS (
      SELECT l_returnflag AS x, l_linestatus AS y, count(*) AS nij
      FROM lineitem GROUP BY 1, 2),
    mx AS (SELECT x, sum(nij) AS ni FROM joint GROUP BY 1),
    my AS (SELECT y, sum(nij) AS nj FROM joint GROUP BY 1),
    tot AS (SELECT sum(nij) AS n FROM joint),
    cells AS (
      SELECT nij, ni, nj, n
      FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
    agg AS (
      SELECT any_value(n) AS nt,
             sum(CAST(nij AS DOUBLE) / n
                 * ln(CAST(n AS DOUBLE) * nij / (CAST(ni AS DOUBLE) * nj))) AS mi,
             sum(-(CAST(nij AS DOUBLE) / n) * ln(CAST(ni AS DOUBLE) / n)) AS hx,
             sum(-(CAST(nij AS DOUBLE) / n) * ln(CAST(nj AS DOUBLE) / n)) AS hy
      FROM cells)
    SELECT CAST(nt AS BIGINT) AS n, round(mi, 6) AS mi_nats,
           round(hx, 6) AS h_x, round(hy, 6) AS h_y,
           round(mi / sqrt(hx * hy), 6) AS nmi
    FROM agg
"""


def agg_partial_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Partial correlation of price and quantity controlling discount —
    three Pearson terms from one pass of split-BIGINT moments."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        partial_correlation,
    )

    return partial_correlation(
        t(spark, sf, "lineitem"), "l_extendedprice", "l_quantity", "l_discount"
    )


QUERIES["agg_partial_corr"] = agg_partial_corr

ORACLES["agg_partial_corr"] = """
    WITH b AS (
      SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS x,
             CAST(round(l_quantity * 100.0) AS BIGINT) AS y,
             CAST(round(l_discount * 100.0) AS BIGINT) AS z
      FROM lineitem),
    g AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * x >> 30) AS qxx_hi, sum(x * x & 1073741823) AS qxx_lo,
             sum(y * y >> 30) AS qyy_hi, sum(y * y & 1073741823) AS qyy_lo,
             sum(z * z >> 30) AS qzz_hi, sum(z * z & 1073741823) AS qzz_lo,
             sum(x * y >> 30) AS qxy_hi, sum(x * y & 1073741823) AS qxy_lo,
             sum(x * z >> 30) AS qxz_hi, sum(x * z & 1073741823) AS qxz_lo,
             sum(y * z >> 30) AS qyz_hi, sum(y * z & 1073741823) AS qyz_lo
      FROM b),
    d AS (
      SELECT n,
             CAST(sx AS DOUBLE) / 100.0 AS sxd,
             CAST(sy AS DOUBLE) / 100.0 AS syd,
             CAST(sz AS DOUBLE) / 100.0 AS szd,
             (CAST(qxx_hi AS DOUBLE) * 1073741824.0 + CAST(qxx_lo AS DOUBLE)) / 10000.0 AS qxx,
             (CAST(qyy_hi AS DOUBLE) * 1073741824.0 + CAST(qyy_lo AS DOUBLE)) / 10000.0 AS qyy,
             (CAST(qzz_hi AS DOUBLE) * 1073741824.0 + CAST(qzz_lo AS DOUBLE)) / 10000.0 AS qzz,
             (CAST(qxy_hi AS DOUBLE) * 1073741824.0 + CAST(qxy_lo AS DOUBLE)) / 10000.0 AS qxy,
             (CAST(qxz_hi AS DOUBLE) * 1073741824.0 + CAST(qxz_lo AS DOUBLE)) / 10000.0 AS qxz,
             (CAST(qyz_hi AS DOUBLE) * 1073741824.0 + CAST(qyz_lo AS DOUBLE)) / 10000.0 AS qyz
      FROM g),
    r AS (
      SELECT n,
             (qxy - sxd * syd / n) / sqrt((qxx - sxd * sxd / n) * (qyy - syd * syd / n)) AS rxy,
             (qxz - sxd * szd / n) / sqrt((qxx - sxd * sxd / n) * (qzz - szd * szd / n)) AS rxz,
             (qyz - syd * szd / n) / sqrt((qyy - syd * syd / n) * (qzz - szd * szd / n)) AS ryz
      FROM d)
    SELECT CAST(n AS BIGINT) AS n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
             AS r_xy_given_z
    FROM r
"""


def agg_sprt(spark: SparkSession, sf: str) -> DataFrame:
    """Wald SPRT per event type over the time-ordered stream: is the
    rate of high-value events (value > 30) p1 = 0.55 rather than
    p0 = 0.45?  Reports the first boundary crossing — the sequential
    A/B companion to ``agg_power_analysis``."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import sprt_boundary

    e = t(spark, sf, "events")
    return sprt_boundary(
        e,
        ["event_type"],
        ["ts", "event_id"],
        F.col("value") > 30,
        p0=0.45,
        p1=0.55,
    ).orderBy("event_type")


QUERIES["agg_sprt"] = agg_sprt

ORACLES["agg_sprt"] = """
    WITH seq AS (
      SELECT event_type,
             sum(CASE WHEN value > 30 THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS k,
             count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS n
      FROM events),
    llr AS (
      SELECT event_type, n, k,
             k * ln(0.55 / 0.45) + (n - k) * ln(0.45 / 0.55) AS llr
      FROM seq),
    crossed AS (
      SELECT event_type, n, k, llr,
             CASE WHEN llr >= ln(0.8 / 0.05) THEN 'accept_h1'
                  WHEN llr <= ln(0.2 / 0.95) THEN 'accept_h0' END AS dec
      FROM llr
      WHERE llr >= ln(0.8 / 0.05) OR llr <= ln(0.2 / 0.95)),
    first_x AS (
      SELECT event_type, min(n) AS n_at FROM crossed GROUP BY 1)
    SELECT c.event_type,
           CAST(c.n AS BIGINT) AS n_at_decision,
           CAST(c.k AS BIGINT) AS k_at_decision,
           round(c.llr, 6) AS llr,
           c.dec AS decision
    FROM crossed c JOIN first_x f ON c.event_type = f.event_type AND c.n = f.n_at
    ORDER BY c.event_type
"""


# --- link prediction / embedding geometry / coreset family ------------------

AA_CUST_MOD = 20  # customer sample: bounds the per-supplier pair fan-out


def graph_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    """Adamic-Adar link prediction over the customer one-mode
    projection of the customer-supplier bipartite graph: for customer
    pairs sharing suppliers, ``AA = sum_z 1/ln(deg(z))`` over common
    suppliers z (deg >= 2 so ln is never 0).  Top 50.

    Scale shape: the pair generator is the classic two-hop self-join
    on the supplier key — fan-out is sum_z deg(z)^2, bounded here by
    the deterministic customer sample (mod 20); at 100 TB the same cap
    is a degree-threshold stop-list (drop hub suppliers), the
    prefix-filter lesson applied to graphs."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.where(F.col("o_custkey") % AA_CUST_MOD == 0)
        .join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("s").alias("ds"), "deg"
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    pairs = (
        e1.join(e2, (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.c") < F.col("e2.c")))
        .join(deg, F.col("e1.s") == F.col("ds"))
        .where(F.col("deg") >= 2)
        .groupBy(F.col("e1.c").alias("cust_a"), F.col("e2.c").alias("cust_b"))
        .agg(
            F.count(F.lit(1)).alias("common_suppliers"),
            F.round(F.sum(1.0 / F.log(F.col("deg").cast("double"))), 6).alias("aa_score"),
        )
    )
    return pairs.orderBy(
        F.col("aa_score").desc(), "cust_a", "cust_b"
    ).limit(50)


QUERIES["graph_adamic_adar"] = graph_adamic_adar

ORACLES["graph_adamic_adar"] = f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey % {AA_CUST_MOD} = 0),
    deg AS (SELECT s, count(*) AS deg FROM edges GROUP BY 1),
    pairs AS (
      SELECT e1.c AS cust_a, e2.c AS cust_b,
             count(*) AS common_suppliers,
             round(sum(1.0 / ln(CAST(deg AS DOUBLE))), 6) AS aa_score
      FROM edges e1
      JOIN edges e2 ON e1.s = e2.s AND e1.c < e2.c
      JOIN deg d ON e1.s = d.s
      WHERE deg >= 2
      GROUP BY 1, 2)
    SELECT CAST(cust_a AS BIGINT) AS cust_a, CAST(cust_b AS BIGINT) AS cust_b,
           CAST(common_suppliers AS BIGINT) AS common_suppliers, aa_score
    FROM pairs
    ORDER BY aa_score DESC, cust_a, cust_b LIMIT 50
"""


def embedding_isotropy(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space isotropy diagnostics WITHOUT a pair loop: with
    unit-normalized vectors, ``mean pairwise cosine =
    (||sum u||^2 - n) / (n(n-1))`` — the anisotropy measure driving
    all-but-the-top style postprocessing — plus the centroid-norm
    ratio ``||mean x|| / mean ||x||``.  One posexplode + per-dim
    aggregate; everything downstream is 64-dim-sized."""
    from image_matadata_batchprocessing_aws_spark.functions import dot, l2_norm
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )

    e = t(spark, sf, "embeddings").select(as_double_array("embedding").alias("e"))
    e = e.withColumn("__norm", l2_norm(F.col("e")))
    exploded = e.select(
        F.posexplode(F.col("e")).alias("dim", "v"), F.col("__norm")
    )
    per_dim = exploded.groupBy("dim").agg(
        F.sum(F.col("v") / F.col("__norm")).alias("su"),
        F.sum("v").alias("sx"),
    )
    norms = e.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__norm").alias("snorm")
    )
    agg = per_dim.agg(
        F.sum(F.col("su") * F.col("su")).alias("ssu2"),
        F.sum(F.col("sx") * F.col("sx")).alias("ssx2"),
    ).crossJoin(F.broadcast(norms))
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round((F.col("ssu2") - nd) / (nd * (nd - 1)), 6).alias("mean_pairwise_cosine"),
        F.round(
            F.sqrt(F.col("ssx2")) / nd / (F.col("snorm") / nd), 6
        ).alias("centroid_norm_ratio"),
    )


QUERIES["embedding_isotropy"] = embedding_isotropy

ORACLES["embedding_isotropy"] = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))) AS nrm
      FROM embeddings),
    ex AS (
      SELECT u.dim - 1 AS dim, e[u.dim] AS x, nrm
      FROM v, LATERAL (SELECT unnest(generate_series(1, len(e))) AS dim) u),
    per_dim AS (
      SELECT dim, sum(x / nrm) AS su, sum(x) AS sx FROM ex GROUP BY 1),
    norms AS (SELECT count(*) AS n, sum(nrm) AS snorm FROM v),
    agg AS (
      SELECT sum(su * su) AS ssu2, sum(sx * sx) AS ssx2 FROM per_dim)
    SELECT CAST(n AS BIGINT) AS n,
           round((ssu2 - n) / (CAST(n AS DOUBLE) * (n - 1)), 6)
             AS mean_pairwise_cosine,
           round(sqrt(ssx2) / n / (snorm / n), 6) AS centroid_norm_ratio
    FROM agg CROSS JOIN norms
"""

HUB_K = 10


def embedding_hubness(spark: SparkSession, sf: str) -> DataFrame:
    """Hubness diagnostic: how often each vector lands in other
    vectors' cosine top-10 (k-occurrence) — the high-dimensional
    pathology that silently skews kNN-based dedup and retrieval.
    Output: the k-occurrence histogram (antihubs = bucket 0).  The
    all-pairs pass is the ``knn_brute_cosine`` kernel (broadcast-sized
    query side here; IVF/LSH candidates at scale)."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
        knn_bruteforce,
    )

    e = t(spark, sf, "embeddings")
    q = e.select(F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qe"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), as_double_array("embedding").alias("ce"))
    knn = knn_bruteforce(q, c, k=HUB_K + 1, metric="cosine").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("rn").asc())
    topk = knn.withColumn("__r2", F.row_number().over(w)).where(F.col("__r2") <= HUB_K)
    kocc = topk.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("k_occ"))
    all_ids = e.select(F.col("vec_id").alias("neighbor_id"))
    full = all_ids.join(kocc, "neighbor_id", "left").fillna(0, subset=["k_occ"])
    return (
        full.groupBy("k_occ")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(F.col("k_occ").cast("long"), F.col("n_points").cast("long"))
        .orderBy("k_occ")
    )


QUERIES["embedding_hubness"] = embedding_hubness

ORACLES["embedding_hubness"] = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.e, b.e), 6) AS score
      FROM v a CROSS JOIN v b WHERE a.vec_id <> b.vec_id),
    r AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rn
      FROM s),
    kocc AS (
      SELECT neighbor_id, count(*) AS k_occ FROM r WHERE rn <= {HUB_K} GROUP BY 1),
    full_t AS (
      SELECT v.vec_id, coalesce(k.k_occ, 0) AS k_occ
      FROM v LEFT JOIN kocc k ON v.vec_id = k.neighbor_id)
    SELECT CAST(k_occ AS BIGINT) AS k_occ, CAST(count(*) AS BIGINT) AS n_points
    FROM full_t GROUP BY 1 ORDER BY 1
"""


def agg_pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on (cheaper
    retail price, larger size).  O(n log n), no pairwise join: sort by
    price, a part is on the frontier iff its size strictly exceeds the
    running max size of every strictly-cheaper part.  Equal-price ties
    are handled by comparing against the running max of the PRECEDING
    price group (range frame), so co-priced parts can both survive."""
    p = t(spark, sf, "part")
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("p_retailprice").asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    scaled = p.select(
        "p_partkey", "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    w2 = (
        Window.orderBy(F.col("price_cents").asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    flagged = scaled.withColumn("__maxprev", F.max("p_size").over(w2))
    return (
        flagged.where(
            F.col("__maxprev").isNull() | (F.col("p_size") > F.col("__maxprev"))
        )
        .select(
            F.col("p_partkey").cast("long"),
            F.col("price_cents"),
            F.col("p_size").cast("long").alias("size"),
        )
        .orderBy("price_cents", "p_partkey")
    )


QUERIES["agg_pareto_frontier"] = agg_pareto_frontier

ORACLES["agg_pareto_frontier"] = """
    WITH s AS (
      SELECT p_partkey, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part),
    f AS (
      SELECT p_partkey, price_cents, p_size,
             max(p_size) OVER (ORDER BY price_cents
                               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS maxprev
      FROM s)
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, price_cents,
           CAST(p_size AS BIGINT) AS size
    FROM f WHERE maxprev IS NULL OR p_size > maxprev
    ORDER BY price_cents, p_partkey
"""


def agg_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """Chapman capture-recapture estimate of the active customer
    population from two yearly 'captures' (customers ordering in 1996
    and 1997): ``N_hat = (n1+1)(n2+1)/(m+1) - 1`` — the ecology
    estimator data teams reuse to size dedup universes from overlapping
    crawls.  Exact integer captures, one double epilogue."""
    o = t(spark, sf, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    caps = o.where(F.col("yr").isin(1996, 1997)).select("o_custkey", "yr").distinct()
    agg = caps.groupBy().agg(
        F.sum((F.col("yr") == 1996).cast("long")).alias("n1"),
        F.sum((F.col("yr") == 1997).cast("long")).alias("n2"),
    )
    both = (
        caps.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") == 2)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("m"))
    )
    out = agg.crossJoin(F.broadcast(both))
    n1d, n2d, md = (F.col(c).cast("double") for c in ("n1", "n2", "m"))
    return out.select(
        F.col("n1").cast("long").alias("n_1996"),
        F.col("n2").cast("long").alias("n_1997"),
        F.col("m").cast("long").alias("n_both"),
        F.round((n1d + 1) * (n2d + 1) / (md + 1) - 1, 2).alias("chapman_estimate"),
    )


QUERIES["agg_capture_recapture"] = agg_capture_recapture

ORACLES["agg_capture_recapture"] = """
    WITH caps AS (
      SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
    a AS (
      SELECT sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS n2
      FROM caps),
    b AS (
      SELECT count(*) AS m
      FROM (SELECT o_custkey FROM caps GROUP BY 1 HAVING count(*) = 2))
    SELECT CAST(n1 AS BIGINT) AS n_1996, CAST(n2 AS BIGINT) AS n_1997,
           CAST(m AS BIGINT) AS n_both,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2) AS chapman_estimate
    FROM a CROSS JOIN b
"""


def agg_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort LTV curve: cumulative revenue per customer by cohort
    year (first-order year) and age-in-years since the cohort — the
    companion to ``agg_retention_cohorts`` on the money axis.  Exact
    cents accumulate through the cumulative window; one division per
    output cell."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    j = o.join(first, "o_custkey").select(
        "cohort", (F.col("yr") - F.col("cohort")).alias("age"), "cents", "o_custkey"
    )
    cohort_sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    per = j.groupBy("cohort", "age").agg(F.sum("cents").alias("rev_cents"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per.withColumn("cum_cents", F.sum("rev_cents").over(w)).join(
        F.broadcast(cohort_sizes), "cohort"
    )
    return cum.select(
        F.col("cohort").cast("long"),
        F.col("age").cast("long"),
        F.col("cohort_n").cast("long"),
        F.col("rev_cents").cast("long"),
        F.col("cum_cents").cast("long"),
        F.round(
            F.col("cum_cents").cast("double") / 100.0 / F.col("cohort_n").cast("double"),
            6,
        ).alias("ltv_per_customer"),
    ).orderBy("cohort", "age")


QUERIES["agg_cohort_ltv"] = agg_cohort_ltv

ORACLES["agg_cohort_ltv"] = """
    WITH o AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    first_o AS (SELECT o_custkey, min(yr) AS cohort FROM o GROUP BY 1),
    sizes AS (SELECT cohort, count(*) AS cohort_n FROM first_o GROUP BY 1),
    j AS (
      SELECT f.cohort, o.yr - f.cohort AS age, o.cents
      FROM o JOIN first_o f ON o.o_custkey = f.o_custkey),
    per AS (SELECT cohort, age, sum(cents) AS rev_cents FROM j GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age, rev_cents,
             sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM per)
    SELECT CAST(c.cohort AS BIGINT) AS cohort, CAST(age AS BIGINT) AS age,
           CAST(cohort_n AS BIGINT) AS cohort_n,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(cum_cents AS BIGINT) AS cum_cents,
           round(CAST(cum_cents AS DOUBLE) / 100.0 / cohort_n, 6) AS ltv_per_customer
    FROM cum c JOIN sizes s ON c.cohort = s.cohort
    ORDER BY cohort, age
"""


# --- time-series mining family (Bollinger / SAX / MASE / Ljung-Box) ---------


def _daily_cents(spark: SparkSession, sf: str) -> DataFrame:
    """Per (event_type, epoch-day): exact cents sum — the shared
    integer-first daily grid for the ts_* additions."""
    e = t(spark, sf, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400 * 1_000_000)).cast("long")
    return (
        e.select("event_type", day.alias("day"),
                 F.round(F.col("value") * 100).cast("long").alias("__c"))
        .groupBy("event_type", "day")
        .agg(F.sum("__c").alias("cents"))
    )


def ts_bollinger(spark: SparkSession, sf: str) -> DataFrame:
    """Bollinger-band breakouts on daily revenue per event type: a day
    is flagged when its total leaves mean ± 2·sd of the PRECEDING
     7 observed days (window excludes the current row, so the band
    never contains the point it judges).  Window sums are exact cents
    and squared cents; sd is one double epilogue per row."""
    d = _daily_cents(spark, sf)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = d.select(
        "event_type", "day", "cents",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum("cents").over(w).alias("__s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("__q"),
    ).where(F.col("__n") == 7)
    nd = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / nd
    sd = F.sqrt(
        (F.col("__q").cast("double") - F.col("__s").cast("double") * F.col("__s") / nd)
        / (nd - 1.0)
    )
    flagged = stats.where(
        (F.col("cents").cast("double") > mean + 2.0 * sd)
        | (F.col("cents").cast("double") < mean - 2.0 * sd)
    )
    return flagged.select(
        "event_type",
        "day",
        F.col("cents").cast("long").alias("cents"),
        F.round(mean / 100.0, 6).alias("band_mean"),
        F.round(sd / 100.0, 6).alias("band_sd"),
        F.when(F.col("cents").cast("double") > mean, F.lit("above")).otherwise(
            F.lit("below")
        ).alias("side"),
    ).orderBy("event_type", "day")


QUERIES["ts_bollinger"] = ts_bollinger

_DAILY_SQL = """
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2"""

ORACLES["ts_bollinger"] = f"""
    WITH d AS ({_DAILY_SQL}),
    w AS (
      SELECT event_type, day, cents,
             count(*) OVER pw AS n, sum(cents) OVER pw AS s,
             sum(cents * cents) OVER pw AS q
      FROM d
      WINDOW pw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
    f AS (
      SELECT event_type, day, cents,
             CAST(s AS DOUBLE) / n AS mean_c,
             sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1.0)) AS sd_c
      FROM w WHERE n = 7)
    SELECT event_type, day, cents,
           round(mean_c / 100.0, 6) AS band_mean,
           round(sd_c / 100.0, 6) AS band_sd,
           CASE WHEN cents > mean_c THEN 'above' ELSE 'below' END AS side
    FROM f
    WHERE cents > mean_c + 2.0 * sd_c OR cents < mean_c - 2.0 * sd_c
    ORDER BY event_type, day
"""

SAX_SEG_DAYS = 4


def ts_sax_symbols(spark: SparkSession, sf: str) -> DataFrame:
    """SAX symbolization of the daily series per event type: z-score
    against the type's own mean/sd (exact integer moments), PAA over
    4-observation segments, then the 4-letter Gaussian-breakpoint
    alphabet (a < -0.6745 < b < 0 < c < 0.6745 < d) — the classic
    motif/novelty preprocessing for time-series mining."""
    d = _daily_cents(spark, sf)
    from pyspark.sql import Window

    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("cents").alias("__s"),
        F.sum(F.col("cents") * F.col("cents")).alias("__q"),
    )
    nd = F.col("__n").cast("double")
    mu = F.col("__s").cast("double") / nd
    sd = F.sqrt(
        (F.col("__q").cast("double") - F.col("__s").cast("double") * F.col("__s") / nd)
        / (nd - 1.0)
    )
    stats = g.select("event_type", mu.alias("__mu"), sd.alias("__sd"))
    w = Window.partitionBy("event_type").orderBy("day")
    idx = d.withColumn("__i", F.row_number().over(w) - 1).join(
        F.broadcast(stats), "event_type"
    )
    seg = idx.groupBy(
        "event_type", (F.col("__i") / SAX_SEG_DAYS).cast("long").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum((F.col("cents").cast("double") - F.col("__mu")) / F.col("__sd")).alias(
            "__zsum"
        ),
    )
    paa = F.col("__zsum") / F.col("__cnt").cast("double")
    sym = (
        F.when(paa < -0.6745, "a")
        .when(paa < 0.0, "b")
        .when(paa < 0.6745, "c")
        .otherwise("d")
    )
    return (
        seg.where(F.col("__cnt") == SAX_SEG_DAYS)
        .select(
            "event_type",
            F.col("segment").cast("long"),
            F.round(paa, 6).alias("paa_z"),
            sym.alias("symbol"),
        )
        .orderBy("event_type", "segment")
    )


QUERIES["ts_sax_symbols"] = ts_sax_symbols

ORACLES["ts_sax_symbols"] = f"""
    WITH d AS ({_DAILY_SQL}),
    g AS (
      SELECT event_type, count(*) AS n, sum(cents) AS s,
             sum(cents * cents) AS q
      FROM d GROUP BY 1),
    stats AS (
      SELECT event_type, CAST(s AS DOUBLE) / n AS mu,
             sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1.0)) AS sd
      FROM g),
    idx AS (
      SELECT d.event_type, d.cents, mu, sd,
             row_number() OVER (PARTITION BY d.event_type ORDER BY day) - 1 AS i
      FROM d JOIN stats USING (event_type)),
    seg AS (
      SELECT event_type, i // {SAX_SEG_DAYS} AS segment, count(*) AS cnt,
             sum((CAST(cents AS DOUBLE) - mu) / sd) AS zsum
      FROM idx GROUP BY 1, 2)
    SELECT event_type, CAST(segment AS BIGINT) AS segment,
           round(zsum / cnt, 6) AS paa_z,
           CASE WHEN zsum / cnt < -0.6745 THEN 'a'
                WHEN zsum / cnt < 0.0 THEN 'b'
                WHEN zsum / cnt < 0.6745 THEN 'c'
                ELSE 'd' END AS symbol
    FROM seg WHERE cnt = {SAX_SEG_DAYS}
    ORDER BY event_type, segment
"""


def ts_mase(spark: SparkSession, sf: str) -> DataFrame:
    """MASE of the seasonal-naive (lag-7) forecast per event type,
    scaled by the one-step-naive in-sample MAE — the scale-free
    forecast-accuracy measure; both MAEs are exact integer sums of
    |cents| differences, one division at the end."""
    d = _daily_cents(spark, sf)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day")
    lagged = d.select(
        "event_type",
        "cents",
        F.lag("cents", 1).over(w).alias("__l1"),
        F.lag("cents", 7).over(w).alias("__l7"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.count(F.when(F.col("__l1").isNotNull(), 1)).alias("n1"),
        F.sum(F.abs(F.col("cents") - F.col("__l1"))).alias("mae1_c"),
        F.count(F.when(F.col("__l7").isNotNull(), 1)).alias("n7"),
        F.sum(F.abs(F.col("cents") - F.col("__l7"))).alias("mae7_c"),
    )
    mae1 = F.col("mae1_c").cast("double") / F.col("n1").cast("double") / 100.0
    mae7 = F.col("mae7_c").cast("double") / F.col("n7").cast("double") / 100.0
    return agg.select(
        "event_type",
        F.col("n7").cast("long").alias("n_forecasts"),
        F.round(mae1, 6).alias("mae_naive1"),
        F.round(mae7, 6).alias("mae_seasonal7"),
        F.round(mae7 / mae1, 6).alias("mase"),
    ).orderBy("event_type")


QUERIES["ts_mase"] = ts_mase

ORACLES["ts_mase"] = f"""
    WITH d AS ({_DAILY_SQL}),
    lagged AS (
      SELECT event_type, cents,
             lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
             lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7
      FROM d),
    agg AS (
      SELECT event_type,
             count(l1) AS n1, sum(abs(cents - l1)) AS mae1_c,
             count(l7) AS n7, sum(abs(cents - l7)) AS mae7_c
      FROM lagged GROUP BY 1)
    SELECT event_type, CAST(n7 AS BIGINT) AS n_forecasts,
           round(CAST(mae1_c AS DOUBLE) / n1 / 100.0, 6) AS mae_naive1,
           round(CAST(mae7_c AS DOUBLE) / n7 / 100.0, 6) AS mae_seasonal7,
           round((CAST(mae7_c AS DOUBLE) / n7) / (CAST(mae1_c AS DOUBLE) / n1), 6)
             AS mase
    FROM agg ORDER BY event_type
"""

LB_MAX_LAG = 10


def ts_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    """Ljung-Box portmanteau statistic on the all-types daily total:
    ``Q = n(n+2) sum_k r_k^2/(n-k)``, k = 1..10 — is the series white
    noise?  The r_k come from one lag self-join per k expressed as a
    single unpivoted window pass; centered products are doubles over
    exact integer cents (sums bounded by the day count, not data)."""
    d = (
        _daily_cents(spark, sf)
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    from pyspark.sql import Window

    g = d.groupBy().agg(
        F.count(F.lit(1)).alias("__n"), F.sum("cents").alias("__s")
    )
    w = Window.orderBy("day")
    lags = d.crossJoin(F.broadcast(g)).select(
        "day",
        "cents",
        "__n",
        (F.col("cents").cast("double") - F.col("__s").cast("double") / F.col("__n"))
        .alias("__c0"),
        *[
            (
                F.lag("cents", k).over(w).cast("double")
                - F.col("__s").cast("double") / F.col("__n")
            ).alias(f"__c{k}")
            for k in range(1, LB_MAX_LAG + 1)
        ],
    )
    agg = lags.groupBy("__n").agg(
        F.sum(F.col("__c0") * F.col("__c0")).alias("__den"),
        *[
            F.sum(F.col("__c0") * F.col(f"__c{k}")).alias(f"__num{k}")
            for k in range(1, LB_MAX_LAG + 1)
        ],
    )
    nd = F.col("__n").cast("double")
    q = sum(
        (
            (F.col(f"__num{k}") / F.col("__den"))
            * (F.col(f"__num{k}") / F.col("__den"))
            / (nd - k)
            for k in range(1, LB_MAX_LAG + 1)
        ),
        F.lit(0.0),
    )
    return agg.select(
        F.col("__n").cast("long").alias("n_days"),
        *[
            F.round(F.col(f"__num{k}") / F.col("__den"), 6).alias(f"r{k}")
            for k in (1, 2, 3, 7)
        ],
        F.round(nd * (nd + 2.0) * q, 4).alias("ljung_box_q"),
    )


QUERIES["ts_ljung_box"] = ts_ljung_box


def _lb_oracle() -> str:
    nums = ",\n             ".join(
        f"sum(c0 * c{k}) AS num{k}" for k in range(1, LB_MAX_LAG + 1)
    )
    lag_cols = ",\n             ".join(
        f"lag(cents, {k}) OVER (ORDER BY day) AS l{k}"
        for k in range(1, LB_MAX_LAG + 1)
    )
    centered = ",\n             ".join(
        f"CAST(l{k} AS DOUBLE) - CAST(s AS DOUBLE) / n AS c{k}"
        for k in range(1, LB_MAX_LAG + 1)
    )
    qterms = " + ".join(
        f"(num{k} / den) * (num{k} / den) / (n - {k})"
        for k in range(1, LB_MAX_LAG + 1)
    )
    rcols = ", ".join(f"round(num{k} / den, 6) AS r{k}" for k in (1, 2, 3, 7))
    return f"""
    WITH d0 AS ({_DAILY_SQL}),
    d AS (SELECT day, sum(cents) AS cents FROM d0 GROUP BY 1),
    g AS (SELECT count(*) AS n, sum(cents) AS s FROM d),
    lagd AS (
      SELECT day, cents,
             {lag_cols}
      FROM d),
    cent AS (
      SELECT n, CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n AS c0,
             {centered}
      FROM lagd CROSS JOIN g),
    agg AS (
      SELECT n, sum(c0 * c0) AS den,
             {nums}
      FROM cent GROUP BY n)
    SELECT CAST(n AS BIGINT) AS n_days, {rcols},
           round(n * (n + 2.0) * ({qterms}), 4) AS ljung_box_q
    FROM agg
"""


ORACLES["ts_ljung_box"] = _lb_oracle()


# --- text + embedding curation family (chrF / burstiness / coreset / MMD) ---


def eval_chrf_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """chrF (character n-gram F2) over the near-dup candidate pairs —
    the tokenization-free generation-eval metric next to
    ``eval_bleu_pairs``/``eval_rouge_pairs``; exact per-order overlap
    and total BIGINTs plus the averaged composite."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        chrf_pair_stats,
    )
    from image_matadata_batchprocessing_aws_spark.queries.dedup import JACCARD_THRESHOLD

    docs = t(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    return chrf_pair_stats(docs, pairs).orderBy("id_a", "id_b")


QUERIES["eval_chrf_pairs"] = eval_chrf_pairs


def _chrf_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.dedup import (
        _SHINGLES_CTE,
        JACCARD_THRESHOLD,
    )

    s_expr = "regexp_replace(lower(text), '\\s+', '', 'g')"
    gram_ctes, stat_ctes, joins = [], [], []
    f_terms, int_cols = [], []
    for n in range(1, 4):
        gram_ctes.append(
            f"""g{n} AS (
          SELECT doc_id, unnest(
            CASE WHEN length({s_expr}) >= {n}
                 THEN list_transform(range(1, length({s_expr}) - {n} + 2),
                                     i -> substr({s_expr}, i, {n}))
                 ELSE CAST([] AS VARCHAR[]) END) AS g
          FROM documents)"""
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
        joins.append(
            f"LEFT JOIN o{n} ON o{n}.id_a = cand.id_a AND o{n}.id_b = cand.id_b\n"
            f"    LEFT JOIN tt{n} ta{n} ON ta{n}.doc_id = cand.id_a\n"
            f"    LEFT JOIN tt{n} tb{n} ON tb{n}.doc_id = cand.id_b"
        )
        int_cols.append(
            f"CAST(coalesce(o{n}.ov, 0) AS BIGINT) AS ov{n}, "
            f"CAST(coalesce(ta{n}.tot, 0) AS BIGINT) AS tota{n}, "
            f"CAST(coalesce(tb{n}.tot, 0) AS BIGINT) AS totb{n}"
        )
        p = f"(CAST(coalesce(o{n}.ov, 0) AS DOUBLE) / tb{n}.tot)"
        r = f"(CAST(coalesce(o{n}.ov, 0) AS DOUBLE) / ta{n}.tot)"
        f_terms.append(
            f"(CASE WHEN coalesce(tb{n}.tot, 0) > 0 AND coalesce(ta{n}.tot, 0) > 0"
            f" AND coalesce(o{n}.ov, 0) > 0"
            f" THEN 5.0 * {p} * {r} / (4.0 * {p} + {r}) ELSE 0.0 END)"
        )
    return f"""
    WITH {_SHINGLES_CTE},
    cand AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
    {', '.join(gram_ctes)},
    {', '.join(stat_ctes)}
    SELECT cand.id_a, cand.id_b,
           {', '.join(int_cols)},
           round(({' + '.join(f_terms)}) / 3.0, 6) AS chrf
    FROM cand
    {chr(10).join('    ' + j for j in joins)}
    ORDER BY cand.id_a, cand.id_b
"""


ORACLES["eval_chrf_pairs"] = _chrf_oracle()

BURST_MIN_DF = 10
BURST_TOP = 40


def text_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Token burstiness (variance-to-mean ratio of per-document
    counts, zeros included via the moment identity): bursty tokens
    cluster in few documents — the Church/Gale signal behind
    stop-list and topicality heuristics.  Exact integer moments."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z]{2,}', 0)")).alias(
            "token"
        ),
    )
    per_doc = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("__c"))
    n_docs = d.count()
    per_tok = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("__c").alias("__tot"),
        F.sum(F.col("__c") * F.col("__c")).alias("__sq"),
    )
    nd = F.lit(float(n_docs))
    mean = F.col("__tot").cast("double") / nd
    var = (
        F.col("__sq").cast("double")
        - F.col("__tot").cast("double") * F.col("__tot") / nd
    ) / (nd - 1.0)
    vmr = F.round(var / mean, 6)
    return (
        per_tok.where(F.col("df") >= BURST_MIN_DF)
        .select(
            "token",
            F.col("df").cast("long").alias("df"),
            F.col("__tot").cast("long").alias("total_count"),
            vmr.alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "token")
        .limit(BURST_TOP)
    )


QUERIES["text_burstiness"] = text_burstiness

ORACLES["text_burstiness"] = f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{{2,}}')) AS token
      FROM documents),
    per_doc AS (SELECT token, doc_id, count(*) AS c FROM toks GROUP BY 1, 2),
    nd AS (SELECT count(*) AS n FROM documents),
    per_tok AS (
      SELECT token, count(*) AS df, sum(c) AS tot, sum(c * c) AS sq
      FROM per_doc GROUP BY 1)
    SELECT token, CAST(df AS BIGINT) AS df, CAST(tot AS BIGINT) AS total_count,
           round(((CAST(sq AS DOUBLE) - CAST(tot AS DOUBLE) * tot / n) / (n - 1.0))
                 / (CAST(tot AS DOUBLE) / n), 6) AS burstiness
    FROM per_tok CROSS JOIN nd
    WHERE df >= {BURST_MIN_DF}
    ORDER BY burstiness DESC, token LIMIT {BURST_TOP}
"""

KCENTER_K = 8


def sample_kcenter_coreset(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez) over embeddings:
    start from the lowest vec_id, then 7 times pick the point farthest
    (L2) from its nearest selected center — the classic diversity
    coreset for data pruning.  Each round is one distance map + one
    1-row argmax; only the center VECTOR (64 doubles) ever reaches the
    driver, never data.  Ties break on rounded distance then vec_id,
    so both engines pick identical centers."""
    from image_matadata_batchprocessing_aws_spark.functions import l2_dist
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )

    e = (
        t(spark, sf, "embeddings")
        .select("vec_id", as_double_array("embedding").alias("e"))
    )
    first = e.orderBy("vec_id").limit(1).collect()[0]
    centers = [(0, int(first["vec_id"]), None)]
    cur = e.select(
        "vec_id",
        "e",
        F.round(l2_dist(F.col("e"), F.array([F.lit(float(v)) for v in first["e"]])), 6)
        .alias("d"),
    ).persist()
    for rnd in range(1, KCENTER_K):
        far = cur.orderBy(F.col("d").desc(), F.col("vec_id").asc()).limit(1).collect()[0]
        centers.append((rnd, int(far["vec_id"]), float(far["d"])))
        nxt = cur.select(
            "vec_id",
            "e",
            F.least(
                F.col("d"),
                F.round(
                    l2_dist(F.col("e"), F.array([F.lit(float(v)) for v in far["e"]])), 6
                ),
            ).alias("d"),
        ).persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return t(spark, sf, "embeddings").sparkSession.createDataFrame(
        [(r, c, d) for r, c, d in centers],
        "round long, center_vec_id long, dist_at_selection double",
    )


QUERIES["sample_kcenter_coreset"] = sample_kcenter_coreset


def _kcenter_oracle() -> str:
    dist = (
        "round(sqrt(list_sum(list_transform(range(1, 65),"
        " i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i])))), 6)"
    )
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        "c0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)",
        f"d0 AS (SELECT v.vec_id, v.e, {dist.replace('c.e', 'c0.e')} AS d"
        "  FROM v CROSS JOIN c0)",
    ]
    selects = ["SELECT 0 AS round, vec_id AS center_vec_id, NULL AS dist_at_selection FROM c0"]
    for r in range(1, KCENTER_K):
        ctes.append(
            f"c{r} AS (SELECT vec_id, e, d FROM d{r - 1}"
            f" ORDER BY d DESC, vec_id LIMIT 1)"
        )
        if r < KCENTER_K - 1:
            ctes.append(
                f"d{r} AS (SELECT v2.vec_id, v2.e, least(v2.d, {dist.replace('v.e', 'v2.e').replace('c.e', f'c{r}.e')}) AS d"
                f"  FROM d{r - 1} v2 CROSS JOIN c{r})"
            )
        selects.append(
            f"SELECT {r} AS round, vec_id AS center_vec_id, d AS dist_at_selection"
            f" FROM c{r}"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY round"
    )


ORACLES["sample_kcenter_coreset"] = _kcenter_oracle()

MMD_MOD = 3  # deterministic sample: bounds the pair grid
MMD_GAMMA = 1.0 / 64.0


def agg_mmd_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Unbiased squared Maximum Mean Discrepancy (RBF kernel,
    gamma = 1/dim) between the low-label (0-4) and high-label (5-9)
    embedding populations — the kernel two-sample drift test next to
    ``embedding_energy_distance``.  Pairs come from a deterministic
    mod-sample (the energy-distance precedent): quadratic in the
    SAMPLE, never the corpus."""
    from image_matadata_batchprocessing_aws_spark.functions import l2_dist
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )

    e = (
        t(spark, sf, "embeddings")
        .where(F.col("vec_id") % MMD_MOD == 0)
        .select("vec_id", "label", as_double_array("embedding").alias("e"))
    )
    a = e.where(F.col("label") < 5).select(
        F.col("vec_id").alias("ida"), F.col("e").alias("ea")
    )
    b = e.where(F.col("label") >= 5).select(
        F.col("vec_id").alias("idb"), F.col("e").alias("eb")
    )

    def k(u, v):
        d = l2_dist(u, v)
        return F.exp(-F.lit(MMD_GAMMA) * d * d)

    kaa = (
        a.alias("x")
        .join(F.broadcast(a.alias("y")), F.col("x.ida") != F.col("y.ida"))
        .agg(F.sum(k(F.col("x.ea"), F.col("y.ea"))).alias("s"), F.count(F.lit(1)).alias("n"))
    )
    kbb = (
        b.alias("x")
        .join(F.broadcast(b.alias("y")), F.col("x.idb") != F.col("y.idb"))
        .agg(F.sum(k(F.col("x.eb"), F.col("y.eb"))).alias("s"), F.count(F.lit(1)).alias("n"))
    )
    kab = (
        a.crossJoin(F.broadcast(b))
        .agg(F.sum(k(F.col("ea"), F.col("eb"))).alias("s"), F.count(F.lit(1)).alias("n"))
    )
    na = a.count()
    nb = b.count()
    row = (
        kaa.select(F.col("s").alias("saa"), F.col("n").alias("naa"))
        .crossJoin(kbb.select(F.col("s").alias("sbb"), F.col("n").alias("nbb")))
        .crossJoin(kab.select(F.col("s").alias("sab"), F.col("n").alias("nab")))
    )
    mmd2 = (
        F.col("saa") / F.col("naa").cast("double")
        + F.col("sbb") / F.col("nbb").cast("double")
        - 2.0 * F.col("sab") / F.col("nab").cast("double")
    )
    return row.select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.round(mmd2, 6).alias("mmd2_unbiased"),
    )


QUERIES["agg_mmd_drift"] = agg_mmd_drift

ORACLES["agg_mmd_drift"] = f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id % {MMD_MOD} = 0),
    a AS (SELECT vec_id, e FROM e WHERE label < 5),
    b AS (SELECT vec_id, e FROM e WHERE label >= 5),
    kaa AS (
      SELECT sum(exp(-{MMD_GAMMA} * list_distance(x.e, y.e) * list_distance(x.e, y.e))) AS s,
             count(*) AS n
      FROM a x JOIN a y ON x.vec_id <> y.vec_id),
    kbb AS (
      SELECT sum(exp(-{MMD_GAMMA} * list_distance(x.e, y.e) * list_distance(x.e, y.e))) AS s,
             count(*) AS n
      FROM b x JOIN b y ON x.vec_id <> y.vec_id),
    kab AS (
      SELECT sum(exp(-{MMD_GAMMA} * list_distance(x.e, y.e) * list_distance(x.e, y.e))) AS s,
             count(*) AS n
      FROM a x CROSS JOIN b y),
    sizes AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(kaa.s / kaa.n + kbb.s / kbb.n - 2.0 * kab.s / kab.n, 6)
             AS mmd2_unbiased
    FROM kaa CROSS JOIN kbb CROSS JOIN kab CROSS JOIN sizes
"""


# --- curation quality / spectral / lexical / network batch ------------------

BLUR_N_DOCS = 24


def multimodal_blur_laplacian(spark: SparkSession, sf: str) -> DataFrame:
    """Variance-of-Laplacian sharpness scoring — THE standard blur
    filter in image-curation pipelines — with a closed-form oracle:
    even docs are amplitude-A checkerboards (interior 4-neighbour
    Laplacian is exactly ±4A -> variance 16A^2), odd docs are solid
    (Laplacian 0 everywhere).  Real PNG encode -> real decode -> numpy
    'valid' convolution inside one Arrow mapInPandas stage; the R
    channel is scored (the fixtures are gray, so channel choice is
    exact, not a luma approximation)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(BLUR_N_DOCS):
        h, w = ANIM_DIMS[d % len(ANIM_DIMS)]
        amp = 100 + d % 100
        if d % 2 == 0:
            yy, xx = np.mgrid[0:h, 0:w]
            gray = np.where((yy + xx) % 2 == 0, amp, 0).astype(np.uint8)
        else:
            gray = np.full((h, w), amp, np.uint8)
        img = np.dstack([gray, gray, gray])
        rows.append((d, f"{d}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = _real_decode(name, bytes(content))[:, :, 0].astype(np.int64)
                lap = (
                    img[:-2, 1:-1] + img[2:, 1:-1] + img[1:-1, :-2] + img[1:-1, 2:]
                    - 4 * img[1:-1, 1:-1]
                )
                n = lap.size
                s, sq = int(lap.sum()), int((lap * lap).sum())
                var = sq / n - (s / n) * (s / n)
                out.append((name, n, int(round(var))))
            yield pd.DataFrame(out, columns=["file_name", "n_interior", "lap_var"])
            out = []

    stats = entries.select("entry_name", "content").mapInPandas(
        score, "file_name string, n_interior long, lap_var long"
    )
    return (
        stats.join(
            entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
        )
        .select(
            "doc_id", "n_interior", "lap_var", (F.col("lap_var") > 0).alias("is_sharp")
        )
        .orderBy("doc_id")
    )


QUERIES["multimodal_blur_laplacian"] = multimodal_blur_laplacian

ORACLES["multimodal_blur_laplacian"] = f"""
    WITH d AS (SELECT unnest(range({BLUR_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_H} END AS h,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_W} END AS w,
             100 + doc_id % 100 AS amp
      FROM d)
    SELECT doc_id,
           CAST((h - 2) * (w - 2) AS BIGINT) AS n_interior,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16 * amp * amp ELSE 0 END AS BIGINT)
             AS lap_var,
           doc_id % 2 = 0 AS is_sharp
    FROM dims ORDER BY doc_id
"""


def ts_periodogram(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete periodogram of the daily total at candidate periods
    2..14 days: normalized spectral power
    ``P(p) = (S_cos^2 + S_sin^2) / (n * sum x~^2)`` over the centered
    series — the is-there-weekly-seasonality scan feeding
    ``agg_seasonality``.  The day grid is data-sized; the period grid
    is 13 literal rows."""
    d = (
        _daily_cents(spark, sf)
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    from pyspark.sql import Window
    import math

    w = Window.orderBy("day")
    g = d.groupBy().agg(F.count(F.lit(1)).alias("__n"), F.sum("cents").alias("__s"))
    idx = d.withColumn("__t", F.row_number().over(w) - 1).crossJoin(F.broadcast(g))
    centered = idx.select(
        "__t",
        "__n",
        (F.col("cents").cast("double") / 100.0
         - F.col("__s").cast("double") / 100.0 / F.col("__n")).alias("__x"),
    )
    periods = centered.sparkSession.range(2, 15).select(
        F.col("id").cast("long").alias("period")
    )
    two_pi = F.lit(2.0 * math.pi)
    terms = centered.crossJoin(F.broadcast(periods)).select(
        "period",
        "__n",
        (F.col("__x") * F.cos(two_pi * F.col("__t") / F.col("period"))).alias("__c"),
        (F.col("__x") * F.sin(two_pi * F.col("__t") / F.col("period"))).alias("__sn"),
        (F.col("__x") * F.col("__x")).alias("__x2"),
    )
    agg = terms.groupBy("period").agg(
        F.first("__n").alias("__n"),
        F.sum("__c").alias("__sc"),
        F.sum("__sn").alias("__ss"),
        F.sum("__x2").alias("__sx2"),
    )
    power = (
        (F.col("__sc") * F.col("__sc") + F.col("__ss") * F.col("__ss"))
        / (F.col("__n").cast("double") * F.col("__sx2"))
    )
    return agg.select(
        "period", F.round(power, 6).alias("norm_power")
    ).orderBy("period")


QUERIES["ts_periodogram"] = ts_periodogram

ORACLES["ts_periodogram"] = f"""
    WITH d0 AS ({_DAILY_SQL}),
    d AS (SELECT day, sum(cents) AS cents FROM d0 GROUP BY 1),
    g AS (SELECT count(*) AS n, sum(cents) AS s FROM d),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             CAST(cents AS DOUBLE) / 100.0 - CAST(s AS DOUBLE) / 100.0 / n AS x,
             n
      FROM d CROSS JOIN g),
    periods AS (SELECT unnest(range(2, 15)) AS period),
    terms AS (
      SELECT period, n,
             x * cos(2 * pi() * t / period) AS c,
             x * sin(2 * pi() * t / period) AS sn,
             x * x AS x2
      FROM idx CROSS JOIN periods),
    agg AS (
      SELECT period, any_value(n) AS n, sum(c) AS sc, sum(sn) AS ss,
             sum(x2) AS sx2
      FROM terms GROUP BY 1)
    SELECT CAST(period AS BIGINT) AS period,
           round((sc * sc + ss * ss) / (n * sx2), 6) AS norm_power
    FROM agg ORDER BY period
"""


def ts_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per
    user — ``day - row_number()`` groups each run of consecutive
    distinct days into one island; exact integers end to end."""
    e = t(spark, sf, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400 * 1_000_000)).cast("long")
    days = e.select("user_id", day.alias("day")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("__grp", F.col("day") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "__grp").agg(F.count(F.lit(1)).alias("__len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("__len").alias("n_active_days"),
            F.max("__len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .select(
            "user_id",
            F.col("n_active_days").cast("long"),
            F.col("longest_streak").cast("long"),
            F.col("n_streaks").cast("long"),
        )
        .orderBy("user_id")
    )


QUERIES["ts_streaks"] = ts_streaks

ORACLES["ts_streaks"] = """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
      FROM events),
    isl AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days),
    streaks AS (
      SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY 1 ORDER BY user_id
"""

ZIPF_TOP = 100


def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) over the
    top-100 tokens — the frequency-distribution companion to the
    Heaps'-law ``text_vocab_growth``.  Token counts are exact; the
    regression runs over 100 (ln rank, ln freq) pairs."""
    d = t(spark, sf, "documents")
    toks = d.select(
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z]{2,}', 0)")).alias(
            "token"
        )
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= ZIPF_TOP
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("__x"),
        F.log(F.col("cnt").cast("double")).alias("__y"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nd
    )
    intercept = F.col("sy") / nd - slope * F.col("sx") / nd
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


QUERIES["text_zipf_fit"] = text_zipf_fit

ORACLES["text_zipf_fit"] = f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]{{2,}}')) AS token
      FROM documents),
    counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank
      FROM counts QUALIFY rank <= {ZIPF_TOP}),
    xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
           FROM ranked),
    agg AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy)
    SELECT CAST(n AS BIGINT) AS n_tokens,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS zipf_slope,
           round(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n, 6)
             AS zipf_intercept
    FROM agg
"""


def text_hapax_legomena(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical-richness profile: hapax/dis legomena counts, type-token
    ratio, Sichel's S and Honoré's R — exact vocabulary integers with
    one ln epilogue."""
    d = t(spark, sf, "documents")
    toks = d.select(
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z]{2,}', 0)")).alias(
            "token"
        )
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    agg = counts.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cnt").alias("n"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("v1"),
        F.sum((F.col("cnt") == 2).cast("long")).alias("v2"),
    )
    vd = F.col("v").cast("double")
    nd = F.col("n").cast("double")
    v1d = F.col("v1").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("vocab_size"),
        F.col("v1").cast("long").alias("hapax"),
        F.col("v2").cast("long").alias("dis_legomena"),
        F.round(vd / nd, 6).alias("type_token_ratio"),
        F.round(F.col("v2").cast("double") / vd, 6).alias("sichel_s"),
        F.round(100.0 * F.log(nd) / (1.0 - v1d / vd), 6).alias("honore_r"),
    )


QUERIES["text_hapax_legomena"] = text_hapax_legomena

ORACLES["text_hapax_legomena"] = """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS token
      FROM documents),
    counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    agg AS (
      SELECT count(*) AS v, sum(cnt) AS n,
             sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS v1,
             sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS v2
      FROM counts)
    SELECT CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS vocab_size,
           CAST(v1 AS BIGINT) AS hapax, CAST(v2 AS BIGINT) AS dis_legomena,
           round(CAST(v AS DOUBLE) / n, 6) AS type_token_ratio,
           round(CAST(v2 AS DOUBLE) / v, 6) AS sichel_s,
           round(100.0 * ln(CAST(n AS DOUBLE)) / (1.0 - CAST(v1 AS DOUBLE) / v), 6)
             AS honore_r
    FROM agg
"""

RC_CUST_MOD = 5


def graph_rich_club(spark: SparkSession, sf: str) -> DataFrame:
    """Rich-club coefficient over the supplier co-purchase projection:
    for degree thresholds k, the edge density among suppliers whose
    projected degree exceeds k — do high-degree suppliers
    preferentially interconnect?  ``phi(k) = 2 E_k / (N_k (N_k-1))``.
    The projection join is bounded by the deterministic customer
    sample (the Adamic-Adar discipline)."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.where(F.col("o_custkey") % RC_CUST_MOD == 0)
        .join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    proj = (
        e1.join(e2, (F.col("e1.c") == F.col("e2.c")) & (F.col("e1.s") < F.col("e2.s")))
        .select(F.col("e1.s").alias("sa"), F.col("e2.s").alias("sb"))
        .distinct()
    )
    deg = (
        proj.select(F.col("sa").alias("node"))
        .union(proj.select(F.col("sb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ks = proj.sparkSession.createDataFrame(
        [(k,) for k in (1, 2, 4, 8, 16)], "k long"
    )
    nk = ks.join(deg, deg.deg > ks.k).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_k")
    )
    ek = (
        ks.join(
            proj.join(deg.select(F.col("node").alias("sa"), F.col("deg").alias("__da")), "sa")
            .join(deg.select(F.col("node").alias("sb"), F.col("deg").alias("__db")), "sb"),
            (F.col("__da") > F.col("k")) & (F.col("__db") > F.col("k")),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    out = nk.join(ek, "k", "left").fillna(0, subset=["e_k"])
    phi = F.when(
        F.col("n_k") >= 2,
        2.0 * F.col("e_k").cast("double")
        / (F.col("n_k").cast("double") * (F.col("n_k").cast("double") - 1.0)),
    )
    return out.select(
        "k",
        F.col("n_k").cast("long").alias("n_nodes"),
        F.col("e_k").cast("long").alias("n_edges"),
        F.round(phi, 6).alias("phi"),
    ).orderBy("k")


QUERIES["graph_rich_club"] = graph_rich_club

ORACLES["graph_rich_club"] = f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey % {RC_CUST_MOD} = 0),
    proj AS (
      SELECT DISTINCT e1.s AS sa, e2.s AS sb
      FROM edges e1 JOIN edges e2 ON e1.c = e2.c AND e1.s < e2.s),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT sa AS node FROM proj UNION ALL SELECT sb FROM proj)
      GROUP BY 1),
    ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
    nk AS (
      SELECT k, count(*) AS n_k FROM ks JOIN deg ON deg > k GROUP BY 1),
    ek AS (
      SELECT k, count(*) AS e_k
      FROM ks JOIN (
        SELECT p.sa, p.sb, da.deg AS dega, db.deg AS degb
        FROM proj p JOIN deg da ON p.sa = da.node JOIN deg db ON p.sb = db.node
      ) ON dega > k AND degb > k
      GROUP BY 1)
    SELECT CAST(nk.k AS BIGINT) AS k, CAST(n_k AS BIGINT) AS n_nodes,
           CAST(coalesce(e_k, 0) AS BIGINT) AS n_edges,
           round(CASE WHEN n_k >= 2
                 THEN 2.0 * coalesce(e_k, 0) / (CAST(n_k AS DOUBLE) * (n_k - 1.0)) END,
                 6) AS phi
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    ORDER BY k
"""


def agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag via the
    cumulative-weight scan over the per-price partial aggregate (the
    ``roc_auc`` no-row-level-window discipline): integer weights, the
    median is the first price whose doubled cumulative weight reaches
    the total."""
    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.round(F.col("l_quantity")).cast("long").alias("wt"),
    )
    per = li.groupBy("l_returnflag", "price_cents").agg(F.sum("wt").alias("__w"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.groupBy("l_returnflag").agg(F.sum("__w").alias("__tw"))
    cum = per.withColumn("__cw", F.sum("__w").over(w)).join(tot, "l_returnflag")
    first = (
        cum.where(2 * F.col("__cw") >= F.col("__tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_cents").alias("weighted_median_cents"),
            F.first("__tw").alias("total_weight"),
        )
    )
    return first.select(
        "l_returnflag",
        F.col("weighted_median_cents").cast("long"),
        F.col("total_weight").cast("long"),
    ).orderBy("l_returnflag")


QUERIES["agg_weighted_median"] = agg_weighted_median

ORACLES["agg_weighted_median"] = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(round(l_quantity) AS BIGINT) AS wt
      FROM lineitem),
    per AS (
      SELECT l_returnflag, price_cents, sum(wt) AS w
      FROM li GROUP BY 1, 2),
    cum AS (
      SELECT l_returnflag, price_cents, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM per)
    SELECT l_returnflag,
           CAST(min(price_cents) AS BIGINT) AS weighted_median_cents,
           CAST(any_value(tw) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cw >= tw
    GROUP BY 1 ORDER BY 1
"""


def agg_ipw_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Inverse-propensity-weighted ATE with exact segment-level
    propensities: treatment = odd custkey, propensity e_s = treated
    share within each market segment (the stratified-IPW identity) —
    the causal sibling of ``agg_cuped``/``agg_diff_in_diff``.  All
    cell sums are exact cents; the weighting is a per-segment double
    epilogue over five cells."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        (F.col("o_custkey") % 2 == 1).cast("int").alias("tr"),
        "cents",
    )
    cells = j.groupBy("c_mktsegment", "tr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    seg = cells.groupBy("c_mktsegment").agg(
        F.sum("n").alias("n_seg"),
        F.sum(F.when(F.col("tr") == 1, F.col("n")).otherwise(0)).alias("n_treat"),
        F.sum(F.when(F.col("tr") == 1, F.col("s")).otherwise(0)).alias("s_treat"),
        F.sum(F.when(F.col("tr") == 0, F.col("s")).otherwise(0)).alias("s_ctrl"),
    )
    es = F.col("n_treat").cast("double") / F.col("n_seg").cast("double")
    term = (
        F.col("s_treat").cast("double") / 100.0 / es
        - F.col("s_ctrl").cast("double") / 100.0 / (1.0 - es)
    )
    agg = seg.agg(
        F.sum("n_seg").alias("__nt"),
        F.sum(term).alias("__num"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return agg.select(
        F.col("__nt").cast("long").alias("n"),
        F.col("n_segments").cast("long"),
        F.round(F.col("__num") / F.col("__nt").cast("double"), 6).alias("ate_ipw"),
    )


QUERIES["agg_ipw_estimate"] = agg_ipw_estimate

ORACLES["agg_ipw_estimate"] = """
    WITH j AS (
      SELECT c_mktsegment,
             CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END AS tr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey),
    cells AS (
      SELECT c_mktsegment, tr, count(*) AS n, sum(cents) AS s
      FROM j GROUP BY 1, 2),
    seg AS (
      SELECT c_mktsegment, sum(n) AS n_seg,
             sum(CASE WHEN tr = 1 THEN n ELSE 0 END) AS n_treat,
             sum(CASE WHEN tr = 1 THEN s ELSE 0 END) AS s_treat,
             sum(CASE WHEN tr = 0 THEN s ELSE 0 END) AS s_ctrl
      FROM cells GROUP BY 1),
    tot AS (SELECT sum(n_seg) AS nt FROM seg),
    terms AS (
      SELECT CAST(s_treat AS DOUBLE) / 100.0
               / (CAST(n_treat AS DOUBLE) / n_seg)
             - CAST(s_ctrl AS DOUBLE) / 100.0
               / (1.0 - CAST(n_treat AS DOUBLE) / n_seg) AS term
      FROM seg)
    SELECT CAST(nt AS BIGINT) AS n,
           CAST((SELECT count(*) FROM seg) AS BIGINT) AS n_segments,
           round(sum(term) / nt, 6) AS ate_ipw
    FROM terms CROSS JOIN tot GROUP BY nt
"""


# --- Otsu / consistent hashing / entropy rate / recsys coverage -------------

OTSU_N_DOCS = 18


def multimodal_otsu(spark: SparkSession, sf: str) -> DataFrame:
    """Otsu global threshold per image — the classic binarization step
    of document-scan pipelines — with decode REAL and the argmax IN
    the engine: the Arrow stage only decodes PNGs and emits exact
    256-bin histograms; the between-class-variance maximization
    ``argmax_t (sum0*W - S*w0)^2 / (w0*(W-w0))`` runs as identical
    relational algebra on exact integers in Spark and DuckDB (the
    numerator is integer-exact; ties break on the smaller t)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(OTSU_N_DOCS):
        h, w = ANIM_DIMS[d % len(ANIM_DIMS)]
        hw = h * w
        l1, l2, l3 = 40 + d % 20, 120 + d % 30, 200 + d % 40
        n1, n2 = hw // 2, hw // 3
        flat = np.empty(hw, np.uint8)
        flat[:n1] = l1
        flat[n1 : n1 + n2] = l2
        flat[n1 + n2 :] = l3
        gray = flat.reshape(h, w)
        rows.append((d, f"{d}.png", bytearray(encode_png(np.dstack([gray] * 3)))))
    entries = spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = _real_decode(name, bytes(content))[:, :, 0]
                counts = np.bincount(img.reshape(-1), minlength=256)
                for level in np.nonzero(counts)[0]:
                    out.append((name, int(level), int(counts[level])))
            yield pd.DataFrame(out, columns=["file_name", "level", "cnt"])

    h_df = entries.select("entry_name", "content").mapInPandas(
        hist, "file_name string, level long, cnt long"
    ).join(entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name")
    tot = h_df.groupBy("doc_id").agg(
        F.sum("cnt").alias("W"), F.sum(F.col("level") * F.col("cnt")).alias("S")
    )
    ts = h_df.sparkSession.range(0, 256).select(F.col("id").alias("tt"))
    cum = (
        h_df.join(F.broadcast(ts), F.col("level") <= F.col("tt"))
        .groupBy("doc_id", "tt")
        .agg(F.sum("cnt").alias("w0"), F.sum(F.col("level") * F.col("cnt")).alias("sum0"))
        .join(tot, "doc_id")
        .where((F.col("w0") > 0) & (F.col("w0") < F.col("W")))
    )
    num = (F.col("sum0") * F.col("W") - F.col("S") * F.col("w0"))
    score = (num * num).cast("double") / (
        F.col("w0") * (F.col("W") - F.col("w0"))
    ).cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("__score").desc(), F.col("tt").asc())
    best = (
        cum.withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    return best.select(
        "doc_id",
        F.col("tt").cast("long").alias("otsu_threshold"),
        (num * num).cast("long").alias("score_numerator"),
        F.col("w0").cast("long").alias("n_below"),
    ).orderBy("doc_id")


QUERIES["multimodal_otsu"] = multimodal_otsu

ORACLES["multimodal_otsu"] = f"""
    WITH d AS (SELECT unnest(range({OTSU_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_H} END AS h,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_W} END AS w,
             40 + doc_id % 20 AS l1, 120 + doc_id % 30 AS l2,
             200 + doc_id % 40 AS l3
      FROM d),
    hist AS (
      SELECT doc_id, l1 AS level, (h * w) // 2 AS cnt FROM dims
      UNION ALL
      SELECT doc_id, l2, (h * w) // 3 FROM dims
      UNION ALL
      SELECT doc_id, l3, h * w - (h * w) // 2 - (h * w) // 3 FROM dims),
    tot AS (
      SELECT doc_id, sum(cnt) AS W, sum(level * cnt) AS S FROM hist GROUP BY 1),
    ts AS (SELECT unnest(range(0, 256)) AS tt),
    cum AS (
      SELECT h.doc_id, tt, sum(cnt) AS w0, sum(level * cnt) AS sum0
      FROM hist h JOIN ts ON h.level <= ts.tt
      GROUP BY 1, 2),
    scored AS (
      SELECT c.doc_id, tt, w0,
             (sum0 * W - S * w0) * (sum0 * W - S * w0) AS num,
             CAST((sum0 * W - S * w0) * (sum0 * W - S * w0) AS DOUBLE)
               / (w0 * (W - w0)) AS score
      FROM cum c JOIN tot USING (doc_id)
      WHERE w0 > 0 AND w0 < W),
    best AS (
      SELECT doc_id, tt, num, w0,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, tt ASC) AS rn
      FROM scored)
    SELECT doc_id, CAST(tt AS BIGINT) AS otsu_threshold,
           CAST(num AS BIGINT) AS score_numerator,
           CAST(w0 AS BIGINT) AS n_below
    FROM best WHERE rn = 1 ORDER BY doc_id
"""

CH_SHARDS = 8
CH_VNODES = 16
CH_RING_MASK = (1 << 62) - 1


def etl_consistent_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """Consistent-hash ring assignment (Karger) with virtual nodes:
    documents map to the first of 8x16 shard vnodes clockwise from
    their md5 ring position, and the rebalance story is quantified by
    also assigning against a 9-shard ring — classic result: only
    ~1/(N+1) of keys move, all TO the new shard.  Ring metric:
    62-bit masked md5, wrap handled by modular distance (exact
    BIGINTs; the vnode table is 144 literal rows, broadcast)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    docs = t(spark, sf, "documents").select(
        "doc_id",
        (
            md5_int64(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
            .bitwiseAND(F.lit(CH_RING_MASK))
        ).alias("h"),
    )
    spark_ = docs.sparkSession
    ring = spark_.createDataFrame(
        [(s, v) for s in range(CH_SHARDS + 1) for v in range(CH_VNODES)],
        "shard long, vnode long",
    ).select(
        "shard",
        (
            md5_int64(
                F.concat(
                    F.lit("shard:"),
                    F.col("shard").cast("string"),
                    F.lit(":"),
                    F.col("vnode").cast("string"),
                )
            ).bitwiseAND(F.lit(CH_RING_MASK))
        ).alias("pos"),
    )

    def assign(n_shards: int, out: str) -> DataFrame:
        r = ring.where(F.col("shard") < n_shards)
        dist = F.when(
            F.col("pos") >= F.col("h"), F.col("pos") - F.col("h")
        ).otherwise(F.col("pos") - F.col("h") + F.lit(CH_RING_MASK + 1))
        pairs = docs.crossJoin(F.broadcast(r)).select(
            "doc_id", "shard", dist.alias("__d")
        )
        best = pairs.groupBy("doc_id").agg(
            F.min(F.struct("__d", "shard")).alias("__b")
        )
        return best.select("doc_id", F.col("__b.shard").alias(out))

    a8 = assign(CH_SHARDS, "shard8")
    a9 = assign(CH_SHARDS + 1, "shard9")
    j = a8.join(a9, "doc_id")
    return (
        j.groupBy("shard8")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("shard8") != F.col("shard9")).cast("long")).alias("n_moved"),
        )
        .select(
            F.col("shard8").cast("long").alias("shard"),
            F.col("n_docs").cast("long"),
            F.col("n_moved").cast("long"),
        )
        .orderBy("shard")
    )


QUERIES["etl_consistent_hashing"] = etl_consistent_hashing


def _ch_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    doc_h = md5_int64_sql("'doc:' || CAST(doc_id AS VARCHAR)")
    pos = md5_int64_sql(
        "'shard:' || CAST(shard AS VARCHAR) || ':' || CAST(vnode AS VARCHAR)"
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, {doc_h} & {CH_RING_MASK} AS h FROM documents),
    ring AS (
      SELECT s.shard, v.vnode, {pos} & {CH_RING_MASK} AS pos
      FROM (SELECT unnest(range({CH_SHARDS + 1})) AS shard) s
      CROSS JOIN (SELECT unnest(range({CH_VNODES})) AS vnode) v),
    a8 AS (
      SELECT doc_id, arg_min(shard,
               CASE WHEN pos >= h THEN pos - h
                    ELSE pos - h + {CH_RING_MASK + 1} END) AS shard8
      FROM docs CROSS JOIN ring WHERE shard < {CH_SHARDS}
      GROUP BY doc_id),
    a9 AS (
      SELECT doc_id, arg_min(shard,
               CASE WHEN pos >= h THEN pos - h
                    ELSE pos - h + {CH_RING_MASK + 1} END) AS shard9
      FROM docs CROSS JOIN ring
      GROUP BY doc_id)
    SELECT CAST(shard8 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY 1 ORDER BY 1
"""


ORACLES["etl_consistent_hashing"] = _ch_oracle()


def agg_markov_entropy_rate(spark: SparkSession, sf: str) -> DataFrame:
    """First-order entropy rate of the per-user event-type process:
    ``H(X_t | X_t-1) = -sum_ij p_ij ln(n_ij/n_i)`` over observed
    transitions, next to the marginal entropy ``H(X_t)`` — how much
    the event stream's history compresses the next step.  Exact
    transition integers; the ln epilogue rides the 25-cell table."""
    e = t(spark, sf, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__nxt", F.lead("event_type").over(w))
        .where(F.col("__nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("__nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    ni = trans.groupBy("a").agg(F.sum("nij").alias("ni"))
    tot = trans.agg(F.sum("nij").alias("n"))
    cells = trans.join(ni, "a").crossJoin(F.broadcast(tot))
    cond = -(
        F.col("nij").cast("double") / F.col("n").cast("double")
    ) * F.log(F.col("nij").cast("double") / F.col("ni").cast("double"))
    marg_cells = ni.crossJoin(F.broadcast(tot))
    marg = -(
        F.col("ni").cast("double") / F.col("n").cast("double")
    ) * F.log(F.col("ni").cast("double") / F.col("n").cast("double"))
    h_rate = cells.agg(
        F.first("n").alias("n_transitions"), F.sum(cond).alias("__h")
    )
    h_marg = marg_cells.agg(F.sum(marg).alias("__hm"))
    out = h_rate.crossJoin(h_marg)
    return out.select(
        F.col("n_transitions").cast("long"),
        F.round(F.col("__h"), 6).alias("entropy_rate_nats"),
        F.round(F.col("__hm"), 6).alias("marginal_entropy_nats"),
        F.round(1.0 - F.col("__h") / F.col("__hm"), 6).alias("predictability_gain"),
    )


QUERIES["agg_markov_entropy_rate"] = agg_markov_entropy_rate

ORACLES["agg_markov_entropy_rate"] = """
    WITH seq AS (
      SELECT event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events),
    trans AS (SELECT a, b, count(*) AS nij FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
    ni AS (SELECT a, sum(nij) AS ni FROM trans GROUP BY 1),
    tot AS (SELECT sum(nij) AS n FROM trans),
    hr AS (
      SELECT any_value(n) AS n,
             sum(-(CAST(nij AS DOUBLE) / n) * ln(CAST(nij AS DOUBLE) / ni)) AS h
      FROM trans JOIN ni USING (a) CROSS JOIN tot),
    hm AS (
      SELECT sum(-(CAST(ni AS DOUBLE) / n) * ln(CAST(ni AS DOUBLE) / n)) AS hmarg
      FROM ni CROSS JOIN tot)
    SELECT CAST(n AS BIGINT) AS n_transitions,
           round(h, 6) AS entropy_rate_nats,
           round(hmarg, 6) AS marginal_entropy_nats,
           round(1.0 - h / hmarg, 6) AS predictability_gain
    FROM hr CROSS JOIN hm
"""


def reco_coverage_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-accuracy recsys evaluation over the item-to-item
    recommendations of ``reco_item_cooccurrence``: catalog coverage
    (share of catalog ever recommended) and mean novelty
    ``-log2(popularity)`` of recommended items (Vargas & Castells) —
    exact support integers, ln epilogue on the rec list."""
    import math

    from image_matadata_batchprocessing_aws_spark.operators.reco import (
        item_cooccurrence_topk,
    )

    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    recs = item_cooccurrence_topk(
        li, "l_orderkey", "l_partkey", k=3, min_pair_count=2
    ).where(F.col("pair_count") >= 2)
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    support = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__n"))
    scalars = support.agg(
        F.count(F.lit(1)).alias("__ncat")
    ).crossJoin(
        F.broadcast(
            baskets.agg(F.count_distinct("l_orderkey").alias("__nb"))
        )
    )
    nov = (
        recs.join(
            support.select(F.col("l_partkey").alias("neighbor"), "__n"), "neighbor"
        )
        .crossJoin(F.broadcast(scalars))
        .agg(
            F.count(F.lit(1)).alias("n_recs"),
            F.count_distinct("neighbor").alias("n_recommended_items"),
            F.sum(
                -F.log(F.col("__n").cast("double") / F.col("__nb").cast("double"))
                / F.lit(math.log(2.0))
            ).alias("__novsum"),
            F.first("__ncat").alias("__ncat"),
        )
    )
    return nov.select(
        F.col("n_recs").cast("long"),
        F.col("n_recommended_items").cast("long"),
        F.col("__ncat").cast("long").alias("n_catalog"),
        F.round(
            F.col("n_recommended_items").cast("double") / F.col("__ncat").cast("double"),
            6,
        ).alias("coverage"),
        F.round(F.col("__novsum") / F.col("n_recs").cast("double"), 6).alias(
            "mean_novelty_bits"
        ),
    )


QUERIES["reco_coverage_novelty"] = reco_coverage_novelty


def _reco_cov_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.r05_queue import (
        ORACLES as _R05,
    )

    base = _R05["reco_item_cooccurrence"].strip().rstrip()
    return f"""
    WITH rec AS ({base}),
    baskets AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    support AS (SELECT i, count(*) AS n FROM baskets GROUP BY 1),
    nb AS (SELECT count(DISTINCT b) AS n_baskets FROM baskets),
    cat AS (SELECT count(*) AS n_catalog FROM support),
    nov AS (
      SELECT count(*) AS n_recs,
             count(DISTINCT neighbor) AS n_rec_items,
             sum(-ln(CAST(s.n AS DOUBLE) / n_baskets) / ln(2.0)) AS novsum
      FROM rec JOIN support s ON rec.neighbor = s.i CROSS JOIN nb)
    SELECT CAST(n_recs AS BIGINT) AS n_recs,
           CAST(n_rec_items AS BIGINT) AS n_recommended_items,
           CAST(n_catalog AS BIGINT) AS n_catalog,
           round(CAST(n_rec_items AS DOUBLE) / n_catalog, 6) AS coverage,
           round(novsum / n_recs, 6) AS mean_novelty_bits
    FROM nov CROSS JOIN cat
"""


ORACLES["reco_coverage_novelty"] = _reco_cov_oracle()


# --- sub-byte / 16-bit PNG decode through the pipeline -----------------------

PNGD_N_DOCS = 18


def multimodal_png_depths(spark: SparkSession, sf: str) -> DataFrame:
    """REAL decode of the PNG depths beyond 8-bit (S9 completion;
    ImageIO-parity tested in tests/test_png_depths.py): 16-bit
    grayscale (high-byte reduction, the PIL I;16 rule), 4-bit palette,
    and 1-bit grayscale — per-doc channel sums recomputed per pixel by
    the DuckDB twin from the same doc_id arithmetic."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        encode_png_raw,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(PNGD_N_DOCS):
        h, w = ANIM_DIMS[d % len(ANIM_DIMS)]
        yy, xx = np.mgrid[0:h, 0:w]
        if d % 3 == 0:  # 16-bit gray
            vals = ((xx * 13 + yy * 577) * 97 + d * 251) % 65536
            blob = encode_png_raw(vals.astype(np.uint32), 16, 0)
            depth, ctype = 16, 0
        elif d % 3 == 1:  # 4-bit palette
            pal = np.stack(
                [
                    (np.arange(16) * 16 + d) % 256,
                    (np.arange(16) * 13 + 2 * d) % 256,
                    (np.arange(16) * 29 + 3 * d) % 256,
                ],
                axis=1,
            ).astype(np.uint8)
            idx = (xx + yy + d) % 16
            blob = encode_png_raw(idx.astype(np.uint32), 4, 3, palette=pal)
            depth, ctype = 4, 3
        else:  # 1-bit gray
            vals = (xx + yy + d) % 2
            blob = encode_png_raw(vals.astype(np.uint32), 1, 0)
            depth, ctype = 1, 0
        rows.append((d, f"{d}.png", depth, ctype, bytearray(blob)))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, depth long, ctype long, content binary"
    )

    def sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                h_, w_ = img.shape[:2]
                s = img.reshape(-1, 3).sum(axis=0)
                out.append((name, h_, w_, int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                out,
                columns=["file_name", "height", "width", "r_sum", "g_sum", "b_sum"],
            )

    stats = entries.select("entry_name", "content").mapInPandas(
        sums, "file_name string, height long, width long, r_sum long, g_sum long, b_sum long"
    )
    return (
        stats.join(
            entries.select(
                "doc_id", "depth", "ctype", F.col("entry_name").alias("file_name")
            ),
            "file_name",
        )
        .select("doc_id", "depth", "ctype", "height", "width", "r_sum", "g_sum", "b_sum")
        .orderBy("doc_id")
    )


QUERIES["multimodal_png_depths"] = multimodal_png_depths

ORACLES["multimodal_png_depths"] = f"""
    WITH d AS (SELECT unnest(range({PNGD_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_H} END AS h,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_W} END AS w
      FROM d),
    px AS (
      SELECT doc_id, h, w, x.x AS x, y.y AS y
      FROM dims,
           LATERAL (SELECT unnest(range(w)) AS x) x,
           LATERAL (SELECT unnest(range(h)) AS y) y),
    vals AS (
      SELECT doc_id, h, w,
             CASE doc_id % 3
               WHEN 0 THEN (((x * 13 + y * 577) * 97 + doc_id * 251) % 65536) // 256
               WHEN 1 THEN (((x + y + doc_id) % 16) * 16 + doc_id) % 256
               ELSE ((x + y + doc_id) % 2) * 255 END AS r,
             CASE doc_id % 3
               WHEN 0 THEN (((x * 13 + y * 577) * 97 + doc_id * 251) % 65536) // 256
               WHEN 1 THEN (((x + y + doc_id) % 16) * 13 + 2 * doc_id) % 256
               ELSE ((x + y + doc_id) % 2) * 255 END AS g,
             CASE doc_id % 3
               WHEN 0 THEN (((x * 13 + y * 577) * 97 + doc_id * 251) % 65536) // 256
               WHEN 1 THEN (((x + y + doc_id) % 16) * 29 + 3 * doc_id) % 256
               ELSE ((x + y + doc_id) % 2) * 255 END AS b
      FROM px)
    SELECT doc_id,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 4 ELSE 1 END AS BIGINT)
             AS depth,
           CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 0 END AS BIGINT)
             AS ctype,
           CAST(any_value(h) AS BIGINT) AS height,
           CAST(any_value(w) AS BIGINT) AS width,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum(g) AS BIGINT) AS g_sum,
           CAST(sum(b) AS BIGINT) AS b_sum
    FROM vals GROUP BY doc_id
    ORDER BY doc_id
"""


# --- lead-lag, extreme-value and long-memory diagnostics ---------------------


def ts_cross_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase daily
    revenue series at lags -7..7 (negative lag = clicks lead):
    exact-cents day sums, centered products over the overlap window,
    one normalized double per lag."""
    d = _daily_cents(spark, sf).where(F.col("event_type").isin("click", "purchase"))
    x = d.where(F.col("event_type") == "click").select(
        "day", F.col("cents").alias("xc")
    )
    y = d.where(F.col("event_type") == "purchase").select(
        "day", F.col("cents").alias("yc")
    )
    lags = d.sparkSession.range(-7, 8).select(F.col("id").cast("long").alias("lag"))
    # overlap rows: y at day + lag
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(
            y.select(F.col("day").alias("yday"), "yc"),
            F.col("yday") == F.col("day") + F.col("lag"),
        )
        .select("lag", "xc", "yc")
    )
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("xc") * F.col("yc")).alias("sxy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / nd
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / nd
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / nd
    return stats.select(
        "lag",
        F.col("n").cast("long").alias("n_days"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("xcorr"),
    ).orderBy("lag")


QUERIES["ts_cross_correlation"] = ts_cross_correlation

ORACLES["ts_cross_correlation"] = f"""
    WITH d AS ({_DAILY_SQL}),
    x AS (SELECT day, cents AS xc FROM d WHERE event_type = 'click'),
    y AS (SELECT day AS yday, cents AS yc FROM d WHERE event_type = 'purchase'),
    lags AS (SELECT unnest(range(-7, 8)) AS lag),
    pairs AS (
      SELECT lag, xc, yc
      FROM x CROSS JOIN lags JOIN y ON yday = day + lag),
    stats AS (
      SELECT lag, count(*) AS n, sum(xc) AS sx, sum(yc) AS sy,
             sum(xc * yc) AS sxy, sum(xc * xc) AS sxx, sum(yc * yc) AS syy
      FROM pairs GROUP BY 1)
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)), 6)
             AS xcorr
    FROM stats ORDER BY lag
"""

EULER_GAMMA = 0.5772156649015329


def agg_gumbel_daily_max(spark: SparkSession, sf: str) -> DataFrame:
    """Gumbel extreme-value fit (method of moments) on daily maxima of
    event values per type: ``beta = s sqrt(6)/pi``,
    ``mu = m - gamma beta``, plus the implied 99th-percentile level
    ``mu - beta ln(-ln 0.99))`` — capacity-planning statistics over
    exact integer daily maxima."""
    import math

    e = t(spark, sf, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400 * 1_000_000)).cast("long")
    dmax = (
        e.select("event_type", day.alias("day"),
                 F.round(F.col("value") * 100).cast("long").alias("c"))
        .groupBy("event_type", "day")
        .agg(F.max("c").alias("mx"))
    )
    g = dmax.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s"),
        F.sum(F.col("mx") * F.col("mx")).alias("q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd / 100.0
    var = (
        F.col("q").cast("double") / 10000.0
        - (F.col("s").cast("double") / 100.0) * (F.col("s").cast("double") / 100.0) / nd
    ) / (nd - 1.0)
    beta = F.sqrt(var * 6.0) / F.lit(math.pi)
    mu = mean - F.lit(EULER_GAMMA) * beta
    p99 = mu - beta * F.log(-F.log(F.lit(0.99)))
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(mean, 6).alias("mean_daily_max"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(p99, 6).alias("p99_level"),
    ).orderBy("event_type")


QUERIES["agg_gumbel_daily_max"] = agg_gumbel_daily_max

ORACLES["agg_gumbel_daily_max"] = f"""
    WITH dmax AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
             max(CAST(round(value * 100) AS BIGINT)) AS mx
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT event_type, count(*) AS n, sum(mx) AS s, sum(mx * mx) AS q
      FROM dmax GROUP BY 1),
    fit AS (
      SELECT event_type, n,
             CAST(s AS DOUBLE) / n / 100.0 AS mean,
             sqrt(((CAST(q AS DOUBLE) / 10000.0
                    - (CAST(s AS DOUBLE) / 100.0) * (CAST(s AS DOUBLE) / 100.0) / n)
                   / (n - 1.0)) * 6.0) / pi() AS beta
      FROM g)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(mean, 6) AS mean_daily_max,
           round(beta, 6) AS gumbel_beta,
           round(mean - {EULER_GAMMA} * beta, 6) AS gumbel_mu,
           round(mean - {EULER_GAMMA} * beta - beta * ln(-ln(0.99)), 6) AS p99_level
    FROM fit ORDER BY event_type
"""

HURST_BLOCKS = (8, 16, 32)


def ts_hurst(spark: SparkSession, sf: str) -> DataFrame:
    """Rescaled-range (R/S) long-memory analysis of the daily total:
    for block sizes 8/16/32 days, average ``R/S`` over complete blocks
    (R = range of mean-adjusted cumulative sums, S = population sd),
    then the Hurst exponent as the OLS slope of ln(R/S) on ln(size).
    0.5 = memoryless; the trend/persistence screen for metrics series.
    Integer cents through the block sums; the per-block epilogue is a
    handful of doubles."""
    d = (
        _daily_cents(spark, sf)
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("day")
    idx = d.withColumn("__t", F.row_number().over(w) - 1)
    sizes = d.sparkSession.createDataFrame(
        [(s,) for s in HURST_BLOCKS], "size long"
    )
    blk = idx.crossJoin(F.broadcast(sizes)).select(
        "size", (F.col("__t") / F.col("size")).cast("long").alias("blk"),
        (F.col("__t") % F.col("size")).alias("__i"), "cents",
    )
    per_blk = blk.groupBy("size", "blk").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("cents").alias("__s"),
        F.sum(F.col("cents") * F.col("cents")).alias("__q"),
    )
    full = per_blk.where(F.col("__n") == F.col("size"))
    wcum = (
        Window.partitionBy("size", "blk")
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = blk.join(full.select("size", "blk", "__s"), ["size", "blk"])
    cum = joined.select(
        "size",
        "blk",
        "__i",
        (
            F.sum(F.col("cents")).over(wcum).cast("double")
            - (F.col("__i") + 1).cast("double")
            * F.col("__s").cast("double")
            / F.col("size").cast("double")
        ).alias("__cd"),
    )
    rng_ = cum.groupBy("size", "blk").agg(
        (F.max("__cd") - F.min("__cd")).alias("__r")
    )
    nd = F.col("size").cast("double")
    sd = F.sqrt(
        F.col("__q").cast("double") / nd
        - (F.col("__s").cast("double") / nd) * (F.col("__s").cast("double") / nd)
    )
    rs = (
        full.select("size", "blk", sd.alias("__sd"))
        .join(rng_, ["size", "blk"])
        .where(F.col("__sd") > 0)
        .groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.avg(F.col("__r") / F.col("__sd")).alias("__rs"),
        )
    )
    pts = rs.select(
        "size",
        "n_blocks",
        F.log(F.col("size").cast("double")).alias("__x"),
        F.log("__rs").alias("__y"),
        F.col("__rs").alias("__rsv"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / kd) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / kd
    )
    out = pts.crossJoin(F.broadcast(fit.select(slope.alias("__h"))))
    return out.select(
        F.col("size").cast("long").alias("block_size"),
        F.col("n_blocks").cast("long"),
        F.round(F.col("__rsv"), 6).alias("mean_rs"),
        F.round(F.col("__h"), 6).alias("hurst_exponent"),
    ).orderBy("block_size")


QUERIES["ts_hurst"] = ts_hurst

ORACLES["ts_hurst"] = f"""
    WITH d0 AS ({_DAILY_SQL}),
    d AS (SELECT day, sum(cents) AS cents FROM d0 GROUP BY 1),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) - 1 AS t, cents FROM d),
    sizes AS (SELECT unnest([{', '.join(str(s) for s in HURST_BLOCKS)}]) AS size),
    blk AS (
      SELECT size, t // size AS blk, t % size AS i, cents
      FROM idx CROSS JOIN sizes),
    per_blk AS (
      SELECT size, blk, count(*) AS n, sum(cents) AS s, sum(cents * cents) AS q
      FROM blk GROUP BY 1, 2),
    full_b AS (SELECT * FROM per_blk WHERE n = size),
    cum AS (
      SELECT b.size, b.blk, b.i,
             sum(b.cents) OVER (PARTITION BY b.size, b.blk ORDER BY b.i
                                ROWS UNBOUNDED PRECEDING)
             - (b.i + 1) * (CAST(f.s AS DOUBLE) / f.size) AS cd
      FROM blk b JOIN full_b f ON b.size = f.size AND b.blk = f.blk),
    rng AS (SELECT size, blk, max(cd) - min(cd) AS r FROM cum GROUP BY 1, 2),
    rs AS (
      SELECT f.size, count(*) AS n_blocks,
             avg(r / sqrt(CAST(f.q AS DOUBLE) / f.size
                          - (CAST(f.s AS DOUBLE) / f.size)
                            * (CAST(f.s AS DOUBLE) / f.size))) AS mean_rs
      FROM full_b f JOIN rng ON f.size = rng.size AND f.blk = rng.blk
      WHERE CAST(f.q AS DOUBLE) / f.size
            - (CAST(f.s AS DOUBLE) / f.size) * (CAST(f.s AS DOUBLE) / f.size) > 0
      GROUP BY 1),
    pts AS (SELECT size, n_blocks, mean_rs,
                   ln(CAST(size AS DOUBLE)) AS x, ln(mean_rs) AS y
            FROM rs),
    fit AS (
      SELECT (sum(x * y) - sum(x) * sum(y) / count(*))
             / (sum(x * x) - sum(x) * sum(x) / count(*)) AS h
      FROM pts)
    SELECT CAST(size AS BIGINT) AS block_size,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           round(mean_rs, 6) AS mean_rs,
           round(h, 6) AS hurst_exponent
    FROM pts CROSS JOIN fit ORDER BY block_size
"""


# --- ICO container decode through the pipeline -------------------------------

ICO_N_DOCS = 18


def multimodal_ico_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL Windows-ICO container decode (S9 container completion;
    the reference's PIL seam reads ICO natively): each doc packs a
    small decoy entry and a larger winner entry — alternating embedded
    PNG and DIB/BMP payloads — and the pipeline must decode the
    LARGEST entry (PIL's selection rule).  Solid colors give exact
    closed-form channel sums the DuckDB twin recomputes from doc_id
    arithmetic."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_ico
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    rows = []
    for d in range(ICO_N_DOCS):
        h, w = ANIM_DIMS[d % len(ANIM_DIMS)]
        h, w = min(h, 256), min(w, 256)
        cw = ((d * 11) % 251, (d * 17) % 251, (d * 23) % 251)  # winner
        cd = ((d * 29) % 251, (d * 31) % 251, (d * 37) % 251)  # decoy
        win = np.empty((h, w, 3), np.uint8)
        win[:, :, 0], win[:, :, 1], win[:, :, 2] = cw
        dec = np.empty((8, 8, 3), np.uint8)
        dec[:, :, 0], dec[:, :, 1], dec[:, :, 2] = cd
        kinds = ("png", "bmp") if d % 2 == 0 else ("bmp", "png")
        entries_ = [(dec, kinds[0]), (win, kinds[1])]
        if d % 3 == 0:
            entries_ = entries_[::-1]  # winner first sometimes
        rows.append((d, f"{d}.ico", bytearray(encode_ico(entries_))))
    entries = spark.createDataFrame(rows, "doc_id long, entry_name string, content binary")

    def sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                h_, w_ = img.shape[:2]
                s = img.reshape(-1, 3).sum(axis=0)
                out.append((name, h_, w_, int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                out, columns=["file_name", "height", "width", "r_sum", "g_sum", "b_sum"]
            )

    stats = entries.select("entry_name", "content").mapInPandas(
        sums, "file_name string, height long, width long, r_sum long, g_sum long, b_sum long"
    )
    return (
        stats.join(
            entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
        )
        .select("doc_id", "height", "width", "r_sum", "g_sum", "b_sum")
        .orderBy("doc_id")
    )


QUERIES["multimodal_ico_decode"] = multimodal_ico_decode

ORACLES["multimodal_ico_decode"] = f"""
    WITH d AS (SELECT unnest(range({ICO_N_DOCS})) AS doc_id),
    dims AS (
      SELECT doc_id,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_H} END AS h,
             CASE doc_id % {len(ANIM_DIMS)} {_ANIM_DIMS_W} END AS w
      FROM d)
    SELECT doc_id, CAST(h AS BIGINT) AS height, CAST(w AS BIGINT) AS width,
           CAST((doc_id * 11 % 251) * h * w AS BIGINT) AS r_sum,
           CAST((doc_id * 17 % 251) * h * w AS BIGINT) AS g_sum,
           CAST((doc_id * 23 % 251) * h * w AS BIGINT) AS b_sum
    FROM dims ORDER BY doc_id
"""


# --- median CI and dedup-aware reweighting ------------------------------------


def agg_median_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median via
    order statistics (the binomial/normal-approximation ranks
    ``n/2 -/+ 0.98 sqrt(n)``) per return flag — the uncertainty the
    plain percentile queries don't report.  Rank selection rides the
    per-value partial aggregate (the ``agg_weighted_median``
    discipline), never a row-level rank window."""
    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
    )
    per = li.groupBy("l_returnflag", "price_cents").agg(
        F.count(F.lit(1)).alias("__w")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.groupBy("l_returnflag").agg(F.sum("__w").alias("__n"))
    cum = per.withColumn("__cw", F.sum("__w").over(w)).join(tot, "l_returnflag")
    nd = F.col("__n").cast("double")
    lo_rank = F.floor(nd / 2.0 - 0.98 * F.sqrt(nd)).cast("long")
    hi_rank = F.ceil(nd / 2.0 + 0.98 * F.sqrt(nd)).cast("long")
    med_rank = (F.col("__n") + 1) / 2.0
    marked = cum.select(
        "l_returnflag", "price_cents", "__cw", "__n",
        lo_rank.alias("__lo"), hi_rank.alias("__hi"), med_rank.alias("__md"),
    )
    agg = marked.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("__cw") >= F.col("__lo"), F.col("price_cents"))).alias(
            "ci_lo_cents"
        ),
        F.min(F.when(F.col("__cw") >= F.col("__md"), F.col("price_cents"))).alias(
            "median_cents"
        ),
        F.min(F.when(F.col("__cw") >= F.col("__hi"), F.col("price_cents"))).alias(
            "ci_hi_cents"
        ),
        F.first("__n").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long"),
        F.col("ci_lo_cents").cast("long"),
        F.col("median_cents").cast("long"),
        F.col("ci_hi_cents").cast("long"),
    ).orderBy("l_returnflag")


QUERIES["agg_median_ci"] = agg_median_ci

ORACLES["agg_median_ci"] = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
      FROM lineitem),
    per AS (
      SELECT l_returnflag, price_cents, count(*) AS w
      FROM li GROUP BY 1, 2),
    cum AS (
      SELECT l_returnflag, price_cents,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS n
      FROM per),
    marked AS (
      SELECT l_returnflag, price_cents, cw, n,
             CAST(floor(n / 2.0 - 0.98 * sqrt(n)) AS BIGINT) AS lo,
             CAST(ceil(n / 2.0 + 0.98 * sqrt(n)) AS BIGINT) AS hi,
             (n + 1) / 2.0 AS md
      FROM cum)
    SELECT l_returnflag, CAST(any_value(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cw >= lo THEN price_cents END) AS BIGINT) AS ci_lo_cents,
           CAST(min(CASE WHEN cw >= md THEN price_cents END) AS BIGINT) AS median_cents,
           CAST(min(CASE WHEN cw >= hi THEN price_cents END) AS BIGINT) AS ci_hi_cents
    FROM marked GROUP BY 1 ORDER BY 1
"""


def dedup_cluster_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-aware example reweighting (the soft-dedup alternative to
    dropping duplicates): every doc in an exact-content cluster gets
    weight 1/cluster_size, so each distinct content contributes unit
    mass; per source, the effective (weighted) corpus size vs the raw
    count quantifies duplication inflation.  Exact md5 grouping; the
    weight sums are per-source doubles of bounded cluster counts."""
    d = t(spark, sf, "documents").select(
        "doc_id", "source", F.md5(F.col("text")).alias("__h")
    )
    sizes = d.groupBy("__h").agg(F.count(F.lit(1)).alias("__sz"))
    j = d.join(sizes, "__h")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("__h").alias("n_distinct_in_source"),
        F.sum(1.0 / F.col("__sz").cast("double")).alias("__eff"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long"),
        F.col("n_distinct_in_source").cast("long"),
        F.round(F.col("__eff"), 6).alias("effective_docs"),
        F.round(
            F.col("n_docs").cast("double") / F.col("__eff"), 6
        ).alias("inflation_factor"),
    ).orderBy("source")


QUERIES["dedup_cluster_weights"] = dedup_cluster_weights

ORACLES["dedup_cluster_weights"] = """
    WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
    sizes AS (SELECT h, count(*) AS sz FROM d GROUP BY 1),
    j AS (SELECT source, d.h, sz FROM d JOIN sizes USING (h))
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_in_source,
           round(sum(1.0 / sz), 6) AS effective_docs,
           round(count(*) / sum(1.0 / sz), 6) AS inflation_factor
    FROM j GROUP BY 1 ORDER BY 1
"""


# --- inequality decomposition and off-policy estimation ----------------------


def agg_theil_index(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-T inequality of customer balances with the exact
    between/within-nation decomposition (``T = T_between + sum_g
    share_g * T_g`` — the additive-decomposability property that makes
    Theil the inequality measure warehouses actually report).  Balances
    shift to positive cents; per-row ln terms quantize to nano-units
    (the ``kaplan_meier`` idiom) so sums are order-independent."""
    c = t(spark, sf, "customer").select(
        (F.round(F.col("c_acctbal") * 100).cast("long") + 100_000).alias("cents"),
        "c_nationkey",
    )
    # per-row x*ln(x) in MICRO-units: the per-row magnitude is
    # cents * ln(cents) ~ 1.5e7, so micro keeps the sum under 2^63
    # through sf 1.0 while the quantization error stays ~5e-7/row —
    # invisible at round(6) of the n-normalized index
    xlnx6 = F.round(
        F.col("cents").cast("double") * F.log(F.col("cents").cast("double")) * 1e6
    ).cast("long")
    per_g = c.select("c_nationkey", "cents", xlnx6.alias("__x6")).groupBy(
        "c_nationkey"
    ).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("cents").alias("s_g"),
        F.sum("__x6").alias("x6_g"),
    )
    tot = per_g.agg(
        F.sum("n_g").alias("n"), F.sum("s_g").alias("s"), F.sum("x6_g").alias("x6")
    )
    j = per_g.crossJoin(F.broadcast(tot))
    nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
    mu = sd / nd
    # total Theil: (1/n) sum (x/mu) ln(x/mu) = [sum x ln x]/(n mu) - ln mu
    t_total = F.col("x6").cast("double") / 1e6 / (nd * mu) - F.log(mu)
    ngd, sgd = F.col("n_g").cast("double"), F.col("s_g").cast("double")
    mug = sgd / ngd
    t_g = F.col("x6_g").cast("double") / 1e6 / (ngd * mug) - F.log(mug)
    between_term = (sgd / sd) * F.log(mug / mu)
    within_term = (sgd / sd) * t_g
    agg = j.groupBy("n", "s", "x6").agg(
        F.sum(between_term).alias("__between"),
        F.sum(within_term).alias("__within"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_groups").cast("long"),
        F.round(t_total, 6).alias("theil_total"),
        F.round(F.col("__between"), 6).alias("theil_between"),
        F.round(F.col("__within"), 6).alias("theil_within"),
    )


QUERIES["agg_theil_index"] = agg_theil_index

ORACLES["agg_theil_index"] = """
    WITH c AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS cents,
             c_nationkey
      FROM customer),
    rows_ AS (
      SELECT c_nationkey, cents,
             CAST(round(CAST(cents AS DOUBLE) * ln(CAST(cents AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS x6
      FROM c),
    per_g AS (
      SELECT c_nationkey, count(*) AS n_g, sum(cents) AS s_g, sum(x6) AS x6_g
      FROM rows_ GROUP BY 1),
    tot AS (SELECT sum(n_g) AS n, sum(s_g) AS s, sum(x6_g) AS x6 FROM per_g),
    j AS (SELECT * FROM per_g CROSS JOIN tot),
    terms AS (
      SELECT n, s, x6,
             (CAST(s_g AS DOUBLE) / s)
               * ln((CAST(s_g AS DOUBLE) / n_g) / (CAST(s AS DOUBLE) / n))
               AS between_term,
             (CAST(s_g AS DOUBLE) / s)
               * (CAST(x6_g AS DOUBLE) / 1000000.0
                  / (n_g * (CAST(s_g AS DOUBLE) / n_g))
                  - ln(CAST(s_g AS DOUBLE) / n_g)) AS within_term
      FROM j)
    SELECT CAST(any_value(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_groups,
           round(any_value(CAST(x6 AS DOUBLE) / 1000000.0
                           / (n * (CAST(s AS DOUBLE) / n))
                           - ln(CAST(s AS DOUBLE) / n)), 6) AS theil_total,
           round(sum(between_term), 6) AS theil_between,
           round(sum(within_term), 6) AS theil_within
    FROM terms GROUP BY n, s, x6
"""


def agg_atkinson_index(spark: SparkSession, sf: str) -> DataFrame:
    """Atkinson inequality index at epsilon = 1
    (``A = 1 - geomean/mean``) per market segment — the
    welfare-grounded companion to ``agg_gini_wealth``; the geometric
    mean accumulates exact nano-unit ln terms."""
    c = t(spark, sf, "customer").select(
        "c_mktsegment",
        (F.round(F.col("c_acctbal") * 100).cast("long") + 100_000).alias("cents"),
    )
    ln9 = F.round(F.log(F.col("cents").cast("double")) * 1e9).cast("long")
    agg = c.select("c_mktsegment", "cents", ln9.alias("__l9")).groupBy(
        "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum("__l9").alias("l9"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    geo = F.exp(F.col("l9").cast("double") / 1e9 / nd)
    return agg.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.round(mean / 100.0, 6).alias("mean_balance"),
        F.round(geo / 100.0, 6).alias("geomean_balance"),
        F.round(1.0 - geo / mean, 6).alias("atkinson_eps1"),
    ).orderBy("c_mktsegment")


QUERIES["agg_atkinson_index"] = agg_atkinson_index

ORACLES["agg_atkinson_index"] = """
    WITH c AS (
      SELECT c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS cents
      FROM customer),
    rows_ AS (
      SELECT c_mktsegment, cents,
             CAST(round(ln(CAST(cents AS DOUBLE)) * 1000000000.0) AS BIGINT) AS l9
      FROM c),
    agg AS (
      SELECT c_mktsegment, count(*) AS n, sum(cents) AS s, sum(l9) AS l9
      FROM rows_ GROUP BY 1)
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           round(CAST(s AS DOUBLE) / n / 100.0, 6) AS mean_balance,
           round(exp(CAST(l9 AS DOUBLE) / 1000000000.0 / n) / 100.0, 6)
             AS geomean_balance,
           round(1.0 - exp(CAST(l9 AS DOUBLE) / 1000000000.0 / n)
                       / (CAST(s AS DOUBLE) / n), 6) AS atkinson_eps1
    FROM agg ORDER BY c_mktsegment
"""

SNIS_CLIP = 5.0


def eval_snips(spark: SparkSession, sf: str) -> DataFrame:
    """Self-normalized importance sampling (SNIPS): estimate the mean
    document quality under a LENGTH-BALANCED target distribution from
    the length-skewed corpus — the off-policy-evaluation estimator
    behind counterfactual data-mix readouts.  Weights are the exact
    density ratio ``(1/n_buckets) / (n_b/n)`` clipped at 5 (the
    standard variance-bias knob, reported alongside the clipped-mass
    diagnostic); quality is the n_chars-per-token proxy in exact
    integers; the epilogue is bucket-count-sized."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        "n_chars",
        F.least((F.col("n_chars") / 100).cast("long"), F.lit(5)).alias("bucket"),
        F.length(F.expr(r"regexp_replace(text, '\\s+', '')")).alias("nospace_chars"),
    )
    per_b = d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("nospace_chars").alias("q_b"),
    )
    tot = per_b.agg(
        F.sum("n_b").alias("n"), F.count(F.lit(1)).alias("k")
    )
    j = per_b.crossJoin(F.broadcast(tot))
    raw_w = (
        F.col("n").cast("double")
        / (F.col("k").cast("double") * F.col("n_b").cast("double"))
    )
    w = F.least(raw_w, F.lit(SNIS_CLIP))
    agg = j.agg(
        F.first("n").alias("n"),
        F.first("k").alias("n_buckets"),
        F.sum(w * F.col("q_b").cast("double")).alias("__wq"),
        F.sum(w * F.col("n_b").cast("double")).alias("__wn"),
        F.sum(F.col("q_b")).alias("__q"),
        F.sum((raw_w > SNIS_CLIP).cast("long")).alias("n_clipped_buckets"),
    )
    return agg.select(
        F.col("n").cast("long"),
        F.col("n_buckets").cast("long"),
        F.col("n_clipped_buckets").cast("long"),
        F.round(F.col("__q").cast("double") / F.col("n").cast("double"), 6).alias(
            "naive_mean_quality"
        ),
        F.round(F.col("__wq") / F.col("__wn"), 6).alias("snips_mean_quality"),
    )


QUERIES["eval_snips"] = eval_snips

ORACLES["eval_snips"] = f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             least(n_chars // 100, 5) AS bucket,
             length(regexp_replace(text, '\\s+', '', 'g')) AS nospace_chars
      FROM documents),
    per_b AS (
      SELECT bucket, count(*) AS n_b, sum(nospace_chars) AS q_b
      FROM d GROUP BY 1),
    tot AS (SELECT sum(n_b) AS n, count(*) AS k FROM per_b),
    j AS (
      SELECT n_b, q_b, n, k,
             CAST(n AS DOUBLE) / (k * CAST(n_b AS DOUBLE)) AS raw_w
      FROM per_b CROSS JOIN tot),
    agg AS (
      SELECT any_value(n) AS n, any_value(k) AS k,
             sum(least(raw_w, {SNIS_CLIP}) * CAST(q_b AS DOUBLE)) AS wq,
             sum(least(raw_w, {SNIS_CLIP}) * CAST(n_b AS DOUBLE)) AS wn,
             sum(q_b) AS q,
             sum(CASE WHEN raw_w > {SNIS_CLIP} THEN 1 ELSE 0 END) AS n_clipped
      FROM j)
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_buckets,
           CAST(n_clipped AS BIGINT) AS n_clipped_buckets,
           round(CAST(q AS DOUBLE) / n, 6) AS naive_mean_quality,
           round(wq / wn, 6) AS snips_mean_quality
    FROM agg
"""
