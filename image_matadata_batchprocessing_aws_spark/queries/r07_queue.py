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
