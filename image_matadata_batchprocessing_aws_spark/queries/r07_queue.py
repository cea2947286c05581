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

from image_matadata_batchprocessing_aws_spark.queries.util import t

QUERIES: dict = {}
ORACLES: dict = {}


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
