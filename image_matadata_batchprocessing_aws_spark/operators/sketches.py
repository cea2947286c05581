"""Probabilistic sketch operators: Bloom filter and Count-Min.

The reference's membership checks (its dedup/verify passes hold the full
key set in memory, e.g. the pandas ``isin``-style audits behind SURVEY
§2.6) stop working when the key set itself is TB-sized.  These sketches
are the 100 TB answer: a fixed-size summary is built distributed, ships
to every task as a broadcast-sized literal, and the probe is a pure
map-side expression — no join, no shuffle, no Python.

Cross-engine determinism: positions/rows come from md5-derived integers
(``functions.md5_int64``), so a DuckDB oracle reproduces the sketch —
including its false positives — bit for bit.

Scale design:

- Bloom build: k positions per key -> pack into 32-bit words ->
  ``bit_or`` groupBy over at most m/32 groups.  Map-side combine means
  each task emits <= m/32 rows regardless of input size; the final
  sketch is m/8 bytes (8 KiB at m=2^16), collected driver-side like any
  other fit statistic (same contract as scaler fits / centroids).
- Bloom probe: the dense word array is embedded as a literal column, so
  membership tests run inside whole-stage codegen with zero exchange.
  At 100 TB you'd size m for the key cardinality (1e9 keys at 10 bits
  per key = 1.25 GB — beyond literal embedding; that regime switches to
  Spark's built-in DataFrameStatFunctions bloom or a broadcast variable,
  same semantics, and the map-side-probe shape is unchanged).
- Count-Min build: d*w bounded counters via one explode(d) + groupBy —
  partial aggregation collapses each task's contribution to <= d*w rows.
  Point queries join the (broadcast, d*w-row) counter table and take the
  min over d rows; estimates are deterministic overcounts (est >= exact
  always, no false negatives).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64

#: Bloom words are 32-bit (stored in longs) so masks never touch the
#: sign bit — keeps ``bit_or`` / bit-tests portable across engines.
BLOOM_WORD_BITS = 32

def _pow2() -> Column:
    """Power-of-two lookup (1 << 0 .. 1 << 31) as a 32-literal array: the
    Python DSL's shiftleft() wants a literal shift amount, so variable
    shifts become an element_at into this table instead.  Built lazily —
    Column construction needs an active session."""
    return F.array(*[F.lit(1 << b).cast("long") for b in range(BLOOM_WORD_BITS)])


def _mask(pos: Column) -> Column:
    """1 << (pos % 32) with a column-valued shift."""
    return F.element_at(_pow2(), (pos.bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"))


def bloom_positions(col: Column | str, k: int, m: int) -> list[Column]:
    """The k probe positions of one key: md5("<i>:" + key) mod m."""
    c = F.col(col) if isinstance(col, str) else col
    return [md5_int64(F.concat(F.lit(f"{i}:"), c)) % F.lit(m) for i in range(k)]


def bloom_build(keys: DataFrame, key_col: str, k: int, m: int) -> DataFrame:
    """Distributed Bloom build -> (word, bits) rows, word = pos div 32.

    One narrow explode (k rows per key) into a groupBy over <= m/32
    groups; partial aggregation makes the shuffle O(m) per task, not
    O(keys)."""
    pos = keys.select(
        F.explode(F.array(*bloom_positions(key_col, k, m))).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            _mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_dense(word_rows, m: int) -> list[int]:
    """Collected (word, bits) rows -> dense m/32-long word list."""
    dense = [0] * (m // BLOOM_WORD_BITS)
    for r in word_rows:
        dense[int(r["word"])] = int(r["bits"])
    return dense


def bloom_hit(elem: Column, dense: list[int], k: int, m: int) -> Column:
    """Map-side membership test of one key against a built sketch.

    The dense word list embeds as a literal array; every position test is
    element_at + bitwiseAND — pure codegen, no exchange.  No false
    negatives: every inserted key tests True."""
    words = F.array(*[F.lit(v).cast("long") for v in dense])
    tests = [
        F.element_at(words, (F.shiftright(p, 5) + F.lit(1)).cast("int"))
        .bitwiseAND(_mask(p))
        != 0
        for p in bloom_positions(elem, k, m)
    ]
    return reduce(lambda a, b: a & b, tests)


def bloom_hit_any(arr: Column, dense: list[int], k: int, m: int) -> Column:
    """True when ANY element of an array column probes positive — the
    per-document form (e.g. "does any shingle hit the benchmark set"),
    evaluated with ``exists`` so the scan stays one pass, short-circuit,
    and entirely JVM-side."""
    return F.exists(arr, lambda s: bloom_hit(s, dense, k, m))


# --- Count-Min sketch ------------------------------------------------------


def cms_cell(row: int | Column, key: Column, w: int) -> Column:
    """Column index of ``key`` in sketch row ``row``: md5("<r>:" + key) mod w."""
    r = F.lit(f"{row}:") if isinstance(row, int) else F.concat(row.cast("string"), F.lit(":"))
    return md5_int64(F.concat(r, key.cast("string"))) % F.lit(w)


def cms_build(df: DataFrame, key_col: str, d: int, w: int) -> DataFrame:
    """(r, c, cnt) counter rows of a d x w Count-Min sketch over the
    stream of ``key_col`` values.  Explode is d-wide but the groupBy has
    at most d*w groups, so map-side combine bounds every task's shuffle
    output at d*w rows."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(r).cast("int").alias("r"), cms_cell(r, key, w).alias("c"))
            for r in range(d)
        ]
    )
    return (
        df.where(key.isNotNull())
        .select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, counters: DataFrame, key_col: str, d: int, w: int
) -> DataFrame:
    """Point-query estimates: per key, min over the d counters it hashes
    to.  The counter table is d*w rows — broadcast it; the keys side
    never shuffles on anything but the final per-key min."""
    key = F.col(key_col)
    probes = keys.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"), cms_cell(r, key, w).alias("c")
                    )
                    for r in range(d)
                ]
            )
        ).alias("rc"),
    ).select(key_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        probes.join(F.broadcast(counters), ["r", "c"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )
