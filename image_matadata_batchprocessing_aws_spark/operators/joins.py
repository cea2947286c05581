"""Time-oriented join operators the reference lacks: as-of and range
(interval) joins.

The reference's only pairing of datasets is positional array alignment
(``train.py:59-64``); the engine provides explicit keyed joins
(SURVEY section 2.3), and these two flavors cover the time-series shapes a
training-data pipeline needs (attach the latest prior signal to an event;
assign events to time windows).

Scale design:

- **as-of**: NOT a sort-merge range join (which Spark would plan as a
  broadcast-nested-loop for an inequality condition).  Instead the classic
  union-and-carry algorithm: tag both inputs, union them, and carry the
  most recent right-side row forward with one window over
  ``(key, ts, side)``.  Cost: exactly one shuffle on the key, one sort per
  partition — linear, no pair blowup, skew bounded by the hottest key
  (same bound any per-key join has).
- **range join**: equi-join on a time *bin* plus an exact residual filter.
  Intervals explode to the bins they cover (bounded by
  interval_length / bin_width + 1 rows each); facts map to exactly one
  bin.  Turns an inequality join (nested-loop) into a hash join whose key
  cardinality the caller controls via ``bin_width``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: each left row gains the columns of
    the right row with the greatest ``right_ts <= left_ts`` for the same
    ``key`` (null-extended when no prior right row exists).

    Equivalent to DuckDB/pandas ``ASOF LEFT JOIN`` /
    ``merge_asof(direction="backward")``, including null-key semantics:
    a null key never matches (SQL equi-join rule) — without the filter
    below, Spark's window partitioning would group null-key rows together
    and "match" them.

    Duplicate right rows at equal ``(key, right_ts)`` resolve
    deterministically: by the greatest ``tiebreak`` column value when
    given, else by a stable hash of the whole right row — never by
    whichever duplicate the partition sort happened to place last.
    """
    right = right.where(F.col(key).isNotNull())
    lcols = left.columns
    rcols = right.columns
    rtype = "struct<" + ", ".join(f"`{f.name}`:{f.dataType.simpleString()}" for f in right.schema.fields) + ">"
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    ltype = "struct<" + ", ".join(f"`{f.name}`:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
    r_tb = (
        F.col(tiebreak).cast("long")
        if tiebreak is not None
        else F.xxhash64(F.struct(*[F.col(c) for c in rcols]))
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_tb.alias("__tb"),
        F.lit(None).cast(ltype).alias("__l"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts => inclusive (>=) match;
    # __tb makes F.last deterministic among equal-(key, ts) right rows
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    return out.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__m").getField(c).alias(f"{right_prefix}{c}") for c in rcols],
    )


def _assert_no_bin_column(*dfs: DataFrame) -> None:
    """The binned joins use ``__bin`` as a scratch column on both inputs;
    ``withColumn`` would silently OVERWRITE a caller column of that name
    and the trailing ``drop`` would then delete caller data."""
    for df in dfs:
        if "__bin" in df.columns:
            raise ValueError(
                "input already has a '__bin' column; rename it before "
                "calling a binned join (the name is used internally)"
            )


def range_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_seconds: int,
) -> DataFrame:
    """Join fact rows to every interval containing them
    (``start_ts <= fact_ts < end_ts``), as a bin equi-join + residual
    filter instead of an inequality nested-loop join.

    ``bin_width_seconds`` should be on the order of the typical interval
    length: each interval produces ``length/bin + 1`` bin rows, and each
    fact exactly one.
    """

    _assert_no_bin_column(facts, intervals)

    def bin_of(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / F.lit(bin_width_seconds * 1_000_000)).cast("long")

    f_binned = facts.withColumn("__bin", bin_of(F.col(fact_ts)))
    i_binned = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(bin_of(F.col(start_ts)), bin_of(F.col(end_ts)))),
    )
    joined = f_binned.join(i_binned, "__bin").where(
        (F.col(fact_ts) >= F.col(start_ts)) & (F.col(fact_ts) < F.col(end_ts))
    )
    return joined.drop("__bin")


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width_seconds: int,
) -> DataFrame:
    """Interval-x-interval overlap join (half-open semantics:
    ``l_start < r_end AND r_start < l_end``) as a bin equi-join —
    the two-sided generalization of :func:`range_join_binned`, and the
    third member of the temporal-join family (as-of, point-in-interval,
    interval-overlap).

    Both sides explode to the bins they cover; the equi-join on the bin
    replaces the inequality nested-loop.  An overlapping pair shares
    every bin in the intersection of its ranges, so to emit each pair
    exactly ONCE without a distinct shuffle, a pair matches only in its
    FIRST shared bin — ``greatest(bin(l_start), bin(r_start))``, which
    is always inside both bin ranges when the intervals overlap.

    Pick ``bin_width_seconds`` near the typical interval length: each
    row produces ``length/bin + 1`` bin rows, and a bin containing many
    interval starts is an ordinary hash-join hot key (AQE skew-split
    applies).
    """

    _assert_no_bin_column(left, right)

    def bin_of(c) -> Column:
        return F.floor(F.unix_micros(c) / F.lit(bin_width_seconds * 1_000_000)).cast("long")

    l = left.withColumn(
        "__bin", F.explode(F.sequence(bin_of(F.col(l_start)), bin_of(F.col(l_end))))
    )
    r = right.withColumn(
        "__bin", F.explode(F.sequence(bin_of(F.col(r_start)), bin_of(F.col(r_end))))
    )
    joined = l.join(r, "__bin").where(
        (F.col(l_start) < F.col(r_end))
        & (F.col(r_start) < F.col(l_end))
        & (F.col("__bin") == F.greatest(bin_of(F.col(l_start)), bin_of(F.col(r_start))))
    )
    return joined.drop("__bin")
