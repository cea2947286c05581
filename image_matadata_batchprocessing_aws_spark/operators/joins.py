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


def _asof_tagged_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str | None,
):
    """Shared prologue of the as-of family: tag both inputs, pack each
    side's columns into one struct, and union — one frame the carry
    windows can sort once per direction.  Returns (union, lcols, rcols).

    Null-key right rows are dropped (SQL equi-join rule: null never
    matches); ``__tb`` makes duplicate-(key, ts) right rows resolve
    deterministically — by the ``tiebreak`` column when given, else by a
    stable hash of the whole right row."""
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
    return l_tag.unionByName(r_tag), lcols, rcols


#: Backward carry: right rows sort BEFORE left rows at equal ts, so the
#: running last() at a left row has seen every right row with ts <= its
#: own (inclusive match); greatest __tb wins among equal-(key, ts) rights.
def _w_backward():
    return (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )


#: Forward carry: left rows sort BEFORE right rows at equal ts, so the
#: first() over [current, end] at a left row sees every right row with
#: ts >= its own (inclusive); smallest __tb wins among equal-ts rights.
def _w_forward():
    return (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").desc(), F.col("__tb").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )


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
    in the shared prologue, Spark's window partitioning would group
    null-key rows together and "match" them.

    Duplicate right rows at equal ``(key, right_ts)`` resolve
    deterministically: by the greatest ``tiebreak`` column value when
    given, else by a stable hash of the whole right row — never by
    whichever duplicate the partition sort happened to place last.
    """
    u, lcols, rcols = _asof_tagged_union(left, right, key, left_ts, right_ts, tiebreak)
    carried = u.withColumn("__m", F.last("__r", ignorenulls=True).over(_w_backward()))
    out = carried.where(F.col("__side") == 1)
    return out.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__m").getField(c).alias(f"{right_prefix}{c}") for c in rcols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward inclusive as-of join: the right row with the SMALLEST
    ``right_ts >= left_ts`` per key (pandas ``direction="forward"``,
    DuckDB ``ASOF ... ON l.ts <= r.ts``) — "what happened next": next
    click after an impression, next failure after a deploy.

    Same union-and-carry cost model as :func:`asof_join` (one shuffle on
    the key, one sort); only the carry direction flips: first() over the
    tail of the partition instead of last() over the head.  Equal-ts
    ties take the SMALLEST tiebreak (mirror image of backward)."""
    u, lcols, rcols = _asof_tagged_union(left, right, key, left_ts, right_ts, tiebreak)
    carried = u.withColumn("__m", F.first("__r", ignorenulls=True).over(_w_forward()))
    out = carried.where(F.col("__side") == 1)
    return out.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__m").getField(c).alias(f"{right_prefix}{c}") for c in rcols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    tiebreak: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Nearest as-of join (pandas ``direction="nearest"``): whichever of
    the backward and forward candidates is closer in absolute time wins;
    an exact-distance tie goes BACKWARD (documented, deterministic).
    ``tolerance_seconds`` nulls out matches farther than the bound in
    either direction — the "within an hour" guard every sensor/event
    alignment wants.

    Timestamps must be TimestampType (distances compare in epoch
    microseconds).  Cost: the same single key-shuffle; the two carry
    windows share the exchange and differ only in sort order, so the
    plan is one Exchange + two in-partition sorts — still linear, still
    no inequality nested-loop."""
    u, lcols, rcols = _asof_tagged_union(left, right, key, left_ts, right_ts, tiebreak)
    carried = u.withColumn(
        "__mb", F.last("__r", ignorenulls=True).over(_w_backward())
    ).withColumn("__mf", F.first("__r", ignorenulls=True).over(_w_forward()))
    out = carried.where(F.col("__side") == 1)
    here = F.unix_micros(F.col("__ts"))
    bdiff = here - F.unix_micros(F.col("__mb").getField(right_ts))
    fdiff = F.unix_micros(F.col("__mf").getField(right_ts)) - here
    if tolerance_seconds is not None:
        tol = F.lit(int(tolerance_seconds) * 1_000_000)
        out = out.withColumn(
            "__mb", F.when(bdiff <= tol, F.col("__mb"))
        ).withColumn("__mf", F.when(fdiff <= tol, F.col("__mf")))
        bdiff = here - F.unix_micros(F.col("__mb").getField(right_ts))
        fdiff = F.unix_micros(F.col("__mf").getField(right_ts)) - here
    chosen = F.when(
        F.col("__mb").isNotNull() & (F.col("__mf").isNull() | (bdiff <= fdiff)),
        F.col("__mb"),
    ).otherwise(F.col("__mf"))
    out = out.withColumn("__m", chosen)
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


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_edit: int = 2,
    block_left=None,
    block_right=None,
    out_dist: str = "edit_distance",
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join — record linkage between two
    tables whose keys almost match (typos, truncations, dirty feeds).

    The all-pairs edit-distance join is quadratic; BLOCKING makes it
    tractable: candidates must share a cheap block key (default: the
    lowercased first 3 characters), so the expensive ``levenshtein``
    runs on the equi-join's candidates only.  This is the standard
    recall trade — a typo inside the blocking window escapes the block;
    run multiple passes with different block expressions (prefix,
    suffix, soundex) and union when recall matters more than cost.

    One equi-join shuffle on the block key; ``levenshtein`` is a JVM
    expression with an exact DuckDB twin, so the operator oracles
    exactly.  Skewed blocks (one hot prefix) fall to AQE skew-join like
    any other equi-join."""
    bl = (
        block_left
        if block_left is not None
        else F.lower(F.substring(F.col(left_col), 1, 3))
    )
    br = (
        block_right
        if block_right is not None
        else F.lower(F.substring(F.col(right_col), 1, 3))
    )
    lf = left.withColumn("__blk", bl)
    rt = right.withColumn("__blk", br)
    joined = lf.join(rt, "__blk").drop("__blk")
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return joined.withColumn(out_dist, dist).where(F.col(out_dist) <= max_edit)
