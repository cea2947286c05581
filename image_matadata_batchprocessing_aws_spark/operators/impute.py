"""Order-dependent imputation: forward/backward fill (SURVEY W1).

The reference does ``batch[col].ffill().bfill()`` per 100k-row pandas chunk
(``Image_Train_Model/read_csv_s3_train.py:77-80``), silently depending on
CSV row order *within a chunk* — values never propagate across chunk
boundaries.  Here the ordering is explicit (caller supplies an order
column) and the fill is global over each partition group.

Scale note: a single global ordering would serialize 100 TB through one
window partition.  The operator therefore requires ``partition_by`` keys
for large tables (fills run per key group, parallel across groups) and
only permits the keyless global form for dimension-sized inputs — and
that contract is ENFORCED, not just documented: a keyless call first
counts at most ``global_row_cap + 1`` rows (a LIMIT-bounded job, cheap);
past the cap, ``ffill`` auto-routes to the two-pass
:func:`ffill_partitioned` and ``bfill`` refuses.  For a truly global
fill at scale, the two-pass algorithm applies: per-partition fill +
a small driver-collected table of per-partition boundary values
broadcast back — implemented by ``ffill_partitioned``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Keyless global windows serialize everything through ONE task; past this
#: many rows the single-partition sort/spill dominates and the two-pass
#: path wins.  Pass ``global_row_cap=None`` to opt out (test fixtures).
GLOBAL_WINDOW_ROW_CAP = 2_000_000


def _window(order_by: str, partition_by: list[str] | None, forward: bool):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    if forward:
        return w.orderBy(F.col(order_by).asc()).rowsBetween(Window.unboundedPreceding, 0)
    return w.orderBy(F.col(order_by).asc()).rowsBetween(0, Window.unboundedFollowing)


def _exceeds(df: DataFrame, cap: int | None) -> bool:
    """True iff df has more than ``cap`` rows, reading at most cap+1."""
    if cap is None:
        return False
    return df.limit(cap + 1).count() > cap


def ffill(
    df: DataFrame,
    cols: list[str],
    order_by: str,
    partition_by: list[str] | None = None,
    global_row_cap: int | None = GLOBAL_WINDOW_ROW_CAP,
) -> DataFrame:
    """Forward-fill: last non-null value at-or-before this row.

    Keyless (global) calls on inputs past ``global_row_cap`` rows take the
    two-pass :func:`ffill_partitioned` path automatically."""
    if not partition_by and _exceeds(df, global_row_cap):
        return ffill_partitioned(df, cols, order_by)
    w = _window(order_by, partition_by, forward=True)
    return df.withColumns({c: F.last(F.col(f"`{c}`"), ignorenulls=True).over(w) for c in cols})


def bfill(
    df: DataFrame,
    cols: list[str],
    order_by: str,
    partition_by: list[str] | None = None,
    global_row_cap: int | None = GLOBAL_WINDOW_ROW_CAP,
) -> DataFrame:
    """Backward-fill: first non-null value at-or-after this row.

    Keyless (global) calls refuse inputs past ``global_row_cap`` rows —
    supply ``partition_by`` keys (or run :func:`ffill_partitioned` on the
    reversed ordering)."""
    if not partition_by and _exceeds(df, global_row_cap):
        raise ValueError(
            f"keyless global bfill over >{global_row_cap} rows would sort "
            "everything in ONE window partition; pass partition_by keys, "
            "or global_row_cap=None to insist"
        )
    w = _window(order_by, partition_by, forward=False)
    return df.withColumns({c: F.first(F.col(f"`{c}`"), ignorenulls=True).over(w) for c in cols})


def ffill_bfill(
    df: DataFrame,
    cols: list[str],
    order_by: str,
    partition_by: list[str] | None = None,
    global_row_cap: int | None = GLOBAL_WINDOW_ROW_CAP,
) -> DataFrame:
    """``ffill().bfill()`` — the reference's exact imputation order
    (``read_csv_s3_train.py:77-80``): forward first, then remaining
    leading nulls filled backward."""
    if not partition_by and _exceeds(df, global_row_cap):
        raise ValueError(
            f"keyless global ffill_bfill over >{global_row_cap} rows would "
            "sort everything in ONE window partition; pass partition_by "
            "keys, or global_row_cap=None to insist"
        )
    # cap already checked once over the same input; don't re-count per leg
    return bfill(
        ffill(df, cols, order_by, partition_by, global_row_cap=None),
        cols,
        order_by,
        partition_by,
        global_row_cap=None,
    )


def ffill_partitioned(df: DataFrame, cols: list[str], order_by: str) -> DataFrame:
    """Scale-path global forward-fill without a single-partition window.

    Two passes: (1) range-repartition by the order key and fill within each
    partition via a grouped window on ``spark_partition_id``; (2) compute
    each partition's last non-null (a tiny aggregate, one row per
    partition), prefix-fill those on the driver, broadcast-join back, and
    coalesce rows whose leading prefix was null.  Cost: one range shuffle +
    one broadcast join — no serialization point.
    """
    parted = df.repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, F.col(order_by))
    # materialize BEFORE reading spark_partition_id: range boundaries come
    # from sampling, so two jobs over the same lineage can assign different
    # partition ids — the boundary-collect job and the output job must see
    # the same assignment or carries attach to the wrong partitions.
    # localCheckpoint (not persist): blocks are freed by the ContextCleaner
    # when the frame is GC'd, and repeated calls with an identical plan
    # don't trip CacheManager's already-cached dedup
    parted = parted.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_by).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = parted.withColumns(
        {c: F.last(F.col(f"`{c}`"), ignorenulls=True).over(w) for c in cols}
    )
    # per-partition last value (post-fill) for each column
    lasts = (
        filled.groupBy("__pid")
        .agg(
            *[F.max_by(F.col(f"`{c}`"), F.when(F.col(f"`{c}`").isNotNull(), F.col(order_by))).alias(c) for c in cols]
        )
        .collect()
    )
    lasts.sort(key=lambda r: r["__pid"])
    carry: dict[int, dict] = {}
    running = {c: None for c in cols}
    for r in lasts:
        carry[r["__pid"]] = dict(running)
        for c in cols:
            if r[c] is not None:
                running[c] = r[c]
    spark = df.sparkSession
    carry_rows = [
        {"__pid": pid, **{f"__carry_{c}": v for c, v in vals.items()}} for pid, vals in carry.items()
    ]
    if not carry_rows:
        return filled.drop("__pid")
    # explicit schema: inference raises on all-None carry columns and can
    # drift from the source column type, breaking the coalesce below
    from pyspark.sql import types as T

    field_type = {f.name: f.dataType for f in df.schema.fields}
    carry_schema = T.StructType(
        [T.StructField("__pid", T.IntegerType())]
        + [T.StructField(f"__carry_{c}", field_type[c]) for c in cols]
    )
    carry_df = spark.createDataFrame(carry_rows, schema=carry_schema)
    out = filled.join(F.broadcast(carry_df), "__pid", "left")
    out = out.withColumns({c: F.coalesce(F.col(f"`{c}`"), F.col(f"`__carry_{c}`")) for c in cols})
    return out.drop("__pid", *[f"__carry_{c}" for c in cols])


def interpolate_linear(
    df: DataFrame,
    cols: list[str],
    order_by: str | list[str],
    partition_by: list[str] | None = None,
    x_col: str | None = None,
    global_row_cap: int | None = GLOBAL_WINDOW_ROW_CAP,
) -> DataFrame:
    """Linear interpolation of null runs — the gap-AWARE member of the
    impute family (ffill/bfill repeat a neighbor; this draws the line
    between both neighbors).  pandas ``Series.interpolate`` semantics:
    interior nulls take ``prev + (next - prev) * (x - x_prev) /
    (x_next - x_prev)``, LEADING nulls stay null (no left endpoint),
    TRAILING nulls forward-fill (pandas' default limit_direction).

    ``x_col=None`` interpolates on row POSITION (pandas
    ``method='linear'``); a numeric ``x_col`` (e.g. epoch seconds)
    time-weights the line (pandas ``method='values'``).  Duplicate x at
    both endpoints degrades to the previous value (no 0/0).

    Plan: the same one-sort window pair as :func:`ffill_bfill` — four
    windowed expressions per column over ONE keyed (exchange, sort),
    everything else map-side; parallel across keys.  Keyless calls past
    ``global_row_cap`` are refused (the single-partition-window
    landmine, `GLOBAL_WINDOW_ROW_CAP`): interpolation needs BOTH
    neighbors, so the ffill two-pass carry trick doesn't transfer —
    pre-key the data or raise the cap explicitly.

    ``order_by`` may be a list for a composite sort (timestamp plus a
    tiebreak) — pass one so ties can't make neighbor choice
    partitioning-dependent."""
    if not partition_by and _exceeds(df, global_row_cap):
        raise ValueError(
            "interpolate_linear: keyless input exceeds global_row_cap "
            f"({global_row_cap}); supply partition_by or raise the cap"
        )
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    base = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*[F.col(c).asc() for c in order_cols])
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    if x_col is None:
        x = F.row_number().over(base).cast("double")
    else:
        x = F.col(x_col).cast("double")
    out = df.withColumn("__x", x)
    for c in cols:
        v = F.col(f"`{c}`")
        pv = F.last(v, ignorenulls=True).over(wb)
        px = F.last(F.when(v.isNotNull(), F.col("__x")), ignorenulls=True).over(wb)
        nv = F.first(v, ignorenulls=True).over(wf)
        nx = F.first(F.when(v.isNotNull(), F.col("__x")), ignorenulls=True).over(wf)
        interp = pv + (nv - pv) * (F.col("__x") - px) / (nx - px)
        out = out.withColumn(
            c,
            F.when(v.isNotNull(), v)
            .when(pv.isNull(), F.lit(None))
            .when(nv.isNull() | (nx == px), pv)
            .otherwise(interp),
        )
    return out.drop("__x")
