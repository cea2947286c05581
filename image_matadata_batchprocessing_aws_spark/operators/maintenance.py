"""Table maintenance sinks a 100 TB pipeline actually needs: dynamic
partition overwrite and small-file compaction.

The reference's closest analogues are the split-and-upload scripts
(``split and upload/split_image_Script.py:39-52``,
``split_csv_script.py:33-40``): hand-rolled file sizing plus
whole-prefix re-uploads.  Engine semantics: partitioned parquet with
(1) *dynamic* overwrite — an incremental batch replaces only the
partitions it contains, never the whole table — and (2) compaction that
rewrites a partition's many small files into size-targeted ones without
touching the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    dynamic: bool = True,
    mode: str = "overwrite",
) -> None:
    """Hive-layout parquet write.  With ``dynamic=True`` (the only sane
    default for incremental loads), overwrite replaces ONLY the
    partitions present in ``df`` — a day's reprocess cannot wipe the
    other 3650 days.  Static overwrite (``dynamic=False``) replaces the
    whole table root."""
    spark = df.sparkSession
    prev = spark.conf.get(_OVERWRITE_MODE_KEY, "static")
    spark.conf.set(_OVERWRITE_MODE_KEY, "dynamic" if dynamic else "static")
    try:
        df.write.mode(mode).partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(_OVERWRITE_MODE_KEY, prev)


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) key over already-quantized non-negative integer
    columns: the low ``bits`` of each column, bit-interleaved (column 0
    gets the least-significant lane).  Pure integer shift/mask codegen —
    expressible identically in any SQL engine, so it oracles exactly.

    Rows close in the Z-key are close in EVERY interleaved dimension, so
    range-sorting a table by the key co-locates multi-dimensional
    neighborhoods into the same files/row groups — parquet min/max stats
    then prune scans filtered on ANY of the dimensions, where a plain
    sort only serves its leading column.  Quantize continuous columns to
    an integer grid first (e.g. ``floor(value / step)``); ``bits`` per
    dimension bounds key width (dims * bits <= 63)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    key = None
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + j
            ).cast("long")
            key = term if key is None else key + term
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimizing rewrite: range-partition by the Z-order key of
    ``cols`` (each output file covers one compact key range — the
    multi-dimensional analogue of a sorted layout), then drop the key.
    The engine-side half of Delta/Iceberg's OPTIMIZE ZORDER."""
    spark = df.sparkSession
    n = n_files or spark.sparkContext.defaultParallelism
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    keyed.repartitionByRange(n, F.col("__zkey")).sortWithinPartitions(
        "__zkey"
    ).drop("__zkey").write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet table's many small files into ~``target_file_bytes``
    files; returns the file count written.  Small files are the silent
    killer of 100 TB scans (one task + one open per file); compaction
    restores ``maxPartitionBytes``-sized units.

    File count is sized from the table's actual on-disk bytes (Hadoop
    ``getContentSummary`` — metadata only, no data read).  Spark refuses
    to overwrite a path it is reading, so the rewrite goes to a sibling
    temp directory and swaps in after the write COMMITS (write, delete
    old, rename) — a failed write leaves the original untouched.  On
    object stores without atomic rename, point the swap at a manifest /
    table format instead; the sizing and repartition logic is identical.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(total_bytes) // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_by:
        # co-locate rows of one table-partition per task so each output
        # file belongs to a single hive partition directory
        compacted = df.repartition(n_files, *[F.col(c) for c in partition_by])
        compacted.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    tmp_jpath = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(jpath, True)
    fs.rename(tmp_jpath, jpath)
    return n_files


def merge_frames(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """The lazy upsert plan: rows in ``updates`` replace same-key rows of
    ``existing``, new keys append, absent keys survive.  One broadcast
    anti-join on the (typically small) update key set + a union — the
    big side never shuffles."""
    keys = updates.select(key).distinct()
    kept = existing.join(F.broadcast(keys), key, "left_anti")
    return kept.unionByName(updates.select(*existing.columns))


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_by: list[str] | None = None,
) -> None:
    """Keyed upsert into a parquet table: rows in ``updates`` replace
    same-key rows, new keys append, absent keys survive — the incremental
    replacement for the reference's reprocess-everything pattern
    (``read_csv_s3_train.py:122-134`` rebuilds the whole table per run).

    Plan: :func:`merge_frames` (broadcast anti-join + union), then
    rewrite via the same commit-then-swap as :func:`compact_parquet`.
    With ``partition_by``, only an updates-partition-pruned slice of the
    table need be rewritten in a table-format deployment; the parquet
    fallback rewrites the table, which is still one scan + one broadcast
    anti-join, no shuffle of the big side.
    """
    existing = spark.read.parquet(path)
    merged = merge_frames(existing, updates, key)
    tmp = path.rstrip("/") + "__merge_tmp"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    fs.delete(jpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath)


def quantize_linear(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    suffix: str = "_q",
) -> DataFrame:
    """Auto-quantization front end for :func:`zorder_key` /
    :func:`write_zordered`: linearly buckets each continuous column into
    ``[0, 2^bits)`` from its OWN fitted min/max, so callers don't have
    to hand-pick a grid step per column.

    Two-pass shape (the scaler-family pattern): one tiny min/max
    aggregate row broadcasts, then bucketing is a map-side expression.
    Zero-spread guard: a constant column buckets to 0 (no 0/0), and
    NULLs bucket to 0 so they cluster together at the key's low end.
    Linear bucketing keeps the grid deterministic and
    engine-reproducible; heavily skewed columns can pre-transform
    (log, rank) first — the downstream interleave is agnostic."""
    hi = (1 << bits) - 1
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__zmin_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__zmax_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        spread = F.col(f"__zmax_{c}") - F.col(f"__zmin_{c}")
        frac = (F.col(c).cast("double") - F.col(f"__zmin_{c}")) / spread
        out = out.withColumn(
            c + suffix,
            F.when(
                F.col(c).isNull() | (spread == 0), F.lit(0).cast("long")
            ).otherwise(
                F.least(F.floor(frac * F.lit(float(hi + 1))).cast("long"), F.lit(hi))
            ),
        )
    return out.drop(
        *[f"__zmin_{c}" for c in cols], *[f"__zmax_{c}" for c in cols]
    )


def zorder_index(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out: str = "zorder",
) -> DataFrame:
    """Convenience composition: :func:`quantize_linear` the continuous
    ``cols``, interleave the buckets with :func:`zorder_key`, drop the
    bucket columns.  See those two for the scale/semantics story."""
    q = quantize_linear(df, cols, bits=bits)
    return q.withColumn(
        out, zorder_key([c + "_q" for c in cols], bits)
    ).drop(*[c + "_q" for c in cols])


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "change_ts",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed (``op`` in I/U/D, ordered by ``ts_col``)
    to a base snapshot: per key, the LATEST change wins — a final D
    removes the key, a final I/U upserts its payload; keys with no
    change survive untouched.

    Scale shape: the feed is reduced first (one keyed window bounded by
    feed volume, never base volume), then :func:`merge_frames`-style
    anti-join + union — the base never shuffles, the change-key set
    broadcasts.  Ties on ``ts_col`` break by op precedence D > U > I
    (deletes win a same-timestamp race), then arbitrary-but-stated —
    the SQL twin must order identically.
    """
    from pyspark.sql.window import Window

    payload = [c for c in changes.columns if c not in (ts_col, op_col)]
    prec = F.when(F.col(op_col) == "D", 2).when(F.col(op_col) == "U", 1).otherwise(0)
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), prec.desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # key set of the reduced feed == key set of the raw feed; deriving
    # it from `changes` keeps the window subtree out of the anti-join
    # branch (Spark re-plans shared subtrees, it doesn't reuse them)
    keys = changes.select(key).distinct()
    survivors = base.join(F.broadcast(keys), key, "left_anti")
    upserts = latest.where(F.col(op_col) != "D").select(payload)
    return survivors.unionByName(upserts.select(*base.columns))


def incremental_join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on,
) -> DataFrame:
    """Insert-only incremental view maintenance for an inner join:
    Delta(A join B) = dA join B_old  UNION ALL  A_old join dB
    UNION ALL  dA join dB.  Appending this to the stored old join
    equals a full recompute — the IVM identity the oracle query states.

    Scale shape: each term joins a DELTA (small, typically
    broadcastable) against one full side or the other delta; the two
    full tables are scanned once each and NEVER joined to each other —
    that is the entire point at 100 TB, where old join old is the cost
    you already paid."""
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )


def scd2_from_feed(
    changes: DataFrame,
    key: str,
    ts_col: str = "change_ts",
    op_col: str = "op",
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a CDC feed:
    each I/U change opens a version valid [its ts, next change's ts);
    the open version has ``valid_to`` null and ``is_current`` true; a D
    closes its predecessor without opening a version.  ``valid_to`` is
    computed BEFORE deletes are filtered, so a delete closes history
    correctly.  Same-timestamp races order I < U < D (apply order:
    insert, then update, then delete — a same-ts U+D leaves a
    zero-length closed version), mirrored by the SQL twin.  The type-2
    companion of :func:`apply_cdc` (type 1).

    Scale shape: one keyed window over the feed (bounded by feed
    volume) — history assembly never touches the dimension table."""
    from pyspark.sql.window import Window

    prec = F.when(F.col(op_col) == "D", 2).when(F.col(op_col) == "U", 1).otherwise(0)
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), prec.asc())
    closed = changes.withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
    return (
        closed.where(F.col(op_col) != "D")
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot RECONCILIATION: full-outer join two table versions on
    the key and classify every row as ``added`` / ``removed`` /
    ``changed`` / ``unchanged``, with a per-column change flag for the
    changed ones — the audit a pipeline runs after a backfill or
    migration ("what exactly did this rewrite touch?").

    Comparison is null-safe (``<=>``): NULL -> value and value -> NULL
    both count as changes, NULL == NULL does not.  One shuffle on the
    key from the full-outer join; the per-column flags are map-side
    expressions, so output cost is key-sized, not column-count-shuffled.
    For very wide tables compare a content hash first and only expand
    the per-column flags on the changed subset (same plan, one extra
    filter) — noted here rather than automated so audits stay explicit.

    Returns ``key..., diff_status, changed_cols (array<string>)``.
    """
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    j = o.join(n, cond, "full_outer")
    # presence tests assume non-null keys (the PK contract); a NULL
    # business key has no identity to diff on
    in_old = F.col(f"o.{key_cols[0]}").isNotNull()
    in_new = F.col(f"n.{key_cols[0]}").isNotNull()
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols
    ]
    return j.select(
        *keys,
        status.alias("diff_status"),
        F.when(
            (in_old & in_new), changed
        ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    size_col: str,
    file_id_col: str,
    target_bytes: int,
    round_digits: int = 4,
) -> DataFrame:
    """The PLANNING half of :func:`compact_parquet`, as a pure
    DataFrame over a file LISTING (path, bytes, partition): assign each
    file to a compaction bin by next-fit-decreasing — files sorted
    size-desc within their table partition, running byte total, bin =
    (cumsum - size) div target — then report per-bin file count, byte
    total and fill ratio.  Unlike first-fit, next-fit off a cumulative
    sum is ONE window expression, fully deterministic, and within 2x of
    optimal bin count (each bin except the last is > half full); a file
    larger than ``target_bytes`` lands alone in its own bin with
    fill > 1 (split hint, not an error).

    Scale shape: this runs over listing METADATA (one row per file —
    millions of rows for a 100 TB table, not the table), and the only
    window partitions by ``part_col``, the same key the physical
    rewrite would parallelize over.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(size_col).desc(), F.col(file_id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    planned = files.select(
        F.col(part_col).alias("part"),
        F.col(size_col).alias("__bytes"),
        F.floor(
            (F.sum(size_col).over(w) - F.col(size_col)).cast("double")
            / F.lit(float(target_bytes))
        ).alias("bin_id"),
    )
    return (
        planned.groupBy("part", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("__bytes").cast("long").alias("total_bytes"),
        )
        .select(
            "part",
            F.col("bin_id").cast("long").alias("bin_id"),
            "n_files",
            "total_bytes",
            F.round(
                F.col("total_bytes").cast("double") / F.lit(float(target_bytes)),
                round_digits,
            ).alias("fill_ratio"),
        )
    )


def compaction_plan_sql(
    table: str,
    part_col: str,
    size_col: str,
    file_id_col: str,
    target_bytes: int,
    round_digits: int = 4,
) -> str:
    """DuckDB twin of :func:`compaction_plan` (same ordering, same
    floor-of-double bin arithmetic)."""
    return f"""
        WITH planned AS (
          SELECT {part_col} AS part, {size_col} AS bytes,
                 CAST(floor(CAST(sum({size_col}) OVER (
                     PARTITION BY {part_col}
                     ORDER BY {size_col} DESC, {file_id_col} ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - {size_col} AS DOUBLE) / {float(target_bytes)}) AS BIGINT)
                   AS bin_id
          FROM {table})
        SELECT part, bin_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS total_bytes,
               round(CAST(sum(bytes) AS DOUBLE) / {float(target_bytes)},
                     {round_digits}) AS fill_ratio
        FROM planned GROUP BY part, bin_id
    """


def zonemap_stats(
    df: DataFrame,
    file_col,
    value_col: str,
) -> DataFrame:
    """Per-file zone-map statistics for ``value_col`` — the min/max/
    count/null-count a parquet footer keeps per row group, computed
    here from data so a layout's SKIPPING POWER can be audited before
    committing to it (compare a clustered vs unclustered ``file_col``
    assignment: same data, wildly different prunable fraction).
    ``file_col`` may be a column name or a Column expression (e.g. the
    bin assignment from :func:`compaction_plan` or a zorder_key range).
    """
    fc = F.col(file_col) if isinstance(file_col, str) else file_col
    return df.groupBy(fc.alias("file_id")).agg(
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(value_col).isNull(), 1).otherwise(0)
        ).alias("n_nulls"),
    )


def zonemap_prune_report(
    stats: DataFrame,
    lo,
    hi,
    round_digits: int = 6,
) -> DataFrame:
    """Given :func:`zonemap_stats` output and a range predicate
    ``value BETWEEN lo AND hi``, report what a min/max zone map would
    skip: a file scans only if its [v_min, v_max] overlaps [lo, hi]
    (all-null files never scan).  One row: file/row counts scanned vs
    skipped and the scan fraction — the number that decides whether a
    re-clustering (z-order / sort) pays for itself.
    """
    overlaps = (
        F.col("v_min").isNotNull()
        & (F.col("v_min") <= F.lit(hi))
        & (F.col("v_max") >= F.lit(lo))
    )
    return stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(overlaps, 1).otherwise(0)).cast("long").alias("files_scanned"),
        F.sum(F.when(~overlaps, 1).otherwise(0)).cast("long").alias("files_skipped"),
        F.sum(F.when(overlaps, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.round(
            F.sum(F.when(overlaps, F.col("n_rows")).otherwise(0)).cast("double")
            / F.sum("n_rows").cast("double"),
            round_digits,
        ).alias("scan_fraction"),
    )


def table_fingerprint(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Order-independent table checksum in ``n_buckets`` rows: every
    row hashes (all columns, name-tagged, null-tagged) to one 60-bit
    md5 integer; rows bucket by md5(key) % n_buckets; each bucket XORs
    its hashes.  Two environments produce identical fingerprints iff
    the tables match row-for-row — the O(1)-output audit to run BEFORE
    the row-level :func:`table_diff` (scan-only, one tiny shuffle, vs
    diff's full co-partitioned join), and bucketing means a mismatch
    localizes to 1/n_buckets of the keyspace for the targeted diff.

    Column order is pinned by sorting names, so logically-identical
    tables with different physical column order still match.
    """
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    cols = sorted(df.columns)
    row_repr = F.concat_ws(
        "\x1f",
        *[
            F.concat(F.lit(c + "="), F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
            for c in cols
        ],
    )
    bucket = md5_int64(F.col(key_col).cast("string")) % F.lit(n_buckets)
    return (
        df.select(
            bucket.alias("bucket"), md5_int64(row_repr).alias("__h")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor("__h").cast("long").alias("hash_xor"),
        )
    )


def table_fingerprint_sql(
    table: str,
    key_col: str,
    cols: list,
    n_buckets: int = 64,
) -> str:
    """DuckDB twin of :func:`table_fingerprint` (pass the column list —
    SQL can't introspect it portably)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    parts = " || chr(31) || ".join(
        f"('{c}=' || coalesce(CAST({c} AS VARCHAR), chr(0)))" for c in sorted(cols)
    )
    h = md5_int64_sql(parts)
    b = md5_int64_sql(f"CAST({key_col} AS VARCHAR)")
    return f"""
        SELECT CAST(({b}) % {n_buckets} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(bit_xor({h}) AS BIGINT) AS hash_xor
        FROM {table} GROUP BY 1
    """


def scd2_validity_audit(
    hist: DataFrame,
    key: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Invariant audit over a type-2 history — the post-build QA a
    dimension pipeline ships with: per-key ordered by ``from_col``,
    count (1) OVERLAPS (a version starts before its predecessor ends),
    (2) GAPS (a version starts after its predecessor ends — broken
    contiguity), (3) keys with not-exactly-one current row, (4) NULL
    valid_from rows, plus basic volume stats.  A healthy build reports
    all zeros; the numbers localize which invariant a bad merge broke.

    One keyed window + keyed aggregates; the audit costs one pass over
    the history, not a self-join.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col(from_col).asc())
    marked = hist.select(
        F.col(key).alias("__k"),
        F.col(from_col).alias("__f"),
        F.col(to_col).alias("__t"),
        F.col(current_col).cast("long").alias("__cur"),
        F.lag(F.col(to_col)).over(w).alias("__prev_to"),
    )
    per_key = marked.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__cur").alias("__n_cur"),
        F.sum(
            F.when(
                F.col("__prev_to").isNotNull() & (F.col("__f") < F.col("__prev_to")), 1
            ).otherwise(0)
        ).alias("__n_overlap"),
        F.sum(
            F.when(
                F.col("__prev_to").isNotNull() & (F.col("__f") > F.col("__prev_to")), 1
            ).otherwise(0)
        ).alias("__n_gap"),
        F.sum(F.when(F.col("__f").isNull(), 1).otherwise(0)).alias("__n_null_from"),
    )
    return per_key.agg(
        F.sum("__n").cast("long").alias("n_versions"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__n_overlap").cast("long").alias("n_overlaps"),
        F.sum("__n_gap").cast("long").alias("n_gaps"),
        F.sum(F.when(F.col("__n_cur") != 1, 1).otherwise(0))
        .cast("long")
        .alias("n_keys_bad_current"),
        F.sum("__n_null_from").cast("long").alias("n_null_from"),
    )
