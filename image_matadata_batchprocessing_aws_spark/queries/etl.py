"""Metadata-ETL operator queries (SURVEY section 2.1-2.2, 2.4-2.8).

Each query re-expresses one (or a tight cluster) of the reference's
pandas ETL steps over the driver tables, with a DuckDB oracle twin.
The reference steps live in ``Image_Train_Model/read_csv_s3_train.py``
unless noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from image_matadata_batchprocessing_aws_spark.operators import (
    add_batch_id,
    drop_columns,
    ffill_bfill,
    label_encode,
    minmax_scale,
)
from image_matadata_batchprocessing_aws_spark.operators.batching import add_row_bytes
from image_matadata_batchprocessing_aws_spark.queries.util import t


# --- P1/P2/F1: drop, cast, trim (ref :61,:64-69) -------------------------


def etl_project_cast(spark: SparkSession, sf: str) -> DataFrame:
    c = drop_columns(t(spark, sf, "customer"), ["c_mktsegment"])
    return c.select(
        F.col("c_custkey").cast("string").alias("c_custkey_str"),
        F.trim(F.col("c_name")).alias("c_name_trim"),
        F.col("c_nationkey"),
        F.col("c_acctbal"),
    )


# --- F2/F3: epoch-ms -> timestamp + date parts w/ 1970 defaults (ref :72-75)


def etl_epoch_dateparts(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    ts_n = F.when(F.col("event_type") != "signup", F.col("ts"))  # null for signup
    e = e.select(
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.timestamp_millis(F.unix_millis(ts_n)).alias("__ts2"),
    )
    return e.select(
        "event_id",
        "ts_ms",
        F.coalesce(F.year("__ts2"), F.lit(1970)).cast("long").alias("year"),
        F.coalesce(F.month("__ts2"), F.lit(1)).cast("long").alias("month"),
        F.coalesce(F.dayofmonth("__ts2"), F.lit(1)).cast("long").alias("day"),
    )


# --- P6/W1/F4: sentinel->null, ffill+bfill per key, constant fill (ref :77-84)


def etl_sentinel_ffill(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").withColumn(
        "v", F.when(F.col("event_type") != "error", F.col("value"))
    )
    filled = ffill_bfill(e, ["v"], order_by="event_id", partition_by=["user_id"])
    return filled.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("v"), F.lit(0.0)).alias("value_filled"),
    )


def etl_ffill_global(spark: SparkSession, sf: str) -> DataFrame:
    """Global-order forward fill via the SCALE PATH (ffill_partitioned:
    range-partition + per-partition window + boundary broadcast — never a
    single-partition window), oracle-checked against a plain
    last_value-ignore-nulls window."""
    from image_matadata_batchprocessing_aws_spark.operators.impute import ffill_partitioned

    e = t(spark, sf, "events").withColumn(
        "v", F.when(F.col("event_type") != "error", F.col("value"))
    )
    filled = ffill_partitioned(e, ["v"], order_by="event_id")
    return filled.select(
        "event_id",
        F.round(F.coalesce(F.col("v"), F.lit(0.0)), 2).alias("v_filled"),
    )


# --- P5/A6/A7: null audit + total-missing gate (ref :86-94,136-139) ------


def etl_null_audit(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").select(
        F.when(F.col("event_type") != "error", F.col("value")).alias("value"),
        F.when(F.col("event_type") != "view", F.col("props")).alias("props"),
        "user_id",
    )
    return e.agg(
        F.count(F.when(F.col("value").isNull(), 1)).alias("value_nulls"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("props_nulls"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("user_id_nulls"),
        (
            F.count(F.when(F.col("value").isNull(), 1))
            + F.count(F.when(F.col("props").isNull(), 1))
            + F.count(F.when(F.col("user_id").isNull(), 1))
        ).alias("total_nulls"),
    )


# --- A8: global label encoding (ref :96-100; global fit fixes per-chunk bug)


def etl_label_encode(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    enc = label_encode(li, ["l_returnflag", "l_linestatus"], suffix="_code")
    return enc.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag_code").cast("long").alias("l_returnflag_code"),
        F.col("l_linestatus_code").cast("long").alias("l_linestatus_code"),
    )


# --- A3: global z-score (ref :107-109) -----------------------------------


def etl_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-stat z-score: scaled-BIGINT sums (associative, parallelism-
    independent) make the fitted mean/std bit-identical across Spark and
    DuckDB (round-1 driver failure was a 1-ulp stats drift flipping
    round() boundary digits); ``+ 0.0`` after round() folds -0.0 into
    +0.0 identically on both engines."""
    from image_matadata_batchprocessing_aws_spark.operators.scale import zscore_scale_exact

    li = t(spark, sf, "lineitem")
    sc = zscore_scale_exact(li, ["l_quantity", "l_extendedprice"], suffix="_z")
    return sc.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(F.col("l_quantity_z"), 4) + F.lit(0.0)).alias("quantity_z"),
        (F.round(F.col("l_extendedprice_z"), 4) + F.lit(0.0)).alias("extendedprice_z"),
    )


# --- robust (median/IQR) scale — outlier-resistant family member ---------


def etl_robust_scale(spark: SparkSession, sf: str) -> DataFrame:
    from image_matadata_batchprocessing_aws_spark.operators.scale import robust_scale

    c = t(spark, sf, "customer")
    sc = robust_scale(c, ["c_acctbal"], suffix="_rs")
    return sc.select(
        "c_custkey", F.round(F.col("c_acctbal_rs"), 4).alias("acctbal_rs")
    )


# --- A2: global min-max scale (train.py:124,127) -------------------------


def etl_minmax(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    sc = minmax_scale(c, ["c_acctbal"], suffix="_mm")
    return sc.select(
        "c_custkey", F.round(F.col("c_acctbal_mm"), 4).alias("acctbal_mm")
    )


# --- median/MAD scale — highest-breakdown member of the scaler family ----


def etl_mad_scale(spark: SparkSession, sf: str) -> DataFrame:
    from image_matadata_batchprocessing_aws_spark.operators.scale import mad_scale

    c = t(spark, sf, "customer")
    sc = mad_scale(c, ["c_acctbal"], suffix="_mad")
    return sc.select(
        "c_custkey", F.round(F.col("c_acctbal_mad"), 4).alias("acctbal_mad")
    )


# --- equal-frequency discretization (KBinsDiscretizer twin) --------------


def etl_quantile_bin(spark: SparkSession, sf: str) -> DataFrame:
    """Quartile binning of customer balances: global exact-percentile
    boundaries broadcast, bin index as map-side comparisons."""
    from image_matadata_batchprocessing_aws_spark.operators.scale import quantile_bin

    c = t(spark, sf, "customer")
    b = quantile_bin(c, ["c_acctbal"], n_bins=4, suffix="_bin")
    return b.select("c_custkey", F.col("c_acctbal_bin").alias("acctbal_bin"))


def etl_quantile_bin_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """PER-GROUP equal-frequency binning: each nation's customers binned
    against that nation's own quartiles (the grouped-fit form of
    etl_quantile_bin — normalizing within strata instead of globally).
    The boundary table is group-count-sized, broadcast back; the bin
    index stays a map-side comparison sum."""
    c = t(spark, sf, "customer")
    bounds = c.groupBy("c_nationkey").agg(
        *[
            F.percentile(F.col("c_acctbal"), F.lit(q)).alias(f"__q{i}")
            for i, q in enumerate((0.25, 0.5, 0.75))
        ]
    )
    j = c.join(F.broadcast(bounds), "c_nationkey")
    bin_idx = sum(
        (F.col("c_acctbal") > F.col(f"__q{i}")).cast("int") for i in range(3)
    )
    return j.select(
        "c_custkey",
        "c_nationkey",
        bin_idx.cast("long").alias("acctbal_bin"),
    )


# --- one-hot indicator expansion (OneHotEncoder / get_dummies twin) ------

#: Pinned TPC-H domains — the production contract: one-hot SCHEMA must
#: not depend on which values a given run happened to see.
ONE_HOT_DOMAINS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}


def etl_one_hot(spark: SparkSession, sf: str) -> DataFrame:
    from image_matadata_batchprocessing_aws_spark.operators.encode import one_hot_encode

    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    oh = one_hot_encode(li, ["l_returnflag", "l_linestatus"], categories=ONE_HOT_DOMAINS)
    return oh.select(
        "l_orderkey",
        "l_linenumber",
        *[f"{c}_{v}" for c, vals in ONE_HOT_DOMAINS.items() for v in vals],
    )


# --- A9/W2: deterministic count-based batching (process_test_train_Images.py:31,49-56)


def etl_batch_id(spark: SparkSession, sf: str) -> DataFrame:
    e = add_batch_id(t(spark, sf, "events"), 200, order_by="event_id")
    return e.groupBy("batch_id").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# --- U1: union-all of chunks == whole table (ref :122-134) ---------------


def etl_union_chunks(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    lo = li.filter(F.col("l_quantity") < 25)
    hi = li.filter(F.col("l_quantity") >= 25)
    return (
        lo.unionByName(hi)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# --- F6: approximate row byte size (split_image_Script.py:35) ------------


def etl_row_bytes(spark: SparkSession, sf: str) -> DataFrame:
    n = t(spark, sf, "nation")
    return add_row_bytes(n).select(
        "n_nationkey", F.col("row_bytes").cast("long").alias("row_bytes")
    )


# --- F10: path/key manipulation (process_test_train_Images.py:38,69) -----


def etl_path_ops(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    path = F.concat(F.lit("s3://bucket/images/"), F.col("source"), F.lit(".csv"))
    return d.select(
        "doc_id",
        F.regexp_replace(path, r"^[a-z0-9+.-]+://[^/]+/", "").alias("key"),
        F.format_string("part_%03d", (F.col("doc_id") % 7).cast("int")).alias("part_name"),
    )


# --- O2: head / offset-limit display window (read_npy_format.py:11) ------


def etl_limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.orderBy("o_orderkey")
        .offset(180)
        .limit(5)
        .select("o_orderkey", "o_totalprice")
    )


# --- O1: sorted distinct keys (train.py:25) ------------------------------


def etl_distinct_values(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").select("event_type").distinct()


# --- A5: mean rowwise Euclidean distance (train.py:105-113) --------------


def eval_euclidean_scalar(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    dist = F.sqrt(
        F.pow(F.col("l_extendedprice") / 1000.0 - F.col("l_quantity"), 2)
        + F.pow(F.col("l_discount") - F.col("l_tax"), 2)
    )
    return li.agg(F.round(F.avg(dist), 4).alias("avg_euclidean"))


ZORDER_BITS = 8


def etl_zorder_key(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) layout key over (nation, quantized balance):
    bit-interleaved integer expression (maintenance.zorder_key — the
    sort key behind write_zordered's multi-dimensional file clustering),
    exact in any engine, so fully oracled.  Balance quantizes to a
    100-unit grid shifted non-negative."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        zorder_key,
    )

    c = t(spark, sf, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nation"),
        F.floor((F.col("c_acctbal") + 1000.0) / 100.0).cast("long").alias("abucket"),
    )
    return c.withColumn(
        "zkey", zorder_key(["nation", "abucket"], bits=ZORDER_BITS)
    )


def _zorder_sql(cols: list[str], bits: int) -> str:
    n = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + j})"
        for j, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def etl_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Keyed upsert semantics with a full oracle: every 7th customer
    plays an updates batch (account balance zeroed, name tagged);
    ``maintenance.merge_frames`` (broadcast anti-join + union — the lazy
    plan inside ``merge_upsert``'s commit-then-swap rewrite) must match
    the SQL anti-join/union twin exactly: updated keys replaced, others
    untouched."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        merge_frames,
    )

    c = t(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = c.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPDATED:"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    return merge_frames(c, updates, "c_custkey")


def etl_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Wide-to-long melt of the lineitem measures (DataFrame.unpivot —
    Catalyst's Expand node, one pass, no join/union of self-scans).
    Downsampled by orderkey so the long output stays driver-collectable;
    the oracle is the portable UNION ALL formulation."""
    li = t(spark, sf, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


def etl_star_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """Star-schema denormalization: the 'one big table' build that
    feature pipelines and BI extracts run — orders widened with
    customer, nation, and region attributes in one broadcast-join chain
    (every dimension is broadcast-sized, so the fact table never
    shuffles; the plan is a single scan + three BroadcastHashJoins).
    Orderkey-sampled so the wide output stays driver-collectable."""
    o = t(spark, sf, "orders").where(F.col("o_orderkey") % 20 == 0)
    c = t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    n = t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf, "region").select("r_regionkey", "r_name")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


def etl_dates_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-dimension generation: the order-date span unrolled into
    one row per day with date parts and a weekend flag — the generator
    pattern (sequence + explode from a 1-row min/max aggregate) that
    star schemas build their date dimension with.  Zero input rows
    shuffle; the generator runs on a single 1-row driver of the span.
    Day-of-week convention: 0 = Sunday (Spark's dayofweek - 1 == DuckDB
    dayofweek)."""
    o = t(spark, sf, "orders")
    span = o.agg(
        F.to_date(F.min("o_orderdate")).alias("d0"),
        F.to_date(F.max("o_orderdate")).alias("d1"),
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    dow = (F.dayofweek("d") - 1).cast("long")
    return days.select(
        F.col("d").alias("date"),
        F.year("d").cast("long").alias("year"),
        F.month("d").cast("long").alias("month"),
        F.dayofmonth("d").cast("long").alias("day"),
        dow.alias("dow"),
        dow.isin(0, 6).alias("is_weekend"),
    )


def etl_cdc_compact(spark: SparkSession, sf: str) -> DataFrame:
    """CDC log compaction (latest-record-wins): the event log plays a
    change stream keyed by user_id — 'error' events act as deletes,
    everything else as upserts.  Keep each key's latest row by
    (ts, event_id), drop keys whose latest op is a delete: the
    materialize step of a merge-on-read table.  One window pass
    partitioned on the key — a single shuffle at any scale."""
    ev = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = ev.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    return latest.where(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.unix_millis("ts").alias("last_ts_ms"),
        F.round("value", 2).alias("last_value"),
    )


HIST_BUCKETS = 20


def agg_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice: global min/max from one
    tiny aggregate broadcast back (the two-pass fit-then-apply shape of
    the scalers), bucket index as a map-side expression, one count
    groupBy over 20 groups.  The bucket arithmetic is identical IEEE
    double math on both engines, so the oracle matches exactly."""
    li = t(spark, sf, "lineitem").select("l_extendedprice")
    fit = li.agg(
        F.min("l_extendedprice").alias("__lo"), F.max("l_extendedprice").alias("__hi")
    )
    j = li.crossJoin(F.broadcast(fit))
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("__lo"))
            / ((F.col("__hi") - F.col("__lo")) / HIST_BUCKETS)
        ),
        F.lit(HIST_BUCKETS - 1),
    ).cast("long")
    return (
        j.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


_PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "props"]


def etl_profile_table(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass table profiler: per column, null count and exact distinct
    cardinality, plus the table row count — the post-write verification
    scan (S12) grown into a data-quality report.  Multiple exact
    count_distincts plan as one Expand pass here; at 100 TB swap them
    for approx_count_distinct (the HLL contract is oracle-checked by
    agg_approx_bound) — same single-scan shape."""
    ev = t(spark, sf, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__{c}_nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__{c}_distinct"))
    wide = ev.agg(F.count("*").alias("n_rows"), *aggs)
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"__{c}_nulls").cast("long").alias("n_nulls"),
                    F.col(f"__{c}_distinct").cast("long").alias("n_distinct"),
                )
                for c in _PROFILE_COLS
            ]
        )
    ).alias("e")
    return wide.select("n_rows", entries).select(
        F.col("e.col_name").alias("col_name"),
        F.col("e.n_nulls").alias("n_nulls"),
        F.col("e.n_distinct").alias("n_distinct"),
        "n_rows",
    )


def etl_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: per
    user, each event_type change opens a new version row with
    [valid_from_ms, valid_to_ms) validity (epoch ms; open-ended current
    row has NULL valid_to and is_current=true).  Deterministic ordering
    via (ts, event_id) so same-timestamp events version identically in
    every engine.

    Scale: two window passes partitioned on user_id — the change filter
    drops rows before the (cheap) second pass, and nothing leaves the
    user's partition; at 100 TB this is one shuffle on the dimension key,
    the same shape warehouses run nightly."""
    ev = t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = ev.withColumn("__prev", F.lag("event_type").over(w)).where(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("valid_from_ms"),
        F.lead(F.unix_millis("ts")).over(w2).alias("valid_to_ms"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(F.unix_millis("ts")).over(w2).isNull().alias("is_current"),
    )


def etl_scd2_asof(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (AS OF) read over the SCD2 history — time travel
    for a dimension table: the snapshot at the corpus's midpoint instant
    is the unique version row per user whose [valid_from, valid_to)
    interval contains it.  The instant derives from the data (integer
    midpoint of min/max event ms) so the query is deterministic at any
    SF; the history build is one keyed shuffle and the snapshot filter
    is map-side over it."""
    hist = etl_scd2_history(spark, sf)
    ev = t(spark, sf, "events")
    # floor division on BOTH engines: a bare /2 + cast would truncate on
    # Spark but ROUND on DuckDB's double->bigint cast for odd sums
    mid = ev.agg(
        F.floor((F.min(F.unix_millis("ts")) + F.max(F.unix_millis("ts"))) / F.lit(2))
        .cast("long")
        .alias("__t")
    )
    snap = hist.crossJoin(F.broadcast(mid)).where(
        (F.col("valid_from_ms") <= F.col("__t"))
        & (F.col("valid_to_ms").isNull() | (F.col("valid_to_ms") > F.col("__t")))
    )
    return snap.select("user_id", "event_type", "version", "valid_from_ms")


QUERIES = {
    "etl_star_flatten": etl_star_flatten,
    "etl_scd2_asof": etl_scd2_asof,
    "etl_dates_dim": etl_dates_dim,
    "etl_cdc_compact": etl_cdc_compact,
    "agg_histogram": agg_histogram,
    "etl_profile_table": etl_profile_table,
    "etl_unpivot": etl_unpivot,
    "etl_scd2_history": etl_scd2_history,
    "etl_zorder_key": etl_zorder_key,
    "etl_merge_upsert": etl_merge_upsert,
    "etl_project_cast": etl_project_cast,
    "etl_epoch_dateparts": etl_epoch_dateparts,
    "etl_sentinel_ffill": etl_sentinel_ffill,
    "etl_ffill_global": etl_ffill_global,
    "etl_null_audit": etl_null_audit,
    "etl_label_encode": etl_label_encode,
    "etl_zscore": etl_zscore,
    "etl_minmax": etl_minmax,
    "etl_robust_scale": etl_robust_scale,
    "etl_mad_scale": etl_mad_scale,
    "etl_quantile_bin": etl_quantile_bin,
    "etl_quantile_bin_grouped": etl_quantile_bin_grouped,
    "etl_one_hot": etl_one_hot,
    "etl_batch_id": etl_batch_id,
    "etl_union_chunks": etl_union_chunks,
    "etl_row_bytes": etl_row_bytes,
    "etl_path_ops": etl_path_ops,
    "etl_limit_offset": etl_limit_offset,
    "etl_distinct_values": etl_distinct_values,
    "eval_euclidean_scalar": eval_euclidean_scalar,
}

ORACLES = {
    "etl_star_flatten": """
        SELECT o_orderkey, o_totalprice, o_orderstatus,
               c_custkey, c_name, c_acctbal,
               n_name AS nation, r_name AS region
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderkey % 20 = 0
    """,
    "etl_dates_dim": """
        WITH span AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
                             CAST(max(o_orderdate) AS DATE) AS d1
                      FROM orders),
        days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
                 FROM span)
        SELECT d AS date,
               CAST(year(d) AS BIGINT) AS year,
               CAST(month(d) AS BIGINT) AS month,
               CAST(day(d) AS BIGINT) AS day,
               CAST(dayofweek(d) AS BIGINT) AS dow,
               dayofweek(d) IN (0, 6) AS is_weekend
        FROM days
    """,
    "etl_cdc_compact": """
        WITH latest AS (
          SELECT user_id, event_type, ts, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE user_id IS NOT NULL)
        SELECT user_id, event_type AS last_event_type,
               epoch_ms(ts) AS last_ts_ms,
               round(value, 2) AS last_value
        FROM latest WHERE rn = 1 AND event_type <> 'error'
    """,
    "agg_histogram": f"""
        WITH fit AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
                     FROM lineitem)
        SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / {HIST_BUCKETS})),
                          {HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
               count(*) AS n
        FROM lineitem CROSS JOIN fit
        GROUP BY 1
    """,
    "etl_profile_table":"\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               count(*) AS n_rows
        FROM events
        """
        for c in _PROFILE_COLS
    ),
    "etl_unpivot": """
        WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 20 = 0)
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM li
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM li
    """,
    "etl_scd2_asof": """
        WITH ev AS (SELECT * FROM events
                    WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        ch AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS prev_type
               FROM ev),
        vers AS (SELECT user_id, event_type, ts, event_id
                 FROM ch WHERE prev_type IS NULL OR prev_type <> event_type),
        hist AS (
          SELECT user_id, event_type,
                 epoch_ms(ts) AS valid_from_ms,
                 lead(epoch_ms(ts)) OVER w AS valid_to_ms,
                 CAST(row_number() OVER w AS BIGINT) AS version
          FROM vers
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        mid AS (SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS t
                FROM events)
        SELECT user_id, event_type, version, valid_from_ms
        FROM hist, mid
        WHERE valid_from_ms <= t AND (valid_to_ms IS NULL OR valid_to_ms > t)
    """,
    "etl_scd2_history": """
        WITH ev AS (SELECT * FROM events
                    WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        ch AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS prev_type
               FROM ev),
        vers AS (SELECT user_id, event_type, ts, event_id
                 FROM ch WHERE prev_type IS NULL OR prev_type <> event_type)
        SELECT user_id, event_type,
               epoch_ms(ts) AS valid_from_ms,
               lead(epoch_ms(ts)) OVER w AS valid_to_ms,
               CAST(row_number() OVER w AS BIGINT) AS version,
               (lead(epoch_ms(ts)) OVER w IS NULL) AS is_current
        FROM vers
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "etl_zorder_key": f"""
        WITH q AS (SELECT c_custkey,
                          CAST(c_nationkey AS BIGINT) AS nation,
                          CAST(floor((c_acctbal + 1000.0) / 100.0) AS BIGINT) AS abucket
                   FROM customer)
        SELECT c_custkey, nation, abucket,
               CAST({_zorder_sql(["nation", "abucket"], ZORDER_BITS)} AS BIGINT) AS zkey
        FROM q
    """,
    "etl_merge_upsert": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey % 7 <> 0
        UNION ALL
        SELECT c_custkey, 'UPDATED:' || c_name AS c_name, 0.0 AS c_acctbal
        FROM customer WHERE c_custkey % 7 = 0
    """,
    "etl_project_cast": """
        SELECT CAST(c_custkey AS VARCHAR) AS c_custkey_str,
               trim(c_name) AS c_name_trim, c_nationkey, c_acctbal
        FROM customer
    """,
    "etl_epoch_dateparts": """
        WITH b AS (
          SELECT event_id, epoch_ms(ts) AS ts_ms,
                 CASE WHEN event_type <> 'signup' THEN ts END AS ts2
          FROM events)
        SELECT event_id, ts_ms,
               CAST(coalesce(year(ts2), 1970) AS BIGINT) AS year,
               CAST(coalesce(month(ts2), 1) AS BIGINT) AS month,
               CAST(coalesce(day(ts2), 1) AS BIGINT) AS day
        FROM b
    """,
    "etl_ffill_global": """
        SELECT event_id,
               round(coalesce(
                 last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
                   OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0.0), 2) AS v_filled
        FROM events
    """,
    "etl_sentinel_ffill": """
        WITH base AS (
          SELECT event_id, user_id,
                 CASE WHEN event_type <> 'error' THEN value END AS v
          FROM events),
        f AS (
          SELECT event_id, user_id,
                 last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vf
          FROM base),
        fb AS (
          SELECT event_id, user_id,
                 coalesce(vf, first_value(vf IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS vfb
          FROM f)
        SELECT event_id, user_id, coalesce(vfb, 0.0) AS value_filled FROM fb
    """,
    "etl_null_audit": """
        WITH b AS (
          SELECT CASE WHEN event_type <> 'error' THEN value END AS value,
                 CASE WHEN event_type <> 'view' THEN props END AS props,
                 user_id
          FROM events)
        SELECT count(CASE WHEN value IS NULL THEN 1 END) AS value_nulls,
               count(CASE WHEN props IS NULL THEN 1 END) AS props_nulls,
               count(CASE WHEN user_id IS NULL THEN 1 END) AS user_id_nulls,
               count(CASE WHEN value IS NULL THEN 1 END)
                 + count(CASE WHEN props IS NULL THEN 1 END)
                 + count(CASE WHEN user_id IS NULL THEN 1 END) AS total_nulls
        FROM b
    """,
    "etl_label_encode": """
        WITH c1 AS (
          SELECT v, dense_rank() OVER (ORDER BY v) - 1 AS code
          FROM (SELECT DISTINCT l_returnflag AS v FROM lineitem WHERE l_returnflag IS NOT NULL)),
        c2 AS (
          SELECT v, dense_rank() OVER (ORDER BY v) - 1 AS code
          FROM (SELECT DISTINCT l_linestatus AS v FROM lineitem WHERE l_linestatus IS NOT NULL))
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(c1.code AS BIGINT) AS l_returnflag_code,
               CAST(c2.code AS BIGINT) AS l_linestatus_code
        FROM lineitem l
        LEFT JOIN c1 ON l.l_returnflag = c1.v
        LEFT JOIN c2 ON l.l_linestatus = c2.v
    """,
    "etl_zscore": """
        WITH sc AS (
          SELECT CAST(round(l_quantity * 10000.0) AS BIGINT) AS vq,
                 CAST(round(l_extendedprice * 10000.0) AS BIGINT) AS vp,
                 l_quantity, l_extendedprice
          FROM lineitem),
        st AS (
          SELECT CAST(sum(vq) AS DOUBLE) / 10000.0 AS s_q,
                 (CAST(sum((vq * vq) >> 30) AS DOUBLE) * 1073741824.0
                  + CAST(sum((vq * vq) & 1073741823) AS DOUBLE)) / 100000000.0 AS ss_q,
                 CAST(count(l_quantity) AS DOUBLE) AS n_q,
                 CAST(sum(vp) AS DOUBLE) / 10000.0 AS s_p,
                 (CAST(sum((vp * vp) >> 30) AS DOUBLE) * 1073741824.0
                  + CAST(sum((vp * vp) & 1073741823) AS DOUBLE)) / 100000000.0 AS ss_p,
                 CAST(count(l_extendedprice) AS DOUBLE) AS n_p
          FROM sc)
        SELECT l_orderkey, l_linenumber,
               round(CASE WHEN sqrt((ss_q - s_q * s_q / n_q) / (n_q - 1.0)) <> 0
                          THEN (l_quantity - s_q / n_q)
                               / sqrt((ss_q - s_q * s_q / n_q) / (n_q - 1.0))
                          ELSE l_quantity - s_q / n_q END, 4) + 0.0 AS quantity_z,
               round(CASE WHEN sqrt((ss_p - s_p * s_p / n_p) / (n_p - 1.0)) <> 0
                          THEN (l_extendedprice - s_p / n_p)
                               / sqrt((ss_p - s_p * s_p / n_p) / (n_p - 1.0))
                          ELSE l_extendedprice - s_p / n_p END, 4) + 0.0 AS extendedprice_z
        FROM lineitem, st
    """,
    "etl_robust_scale": """
        WITH st AS (SELECT quantile_cont(c_acctbal, 0.5) AS m,
                           quantile_cont(c_acctbal, 0.75)
                           - quantile_cont(c_acctbal, 0.25) AS iqr
                    FROM customer)
        SELECT c_custkey,
               -- + 0.0: DuckDB round(-tiny) = -0.0 vs Spark's +0.0
               -- (etl_zscore oracle precedent; one sf0.1 row)
               round(CASE WHEN iqr <> 0 THEN (c_acctbal - m) / iqr
                          ELSE c_acctbal - m END, 4) + 0.0 AS acctbal_rs
        FROM customer, st
    """,
    "etl_minmax": """
        WITH st AS (SELECT min(c_acctbal) AS lo,
                           max(c_acctbal) - min(c_acctbal) AS spread
                    FROM customer)
        SELECT c_custkey,
               round(CASE WHEN spread <> 0 THEN (c_acctbal - lo) / spread
                          ELSE c_acctbal - lo END, 4) AS acctbal_mm
        FROM customer, st
    """,
    "etl_mad_scale": """
        WITH med AS (SELECT quantile_cont(c_acctbal, 0.5) AS m FROM customer),
        mad AS (SELECT quantile_cont(abs(c_acctbal - m), 0.5) AS d
                FROM customer, med)
        SELECT c_custkey,
               round(CASE WHEN d <> 0
                          THEN (c_acctbal - m) / (1.4826 * d)
                          ELSE c_acctbal - m END, 4) AS acctbal_mad
        FROM customer, med, mad
    """,
    "etl_quantile_bin": """
        SELECT c_custkey,
               CAST(CAST(c_acctbal > quantile_cont(c_acctbal, 0.25) OVER () AS INT)
                  + CAST(c_acctbal > quantile_cont(c_acctbal, 0.50) OVER () AS INT)
                  + CAST(c_acctbal > quantile_cont(c_acctbal, 0.75) OVER () AS INT)
                    AS BIGINT) AS acctbal_bin
        FROM customer
    """,
    "etl_quantile_bin_grouped": """
        WITH b AS (
          SELECT c_nationkey,
                 quantile_cont(c_acctbal, 0.25) AS q0,
                 quantile_cont(c_acctbal, 0.50) AS q1,
                 quantile_cont(c_acctbal, 0.75) AS q2
          FROM customer GROUP BY c_nationkey)
        SELECT c.c_custkey, c.c_nationkey,
               CAST(CAST(c.c_acctbal > b.q0 AS INT)
                  + CAST(c.c_acctbal > b.q1 AS INT)
                  + CAST(c.c_acctbal > b.q2 AS INT) AS BIGINT) AS acctbal_bin
        FROM customer c JOIN b USING (c_nationkey)
    """,
    "etl_one_hot": """
        SELECT l_orderkey, l_linenumber,
               CAST(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS INT) AS l_returnflag_A,
               CAST(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS INT) AS l_returnflag_N,
               CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS INT) AS l_returnflag_R,
               CAST(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS INT) AS l_linestatus_F,
               CAST(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS INT) AS l_linestatus_O
        FROM lineitem
    """,
    "etl_batch_id": """
        WITH b AS (
          SELECT event_id,
                 CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 200.0) AS BIGINT) AS batch_id
          FROM events)
        SELECT batch_id, count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id
        FROM b GROUP BY batch_id
    """,
    "etl_union_chunks": """
        WITH u AS (
          SELECT * FROM lineitem WHERE l_quantity < 25
          UNION ALL
          SELECT * FROM lineitem WHERE l_quantity >= 25)
        SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        FROM u GROUP BY l_returnflag
    """,
    "etl_row_bytes": """
        SELECT n_nationkey,
               CAST(length(concat_ws(',', n_nationkey, n_name, n_regionkey)) + 1 AS BIGINT) AS row_bytes
        FROM nation
    """,
    "etl_path_ops": """
        SELECT doc_id,
               regexp_replace('s3://bucket/images/' || source || '.csv',
                              '^[a-z0-9+.-]+://[^/]+/', '') AS key,
               printf('part_%03d', CAST(doc_id % 7 AS INT)) AS part_name
        FROM documents
    """,
    "etl_limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 5 OFFSET 180
    """,
    "etl_distinct_values": "SELECT DISTINCT event_type FROM events",
    "eval_euclidean_scalar": """
        SELECT round(avg(sqrt(pow(l_extendedprice / 1000.0 - l_quantity, 2)
                              + pow(l_discount - l_tax, 2))), 4) AS avg_euclidean
        FROM lineitem
    """,
}


def etl_fk_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit across the star schema: per foreign
    key, row counts and ORPHAN counts (child keys with no parent) — the
    nightly data-quality gate a warehouse runs after ingest.  Each check
    is one anti-join keyed on the FK (broadcast parents where small);
    expected orphans on consistent TPC-H data: zero — the query proves
    the MECHANISM and the driver locks the zeros."""
    checks = [
        ("orders.o_custkey->customer", t(spark, sf, "orders").select(F.col("o_custkey").alias("k")),
         t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))),
        ("lineitem.l_orderkey->orders", t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("k")),
         t(spark, sf, "orders").select(F.col("o_orderkey").alias("k"))),
        ("lineitem.l_partkey->part", t(spark, sf, "lineitem").select(F.col("l_partkey").alias("k")),
         t(spark, sf, "part").select(F.col("p_partkey").alias("k"))),
        ("lineitem.l_suppkey->supplier", t(spark, sf, "lineitem").select(F.col("l_suppkey").alias("k")),
         t(spark, sf, "supplier").select(F.col("s_suppkey").alias("k"))),
        ("customer.c_nationkey->nation", t(spark, sf, "customer").select(F.col("c_nationkey").alias("k")),
         t(spark, sf, "nation").select(F.col("n_nationkey").alias("k"))),
    ]
    out = None
    for name, child, parent in checks:
        row = child.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            child.join(parent, "k", "left_anti").agg(
                F.count(F.lit(1)).alias("n_orphans")
            )
        ).select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        out = row if out is None else out.unionByName(row)
    return out


QUERIES["etl_fk_audit"] = etl_fk_audit
ORACLES["etl_fk_audit"] = """
    SELECT 'orders.o_custkey->customer' AS fk,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
"""
