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

def _mask8(pos: Column) -> Column:
    """1 << (pos % 8) with a column-valued shift (the Python DSL's
    shiftleft() wants a literal shift amount, so the variable shift is an
    element_at into an 8-literal lookup)."""
    pow2 = F.array(*[F.lit(1 << b) for b in range(8)])
    return F.element_at(pow2, (pos.bitwiseAND(F.lit(7)) + F.lit(1)).cast("int"))


def bloom_positions(col: Column | str, k: int, m: int) -> list[Column]:
    """The k probe positions of one key: md5("<i>:" + key) mod m."""
    c = F.col(col) if isinstance(col, str) else col
    return [md5_int64(F.concat(F.lit(f"{i}:"), c)) % F.lit(m) for i in range(k)]


def bloom_build(keys: DataFrame, key_col: str, k: int, m: int) -> DataFrame:
    """Distributed Bloom build -> (byte_idx, bits) rows, byte = pos div 8.

    One narrow explode (k rows per key) into a groupBy over <= m/8
    groups; partial aggregation makes the shuffle O(m) per task, not
    O(keys)."""
    pos = keys.select(
        F.explode(F.array(*bloom_positions(key_col, k, m))).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 3).alias("byte_idx"),
            _mask8(F.col("pos")).alias("mask"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_dense(byte_rows, m: int) -> bytes:
    """Collected (byte_idx, bits) rows -> the dense m/8-byte sketch."""
    dense = bytearray(m // 8)
    for r in byte_rows:
        dense[int(r["byte_idx"])] = int(r["bits"])
    return bytes(dense)


def bloom_capacity(n_keys: int, bits_per_key: int = 64) -> int:
    """Smallest power-of-two m with at least ``bits_per_key * n_keys``
    bits.  Integer-exact, and reproducible in SQL as
    ``pow(2, length(bin(bits_per_key * n - 1)))`` — no float log2."""
    return 1 << max(8, (bits_per_key * max(n_keys, 1) - 1).bit_length())


def bloom_hit(elem: Column, sketch: bytes, k: int, m: int) -> Column:
    """Map-side membership test of one key against a built sketch.

    The sketch ships as ONE BinaryType literal; each position test
    slices its byte with substring (O(1) on binary — unlike string
    substring, whose char indexing is O(position)) and bit-tests via
    hex+conv.  A long-array literal is the trap here: pyspark's
    lit(list) builds CreateArray over one Literal per word, which blows
    the plan past the codegen threshold and falls back to interpreted
    per-row evaluation of the whole array (measured 14x slower than this
    form at m=2^19).  No false negatives: every inserted key tests True.
    An m in the hundreds of MB (1e9-key sets) outgrows literal
    embedding; that regime ships the same bytes as a broadcast variable
    with an identical probe expression."""
    blit = F.lit(sketch)
    tests = []
    for p in bloom_positions(elem, k, m):
        byte_val = F.conv(
            F.hex(F.substring(blit, (F.shiftright(p, 3) + F.lit(1)).cast("int"), 1)),
            16,
            10,
        ).cast("int")
        tests.append(byte_val.bitwiseAND(_mask8(p)) != 0)
    return reduce(lambda a, b: a & b, tests)


def bloom_hit_any(arr: Column, sketch: bytes, k: int, m: int) -> Column:
    """True when ANY element of an array column probes positive.

    Prefer explode + the scalar :func:`bloom_hit` filter for
    document-shaped fan-out: only HIT rows reach any downstream shuffle,
    and Catalyst skips some optimizations inside higher-order-function
    lambdas.  This form suits bounded arrays probed in place."""
    return F.exists(arr, lambda s: bloom_hit(s, sketch, k, m))


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


# --- HyperLogLog-style distinct sketch -------------------------------------
#
# The third sketch of the trio (membership = Bloom, frequency = Count-Min,
# cardinality = this).  Spark's approx_count_distinct is the production
# HLL++; this explicit register-table formulation exists for what the
# built-in cannot do as a black box: the REGISTERS are a first-class
# DataFrame keyed by (group, bucket), so per-partition / per-day sketches
# persist as tiny tables and any rollup (per-group -> global, daily ->
# monthly) is a groupBy(bucket).max(reg) MERGE — no rescan of the raw
# 100 TB, which is the entire point of a mergeable sketch.  Register
# updates are max() (associative, commutative), so partial aggregation
# bounds every task's shuffle at m rows per group.
#
# Determinism: md5-derived 60-bit hashes; rank-of-first-one computed via
# integer bit-length (length(bin(v)) — minimal-width in both engines), and
# the harmonic sum accumulates as EXACT scaled BIGINTs (term = 1 <<
# (rho_max - reg), zero buckets contribute 1 << rho_max), so the final
# double division is the only float op and both engines see identical
# bits.  No float pow, no float log anywhere.


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 9
) -> DataFrame:
    """(group..., bucket, reg) register table: bucket = low p hash bits,
    reg = max rank of the first set bit (from the top) of the remaining
    60-p bits, rank 1-based; a zero remainder ranks 60-p+1 (all zeros)."""
    m = 1 << p
    width = 60 - p
    key = F.col(key_col)
    h = md5_int64(key.cast("string"))
    v = F.shiftright(h, p)
    bitlen = F.when(v > 0, F.length(F.bin(v))).otherwise(F.lit(0))
    rho = (F.lit(width + 1) - bitlen).cast("int")
    return (
        df.where(key.isNotNull())
        .select(*group_cols, (h % F.lit(m)).alias("bucket"), rho.alias("__rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("reg"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to a coarser grouping (or to one global
    sketch with ``group_cols=[]``): max per bucket — the rollup that
    makes the sketch mergeable."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: DataFrame, group_cols: list[str], p: int = 9) -> DataFrame:
    """Cardinality estimate per group from a register table: the raw HLL
    harmonic-mean formula, with the 2^-reg sum carried as exact scaled
    integers (one BIGINT per non-empty bucket, empty buckets folded in as
    a count).  Columns: n_buckets_set, est (rounded 4).

    RAW formula only — accurate for n >> 2.5m; below that, production
    HLL++ switches to linear counting (m * ln(m / empty_buckets)), which
    is deliberately omitted here: ln() is not bit-reproducible across
    engines, and Spark's built-in ``approx_count_distinct`` already IS
    HLL++ when small-n accuracy matters.  This operator's value is the
    first-class register TABLE (persistable, mergeable with
    :func:`hll_merge`), not small-range bias handling."""
    m = 1 << p
    width = 60 - p
    rho_max = width + 1
    # 2^(rho_max - reg) via literal-array lookup: shiftleft() wants a
    # literal shift amount, same workaround as _mask8
    pow2 = F.array(*[F.lit(1 << i) for i in range(rho_max + 1)])
    term = F.element_at(pow2, (F.lit(rho_max) - F.col("reg") + F.lit(1)).cast("int"))
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets_set"),
        F.sum(term).alias("__sum_set"),
    )
    zeros = (F.lit(m) - F.col("n_buckets_set")).cast("long")
    sum_q = F.col("__sum_set") + zeros * F.lit(1 << rho_max)
    est = (
        F.lit(hll_alpha(m) * m * m * float(1 << rho_max))
        / sum_q.cast("double")
    )
    return agg.select(
        *group_cols,
        F.col("n_buckets_set").cast("long").alias("n_buckets_set"),
        F.round(est, 4).alias("est"),
    )


# --- KMV (k minimum values) ------------------------------------------------
#
# Beyer et al. 2007 "On synopses for distinct-value estimation under
# multiset operations".  The niche HLL cannot cover: a KMV sketch
# supports set INTERSECTION estimates (via the Jaccard of merged
# sketches), not just unions.  House md5 hashes make every estimate
# bit-reproducible across engines — the DuckDB twin recomputes the
# same k smallest hashes and the same estimator arithmetic exactly.

KMV_SPACE = float(1 << 60)  # md5_int64 is uniform on [0, 2^60)


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 128
) -> DataFrame:
    """(group..., pos, h): the k smallest distinct 60-bit hashes of
    ``key_col`` per group, 1-based ``pos``.  Scale shape: one distinct
    (hash dedup, map-side partial), one KEYED window bounded by group
    distinct-count — never a global sort; the sketch is k rows per
    group regardless of data volume."""
    from pyspark.sql.window import Window

    key = F.col(key_col)
    distinct = (
        df.where(key.isNotNull())
        .select(*group_cols, md5_int64(key.cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        distinct.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(*group_cols, "pos", "h")
    )


def kmv_merge(sketches: DataFrame, group_cols: list[str], k: int = 128) -> DataFrame:
    """Merge sketch rows down to a coarser grouping: distinct hashes,
    re-rank, keep k — the k smallest of a union of sets is computable
    from the per-set k smallest, which is what makes KMV mergeable."""
    from pyspark.sql.window import Window

    distinct = sketches.select(*group_cols, "h").distinct()
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        distinct.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(*group_cols, "pos", "h")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 128) -> DataFrame:
    """Distinct-count estimate per group: exact row count when the
    group never filled its sketch (< k distinct), else the unbiased
    (k-1) * SPACE / h_k estimator on the k-th smallest hash."""
    per = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("__hk"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("__hk").cast("double")
    )
    return per.select(
        *group_cols,
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.round(est, 4).alias("est_distinct"),
    )


def kmv_jaccard_pair(
    sketch: DataFrame,
    group_col: str,
    ga: str,
    gb: str,
    k: int = 128,
) -> DataFrame:
    """Jaccard / union / intersection estimates between two groups of
    one sketch table (Beyer et al. §5): merge the two sketches, take
    the k smallest of the union K, count how many members of K appear
    in BOTH input sketches (rho = |K ∩ A ∩ B| / |K|), then
    inter_est = rho * union_est.  One row out; every step is k-bounded
    so the comparison costs O(k log k) regardless of set sizes."""
    a = sketch.where(F.col(group_col) == ga).select("h")
    b = sketch.where(F.col(group_col) == gb).select("h")
    merged = kmv_merge(
        sketch.where(F.col(group_col).isin([ga, gb])).withColumn(
            "__g", F.lit(1)
        ),
        ["__g"],
        k,
    )
    in_a = merged.join(a, "h", "left_semi")
    in_both = in_a.join(b, "h", "left_semi")
    union_est = kmv_estimate(merged, ["__g"], k).select(
        "__g", F.col("est_distinct").alias("union_est")
    )
    counts = merged.groupBy("__g").agg(F.count(F.lit(1)).alias("k_used"))
    both = in_both.groupBy().agg(F.count(F.lit(1)).alias("n_both")).withColumn(
        "__g", F.lit(1)
    )
    out = (
        counts.join(both, "__g", "left")
        .na.fill({"n_both": 0})
        .join(union_est, "__g")
    )
    rho = F.col("n_both").cast("double") / F.col("k_used").cast("double")
    return out.select(
        F.lit(ga).alias("group_a"),
        F.lit(gb).alias("group_b"),
        F.col("k_used").cast("long").alias("k_used"),
        F.col("n_both").cast("long").alias("n_both"),
        F.round(rho, 4).alias("jaccard_est"),
        F.round(F.col("union_est"), 4).alias("union_est"),
        F.round(rho * F.col("union_est"), 4).alias("inter_est"),
    )


def bottomk_sample(
    df: DataFrame,
    id_col_expr: Column,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """(group..., pos, h, v): a MERGEABLE uniform-without-replacement
    sample per group — the k rows whose md5 hash of a unique row id is
    smallest.  Because the hash order is a fixed random permutation of
    the rows, the bottom-k of a union is computable from per-part
    bottom-ks (same algebra as KMV), which makes this the quantile
    entry in the mergeable-sketch family: keep k rows per group per
    partition/day, merge register tables, and read any quantile off the
    merged sample — the regime where ``approx_percentile`` can't merge
    across pre-aggregated stores.

    Scale shape mirrors :func:`kmv_sketch`: one keyed window bounded by
    group row-count; the sketch is k rows per group regardless of data
    volume.  Determinism: md5 order, so the DuckDB twin reproduces the
    exact sample."""
    from pyspark.sql.window import Window

    base = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        md5_int64(id_col_expr).alias("h"),
        F.col(value_col).alias("v"),
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        base.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(*group_cols, "pos", "h", "v")
    )


def bottomk_merge(
    samples: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge sample rows down to a coarser grouping: re-rank by hash,
    keep k — bottom-k of a union from per-set bottom-ks."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        samples.select(*group_cols, "h", "v")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(*group_cols, "pos", "h", "v")
    )


def bottomk_quantiles(
    sample: DataFrame, group_cols: list[str], qs: tuple = (0.5, 0.9)
) -> DataFrame:
    """Empirical quantiles of the sample: the value at rank
    ``ceil(q * n)`` of the sample ordered by value (n <= k rows per
    group, so the collect_list is sketch-bounded, never data-bounded).
    Identical construction in the SQL twin — same values, same ties."""
    agg = sample.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.array_sort(F.collect_list("v")).alias("__vs"),
    )
    cols = [*group_cols, F.col("n_sketch").cast("long").alias("n_sketch")]
    for q in qs:
        idx = F.ceil(F.lit(q) * F.col("n_sketch")).cast("int")
        cols.append(
            F.element_at("__vs", idx).alias(f"p{int(q * 100)}")
        )
    return agg.select(*cols)


# --- AMS F2 (tug-of-war) second frequency moment ---------------------------
# Alon, Matias & Szegedy 1996: F2 = sum_v f_v^2 — the self-join /
# shuffle-output size of a key column, estimable in ONE pass with R
# counters instead of a full groupBy.  Each estimator r keeps
# Z_r = sum_v f_v * sign_r(v) with 4-wise-independent signs; E[Z^2] = F2.
# Median-of-means over the R counters gives the concentration bound.
# Determinism: signs come from md5 parity (functions.md5_int64), so a
# DuckDB twin replays every counter bit-for-bit; the means (/group_size)
# and the even-count median ((m1+m2)/2) are dyadic divisions of
# integers, hence exact doubles on both engines.

AMS_ROWS = 16
AMS_GROUP = 4


def ams_sign(r: int, key: Column) -> Column:
    """±1 sign of ``key`` for estimator row ``r``: md5("<r>:" + key) parity."""
    h = md5_int64(F.concat(F.lit(f"{r}:"), key.cast("string")))
    return F.lit(1) - F.lit(2) * (h % F.lit(2))


def ams_f2(
    df: DataFrame,
    key_col: str,
    rows: int = AMS_ROWS,
    group_size: int = AMS_GROUP,
    round_digits: int = 6,
) -> DataFrame:
    """F2 estimate + exact F2 + relative error for ``key_col`` (nulls
    excluded on both paths).  The estimator is ONE full-table aggregate
    with ``rows`` sum columns — map-side partials, no shuffle wider
    than one row — which is the point: at 100 TB this prices a
    self-join / heavy-hitter skew BEFORE paying the groupBy that the
    exact path (here, the verification arm) requires.
    """
    if rows % group_size != 0 or (rows // group_size) % 2 != 0:
        raise ValueError("rows must split into an even number of groups")
    key = F.col(key_col)
    base = df.where(key.isNotNull())
    sums = base.agg(
        *[F.sum(ams_sign(r, key)).alias(f"__z{r}") for r in range(rows)]
    )
    n_groups = rows // group_size
    means = [
        sum(
            [
                (F.col(f"__z{g * group_size + i}") * F.col(f"__z{g * group_size + i}")).cast("double")
                for i in range(group_size)
            ],
            F.lit(0.0),
        )
        / F.lit(float(group_size))
        for g in range(n_groups)
    ]
    sorted_means = F.array_sort(F.array(*means))
    est = (
        F.element_at(sorted_means, n_groups // 2)
        + F.element_at(sorted_means, n_groups // 2 + 1)
    ) / F.lit(2.0)
    exact = (
        base.groupBy(key.alias("__k"))
        .agg(F.count(F.lit(1)).alias("__f"))
        .agg(F.sum(F.col("__f") * F.col("__f")).alias("f2_exact"))
    )
    return (
        sums.crossJoin(F.broadcast(exact))
        .select(
            est.alias("f2_estimate"),
            F.col("f2_exact").cast("long").alias("f2_exact"),
            F.round(
                F.abs(est - F.col("f2_exact").cast("double"))
                / F.col("f2_exact").cast("double"),
                round_digits,
            ).alias("rel_error"),
        )
    )


def ams_f2_sql(
    table: str,
    key_col: str,
    rows: int = AMS_ROWS,
    group_size: int = AMS_GROUP,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`ams_f2`: same md5-parity signs, same
    mean/median dyadic arithmetic."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    def sign(r: int) -> str:
        h = md5_int64_sql(f"'{r}:' || CAST({key_col} AS VARCHAR)")
        return f"(1 - 2 * (({h}) % 2))"

    zsums = ",\n                 ".join(
        f"sum({sign(r)}) AS z{r}" for r in range(rows)
    )
    n_groups = rows // group_size
    mean_exprs = ", ".join(
        "("
        + " + ".join(
            f"CAST(z{g * group_size + i} * z{g * group_size + i} AS DOUBLE)"
            for i in range(group_size)
        )
        + f") / {float(group_size)}"
        for g in range(n_groups)
    )
    mid = n_groups // 2
    return f"""
        WITH sums AS (
          SELECT {zsums}
          FROM {table} WHERE {key_col} IS NOT NULL),
        m AS (
          SELECT list_sort([{mean_exprs}]) AS ms FROM sums),
        est AS (
          SELECT (ms[{mid}] + ms[{mid + 1}]) / 2.0 AS f2_estimate FROM m),
        ex AS (
          SELECT sum(f * f) AS f2_exact FROM (
            SELECT count(*) AS f FROM {table}
            WHERE {key_col} IS NOT NULL GROUP BY {key_col}))
        SELECT f2_estimate,
               CAST(f2_exact AS BIGINT) AS f2_exact,
               round(abs(f2_estimate - CAST(f2_exact AS DOUBLE))
                     / CAST(f2_exact AS DOUBLE), {round_digits}) AS rel_error
        FROM est CROSS JOIN ex
    """


def cms_join_size(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    d: int = 4,
    w: int = 512,
    round_digits: int = 6,
) -> DataFrame:
    """Inner-join OUTPUT-SIZE estimate from two Count-Min sketches
    (Cormode & Muthukrishnan 2005, the inner-product query): |A ⋈ B| =
    sum_k f_A(k)*f_B(k), estimated as the MIN over the d rows of the
    sketch dot product sum_c row_A[c]*row_B[c] — an upper bound that
    tightens with w.  Two scan-bound sketch builds (d*w counter rows
    each) price a join before paying its shuffle: the companion of
    `ams_f2` (self-join size) for the two-table case.

    The verification arm computes the exact size from the two key
    histograms.  All arithmetic is exact integers; the estimate-vs-
    exact ratio is the one double.
    """
    sa = cms_build(left, left_key, d, w)
    sb = cms_build(right, right_key, d, w)
    per_row = (
        sa.alias("a")
        .join(sb.alias("b"), (F.col("a.r") == F.col("b.r")) & (F.col("a.c") == F.col("b.c")))
        .groupBy(F.col("a.r").alias("r"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("__dot"))
    )
    est = per_row.agg(F.min("__dot").alias("join_size_est"))
    fa = left.where(F.col(left_key).isNotNull()).groupBy(
        F.col(left_key).alias("__k")
    ).agg(F.count(F.lit(1)).alias("__fa"))
    fb = right.where(F.col(right_key).isNotNull()).groupBy(
        F.col(right_key).alias("__k")
    ).agg(F.count(F.lit(1)).alias("__fb"))
    exact = fa.join(fb, "__k").agg(
        F.sum(F.col("__fa") * F.col("__fb")).alias("join_size_exact")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("join_size_est").cast("long").alias("join_size_est"),
        F.col("join_size_exact").cast("long").alias("join_size_exact"),
        F.round(
            F.col("join_size_est").cast("double")
            / F.col("join_size_exact").cast("double"),
            round_digits,
        ).alias("overestimate_ratio"),
    )


def cms_join_size_sql(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    d: int = 4,
    w: int = 512,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`cms_join_size` — same md5 cells, same
    min-of-row dot products."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    def cells(table, key, name):
        parts = []
        for r in range(d):
            h = md5_int64_sql(f"'{r}:' || CAST({key} AS VARCHAR)")
            parts.append(
                f"SELECT {r} AS r, ({h}) % {w} AS c"
                f" FROM {table} WHERE {key} IS NOT NULL"
            )
        rows = " UNION ALL ".join(parts)
        return f"{name} AS (SELECT r, c, count(*) AS cnt FROM ({rows}) GROUP BY r, c)"

    return f"""
        WITH {cells(left_table, left_key, "sa")},
        {cells(right_table, right_key, "sb")},
        per_row AS (
          SELECT sa.r, sum(sa.cnt * sb.cnt) AS dot
          FROM sa JOIN sb ON sa.r = sb.r AND sa.c = sb.c
          GROUP BY sa.r),
        est AS (SELECT min(dot) AS join_size_est FROM per_row),
        fa AS (SELECT {left_key} AS k, count(*) AS f FROM {left_table}
               WHERE {left_key} IS NOT NULL GROUP BY 1),
        fb AS (SELECT {right_key} AS k, count(*) AS f FROM {right_table}
               WHERE {right_key} IS NOT NULL GROUP BY 1),
        ex AS (SELECT sum(fa.f * fb.f) AS join_size_exact
               FROM fa JOIN fb USING (k))
        SELECT CAST(join_size_est AS BIGINT) AS join_size_est,
               CAST(join_size_exact AS BIGINT) AS join_size_exact,
               round(CAST(join_size_est AS DOUBLE)
                     / CAST(join_size_exact AS DOUBLE), {round_digits})
                 AS overestimate_ratio
        FROM est CROSS JOIN ex
    """
