"""Reproducible sampling and sequence packing (Stage 5 / north star).

The reference samples with framework RNG (``DataLoader(shuffle=True)``
``train.py:144``; ``random_split``
``Best-Model-architecture-for-local.py:106-109``) — fine for a training
consumer, wrong for a data *pipeline*, where a sample must be (a)
reproducible across reruns/engines, (b) consistent under re-partitioning,
and (c) stable when the corpus grows (a doc's in/out decision never flips
because unrelated rows arrived).  Hash-based sampling gives all three:
``keep iff h(key, salt) mod D < fraction * D``.  ``rand(seed)``-based
sampling gives none (it is ordering/partitioning-dependent).

Scale design: the sample predicate is a pure map-side filter — pushes
past projections, costs zero shuffles, and composes with partition
pruning.  Stratified sampling is the same predicate with a per-stratum
fraction looked up from a broadcast-sized literal map.

Sequence packing (GPT-style pretraining prep): documents concatenated in
a deterministic order and cut into fixed token-budget context windows;
``pack_id = floor(exclusive_cumsum(tokens) / budget)`` assigns each doc
to the window where it starts.  One window-function pass; the global
ordering requirement is the same single-ordering constraint as W1
(ffill) and shares its mitigation — at 100 TB, pack within hash-bucketed
shards (``partition_by``) so each shard packs independently in parallel,
which is also what training actually wants (one packed stream per
data-parallel rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window

from image_matadata_batchprocessing_aws_spark.functions import md5_int64, md5_int64_sql

#: Denominator for the keep-threshold (basis points of basis points —
#: fraction resolution 1e-8, plenty for corpus sampling).
SAMPLE_DENOM = 100_000_000

#: Delimiter between key and salt before hashing: without one,
#: (key='ab', salt='c') and (key='a', salt='bc') hash identically, so
#: differently-salted samples are not independent for adversarial pairs.
#: Unit separator — expressible as chr(31) in SQL, never in real keys.
SAMPLE_DELIM = "\x1f"


def sample_predicate(key: Column | str, fraction: float, salt: str = "") -> Column:
    """Deterministic keep-predicate: stable under reruns, partitioning,
    and corpus growth.  ``salt`` decorrelates independent samples drawn
    from the same keys (e.g. train vs holdout)."""
    c = F.col(key) if isinstance(key, str) else key
    h = md5_int64(F.concat(c.cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt)))
    return (h % SAMPLE_DENOM) < int(fraction * SAMPLE_DENOM)


def sample_predicate_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """DuckDB twin of :func:`sample_predicate` (salt single-quote-escaped)."""
    lit = salt.replace("'", "''")
    h = md5_int64_sql(f"CAST({key_expr} AS VARCHAR) || chr(31) || '{lit}'")
    return f"({h} % {SAMPLE_DENOM}) < {int(fraction * SAMPLE_DENOM)}"


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per ``key``."""
    return df.where(sample_predicate(key, fraction, salt))


def hash_sample_stratified(
    df: DataFrame, key: str, strata: str, fractions: dict, salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample English to 10%
    but keep 100% of low-resource languages.  ``fractions`` maps stratum
    value -> fraction; absent strata are dropped (fraction 0)."""
    c = F.col(key)
    h = md5_int64(F.concat(c.cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))) % SAMPLE_DENOM
    thresh = F.lit(0)
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata) == F.lit(value), F.lit(int(frac * SAMPLE_DENOM))).otherwise(thresh)
    return df.where(h < thresh)


def shuffle_deterministic(
    df: DataFrame, key: str, seed: str = "", out: str = "shuffle_pos"
) -> DataFrame:
    """O3 — reproducible global shuffle (the engine-surface upgrade of the
    reference's ``DataLoader(shuffle=True)`` / ``orderBy(rand(seed))``):
    rows are permuted by ``md5(key, seed)``, so the order is stable across
    reruns, partitionings, and engines — and a different ``seed`` gives an
    independent permutation.  Position assignment runs the two-pass global
    numbering (range shuffle + per-partition window + broadcast prefix
    offsets), never a single-partition window; ``key`` breaks md5-collision
    ties deterministically."""
    from image_matadata_batchprocessing_aws_spark.operators.batching import global_row_number

    h = md5_int64(
        F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(str(seed)))
    )
    return global_row_number(df.withColumn("__sh", h), ["__sh", key], out).drop("__sh")


def shuffle_sql(key_expr: str, seed: str = "") -> str:
    """DuckDB ORDER BY twin of :func:`shuffle_deterministic`'s hash."""
    lit = str(seed).replace("'", "''")
    return md5_int64_sql(f"CAST({key_expr} AS VARCHAR) || chr(31) || '{lit}'")


def quota_sample(
    df: DataFrame,
    key: str,
    strata: str,
    n_per_stratum: int,
    salt: str = "",
    out: str = "quota_rank",
) -> DataFrame:
    """EXACT-size per-stratum sampling: precisely ``n_per_stratum`` rows
    from each stratum (or all of it, if smaller), chosen by hash order —
    the quota analogue of :func:`hash_sample_stratified`, for when the
    spec says "exactly 10k docs per language", not "roughly 10%".

    Deterministic and rerun/partitioning-stable like every sampler here;
    NOT growth-stable (a new doc hashing into the top-N evicts the old
    rank-N doc — inherent to any exact-quota rule).  The ranking window
    partitions BY STRATUM, so work parallelizes across strata and no
    single-partition window exists at any corpus size; a mega-stratum is
    still one partition's sort — shard such strata first or fall back to
    the fractional sampler."""
    h = md5_int64(
        F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
    )
    w = Window.partitionBy(strata).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn(out, F.row_number().over(w).cast("long"))
        .where(F.col(out) <= n_per_stratum)
    )


def token_budget_select(
    df: DataFrame,
    key: str,
    strata: str,
    token_col: str,
    budget: int,
    salt: str = "",
    out: str = "budget_used",
) -> DataFrame:
    """Greedy token-budget corpus selection: per stratum, take docs in
    hash order until the cumulative token count reaches ``budget`` —
    "fill 1B tokens per language" as one window pass.  A doc is kept iff
    the budget has room for ALL its tokens (inclusive running sum <=
    budget: no partial documents, matching how pretraining mixtures are
    specified).  ``out`` reports the running total through each kept doc.

    Same scale shape as :func:`quota_sample`: per-stratum window, no
    global sort, deterministic under reruns and re-partitioning."""
    h = md5_int64(
        F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
    )
    w = (
        Window.partitionBy(strata)
        .orderBy(h.asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(out, F.sum(token_col).over(w).cast("long"))
        .where(F.col(out) <= budget)
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    salt: str = "",
    out: str = "wkey",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``n`` rows
    (Efraimidis–Spirakis A-Res, public algorithm): each row draws a
    deterministic uniform u from ``md5(key, salt)`` and ranks by
    ``ln(u) / weight`` descending — inclusion probability proportional
    to weight, no replacement, one pass.

    Scale shape: the rank key is a pure map-side expression and the
    global top-n plans as ``TakeOrderedAndProject`` (per-partition
    partial top-n, then a driver-side merge of n-row heads) — no global
    sort, no single-partition window.  Deterministic under reruns and
    re-partitioning like every sampler here; the key is ``round(_, 12)``
    with the row key as tiebreak so the cutoff is engine-portable.
    Weights must be > 0 (rows with null/non-positive weight are
    dropped, matching "a zero-weight doc is never sampled")."""
    h = md5_int64(
        F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
    )
    # u in (0, 1]: +1 keeps ln() finite at the h % D == -? floor; md5_int64
    # is non-negative so h % D is in [0, D)
    u = (h % SAMPLE_DENOM + 1) / F.lit(float(SAMPLE_DENOM + 1))
    wkey = F.round(F.log(u) / F.col(weight_col), 12)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn(out, wkey)
        .orderBy(F.col(out).desc(), F.col(key).asc())
        .limit(n)
    )


def weighted_sample_sql(
    key_expr: str, weight_expr: str, n: int, salt: str = ""
) -> str:
    """DuckDB ORDER BY/LIMIT twin of :func:`weighted_sample`'s ranking
    (returns the ORDER BY ... LIMIT suffix operand expressions)."""
    lit = salt.replace("'", "''")
    h = md5_int64_sql(f"CAST({key_expr} AS VARCHAR) || chr(31) || '{lit}'")
    return (
        f"round(ln((({h}) % {SAMPLE_DENOM} + 1) / {float(SAMPLE_DENOM + 1)!r}) "
        f"/ ({weight_expr}), 12)"
    )


def pack_documents(
    df: DataFrame,
    token_col: str,
    order_by: str,
    budget: int,
    partition_by: str | None = None,
    out_pack: str = "pack_id",
    out_offset: str = "pack_offset",
) -> DataFrame:
    """Assign each document a context-window ``pack_id`` and its token
    ``offset`` within the concatenated stream (exclusive running sum over
    a deterministic order).  ``partition_by`` shards the stream so packing
    parallelizes (pack ids are then per-shard)."""
    keys = [partition_by] if partition_by else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn(out_offset, offset).withColumn(
        out_pack, (F.col(out_offset) / F.lit(budget)).cast("long")
    )


def split_assign(
    df: DataFrame, key: str, fractions: list, salt: str = ""
) -> DataFrame:
    """Deterministic disjoint-cover split (train/val/test): one hash per
    key, bucketed by cumulative thresholds — every row lands in exactly
    one split, stable under reruns, partitioning, and corpus growth
    (unlike seeded randomSplit, whose assignment changes with
    partitioning).  ``fractions`` is [(name, fraction), ...]; the last
    split absorbs rounding slack.  Pure map-side expression."""
    c = F.col(key)
    h = (
        md5_int64(F.concat(c.cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt)))
        % SAMPLE_DENOM
    )
    expr = F.lit(fractions[-1][0])
    acc = 0.0
    bounds = []
    for name, frac in fractions[:-1]:
        acc += frac
        bounds.append((name, int(acc * SAMPLE_DENOM)))
    for name, bound in reversed(bounds):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_assign_sql(key_expr: str, fractions: list, salt: str = "") -> str:
    """DuckDB twin of :func:`split_assign`'s split expression."""
    lit = salt.replace("'", "''")
    h = f"({md5_int64_sql(f'CAST({key_expr} AS VARCHAR) || chr(31) || {chr(39)}{lit}{chr(39)}')} % {SAMPLE_DENOM})"
    acc = 0.0
    cases = []
    for name, frac in fractions[:-1]:
        acc += frac
        cases.append(f"WHEN {h} < {int(acc * SAMPLE_DENOM)} THEN '{name}'")
    return f"(CASE {' '.join(cases)} ELSE '{fractions[-1][0]}' END)"


def weighted_sample_grouped(
    df: DataFrame,
    key: str,
    group: str,
    weight_col: str,
    n_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Per-stratum A-Res: :func:`weighted_sample`'s rank key, cut at n
    WITHIN each group by a window partitioned on the stratum — the
    "n docs per language, preferring long ones" mixture spec.  One
    shuffle on the group key; the global variant's TakeOrderedAndProject
    becomes a per-group top-n."""
    h = md5_int64(
        F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
    )
    u = (h % SAMPLE_DENOM + 1) / F.lit(float(SAMPLE_DENOM + 1))
    wkey = F.round(F.log(u) / F.col(weight_col), 12)
    w = Window.partitionBy(group).orderBy(F.col("__wkey").desc(), F.col(key).asc())
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__wkey", wkey)
        .withColumn("wrank", F.row_number().over(w).cast("long"))
        .where(F.col("wrank") <= n_per_group)
        .drop("__wkey")
    )


def negative_sample(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    seed: int = 1,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive-pair
    building: each anchor draws ``k`` pseudo-random corpus rows via
    hash-derived indices into an id-ordered corpus index —
    ``idx_j = md5(anchor || j || seed) % N``.  Hash-derived like every
    sampler in this module: rerun-stable, partitioning-independent, and
    SQL-expressible, so the draw is exactly oracle-able.

    An anchor that draws ITSELF drops that draw (no redraw — a
    deterministic redraw chain is unbounded; callers needing exactly k
    request k+1 and trim).  Returns (anchor_id, neg_rank, neg_id).

    Scale shape: the corpus index comes from the two-pass
    :func:`~image_matadata_batchprocessing_aws_spark.operators.batching.global_row_number`
    (range shuffle + broadcast offsets, no single-partition window); the
    draw table is anchors x k rows built map-side; resolution is one
    equi-join on the index (AQE broadcasts it when the anchor set is
    small).  N is a 1-row count — fit-statistic class."""
    from image_matadata_batchprocessing_aws_spark.operators.batching import (
        global_row_number,
    )

    n = corpus.select(id_col).count()
    if n == 0:
        raise ValueError("negative_sample: empty corpus")
    indexed = global_row_number(corpus.select(id_col), [id_col], out="__idx")
    draws = anchors.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id",
        F.posexplode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_rank", "__j"),
    )
    h = md5_int64(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(SAMPLE_DELIM),
            F.col("__j").cast("string"),
            F.lit(SAMPLE_DELIM),
            F.lit(str(seed)),
        )
    )
    draws = draws.withColumn("__idx", F.pmod(h, F.lit(n)).cast("long")).drop("__j")
    return (
        draws.join(indexed, "__idx")
        .where(F.col(id_col) != F.col("anchor_id"))
        .select("anchor_id", "neg_rank", F.col(id_col).alias("neg_id"))
    )


def neyman_stratified_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    value_col: str,
    budget: int,
    salt: str = "",
    value_digits: int = 4,
) -> DataFrame:
    """NEYMAN-ALLOCATION stratified sampling: a total ``budget`` of
    rows splits across strata proportionally to ``N_h * sd_h`` — the
    variance-minimizing allocation for estimating the population mean
    (Neyman 1934), i.e. volatile strata get oversampled relative to
    their size.  The fixed-fraction :func:`hash_sample_stratified`
    is what you use when fractions are policy; this is what you use
    when they should be OPTIMAL for a measurement budget.

    Everything is engine-portable integer arithmetic: per-stratum
    (N, sum, sum-of-squares) integer sufficient statistics -> sd
    quantized to a scaled BIGINT -> allocation by integer floor
    division -> per-row md5 keep-predicate at ``alloc/N`` (ppm).  The
    allocation table is stratum-sized and broadcasts; the keep test is
    map-side.  Degenerate strata (N < 2 or zero spread) get
    proportional-to-size allocation via a 1-unit weight floor so they
    are never silently dropped.

    Returns the sampled rows with ``__alloc`` (the stratum's target)
    attached for audit.
    """
    from image_matadata_batchprocessing_aws_spark.operators.stats import TWO30

    scale = float(10**value_digits)
    xs = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    per = (
        df.select(F.col(stratum_col).alias("__s"), xs.alias("__x"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__x").alias("__sx"),
            F.sum(F.shiftright(F.col("__x") * F.col("__x"), 30)).alias("__q_hi"),
            F.sum((F.col("__x") * F.col("__x")).bitwiseAND(F.lit(TWO30 - 1))).alias(
                "__q_lo"
            ),
        )
    )
    nd = F.col("__n").cast("double")
    s = F.col("__sx").cast("double") / F.lit(scale)
    q = (
        F.col("__q_hi").cast("double") * F.lit(float(TWO30))
        + F.col("__q_lo").cast("double")
    ) / F.lit(scale * scale)
    sd = F.when(
        (F.col("__n") >= 2), F.sqrt(F.greatest((q - s * s / nd) / (nd - F.lit(1.0)), F.lit(0.0)))
    ).otherwise(F.lit(0.0))
    # integer weight: N_h * round(sd * 1e4), floored at 1 so degenerate
    # strata keep proportional presence
    w = F.greatest(
        F.col("__n") * F.round(sd * F.lit(10000.0)).cast("long"), F.col("__n")
    )
    weights = per.select("__s", "__n", w.alias("__w"))
    tot = weights.agg(F.sum("__w").alias("__wsum"))
    alloc = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn(
            # int64-safe while budget * max(N_h * sd_scaled) < 2^63
            # (comfortably true at any realistic budget; promote to
            # decimal(38,0) past that)
            "__alloc",
            F.least(
                F.expr(f"({budget}L * __w) div __wsum"), F.col("__n")
            ),
        )
        .select("__s", "__n", "__alloc")
    )
    h = (
        md5_int64(
            F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
        )
        % SAMPLE_DENOM
    )
    joined = df.join(
        F.broadcast(alloc), df[stratum_col] == alloc["__s"]
    ).drop("__s")
    keep = h < F.expr(f"(__alloc * {SAMPLE_DENOM}L) div __n")
    return joined.where(keep).drop("__n")


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    salt: str = "gkf",
) -> DataFrame:
    """GROUP k-fold assignment: every row of one ``group_col`` value
    lands in the SAME fold (fold = md5(group, salt) % k), the leakage
    guard plain random folds lack — near-duplicate documents from one
    source/site must never straddle train and eval.  Deterministic,
    rerun- and partitioning-stable, and growth-stable (new rows of a
    known group join its existing fold) — the same md5 discipline as
    :func:`hash_sample`.  Adds a ``fold`` column; map-side only.
    """
    h = md5_int64(
        F.concat(F.col(group_col).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
    )
    return df.withColumn("fold", (h % F.lit(k)).cast("long"))


def group_kfold_sql_expr(group_col: str, k: int = 5, salt: str = "gkf") -> str:
    """DuckDB twin of the :func:`group_kfold` fold expression."""
    h = md5_int64_sql(f"CAST({group_col} AS VARCHAR) || chr(31) || '{salt}'")
    return f"CAST(({h}) % {k} AS BIGINT)"


TEMP_RATE_DENOM = 1_000_000  # per-stratum keep rates quantize to ppm


def temperature_rates(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_total: int = 1000,
    pow_digits: int = 6,
) -> DataFrame:
    """Temperature-scaled mixture rates (the multilingual-LLM staple:
    mC4 / XLM-R sample language l with share n_l^alpha / sum n_m^alpha,
    alpha<1 upweights low-resource strata): per stratum, its size, its
    target share, and the ppm keep-rate min(1, target_total*share/n_l).
    A stratum whose rate clamps at 1 yields fewer rows than its target;
    the report keeps that visible rather than re-normalizing silently
    (waterfilling is a policy choice, not a default).

    Determinism: n^alpha quantizes to a BIGINT at ``pow_digits`` before
    the stratum-count-row sum (libm pow may differ a last ulp across
    engines; the quantization dominates it — the PMI/log precedent),
    and the final rate is an exact integer ppm.
    """
    pscale = float(10**pow_digits)
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    powq = F.round(
        F.pow(F.col("n_rows").cast("double"), F.lit(alpha)) * F.lit(pscale)
    ).cast("long")
    with_p = counts.select("stratum", "n_rows", powq.alias("__pq"))
    tot = with_p.agg(F.sum("__pq").alias("__tot"))
    share = F.col("__pq").cast("double") / F.col("__tot").cast("double")
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_total)) * share / F.col("n_rows").cast("double"),
    )
    return with_p.crossJoin(F.broadcast(tot)).select(
        "stratum",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(share, 6).alias("target_share"),
        F.round(rate * F.lit(float(TEMP_RATE_DENOM))).cast("long").alias("rate_ppm"),
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    alpha: float = 0.5,
    target_total: int = 1000,
    salt: str = "temp-v1",
) -> DataFrame:
    """Apply :func:`temperature_rates` with the house deterministic
    md5 predicate — map-side after one broadcast of the stratum-sized
    rate table; rerun/partitioning/growth-stable like every sampler
    here."""
    rates = temperature_rates(df, stratum_col, alpha, target_total)
    h = md5_int64(
        F.concat(F.col(key).cast("string"), F.lit(SAMPLE_DELIM), F.lit(salt))
    )
    return (
        df.join(
            F.broadcast(rates.select(F.col("stratum").alias(stratum_col), "rate_ppm")),
            stratum_col,
        )
        .where((h % F.lit(TEMP_RATE_DENOM)) < F.col("rate_ppm"))
        .drop("rate_ppm")
    )
