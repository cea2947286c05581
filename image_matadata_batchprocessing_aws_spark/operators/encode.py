"""Global label encoding (SURVEY A8).

The reference fits ``LabelEncoder`` per 100k-row chunk
(``Image_Train_Model/read_csv_s3_train.py:96-100``) so the same category
can map to different codes in different chunks — a correctness bug we
deliberately fix: codes are fit **globally** over sorted distinct values
(dense codes ``0..n-1``, lexicographic — sklearn's convention).

Scale: the dictionary is distinct-cardinality-sized, not data-sized, and
``max_distinct`` (default 100k) caps it — a dictionary past that is not a
dictionary any more.  Codes are assigned from the driver-sorted collected
distincts (an O(cardinality) collect, already bounded by the cap), never
from an unpartitioned window.  Small dictionaries (<= ``map_literal_cap``)
become a map-side literal lookup — zero joins, so a 7-column encode stays
one narrow stage; larger ones fall back to an explicit broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def label_encode(
    df: DataFrame,
    cols: list[str],
    suffix: str = "",
    max_distinct: int | None = 100_000,
    map_literal_cap: int = 1024,
) -> DataFrame:
    """Replace each column's values with dense int codes 0..n_distinct-1
    assigned in ascending value order (nulls keep null)."""
    out = df
    if max_distinct is not None and cols:
        # one job for every column's cardinality guard, not one per column
        approxes = df.agg(
            *[F.approx_count_distinct(F.col(f"`{c}`")).alias(c) for c in cols]
        ).collect()[0]
        for c in cols:
            # approx_count_distinct standard error ~2%; 1.1 margin keeps the guard honest
            if approxes[c] > max_distinct * 1.1:
                raise ValueError(
                    f"label_encode({c}): ~{approxes[c]} distincts exceeds cap {max_distinct}"
                )
    field_type = {f.name: f.dataType for f in df.schema.fields}
    # ONE job collects every column's distincts: collect_set does map-side
    # partial dedup per column, so a k-column encode is guard-job +
    # distinct-job = 2 jobs total, not k+1.  Driver memory is bounded by
    # the cardinality guard above (collect_set drops nulls, matching the
    # old per-column isNotNull/distinct path).
    if cols:
        sets = df.agg(
            *[F.collect_set(F.col(f"`{c}`")).alias(c) for c in cols]
        ).collect()[0]
    for c in cols:
        vals = list(sets[c])
        if max_distinct is not None and len(vals) > max_distinct:
            raise ValueError(
                f"label_encode({c}): {len(vals)} distincts exceeds cap {max_distinct}"
            )
        # Python sort on str is code-point order == UTF-8 binary order ==
        # Spark/DuckDB default string ordering, so codes match an engine-side
        # ORDER BY assignment
        vals.sort()
        if len(vals) <= map_literal_cap:
            pairs = []
            for code, v in enumerate(vals):
                pairs += [F.lit(v), F.lit(code)]
            lookup = (
                F.try_element_at(F.create_map(*pairs), F.col(f"`{c}`"))
                if pairs
                else F.lit(None).cast("int")
            )
            out = out.withColumn(c + suffix, lookup)
        else:
            dictionary = df.sparkSession.createDataFrame(
                [(v, code) for code, v in enumerate(vals)],
                schema=T.StructType(
                    [
                        T.StructField("__val", field_type[c]),
                        T.StructField("__code", T.IntegerType()),
                    ]
                ),
            )
            out = (
                out.join(F.broadcast(dictionary), out[c] == dictionary["__val"], "left")
                .withColumn(c + suffix, F.col("__code"))
                .drop("__val", "__code")
            )
    return out


def one_hot_encode(
    df: DataFrame,
    cols: list[str],
    categories: dict[str, list] | None = None,
    max_distinct: int = 64,
) -> DataFrame:
    """Indicator-column expansion (sklearn ``OneHotEncoder`` /
    ``pd.get_dummies``): each input column gains one ``{col}_{value}``
    0/1 column per category; null inputs encode as all-zeros (sklearn
    ``handle_unknown='ignore'`` convention).

    ``categories`` pins the domain explicitly (schema stability across
    runs/partitions of a pipeline — the production default: a one-hot
    SCHEMA that depends on which values happened to be present is a
    training-serving skew bug).  When omitted, the domain is fit with
    one job over all columns (same single-job pattern as
    :func:`label_encode`) and guarded by ``max_distinct`` — one-hot past
    ~dozens of categories is a sparse-matrix problem, not a
    wide-DataFrame problem.  Encoding itself is pure map-side
    comparisons — no join, no shuffle, whole-stage codegen."""
    if categories is None:
        sets = df.agg(
            *[F.collect_set(F.col(f"`{c}`")).alias(c) for c in cols]
        ).collect()[0]
        categories = {}
        for c in cols:
            vals = sorted(sets[c])
            if len(vals) > max_distinct:
                raise ValueError(
                    f"one_hot_encode({c}): {len(vals)} categories exceeds "
                    f"cap {max_distinct}; pass an explicit domain or use "
                    "label_encode + embedding instead"
                )
            categories[c] = vals
    out = df
    for c in cols:
        for v in categories[c]:
            out = out.withColumn(
                f"{c}_{v}",
                F.when(F.col(f"`{c}`") == F.lit(v), 1).otherwise(0).cast("int"),
            )
    return out


def target_encode(
    df: DataFrame,
    cat_cols: list[str],
    target_col: str,
    suffix: str = "_te",
    leave_one_out: bool = True,
    target_digits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Target (mean) encoding of categorical columns: each category maps
    to the mean of ``target_col`` within it.  With ``leave_one_out``
    (the default) a row's own target is excluded from its encoding —
    ``(sum - y) / (n - 1)`` — the standard leakage guard for training
    features (a category's row must not see its own label); singleton
    categories encode NULL under LOO (no other evidence exists —
    impute downstream, explicitly).

    Exactness (house playbook): targets quantize to scaled BIGINTs so
    the per-category sums are associative — the encoding is then a
    per-row scalar on exact integers, bit-identical across engines and
    partitionings.  Plan: one groupBy per encoded column (category-
    sized result, broadcast back), then map-side arithmetic."""
    scale = float(10**target_digits)
    ys = F.round(F.col(target_col) * F.lit(scale)).cast("long")
    out = df.withColumn("__ys", ys)
    for c in cat_cols:
        stats = (
            out.groupBy(F.col(f"`{c}`").alias("__cat"))
            .agg(F.sum("__ys").alias("__sum"), F.count("__ys").alias("__cnt"))
        )
        joined = out.join(
            F.broadcast(stats), out[f"`{c}`"] == stats["__cat"], "left"
        ).drop("__cat")
        if leave_one_out:
            enc = F.when(
                F.col("__cnt") > 1,
                (F.col("__sum") - F.col("__ys")).cast("double")
                / (F.col("__cnt") - 1).cast("double")
                / F.lit(scale),
            )
        else:
            enc = (
                F.col("__sum").cast("double")
                / F.col("__cnt").cast("double")
                / F.lit(scale)
            )
        out = joined.withColumn(c + suffix, F.round(enc, round_digits)).drop(
            "__sum", "__cnt"
        )
    return out.drop("__ys")
