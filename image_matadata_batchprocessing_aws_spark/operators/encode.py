"""Global label encoding (SURVEY A8).

The reference fits ``LabelEncoder`` per 100k-row chunk
(``Image_Train_Model/read_csv_s3_train.py:96-100``) so the same category
can map to different codes in different chunks — a correctness bug we
deliberately fix: codes are fit **globally** over sorted distinct values
(dense codes ``0..n-1``, lexicographic — sklearn's convention).

Scale: the dictionary is distinct-cardinality-sized, not data-sized; the
window that assigns codes runs over that small set only, and the join
back is an explicit broadcast.  Guard high-cardinality columns with
``max_distinct`` (``approx_count_distinct`` pre-check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def label_encode(
    df: DataFrame,
    cols: list[str],
    suffix: str = "",
    max_distinct: int | None = 10_000_000,
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
            if approxes[c] > max_distinct:
                raise ValueError(
                    f"label_encode({c}): ~{approxes[c]} distincts exceeds cap {max_distinct}"
                )
    for c in cols:
        cq = F.col(f"`{c}`")
        dictionary = (
            df.select(cq.alias("__val"))
            .where(F.col("__val").isNotNull())
            .distinct()
            .withColumn("__code", (F.dense_rank().over(Window.orderBy(F.col("__val"))) - 1))
        )
        out = (
            out.join(F.broadcast(dictionary), out[c] == dictionary["__val"], "left")
            .withColumn(c + suffix, F.col("__code"))
            .drop("__val", "__code")
        )
    return out
