"""Skew mitigation operators: salted join and skew-safe exact distinct.

Where salting does and does NOT help in Spark:

- Algebraic aggregates (sum/count/min/max) need NO salting: hash
  aggregation runs map-side partials, so a hot key leaves each map task
  as one row regardless of skew.
- Exact count-distinct DOES skew: partials can't shrink below the
  distinct set, and the hot key's whole value set lands on one reducer.
  ``skewsafe_count_distinct`` spreads it by shuffling on (key, value)
  first (the distinct), then counting — both shuffles are skew-free if
  values vary.
- A shuffle join against a hot key DOES skew.  AQE's skew-join splitting
  (on in the session factory) handles it at runtime; ``salted_join`` is
  the explicit fallback for engines/paths where AQE can't see it (e.g.
  a deliberately bucketed layout, or a non-AQE consumer): the big side
  gets a per-row salt, the small side is replicated once per salt, and
  the join key becomes (key, salt) — the hot key fans out n_salts ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def skewsafe_count_distinct(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Exact distinct count per key group without concentrating a hot
    key's value set on one reducer: shuffle on (keys..., col) to dedupe,
    then count — each shuffle is spread by the value dimension."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count("*").alias(f"n_distinct_{col}"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: ``big`` rows get a uniform salt in
    [0, n_salts); ``small`` is replicated n_salts times; the join runs on
    (key, salt).  Row multiplicity is unchanged — each big row matches
    exactly the small rows it would have matched, under exactly one salt.

    Cost model: small side inflates n_salts x (it must be
    dimension-sized); the hot key's rows split across n_salts reducers.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full joins would surface each UNMATCHED small-side row
        # once per salt replica
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salted_big = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_big.join(salted_small, [key, "__salt"], how)
    return joined.drop("__salt")


def key_skew_profile(
    df: DataFrame,
    key: str,
    top_k: int = 20,
    heavy_multiple: float = 4.0,
    round_digits: int = 6,
) -> DataFrame:
    """The diagnosis step that decides whether :func:`salted_join` / AQE
    skew handling is even needed: per top-``top_k`` hottest join-key
    value, its row count, share of the table, and ratio to the mean
    key's count, with ``is_heavy`` flagging keys ``heavy_multiple``x
    over the mean (the same heuristic AQE's skewedPartitionFactor
    applies to partitions, applied to KEYS before the shuffle exists).

    One keyed count aggregate (map-side partials, skew-free by the
    algebraic-aggregate argument in the module docstring), a 1-row
    totals broadcast, and a top-k sort bounded by ``top_k`` — nothing
    data-sized moves after the first shuffle.  Ties at the cut break
    deterministically by key.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(top_k)
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(
            F.col("n_rows").cast("double") / F.col("__total").cast("double"),
            round_digits,
        ).alias("share"),
        F.round(
            (F.col("n_rows") * F.col("__n_keys")).cast("double")
            / F.col("__total").cast("double"),
            round_digits,
        ).alias("ratio_to_mean"),
        (
            (F.col("n_rows") * F.col("__n_keys")).cast("double")
            >= F.lit(heavy_multiple) * F.col("__total").cast("double")
        ).alias("is_heavy"),
    )


def key_skew_profile_sql(
    table: str,
    key: str,
    top_k: int = 20,
    heavy_multiple: float = 4.0,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`key_skew_profile` (same tie-break at the
    top-k cut, same integer-product heavy test)."""
    return f"""
        WITH counts AS (
          SELECT {key} AS key, count(*) AS n_rows FROM {table} GROUP BY {key}),
        totals AS (
          SELECT sum(n_rows) AS total, count(*) AS n_keys FROM counts),
        top AS (
          SELECT key, n_rows FROM counts
          ORDER BY n_rows DESC, key ASC LIMIT {top_k})
        SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
               round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE),
                     {round_digits}) AS share,
               round(CAST(n_rows * n_keys AS DOUBLE) / CAST(total AS DOUBLE),
                     {round_digits}) AS ratio_to_mean,
               CAST(n_rows * n_keys AS DOUBLE)
                 >= {heavy_multiple} * CAST(total AS DOUBLE) AS is_heavy
        FROM top CROSS JOIN totals
    """
