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
