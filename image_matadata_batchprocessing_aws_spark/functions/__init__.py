"""Scalar / array expression helpers shared by operators and queries.

Everything here stays JVM-side (built-in ``pyspark.sql.functions`` —
whole-stage codegen, no Python in the hot path).  Where an operator needs
an oracle (DuckDB) twin, the matching SQL-string builder lives next to the
Spark builder so the two can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# Portable deterministic hashing (md5-derived 60-bit ints).
#
# Spark's xxhash64/hash and DuckDB's hash() disagree, so cross-engine
# hash-dependent operators (MinHash, exact-dup keys) derive integers from
# md5 hex — identical in both engines.
# ---------------------------------------------------------------------------


def md5_int64(col: Column | str) -> Column:
    """First 15 hex digits of md5 as a non-negative 60-bit long (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_int64_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_int64` (no base-conversion builtin there:
    fold hex chars with ``list_reduce``)."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}), 1, 15), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
    )


def md5_int32(col: Column | str) -> Column:
    """First 8 hex digits of md5 as a non-negative 32-bit-range long —
    the base hash for universal-hash families (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_int32_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_int32`."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}), 1, 8), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
    )


# ---------------------------------------------------------------------------
# Array / vector math (generalizes the reference's Euclidean evaluation
# aggregate, ``train.py:105-113``, to array<float> columns — SURVEY A5).
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns via higher-order functions."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# Misc scalar helpers mirroring reference ops.
# ---------------------------------------------------------------------------


def approx_row_bytes(cols: list[str]) -> Column:
    """Approximate CSV byte size of a row: ``sum(len(str(v))) + 1``
    (``split and upload/split_image_Script.py:35``)."""
    return F.length(F.concat_ws(",", *cols)) + F.lit(1)


def strip_s3_prefix(col: Column | str) -> Column:
    """Strip an ``s3://bucket/`` (or any scheme://host/) prefix from a path
    (``process_test_train_Images.py:38``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^[a-zA-Z0-9+.-]+://[^/]+/", "")
