"""Spatial radius join via grid-cell bucketing — the spatial member of
the candidate-generation family (MinHash bands, Hamming bands, IVF
cells, and now geo cells).

The scale shape is the point: each side buckets into square grid cells
of side >= radius, the LEFT side expands to its 3x3 cell neighborhood
(a bounded 9x fanout of tiny key rows, never of payloads), candidates
meet in an EQUI-join on the cell id, and the exact distance predicate
verifies candidate pairs only.  No cross join at any scale; skew
equals spatial density and shares the salting mitigations of the other
banded joins.

Metric choices, stated plainly: the oracled query uses an
integer-milliunit PLANAR metric (bit-exact in both engines — trig
results differ by ulps between JVM and C libm, which the exact value
hash would surface as flakes); :func:`haversine_km` is provided for
real-geo use and is unit-tested against an independent Python
computation instead.  The bucketing machinery is metric-agnostic as
long as one cell side covers the radius.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (mean earth radius 6371.0088)."""
    rad = 0.017453292519943295  # pi / 180
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad)
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))


def radius_join_grid(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
    cell: float | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs with planar distance <= ``radius``:
    grid-bucket both sides (cell side = ``cell``, default = radius),
    expand the left side to its 3x3 neighborhood, equi-join on the
    cell, verify ``dx^2 + dy^2 <= radius^2`` map-side.  Emits the
    requested column lists plus ``d2`` (the squared distance — exact
    when coordinates are integers).

    Correctness requires ``cell >= radius`` (a point's true matches
    then always fall in the 3x3 neighborhood of its cell)."""
    cell = float(radius) if cell is None else float(cell)
    if cell < radius:
        raise ValueError("cell must be >= radius for 3x3 completeness")
    left_cols = left_cols or [c for c in left.columns if c not in (x, y)]
    right_cols = right_cols or [c for c in right.columns if c not in (x, y)]

    def cell_of(col: Column) -> Column:
        return F.floor(col / F.lit(cell)).cast("long")

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    lt = left.select(
        *left_cols,
        F.col(x).alias("__lx"),
        F.col(y).alias("__ly"),
        F.explode(offsets).alias("__o"),
    ).select(
        *left_cols,
        "__lx",
        "__ly",
        (cell_of(F.col("__lx")) + F.col("__o.dx")).alias("__cx"),
        (cell_of(F.col("__ly")) + F.col("__o.dy")).alias("__cy"),
    )
    rt = right.select(
        *right_cols,
        F.col(x).alias("__rx"),
        F.col(y).alias("__ry"),
        cell_of(F.col(x)).alias("__cx"),
        cell_of(F.col(y)).alias("__cy"),
    )
    d2 = (F.col("__lx") - F.col("__rx")) * (F.col("__lx") - F.col("__rx")) + (
        F.col("__ly") - F.col("__ry")
    ) * (F.col("__ly") - F.col("__ry"))
    return (
        lt.join(rt, ["__cx", "__cy"])
        .where(d2 <= F.lit(float(radius) * float(radius)))
        .select(*left_cols, *right_cols, d2.alias("d2"))
    )
