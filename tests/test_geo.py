"""Grid-bucketed spatial radius join: completeness vs brute force
(hypothesis), exactness of the integer metric, and the haversine
helper against an independent Python computation."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.geo import haversine_km, radius_join_grid


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 400)),
        min_size=2, max_size=30, unique=True,
    ),
    radius=st.integers(10, 120),
)
def test_radius_join_matches_brute_force(spark, pts, radius):
    n = len(pts)
    left = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "lid long, x double, y double",
    )
    right = spark.createDataFrame(
        [(i + 1000, float(y), float(x)) for i, (x, y) in enumerate(pts)],
        "rid long, x double, y double",
    )
    got = sorted(
        (r.lid, r.rid, r.d2)
        for r in radius_join_grid(
            left, right, radius=radius, left_cols=["lid"], right_cols=["rid"]
        ).collect()
    )
    exp = sorted(
        (i, j + 1000, float((x1 - y2) ** 2 + (y1 - x2) ** 2))
        for i, (x1, y1) in enumerate(pts)
        for j, (x2, y2) in enumerate(pts)
        if (x1 - y2) ** 2 + (y1 - x2) ** 2 <= radius * radius
    )
    assert got == exp


def test_cell_smaller_than_radius_rejected(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "i long, x double, y double")
    with pytest.raises(ValueError, match="cell must be >= radius"):
        radius_join_grid(df, df, radius=10, cell=5)


def test_haversine_against_python(spark):
    # Paris -> New York, a known ~5837 km great-circle leg
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 40.7128, -74.0060)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = df.select(
        haversine_km(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("km")
    ).collect()[0].km

    def hav(lat1, lon1, lat2, lon2):
        rad = math.pi / 180
        dlat, dlon = (lat2 - lat1) * rad, (lon2 - lon1) * rad
        a = (math.sin(dlat / 2) ** 2
             + math.cos(lat1 * rad) * math.cos(lat2 * rad)
             * math.sin(dlon / 2) ** 2)
        return 2 * 6371.0088 * math.asin(math.sqrt(a))

    ref = hav(48.8566, 2.3522, 40.7128, -74.0060)
    assert abs(got - ref) < 1e-9
    assert 5800 < got < 5880
