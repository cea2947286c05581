"""Operator unit tests: ffill/bfill ordering, global encoders/scalers.

The ffill quirk (order-dependence, SURVEY W1) and the global-vs-per-chunk
fit divergence (SURVEY A3/A8) are the reference's two behavioral traps —
tested explicitly here.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators import ffill, bfill, ffill_bfill, label_encode, minmax_scale, zscore_scale
from image_matadata_batchprocessing_aws_spark.operators.impute import ffill_partitioned


def _seq_df(spark):
    # ordering column, value with leading + mid nulls
    return spark.createDataFrame(
        [(0, None), (1, "a"), (2, None), (3, None), (4, "b"), (5, None)],
        "ord long, v string",
    )


def test_ffill_then_bfill_matches_pandas_semantics(spark):
    out = ffill_bfill(_seq_df(spark), ["v"], order_by="ord")
    got = [r.v for r in out.orderBy("ord").collect()]
    # pandas: ffill -> [None,a,a,a,b,b]; bfill -> [a,a,a,a,b,b]
    assert got == ["a", "a", "a", "a", "b", "b"]


def test_ffill_only_leaves_leading_null(spark):
    out = ffill(_seq_df(spark), ["v"], order_by="ord")
    got = [r.v for r in out.orderBy("ord").collect()]
    assert got == [None, "a", "a", "a", "b", "b"]


def test_bfill_only_leaves_trailing_null(spark):
    out = bfill(_seq_df(spark), ["v"], order_by="ord")
    got = [r.v for r in out.orderBy("ord").collect()]
    assert got == ["a", "a", "b", "b", "b", None]


def test_ffill_partitioned_matches_global(spark):
    rows = [(i, None if i % 3 else f"v{i}") for i in range(200)]
    rows[0] = (0, "v0")
    df = spark.createDataFrame(rows, "ord long, v string")
    expect = [r.v for r in ffill(df, ["v"], order_by="ord").orderBy("ord").collect()]
    got = [
        r.v
        for r in ffill_partitioned(df, ["v"], order_by="ord").orderBy("ord").collect()
    ]
    assert got == expect


def test_label_encode_is_global_sorted_bijection(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "a"), (5, None)], "id long, cat string"
    )
    out = label_encode(df, ["cat"], suffix="_code")
    got = {r.id: r.cat_code for r in out.collect()}
    # global fit, lexicographic: a->0, b->1, c->2; nulls stay null
    assert got == {1: 1, 2: 0, 3: 2, 4: 0, 5: None}


def test_zscore_global_fit(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, x double")
    out = zscore_scale(df, ["x"], suffix="_z")
    stats = out.agg(F.avg("x_z"), F.stddev_samp("x_z")).collect()[0]
    assert abs(stats[0]) < 1e-12
    assert abs(stats[1] - 1.0) < 1e-12


def test_minmax_bounds(spark):
    df = spark.createDataFrame([(i, float(i * 3 + 1)) for i in range(10)], "id long, x double")
    out = minmax_scale(df, ["x"], suffix="_m")
    stats = out.agg(F.min("x_m"), F.max("x_m")).collect()[0]
    assert stats[0] == 0.0 and stats[1] == 1.0


def test_robust_scale_resists_outliers(spark):
    from pyspark.sql import functions as F

    from image_matadata_batchprocessing_aws_spark.operators.scale import robust_scale, zscore_scale

    base = [(i, float(i % 10)) for i in range(100)]
    clean = spark.createDataFrame(base, "id long, v double")
    dirty = spark.createDataFrame(base + [(999, 1e9)], "id long, v double")

    def codes(df):
        return {
            r.id: round(r.v_s, 6)
            for r in robust_scale(df, ["v"], suffix="_s").where("id < 100").collect()
        }

    # median/IQR: the 1e9 outlier's influence is bounded — each clean
    # row's scaled value moves only by the tiny quantile-interpolation
    # shift from n=100 -> 101, never proportionally to the outlier...
    a, b = codes(clean), codes(dirty)
    assert max(abs(a[k] - b[k]) for k in a) < 0.2
    # ...whereas mean/std collapses the clean rows' spread to ~1e-8
    # (std is dominated by the outlier) while robust keeps it O(1)
    z = [
        r.v_s
        for r in zscore_scale(dirty, ["v"], suffix="_s").where("id < 100").collect()
    ]
    assert max(z) - min(z) < 1e-6
    assert max(b.values()) - min(b.values()) > 0.5


def test_keyless_fill_guard_routes_or_refuses(spark, monkeypatch):
    """The keyless global-window contract is enforced in code: past the
    row cap, ffill takes the two-pass partitioned path and bfill /
    ffill_bfill refuse."""
    import pytest

    from image_matadata_batchprocessing_aws_spark.operators import impute

    df = _seq_df(spark)

    routed = {}

    def spy(d, cols, order_by):
        routed["hit"] = True
        return impute.ffill(d, cols, order_by, global_row_cap=None)

    monkeypatch.setattr(impute, "ffill_partitioned", spy)
    out = impute.ffill(df, ["v"], order_by="ord", global_row_cap=3)
    assert routed.get("hit"), "large keyless ffill must take the two-pass path"
    got = [r.v for r in out.orderBy("ord").collect()]
    assert got == [None, "a", "a", "a", "b", "b"]  # same semantics either path

    with pytest.raises(ValueError, match="partition_by"):
        impute.bfill(df, ["v"], order_by="ord", global_row_cap=3)
    with pytest.raises(ValueError, match="partition_by"):
        impute.ffill_bfill(df, ["v"], order_by="ord", global_row_cap=3)
    # keyed calls never count rows or refuse, whatever the size
    keyed = impute.ffill_bfill(
        df.withColumn("k", F.col("ord") % 2), ["v"], order_by="ord",
        partition_by=["k"], global_row_cap=0,
    )
    assert keyed.count() == 6


def test_label_encode_multi_column_one_collect_job(spark):
    """k-column encode: codes stay global-sorted per column, and the
    distinct collection is a single collect_set job (2 jobs total with
    the cardinality guard), not one job per column."""
    df = spark.createDataFrame(
        [(1, "b", 30), (2, "a", 10), (3, "c", 20), (4, "a", None)],
        "id long, cat string, num int",
    )
    out = label_encode(df, ["cat", "num"], suffix="_code")
    got = {r.id: (r.cat_code, r.num_code) for r in out.collect()}
    assert got == {1: (1, 2), 2: (0, 0), 3: (2, 1), 4: (0, None)}


# --- quantile binning / one-hot -------------------------------------------


def test_quantile_bin_equal_frequency_and_nulls(spark):
    from image_matadata_batchprocessing_aws_spark.operators.scale import quantile_bin

    rows = [(i, float(i)) for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = quantile_bin(df, ["x"], n_bins=4).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.x_bin, []).append(r.id)
    assert r is not None
    # null input -> null bin; 100 values split 25/25/25/25
    assert sorted(len(v) for k, v in by_bin.items() if k is not None) == [25, 25, 25, 25]
    assert len(by_bin.get(None, [])) == 1
    # monotone: every value in bin k is below every value in bin k+1
    for k in range(3):
        assert max(by_bin[k]) < min(by_bin[k + 1])


def test_one_hot_pinned_and_fitted(spark):
    from image_matadata_batchprocessing_aws_spark.operators.encode import one_hot_encode

    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, None)], "id long, c string"
    )
    # fitted domain: collect_set drops nulls -> columns c_a, c_b
    out = one_hot_encode(df, ["c"])
    assert set(out.columns) == {"id", "c", "c_a", "c_b"}
    got = {r.id: (r.c_a, r.c_b) for r in out.collect()}
    assert got == {0: (1, 0), 1: (0, 1), 2: (0, 0)}  # null row is all-zeros
    # pinned domain keeps schema stable even for absent categories
    out2 = one_hot_encode(df, ["c"], categories={"c": ["a", "b", "z"]})
    assert "c_z" in out2.columns
    assert all(r.c_z == 0 for r in out2.collect())


def test_one_hot_cardinality_guard(spark):
    import pytest

    from image_matadata_batchprocessing_aws_spark.operators.encode import one_hot_encode

    df = spark.createDataFrame([(i, f"v{i}") for i in range(70)], "id long, c string")
    with pytest.raises(ValueError, match="categories exceeds"):
        one_hot_encode(df, ["c"], max_distinct=64)


def test_scalers_zero_spread_degrade_to_centering(spark):
    # a constant column must never yield NaN/Infinity from 0-division:
    # the whole scaler family degrades to centering (= 0.0 here),
    # mirroring the mad_scale guard and sklearn's unit-scale behavior
    import math

    from image_matadata_batchprocessing_aws_spark.operators.scale import (
        mad_scale,
        robust_scale,
        zscore_scale_exact,
    )

    df = spark.createDataFrame([(i, 7.0) for i in range(10)], "id long, x double")
    for fn in (zscore_scale, zscore_scale_exact, robust_scale, minmax_scale, mad_scale):
        vals = [r.x_s for r in fn(df, ["x"], suffix="_s").collect()]
        assert all(v == 0.0 and math.isfinite(v) for v in vals), fn.__name__


def test_interpolate_linear_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.operators.impute import interpolate_linear

    rng = np.random.default_rng(9)
    rows = []
    series = {}
    for k in ("a", "b"):
        vals = [round(float(v), 3) for v in rng.uniform(-50, 50, 60)]
        mask = rng.uniform(size=60) < 0.35
        vals = [None if m else v for v, m in zip(vals, mask)]
        # force the edge cases: leading + trailing null runs
        vals[0] = vals[1] = None
        vals[-1] = None
        series[k] = vals
        rows += [(k, i, vals[i]) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = interpolate_linear(df, ["v"], order_by="i", partition_by=["k"])
    got = {(r.k, r.i): r.v for r in out.collect()}
    for k, vals in series.items():
        want = pd.Series(vals, dtype="float64").interpolate(method="linear")
        for i in range(60):
            w = want.iloc[i]
            g = got[(k, i)]
            if pd.isna(w):
                assert g is None, (k, i)
            else:
                assert g is not None and abs(g - w) < 1e-9, (k, i, g, w)


def test_interpolate_linear_time_weighted(spark):
    from image_matadata_batchprocessing_aws_spark.operators.impute import interpolate_linear

    # x spacing 1:3 — value interpolation must honor the abscissa
    rows = [(0, 0.0, 0.0), (1, 10.0, None), (2, 40.0, 8.0)]
    df = spark.createDataFrame(rows, "i long, x double, v double")
    out = {r.i: r.v for r in interpolate_linear(
        df, ["v"], order_by="i", x_col="x"
    ).collect()}
    assert out[1] == 2.0  # 0 + (8-0) * (10-0)/(40-0)


def test_interpolate_linear_keyless_cap_refuses(spark):
    import pytest

    from image_matadata_batchprocessing_aws_spark.operators.impute import interpolate_linear

    df = spark.range(100).withColumn("v", F.lit(1.0))
    with pytest.raises(ValueError, match="global_row_cap"):
        interpolate_linear(df, ["v"], order_by="id", global_row_cap=10)


def test_target_encode_loo_and_plain(spark):
    from image_matadata_batchprocessing_aws_spark.operators.encode import target_encode

    rows = [(0, "a", 1.0), (1, "a", 3.0), (2, "a", 5.0), (3, "b", 10.0), (4, "c", 7.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    loo = {r.id: r.cat_te for r in target_encode(df, ["cat"], "y").collect()}
    assert loo[0] == 4.0 and loo[1] == 3.0 and loo[2] == 2.0  # (sum-own)/(n-1)
    assert loo[3] is None and loo[4] is None  # singletons: no evidence under LOO
    plain = {
        r.id: r.cat_te
        for r in target_encode(df, ["cat"], "y", leave_one_out=False).collect()
    }
    assert plain[0] == plain[1] == plain[2] == 3.0
    assert plain[3] == 10.0 and plain[4] == 7.0
