"""As-of and binned range join operator semantics on tiny literal frames."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.joins import asof_join, range_join_binned


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null_extension(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T10:00:00"), "p1"),
            (2, "u", _ts("2024-01-01T12:00:00"), "p2"),
            (3, "v", _ts("2024-01-01T09:00:00"), "p3"),  # no prior right row
        ],
        "id long, k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts("2024-01-01T09:30:00")),
            (11, "u", _ts("2024-01-01T12:00:00")),  # equal ts: inclusive match
            (12, "u", _ts("2024-01-01T13:00:00")),  # future: never matched
            (13, "v", _ts("2024-01-01T09:30:00")),  # after left row for v
        ],
        "id long, k string, ts timestamp",
    )
    out = {
        r["id"]: r["r_id"]
        for r in asof_join(left, right, key="k", left_ts="ts", right_ts="ts").collect()
    }
    assert out == {1: 10, 2: 11, 3: None}


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01T10:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, None, _ts("2024-01-01T09:00:00"))], "id long, k string, ts timestamp"
    )
    row = asof_join(left, right, key="k", left_ts="ts", right_ts="ts").collect()[0]
    assert row["id"] == 1 and row["r_id"] is None  # SQL equi-join null rule


def test_asof_keeps_all_left_columns(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00:00"), 5.0)], "id long, k string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [(9, "u", _ts("2024-01-01T08:00:00"))], "rid long, k string, ts timestamp"
    )
    row = asof_join(left, right, key="k", left_ts="ts", right_ts="ts").collect()[0]
    assert (row["id"], row["v"], row["r_rid"]) == (1, 5.0, 9)


def test_range_join_binned_boundaries_and_bin_crossing(spark):
    facts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),  # == start: included
            (2, _ts("2024-01-01T05:59:59")),  # inside, same bin
            (3, _ts("2024-01-01T06:00:00")),  # == end: excluded
            (4, _ts("2024-01-01T03:30:00")),  # inside window 2 (bin-crossing)
        ],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T06:00:00")),
            (200, _ts("2024-01-01T03:00:00"), _ts("2024-01-01T09:00:00")),  # spans 2 bins
        ],
        "window_id long, start_ts timestamp, end_ts timestamp",
    )
    out = range_join_binned(
        facts, intervals, fact_ts="ts", start_ts="start_ts", end_ts="end_ts",
        bin_width_seconds=6 * 3600,
    )
    got = {(r["window_id"], r["event_id"]) for r in out.collect()}
    assert got == {(100, 1), (100, 2), (100, 4), (200, 2), (200, 3), (200, 4)}


def test_range_join_produces_equi_join_not_nested_loop(spark):
    facts = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros((F.col("id") * 600_000_000).cast("long")).alias("ts"),
    )
    intervals = spark.range(5).select(
        F.col("id").alias("window_id"),
        F.timestamp_micros((F.col("id") * 7_200_000_000).cast("long")).alias("start_ts"),
        F.timestamp_micros((F.col("id") * 7_200_000_000 + 3_600_000_000).cast("long")).alias("end_ts"),
    )
    plan = range_join_binned(
        facts, intervals, "ts", "start_ts", "end_ts", bin_width_seconds=3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_asof_random_matches_reference_with_duplicate_ts(spark):
    """Randomized cross-check vs a driver-side reference, with planted
    duplicate (key, ts) right rows: the deterministic tiebreak must pick
    the greatest tiebreak value, on every partitioning."""
    import random

    rng = random.Random(99)
    lefts = [(i, rng.randrange(5), rng.randrange(100)) for i in range(200)]
    rights = []
    for j in range(150):
        rights.append((j, rng.randrange(5), rng.randrange(100), rng.randrange(1000)))
    # plant exact duplicates of (key, ts) with different payloads
    for j in range(150, 170):
        base = rights[rng.randrange(150)]
        rights.append((j, base[1], base[2], rng.randrange(1000)))

    expected = {}
    for lid, k, lt in lefts:
        cands = [r for r in rights if r[1] == k and r[2] <= lt]
        if not cands:
            expected[lid] = None
        else:
            best_ts = max(r[2] for r in cands)
            at_ts = [r for r in cands if r[2] == best_ts]
            expected[lid] = max(at_ts, key=lambda r: r[0])[0]  # max tiebreak=rid

    left = spark.createDataFrame(lefts, "lid long, k long, lt long")
    right = spark.createDataFrame(rights, "rid long, k long, rt long, payload long")
    for reparted in (right, right.repartition(13)):
        out = asof_join(
            left, reparted, key="k", left_ts="lt", right_ts="rt", tiebreak="rid"
        )
        got = {r.lid: r.r_rid for r in out.collect()}
        assert got == expected


def test_interval_overlap_join_emits_each_pair_once(spark):
    from datetime import datetime

    from image_matadata_batchprocessing_aws_spark.operators.joins import (
        interval_overlap_join_binned,
    )

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [(1, ts(0), ts(10)), (2, ts(12), ts(13))],
        "lid long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts(1), ts(9)),     # nested in lid=1: shares MANY 1h bins
            (11, ts(9, 30), ts(11)),  # overlaps lid=1 tail only
            (12, ts(10), ts(12)),   # touches lid=1 end exactly: half-open, no overlap
            (13, ts(20), ts(21)),   # disjoint from everything
        ],
        "rid long, r_start timestamp, r_end timestamp",
    )
    out = interval_overlap_join_binned(
        left, right, "l_start", "l_end", "r_start", "r_end", bin_width_seconds=3600
    ).select("lid", "rid")
    rows = [(r.lid, r.rid) for r in out.collect()]
    # exactly-once per overlapping pair, even for the many-shared-bin pair
    assert sorted(rows) == [(1, 10), (1, 11)]


def test_binned_joins_refuse_caller_bin_column(spark):
    """__bin is internal scratch; a caller column of that name must raise,
    not be silently overwritten and dropped."""
    import pytest

    from image_matadata_batchprocessing_aws_spark.operators.joins import (
        interval_overlap_join_binned,
    )

    facts = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 7)], "event_id long, ts timestamp, __bin long"
    )
    intervals = spark.createDataFrame(
        [(100, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T06:00:00"))],
        "window_id long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(ValueError, match="__bin"):
        range_join_binned(facts, intervals, "ts", "start_ts", "end_ts", 3600)
    with pytest.raises(ValueError, match="__bin"):
        interval_overlap_join_binned(
            intervals, facts.withColumnRenamed("ts", "r_end"),
            "start_ts", "end_ts", "r_end", "r_end", 3600,
        )


# --- as-of direction variants ---------------------------------------------


def _ts_df(spark, rows, schema):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts")))


def test_asof_forward_picks_next_inclusive(spark):
    from image_matadata_batchprocessing_aws_spark.operators.joins import asof_join_forward

    left = _ts_df(spark, [(1, "a", 100), (2, "a", 205), (3, "b", 100)], "lid long, k string, ts long")
    right = _ts_df(
        spark,
        [(10, "a", 100), (11, "a", 200), (12, "a", 300)],
        "rid long, k string, ts long",
    )
    got = {
        r.lid: r.r_rid
        for r in asof_join_forward(left, right, "k", "ts", "ts").collect()
    }
    # lid 1: equal ts is inclusive -> rid 10; lid 2: next after 205 -> 300;
    # lid 3: no right rows for key b -> null
    assert got == {1: 10, 2: 12, 3: None}


def test_asof_nearest_tie_goes_backward_and_tolerance_nulls(spark):
    from image_matadata_batchprocessing_aws_spark.operators.joins import asof_join_nearest

    left = _ts_df(
        spark,
        [(1, "a", 150), (2, "a", 198), (3, "a", 1000), (4, "b", 50)],
        "lid long, k string, ts long",
    )
    right = _ts_df(
        spark, [(10, "a", 100), (11, "a", 200)], "rid long, k string, ts long"
    )
    got = {
        r.lid: r.r_rid
        for r in asof_join_nearest(
            left, right, "k", "ts", "ts", tolerance_seconds=300
        ).collect()
    }
    # lid 1: dist 50 both ways -> tie -> backward rid 10
    # lid 2: 98 back vs 2 forward -> rid 11
    # lid 3: nearest is 800s away > 300s tolerance -> null
    # lid 4: no key match -> null
    assert got == {1: 10, 2: 11, 3: None, 4: None}


def test_asof_nearest_without_tolerance_always_matches(spark):
    from image_matadata_batchprocessing_aws_spark.operators.joins import asof_join_nearest

    left = _ts_df(spark, [(1, "a", 10), (2, "a", 10_000)], "lid long, k string, ts long")
    right = _ts_df(spark, [(10, "a", 5_000)], "rid long, k string, ts long")
    got = {
        r.lid: r.r_rid for r in asof_join_nearest(left, right, "k", "ts", "ts").collect()
    }
    assert got == {1: 10, 2: 10}


def test_asof_directions_match_pandas_merge_asof(spark):
    """All three as-of directions cross-validated against pandas
    merge_asof on randomized frames (distinct timestamps per key, so
    tie policy differences cannot blur the comparison)."""
    import numpy as np
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.operators.joins import (
        asof_join,
        asof_join_forward,
        asof_join_nearest,
    )

    rng = np.random.default_rng(11)
    for trial in range(3):
        keys = ["a", "b", "c"]
        lrows, rrows = [], []
        lid = rid = 0
        for k in keys:
            lts = rng.choice(20_000, size=15, replace=False)
            rts = rng.choice(20_000, size=10, replace=False)
            for ts in lts:
                lrows.append((lid, k, int(ts)))
                lid += 1
            for ts in rts:
                rrows.append((rid, k, int(ts)))
                rid += 1
        left = spark.createDataFrame(lrows, "lid long, k string, sec long").select(
            "lid", "k", F.timestamp_seconds("sec").alias("ts")
        )
        right = spark.createDataFrame(rrows, "rid long, k string, sec long").select(
            "rid", "k", F.timestamp_seconds("sec").alias("ts")
        )
        lp = pd.DataFrame(lrows, columns=["lid", "k", "sec"]).sort_values("sec")
        rp = pd.DataFrame(rrows, columns=["rid", "k", "sec"]).sort_values("sec")
        for direction, fn, tol in [
            ("backward", asof_join, None),
            ("forward", asof_join_forward, None),
            ("nearest", asof_join_nearest, None),
            ("nearest", asof_join_nearest, 500),
        ]:
            kwargs = {"tolerance_seconds": tol} if tol else {}
            got = {
                r.lid: r.r_rid
                for r in fn(left, right, "k", "ts", "ts", **kwargs).collect()
            }
            pkw = {"tolerance": tol} if tol else {}
            exp_df = pd.merge_asof(
                lp, rp, on="sec", by="k", direction=direction, **pkw
            )
            exp = {
                int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
                for row in exp_df.itertuples()
            }
            assert got == exp, (trial, direction, tol)


def test_fuzzy_join_blocked_linkage(spark):
    from pyspark.sql import functions as F

    from image_matadata_batchprocessing_aws_spark.operators.joins import fuzzy_join

    clean = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "maria garcia"), (3, "wei chen")],
        "id long, name string",
    )
    dirty = spark.createDataFrame(
        [(10, "jonathan smyth"), (11, "mariah garcia"), (12, "wei  chen"),
         (13, "completely different")],
        "id long, name string",
    )
    out = fuzzy_join(
        clean,
        dirty.withColumnRenamed("id", "rid").withColumnRenamed("name", "rname"),
        "name",
        "rname",
        max_edit=2,
    )
    got = {(r.id, r.rid): r.edit_distance for r in out.collect()}
    assert got == {(1, 10): 1, (2, 11): 1, (3, 12): 1}

    # a typo INSIDE the blocking window escapes the block (documented
    # recall trade) — a suffix-block second pass recovers it
    dirty2 = spark.createDataFrame([(20, "xonathan smith")], "rid long, rname string")
    assert fuzzy_join(clean, dirty2, "name", "rname", max_edit=2).count() == 0
    suffix = fuzzy_join(
        clean, dirty2, "name", "rname", max_edit=2,
        block_left=F.lower(F.substring(F.col("name"), -3, 3)),
        block_right=F.lower(F.substring(F.col("rname"), -3, 3)),
    )
    assert [(r.id, r.rid) for r in suffix.collect()] == [(1, 20)]
