"""Dynamic partition overwrite + small-file compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
    compact_parquet,
    write_partitioned,
)


def test_dynamic_overwrite_replaces_only_present_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(1, "day1"), (2, "day1"), (3, "day2")],
        "id long, day string",
    )
    write_partitioned(full, path, ["day"])
    # incremental reprocess of day 1 only, with different rows
    day1 = spark.createDataFrame([(10, "day1")], "id long, day string")
    write_partitioned(day1, path, ["day"], dynamic=True)
    back = spark.read.parquet(path)
    got = {(r.id, r.day) for r in back.collect()}
    # day 2 survives; day 1 fully replaced
    assert got == {(10, "day1"), (3, "day2")}


def test_static_overwrite_replaces_whole_table(spark, tmp_path):
    path = str(tmp_path / "t2")
    full = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, part string"
    )
    write_partitioned(full, path, ["part"])
    only_a = spark.createDataFrame([(9, "a")], "id long, part string")
    write_partitioned(only_a, path, ["part"], dynamic=False)
    assert {r.id for r in spark.read.parquet(path).collect()} == {9}


def test_overwrite_mode_conf_restored(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, "static")
    df = spark.createDataFrame([(1, "x")], "id long, p string")
    write_partitioned(df, str(tmp_path / "t3"), ["p"], dynamic=True)
    assert spark.conf.get(key, "static") == before


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # fragment: 40 tiny files
    spark.range(2000).toDF("id").repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 40
    n = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n <= 2
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(2000))


def test_compact_partitioned_keeps_layout(spark, tmp_path):
    path = str(tmp_path / "fragp")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(1000)], "id long, p string"
    )
    df.repartition(20).write.partitionBy("p").parquet(path)
    assert len(glob.glob(f"{path}/p=*/*.parquet")) >= 20
    compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024, partition_by=["p"])
    assert sorted(glob.glob(f"{path}/p=*")) == [f"{path}/p=a", f"{path}/p=b"]
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.groupBy("p").count().count() == 2


def test_merge_upsert_replaces_appends_and_keeps(spark, tmp_path):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import merge_upsert

    path = str(tmp_path / "m")
    base = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (3, "old")], "id long, v string"
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [(1, "new"), (3, "new"), (4, "added")], "id long, v string"
    )
    merge_upsert(spark, path, updates, key="id")
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "new", 2: "keep", 3: "new", 4: "added"}


def test_merge_upsert_failed_write_preserves_original(spark, tmp_path):
    import pytest

    from image_matadata_batchprocessing_aws_spark.operators.maintenance import merge_upsert

    path = str(tmp_path / "m2")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(path)
    bad = spark.createDataFrame([(2,)], "other long")  # schema mismatch -> raises
    with pytest.raises(Exception):
        merge_upsert(spark, path, bad, key="id")
    assert {r.id for r in spark.read.parquet(path).collect()} == {1}


def test_zorder_key_matches_morton_reference_and_layout(spark, tmp_path):
    """zorder_key == a driver-side Morton interleave on a grid, and
    write_zordered produces files whose rows are contiguous in the key
    (each file covers one compact Z-range => parquet min/max stats can
    prune on EITHER dimension)."""
    import glob

    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        write_zordered,
        zorder_key,
    )

    def morton(x, y, bits=8):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out

    rows = [(i, i % 13, (i * 7) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id: r.z for r in df.withColumn("z", zorder_key(["x", "y"], 8)).collect()}
    assert got == {i: morton(x, y) for i, x, y in rows}

    out = str(tmp_path / "zsorted")
    write_zordered(df, out, ["x", "y"], bits=8, n_files=4)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 2
    ranges = []
    for f in files:
        part = spark.read.parquet(f).collect()
        keys = [morton(r.x, r.y) for r in part]
        assert keys == sorted(keys)  # sorted within file
        ranges.append((min(keys), max(keys)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # files cover disjoint, ordered key ranges


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution across parquet generations: an old fileset
    without a column and a new one with it read as ONE table via
    mergeSchema — old rows null-extend, values survive, and the scan
    still prunes columns."""
    from pyspark.sql import functions as F

    old = spark.range(5).select(F.col("id"), F.lit("old").alias("src"))
    new = spark.range(5, 8).select(
        F.col("id"), F.lit("new").alias("src"), (F.col("id") * 10).alias("score")
    )
    p = str(tmp_path / "evolving")
    old.write.mode("overwrite").parquet(p + "/gen=0")
    new.write.mode("overwrite").parquet(p + "/gen=1")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) >= {"id", "src", "score"}
    rows = {r.id: (r.src, r.score) for r in merged.collect()}
    assert rows[0] == ("old", None)  # old generation null-extends
    assert rows[6] == ("new", 60)
    assert len(rows) == 8


# --- Z-order clustering ---------------------------------------------------


def _morton(xb, yb, bits):
    z = 0
    for j in range(bits):
        z |= ((xb >> j) & 1) << (j * 2)
        z |= ((yb >> j) & 1) << (j * 2 + 1)
    return z


def test_zorder_index_matches_python_morton(spark):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import zorder_index

    bits = 4
    n = 1 << bits
    rows = [(x * n + y, float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r.id: r.zorder for r in zorder_index(df, ["x", "y"], bits=bits).collect()}
    hi = n - 1
    for x in range(n):
        for y in range(n):
            # linear quantization over [0, 15] maps value v -> bucket v
            xb = min(int(x / hi * n), hi)
            yb = min(int(y / hi * n), hi)
            assert out[x * n + y] == _morton(xb, yb, bits), (x, y)


def test_zorder_locality_quadrants(spark):
    # the top 2 interleaved bits split the grid into its four quadrants:
    # range-bucketing by zorder must bound BOTH dimensions, which a
    # compound sort cannot do for the trailing column
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import zorder_index
    from pyspark.sql import functions as F

    bits = 4
    n = 1 << bits
    rows = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x double, y double")
    z = zorder_index(df, ["x", "y"], bits=bits)
    quad = z.withColumn("q", F.shiftright("zorder", 2 * bits - 2))
    spans = (
        quad.groupBy("q")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    assert len(spans) == 4
    for r in spans:
        assert r.cnt == n * n / 4
        assert r.sx <= n / 2 - 1 and r.sy <= n / 2 - 1


def test_zorder_nulls_and_constant_cols(spark):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import zorder_index

    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3.0, 5.0), (3, 9.0, 5.0)], "id long, x double, y double"
    )
    out = {r.id: r.zorder for r in zorder_index(df, ["x", "y"], bits=4).collect()}
    # y constant -> contributes bucket 0 everywhere; null x -> bucket 0
    assert out[1] == 0
    assert out[2] == 0  # x = min -> bucket 0
    assert out[3] > 0


def test_quantize_linear_feeds_write_zordered(spark, tmp_path):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        quantize_linear,
        write_zordered,
    )

    rows = [(i, float(i % 37), float(i % 11)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    q = quantize_linear(df, ["x", "y"], bits=6)
    path = str(tmp_path / "zt")
    write_zordered(q, path, ["x_q", "y_q"], bits=6, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert {"id", "x", "y", "x_q", "y_q"} == set(back.columns)


def test_apply_cdc_semantics(spark):
    """Latest-wins, D deletes, I inserts, same-ts race breaks D > U."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", 1, "U"), (1, "a2", 2, "U"),     # latest U wins
            (2, None, 1, "D"),                         # delete
            (3, "c1", 5, "U"), (3, None, 5, "D"),      # same-ts race -> D
            (9, "new", 1, "I"),                        # insert
        ],
        "k int, v string, change_ts int, op string",
    )
    got = {r.k: r.v for r in apply_cdc(base, changes, "k").collect()}
    assert got == {1: "a2", 3: None, 4: "d", 9: "new"} or got == {1: "a2", 4: "d", 9: "new"}
    # D must actually remove key 2 and key 3
    assert 2 not in got and 3 not in got


def test_incremental_join_delta_identity(spark):
    """old join + delta terms == full recompute (insert-only IVM)."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        incremental_join_delta,
    )

    a = spark.createDataFrame([(i, f"a{i}") for i in range(20)], "k int, av string")
    b = spark.createDataFrame(
        [(i % 10, f"b{i}") for i in range(30)], "k int, bv string"
    )
    a_old, a_new = a.where("k < 12"), a.where("k >= 12")
    b_old, b_new = b.where("bv < 'b2'"), b.where("bv >= 'b2'")
    on = ["k"]
    maintained = a_old.join(b_old, on).unionByName(
        incremental_join_delta(a_old, a_new, b_old, b_new, on)
    )
    full = a.join(b, on)
    assert sorted(map(tuple, maintained.collect())) == sorted(map(tuple, full.collect()))


def test_scd2_from_feed_semantics(spark):
    """Versions chain [ts, next ts); delete closes without opening;
    same-ts U+D leaves a zero-length closed version."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        scd2_from_feed,
    )

    feed = spark.createDataFrame(
        [
            (1, "v1", 1, "I"), (1, "v2", 5, "U"),          # two versions
            (2, "w1", 1, "I"), (2, None, 3, "D"),          # deleted
            (3, "x1", 2, "U"), (3, None, 2, "D"),          # same-ts race
        ],
        "k int, v string, change_ts int, op string",
    )
    rows = {(r.k, r.valid_from): r for r in scd2_from_feed(feed, "k").collect()}
    assert rows[(1, 1)].valid_to == 5 and not rows[(1, 1)].is_current
    assert rows[(1, 5)].valid_to is None and rows[(1, 5)].is_current
    assert rows[(2, 1)].valid_to == 3 and not rows[(2, 1)].is_current
    assert rows[(3, 2)].valid_to == 2 and not rows[(3, 2)].is_current  # U before D
    assert len(rows) == 4  # D rows never open versions


def test_compaction_plan_next_fit_decreasing_bins(spark):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        compaction_plan,
    )

    df = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate([5, 4, 3, 2, 1])],
        "part string, fid long, bytes long",
    )
    out = {
        r.bin_id: r
        for r in compaction_plan(df, "part", "bytes", "fid", target_bytes=6).collect()
    }
    assert out[0].n_files == 2 and out[0].total_bytes == 9  # 5 + 4
    assert out[1].total_bytes == 3
    assert out[2].n_files == 2 and out[2].total_bytes == 3  # 2 + 1
    assert out[0].fill_ratio == 1.5


def test_compaction_plan_oversized_file_gets_own_bin(spark):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        compaction_plan,
    )

    df = spark.createDataFrame(
        [("p", 1, 10), ("p", 2, 2)], "part string, fid long, bytes long"
    )
    out = sorted(
        compaction_plan(df, "part", "bytes", "fid", target_bytes=6).collect(),
        key=lambda r: r.bin_id,
    )
    assert out[0].n_files == 1 and out[0].fill_ratio > 1  # split hint
    assert out[1].bin_id == 1 and out[1].total_bytes == 2


def test_zonemap_prune_clustered_vs_unclustered(spark):
    """The same predicate skips everything-but-one-file under a
    clustered layout and nothing under an anti-clustered one."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        zonemap_prune_report,
        zonemap_stats,
    )
    from pyspark.sql import functions as F

    # 40 rows, v = 0..39; clustered: file = v div 10; anti: file = v mod 4
    df = spark.range(40).select(F.col("id").alias("v"))
    clustered = zonemap_stats(df, (F.col("v") / 10).cast("long"), "v")
    anti = zonemap_stats(df, F.col("v") % 4, "v")
    rc = zonemap_prune_report(clustered, 10, 19).collect()[0]
    ra = zonemap_prune_report(anti, 10, 19).collect()[0]
    assert rc.files_scanned == 1 and rc.rows_scanned == 10
    assert rc.scan_fraction == 0.25
    assert ra.files_scanned == 4 and ra.scan_fraction == 1.0


def test_table_fingerprint_detects_one_changed_value(spark):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        table_fingerprint,
    )

    a = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, v string")
    b = spark.createDataFrame(
        [(i, f"v{i}" if i != 37 else "CHANGED") for i in range(100)],
        "id long, v string",
    )
    fa = {r.bucket: r for r in table_fingerprint(a, "id").collect()}
    fb = {r.bucket: r for r in table_fingerprint(b, "id").collect()}
    diff = [k for k in fa if fa[k].hash_xor != fb[k].hash_xor]
    assert len(diff) == 1  # mismatch localizes to row 37's bucket
    assert all(fa[k].n_rows == fb[k].n_rows for k in fa)


def test_table_fingerprint_column_order_invariant(spark):
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        table_fingerprint,
    )

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = a.select("v", "id")  # physically reordered
    assert (
        table_fingerprint(a, "id").collect()
        == table_fingerprint(b, "id").collect()
    )


def test_scd2_audit_detects_planted_corruption(spark):
    """Healthy history audits to zeros; an overlap, a gap, and a
    double-current key each fire their own counter."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        scd2_validity_audit,
    )

    healthy = spark.createDataFrame(
        [(1, 0, 10, False), (1, 10, None, True), (2, 5, None, True)],
        "k long, valid_from long, valid_to long, is_current boolean",
    )
    r = scd2_validity_audit(healthy, "k").collect()[0]
    assert (r.n_overlaps, r.n_gaps, r.n_keys_bad_current) == (0, 0, 0)
    assert r.n_versions == 3 and r.n_keys == 2

    corrupt = spark.createDataFrame(
        [
            (1, 0, 10, False), (1, 8, 20, False), (1, 25, None, True),  # overlap+gap
            (2, 0, None, True), (2, 5, None, True),                     # two currents
        ],
        "k long, valid_from long, valid_to long, is_current boolean",
    )
    r = scd2_validity_audit(corrupt, "k").collect()[0]
    assert r.n_overlaps == 1 and r.n_gaps == 1 and r.n_keys_bad_current == 1
