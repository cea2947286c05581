"""IVF physical layout: partition-pruned probes + end-to-end indexed ANN."""

from __future__ import annotations

import glob

import numpy as np
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.clustering import kmeans_train
from image_matadata_batchprocessing_aws_spark.operators.ivf import (
    ann_query_indexed,
    probe_cells,
    write_ivf_index,
)


def _corpus(spark, n=120, dim=8, k=4, seed=11):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((k, dim)) * 10
    rows = []
    for i in range(n):
        c = centers[i % k]
        rows.append((i, [float(v) for v in c + rng.standard_normal(dim) * 0.1]))
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def test_write_creates_cell_directories_and_probe_prunes(spark, tmp_path):
    corpus = _corpus(spark)
    cents, _ = kmeans_train(corpus, k=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, cents, path)
    dirs = sorted(glob.glob(f"{path}/cent_id=*"))
    assert len(dirs) == 4  # one directory per cell
    probed = probe_cells(spark, path, [0, 2])
    # partition pruning reaches the scan: only the probed directories
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got_cells = {r.cent_id for r in probed.select("cent_id").distinct().collect()}
    assert got_cells <= {0, 2}
    # round-trip: every probed row's vector survives intact
    assert probed.count() == sum(
        r.n for r in
        spark.read.parquet(path).groupBy("cent_id").agg(F.count("*").alias("n"))
        .where(F.col("cent_id").isin([0, 2])).collect()
    )


def test_indexed_ann_matches_in_cell_bruteforce(spark, tmp_path):
    corpus = _corpus(spark)
    cents, _ = kmeans_train(corpus, k=4)
    path = str(tmp_path / "ivf2")
    write_ivf_index(corpus, cents, path)
    # queries = 3 corpus points (their own cell must contain them at rank 1)
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    top = ann_query_indexed(spark, path, queries, cents, k=3, nprobe=1)
    rows = {(r.query_id, r.rn): r.neighbor_id for r in top.collect()}
    for q in range(3):
        assert rows[(q, 1)] == q  # exact self-match at rank 1 (cosine 1.0)
    # every query returns exactly k rows from its probed cell
    counts = top.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)
    # strict nprobe=1: all of a query's neighbors come from ONE cell —
    # never from another query's probed cell
    idx = spark.read.parquet(path).select("vec_id", "cent_id")
    cells_per_q = (
        top.join(idx, top.neighbor_id == idx.vec_id)
        .groupBy("query_id")
        .agg(F.count_distinct("cent_id").alias("nc"))
        .collect()
    )
    assert all(r.nc == 1 for r in cells_per_q)
