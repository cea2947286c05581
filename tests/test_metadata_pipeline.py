"""End-to-end metadata ETL: the reference's flagship program
(read_csv_s3_train.py) on a 32-column CSV fixture with every quirk the
reference handles — sentinel nulls, missing categoricals, bad epochs."""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.pipelines import metadata_etl, metadata_etl_verified
from image_matadata_batchprocessing_aws_spark.schemas import METADATA_SCHEMA
from image_matadata_batchprocessing_aws_spark.sources.csv_source import read_metadata_csv

COLS = [f.name for f in METADATA_SCHEMA.fields]


def _base_row(i: int) -> dict:
    row = {c: "" for c in COLS}
    row.update(
        {
            "id": str(i),
            "latitude": str(10.0 + i),
            "longitude": str(-3.0 * i),
            "thumb_original_url": f"http://x/{i}.jpg",
            "country": f"c{i % 3}",
            "sequence": f"s{i}",
            "captured_at": str(1609459200000 + i * 86_400_000),  # 2021-01-01 + i days
            "lon_bin": str(i),
            "lat_bin": str(i),
            "cell": f"cell{i}",
            "region": f"r{i % 2}",
            "sub-region": f"sr{i % 2}",
            "city": f"city{i}",
            "land_cover": str(i % 5),
            "road_index": str(0.1 * i),
            "drive_side": str(i % 2),
            "climate": str(i % 7),
            "soil": str(i % 4),
            "dist_sea": str(5.0 * i),
            "unique_region": f"ur{i % 2}",
            "unique_sub-region": f"usr{i % 2}",
            "unique_city": f"uc{i}",
            "unique_country": f"ucy{i % 3}",
            "creator_username": f"user{i}",
            "creator_id": str(1000 + i),
        }
    )
    for q in ("500", "1000", "2500", "5000", "12500", "25000", "50000"):
        row[f"quadtree_10_{q}"] = str(i)
    return row


@pytest.fixture(scope="module")
def metadata_csv(tmp_path_factory):
    d = tmp_path_factory.mktemp("meta")
    path = str(d / "train001.csv")
    rows = [_base_row(i) for i in range(8)]
    rows[2]["country"] = "NA"          # sentinel -> null -> ffilled from row 1
    rows[3]["region"] = " "            # sentinel
    rows[4]["captured_at"] = ""        # bad epoch -> null ts -> 1970 defaults
    rows[5]["unique_city"] = "NULL"    # sentinel -> "Unknown" fill
    rows[5]["creator_username"] = "<NA>"
    rows[6]["road_index"] = ""         # numeric null -> 0 fill (pre-zscore)
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=COLS)
        w.writeheader()
        w.writerows(rows)
    return path


def test_pipeline_end_to_end(spark, metadata_csv):
    raw = read_metadata_csv(spark, metadata_csv)
    assert raw.where(F.col("country").isNull()).count() == 1  # sentinel became null
    out = metadata_etl(raw).orderBy("id").collect()
    by_id = {r.id: r for r in out}
    # P1: url column dropped
    assert "thumb_original_url" not in out[0].asDict()
    # W1: sentinel country on row 2 forward-filled from row 1 => same code
    assert by_id[2].country == by_id[1].country
    # region for row 3 filled from row 2
    assert by_id[3].region == by_id[2].region
    # F2/F3: good epoch -> real date parts; bad epoch -> 1970 defaults
    assert (by_id[0].year, by_id[0].month, by_id[0].day) == (2021, 1, 1)
    assert (by_id[4].year, by_id[4].month, by_id[4].day) == (1970, 1, 1)
    # A8: encoded categoricals are dense ints starting at 0
    countries = sorted({r.country for r in out})
    assert countries == list(range(len(countries)))
    # A3: z-scored columns have ~zero mean
    df_out = metadata_etl(read_metadata_csv(spark, metadata_csv))
    stats = df_out.agg(F.avg("latitude"), F.stddev_samp("latitude")).collect()[0]
    assert abs(stats[0]) < 1e-9 and abs(stats[1] - 1.0) < 1e-9


def test_pipeline_quality_gate_passes_and_schema_preserved(spark, metadata_csv):
    raw = read_metadata_csv(spark, metadata_csv)
    out = metadata_etl_verified(raw)  # raises if any promised column has nulls
    # S11 divergence: parquet round-trip preserves schema (no .npy erosion)
    assert dict(out.dtypes)["id"] == "bigint"
    assert out.count() == 8