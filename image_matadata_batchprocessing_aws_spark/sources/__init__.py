from image_matadata_batchprocessing_aws_spark.sources.tables import load_table, register_views
from image_matadata_batchprocessing_aws_spark.sources.csv_source import read_metadata_csv, read_csv

__all__ = ["load_table", "register_views", "read_metadata_csv", "read_csv"]
