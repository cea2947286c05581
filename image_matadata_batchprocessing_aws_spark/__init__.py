"""PySpark-native analytics engine re-expressing the data-processing
surface of the reference repo (shivam-9999/Image_Matadata-BatchProcessing_AWS)
as idiomatic Spark DataFrame / SQL / Structured Streaming operators,
plus the LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Package layout (SURVEY.md section 7 build plan):

- ``session``    — SparkSession factory tuned for local[N] and cluster use
- ``schemas``    — explicit StructTypes (metadata CSV, images, events)
- ``sources``    — schema'd CSV / parquet / binary+ZIP scans, listings
- ``operators``  — DataFrame -> DataFrame operators (cleaning, impute,
                   encode, scale, audit, batching, dedup, similarity, text)
- ``functions``  — scalar/array expression helpers shared by operators
- ``queries``    — the oracle-checked query inventory (driver contract)
- ``streaming``  — Structured Streaming surface over the events table
- ``multimodal`` — binary image column plumbing (decode stubbed)
"""

from image_matadata_batchprocessing_aws_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
