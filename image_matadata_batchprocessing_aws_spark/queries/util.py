from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

#: Per-session scan cache: ``spark.read.parquet`` runs a footer
#: schema-inference job on EVERY call, so a 401-query gate re-reads the
#: same footers hundreds of times and merely CONSTRUCTING a DataFrame
#: launches Spark jobs (ADVICE r7 surfaced this via
#: ``eval_holm_bonferroni``; the lazy-construction lock test in
#: tests/test_r08_queue.py now pins it queue-wide).  DataFrames are
#: immutable lazy plans, so reusing one per (sf_dir, table) is safe;
#: keyed weakly on the session so stopped sessions drop their entries.
_SCAN_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (nanos-timestamp handling included),
    memoized per (session, resolved sf_dir, table)."""
    key = (os.path.abspath(sf_dir), name)
    cache = _SCAN_CACHE.setdefault(spark, {})
    if key not in cache:
        cache[key] = load_table(spark, sf_dir, name)
    return cache[key]
