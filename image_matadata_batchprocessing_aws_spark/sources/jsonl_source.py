"""Newline-delimited JSON (JSONL) source/sink — the interchange format
LLM corpora actually ship as (one document object per line).

House source rules (``sources/csv_source.py`` is the model, and the
reference's implicit-schema CSV reads are the anti-model — SURVEY
§1.2): schemas are EXPLICIT, malformed lines isolate per row instead of
failing the scan, and the reader is a plain ``spark.read.json`` so
predicate pushdown/column pruning behave like any other scan.

Scale notes: JSONL splits by line, so a single large file still
parallelizes (unlike multiline JSON, which is a one-task-per-file
trap — ``multiLine`` stays off here by design); the sink shards by
``maxRecordsPerFile`` like the tensor-batch sink (S10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Spark's PERMISSIVE-mode catch column: a malformed line lands whole
#: in this column with every schema field NULL — per-row error
#: isolation, the multimodal decode contract applied to a text source.
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema'd JSONL scan.  ``schema`` is the DDL string for the GOOD
    rows; the corrupt-capture column is appended here, not by the
    caller.  With ``keep_corrupt`` the malformed lines survive as
    (nulls..., raw_line) rows for audit; without it they are filtered
    (but never silently — count them via :func:`corrupt_line_audit`).
    """
    if not keep_corrupt:
        # DROPMALFORMED, not a filter on the corrupt column: Spark
        # disallows plans whose only referenced scan column is the
        # internal corrupt column (e.g. a count() after that filter),
        # and the dedicated mode is the supported way to say "skip".
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def corrupt_line_audit(df: DataFrame, probe_col: str) -> DataFrame:
    """One-row audit of a :func:`read_jsonl` frame: good vs corrupt
    line counts (the S12 post-read verification shape).

    ``probe_col`` is required because Spark REFUSES plans whose only
    referenced scan column is the internal corrupt column (the scan
    would have nothing to parse); referencing a real field keeps the
    plan legal and its non-null count doubles as a field-level parse
    rate.
    """
    return df.agg(
        F.count(F.when(F.col(CORRUPT_COL).isNull(), 1)).alias("good_lines"),
        F.count(F.col(CORRUPT_COL)).alias("corrupt_lines"),
        F.count(F.col(probe_col)).alias("probe_nonnull"),
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Sharded JSONL sink: one object per line, split into parts of at
    most ``max_records_per_file`` rows (the S4/S10 sizing contract)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )
