"""Projection / cast / trim / fill / timestamp operators (SURVEY P1-P6, F1-F5).

These are the per-chunk transforms of the reference's metadata ETL
(``Image_Train_Model/read_csv_s3_train.py:57-118``) re-expressed as lazy
Column expressions: Catalyst fuses the whole chain into one codegen'd
stage over the scan, so "per-chunk" disappears — there is one plan over
all partitions, no accumulation loop (SURVEY U1 collapses with it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _q(name: str) -> Column:
    return F.col(f"`{name}`")


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P1 — e.g. drop ``thumb_original_url`` (``read_csv_s3_train.py:61``)."""
    return df.drop(*cols)


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P2/F5 — dtype casts (``read_csv_s3_train.py:64-65``)."""
    return df.withColumns({c: _q(c).cast(t) for c, t in casts.items()})


def trim_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """F1 — whitespace strip (``read_csv_s3_train.py:67-69``)."""
    return df.withColumns({c: F.trim(_q(c)) for c in cols})


def replace_sentinel(df: DataFrame, cols: list[str], sentinel: str, value) -> DataFrame:
    """P6 — conditional elementwise replace, the ``np.where(x == '<NA>', 0, x)``
    at ``Best-Model-architecture-for-local.py:23``."""
    return df.withColumns(
        {c: F.when(_q(c) == F.lit(sentinel), F.lit(value)).otherwise(_q(c)) for c in cols}
    )


def fill_constants(df: DataFrame, fills: dict) -> DataFrame:
    """F4 — constant null-fill (``read_csv_s3_train.py:83-84,102-104``)."""
    return df.na.fill(fills)


def epoch_ms_to_timestamp(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """F2 — epoch-ms -> timestamp; invalid/null coerces to null, matching
    ``pd.to_datetime(errors='coerce')`` (``read_csv_s3_train.py:72``)."""
    return df.withColumn(out or col, F.timestamp_millis(_q(col).cast("long")))


def add_date_parts(df: DataFrame, ts_col: str, default=(1970, 1, 1)) -> DataFrame:
    """F3 — year/month/day with epoch defaults on null
    (``read_csv_s3_train.py:73-75``)."""
    y, m, d = default
    return df.withColumns(
        {
            "year": F.coalesce(F.year(_q(ts_col)), F.lit(y)),
            "month": F.coalesce(F.month(_q(ts_col)), F.lit(m)),
            "day": F.coalesce(F.dayofmonth(_q(ts_col)), F.lit(d)),
        }
    )


def pseudonymize_keys(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """Deterministic PSEUDONYMIZATION of identifier columns: each value
    becomes a 16-hex-char md5 surrogate of (salt, value) — referential
    integrity survives (equal inputs map to equal tokens under one
    salt, so joins across pseudonymized tables still work), raw ids do
    not.  Salt rotation re-keys the whole estate.  NULLs stay NULL; the
    map-side expression never shuffles.  This is tokenization for
    analytics handoff (GDPR pseudonymization), NOT encryption: with
    the salt, tokens are recomputable from known ids — treat the salt
    as a secret.
    """
    out = df
    for c in cols:
        token = F.substring(
            F.md5(F.concat(F.lit(salt + "\x1f"), F.col(c).cast("string"))), 1, 16
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), token))
    return out


def pseudonymize_sql_expr(col: str, salt: str) -> str:
    """DuckDB twin of one :func:`pseudonymize_keys` column expression."""
    return (
        f"CASE WHEN {col} IS NOT NULL THEN "
        f"substr(md5('{salt}' || chr(31) || CAST({col} AS VARCHAR)), 1, 16) END"
    )
