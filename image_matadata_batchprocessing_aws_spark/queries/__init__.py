"""The oracle-checked query inventory (driver contract).

Each submodule exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL twins).  Names map to
SURVEY.md section 2 operator ids — see PARITY.md for the line-by-line map.

Cross-engine determinism rules (every query follows them):

- computed integers are cast to BIGINT on both sides;
- float aggregates are ``round()``ed identically on both sides (raw
  parquet doubles pass through exactly);
- timestamps leave results as epoch-ms BIGINT (``unix_millis`` /
  ``epoch_ms``) — no tz ambiguity;
- any top-k orders by the rounded measure plus a unique key, so ties
  break identically in both engines.
"""

from __future__ import annotations

from image_matadata_batchprocessing_aws_spark.queries import chunking as _chunking
from image_matadata_batchprocessing_aws_spark.queries import dedup as _dedup
from image_matadata_batchprocessing_aws_spark.queries import etl as _etl
from image_matadata_batchprocessing_aws_spark.queries import multimodal as _multimodal
from image_matadata_batchprocessing_aws_spark.queries import relational as _relational
from image_matadata_batchprocessing_aws_spark.queries import sampling as _sampling
from image_matadata_batchprocessing_aws_spark.queries import search as _search
from image_matadata_batchprocessing_aws_spark.queries import similarity as _similarity
from image_matadata_batchprocessing_aws_spark.queries import streaming_batch as _streaming
from image_matadata_batchprocessing_aws_spark.queries import text as _text
from image_matadata_batchprocessing_aws_spark.queries import timejoins as _timejoins

# Registry order IS the driver's correctness-check order (first 50 entries
# get oracle rows).  North-star families (dedup/similarity/text/timejoins/
# sampling/multimodal) go right after etl so every family lands inside the
# window: 16+9+5+8+2+3+2 = 45, plus streaming's first 5 (stream_json_* lead
# that module — they had no round-1 driver rows).  relational's 29 entries
# sit below the fold: all were driver-verified green in CORRECTNESS_r01.
_MODULES = [
    _etl,
    _dedup,
    _similarity,
    _text,
    _timejoins,
    _sampling,
    _multimodal,
    _streaming,
    _relational,
    _chunking,
    _search,
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
