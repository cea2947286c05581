"""Custom Python Data Source (the Spark 4 ``pyspark.sql.datasource``
API): a DETERMINISTIC synthetic-corpus generator registered as a real
``spark.read.format(...)`` source.

Two reasons this exists beyond API-surface completeness:

- Corpus pipelines constantly need load/soak inputs ("give me 10M
  plausible documents, partitioned, NOW") without touching real data;
  a generator *source* makes that a scan, so everything downstream
  (pushdown, partition parallelism, AQE) behaves exactly as it will in
  production — unlike driver-side ``createDataFrame`` fixtures.
- The output is CLOSED-FORM: doc ``d`` is fully determined by the
  options, so a SQL oracle can regenerate the corpus bit-for-bit and
  the whole source path (plugin registration -> partition planning ->
  per-partition iterators -> Arrow) becomes oracle-checkable.

Partition ``i`` of ``P`` yields docs ``d = i, i+P, i+2P, ...`` — row
placement is partition-deterministic too, so parallelism never changes
results.  Generation cost is O(docs/partition) per task with zero
driver materialization; at 100 TB-scale soak tests you raise
``n_partitions`` and let the cluster fan out.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: text formula constants (mirrored by the SQL twin)
TOKEN_MULT = 37
TOKEN_MOD = 997
LEN_BASE = 20
LEN_SPREAD = 30
LANGS = ("en", "de", "fr", "es")


def doc_text(d: int) -> str:
    """Closed-form text of doc ``d`` (the contract the oracle mirrors):
    ``LEN_BASE + d % LEN_SPREAD`` tokens ``t{(d*TOKEN_MULT + j) % TOKEN_MOD}``."""
    n = LEN_BASE + d % LEN_SPREAD
    return " ".join(f"t{(d * TOKEN_MULT + j) % TOKEN_MOD}" for j in range(n))


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self):  # noqa: D102 — API contract
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):  # noqa: D102 — API contract
        start = partition.value
        for d in range(start, self.n_docs, self.n_partitions):
            text = doc_text(d)
            yield (d, text, LANGS[d % len(LANGS)], len(text))


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after
    ``spark.dataSource.register(SyntheticDocsSource)``."""

    @classmethod
    def name(cls) -> str:  # noqa: D102 — API contract
        return "synthetic_docs"

    def schema(self) -> str:  # noqa: D102 — API contract
        return "doc_id bigint, text string, lang string, n_chars bigint"

    def reader(self, schema):  # noqa: D102 — API contract
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: D102, N802 — API contract
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent plugin registration for the current session."""
    spark.dataSource.register(SyntheticDocsSource)


def doc_text_sql(d_expr: str) -> str:
    """DuckDB twin of :func:`doc_text` for oracle regeneration."""
    return (
        f"array_to_string(list_transform(range({LEN_BASE} + ({d_expr}) % {LEN_SPREAD}), "
        f"j -> 't' || (({d_expr}) * {TOKEN_MULT} + j) % {TOKEN_MOD}), ' ')"
    )


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch STREAM reader for the same closed-form corpus: each
    trigger advances the offset by ``batch_size`` docs until ``n_docs``
    is exhausted, so the stream replays the EXACT batch-mode corpus —
    offsets are plain dicts checkpointed by the engine, and a restart
    resumes from the committed offset (exactly-once at the source).
    """

    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self):  # noqa: D102, N802 — API contract
        return {"next": 0}

    def read(self, start):  # noqa: D102 — API contract
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n_docs)
        rows = []
        for d in range(lo, hi):
            text = doc_text(d)
            rows.append((d, text, LANGS[d % len(LANGS)], len(text)))
        return (iter(rows), {"next": hi})

    def readBetweenOffsets(self, start, end):  # noqa: D102, N802 — API contract
        rows = []
        for d in range(start["next"], end["next"]):
            text = doc_text(d)
            rows.append((d, text, LANGS[d % len(LANGS)], len(text)))
        return iter(rows)
