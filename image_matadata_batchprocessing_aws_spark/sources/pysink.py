"""Custom Python Data Source WRITER (the batch-write side of the Spark 4
``pyspark.sql.datasource`` API — the reader/stream-reader live in
``sources/pysource.py``; this completes the plugin triangle).

A JSONL sink with the full two-phase commit protocol a distributed
writer owes its caller:

- each TASK writes its partition to ``part-<uuid>.jsonl.tmp`` and
  returns the name in its ``WriterCommitMessage`` — nothing a failed or
  speculative task writes is ever visible;
- ``commit`` (driver-side, exactly once, only after every task
  succeeded) renames the listed temp files to their final names and
  writes a ``_SUCCESS`` manifest naming them — readers that honor the
  manifest see an atomic all-or-nothing dataset;
- ``abort`` removes whatever temp files the failed attempt left.

This is the same temp-then-rename recipe Spark's own
``FileOutputCommitter`` v1 uses, reproduced at the plugin layer.  Scale
note: each task streams its rows (no buffering beyond one line), the
driver only ever handles file NAMES, and the rename-on-commit is
O(tasks), not O(rows).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, file_name: str):
        self.file_name = file_name


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, schema):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator):  # noqa: D102 — API contract
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, name + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {c: row[i] for i, c in enumerate(self.columns)},
                        ensure_ascii=False,
                        sort_keys=True,
                    )
                )
                fh.write("\n")
        return JsonlCommit(name)

    def commit(self, messages):  # noqa: D102 — API contract
        names = sorted(m.file_name for m in messages)
        for name in names:
            os.rename(
                os.path.join(self.path, name + ".tmp"),
                os.path.join(self.path, name),
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            fh.write("\n".join(names) + "\n")

    def abort(self, messages):  # noqa: D102 — API contract
        # failed tasks appear as None in `messages` (API contract) — and
        # abort only runs BECAUSE a task failed, so the guard is load-bearing
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.file_name + ".tmp"))
            except OSError:
                pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming side of the sink: same temp-then-rename recipe, but
    commit is PER EPOCH and the epoch's files rename to
    ``batch-<epoch>-<name>`` with a ``_SUCCESS-<epoch>`` manifest —
    re-running an epoch after a crash overwrites its own manifest and
    leaves every other epoch untouched (the replay-idempotency
    contract the numbered-batch parquet sink documents)."""

    def __init__(self, options: dict, schema):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator):  # noqa: D102 — API contract
        os.makedirs(self.path, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, name + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {c: row[i] for i, c in enumerate(self.columns)},
                        ensure_ascii=False,
                        sort_keys=True,
                    )
                )
                fh.write("\n")
        return JsonlCommit(name)

    def commit(self, messages, batchId):  # noqa: D102, N803 — API contract
        # epoch REPLAY (crash between commit and checkpoint write) re-runs
        # write() with fresh uuids — clear the previous attempt's files for
        # this epoch first, or replay leaves both attempts visible and a
        # batch-*.jsonl reader double-counts the epoch
        for stale in os.listdir(self.path):
            if stale.startswith(f"batch-{batchId}-"):
                os.remove(os.path.join(self.path, stale))
        names = []
        for m in messages:
            final = f"batch-{batchId}-{m.file_name}"
            os.rename(
                os.path.join(self.path, m.file_name + ".tmp"),
                os.path.join(self.path, final),
            )
            names.append(final)
        manifest = os.path.join(self.path, f"_SUCCESS-{batchId}")
        with open(manifest, "w", encoding="utf-8") as fh:
            fh.write("\n".join(sorted(names)) + "\n")

    def abort(self, messages, batchId):  # noqa: D102, N803 — API contract
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.file_name + ".tmp"))
            except OSError:
                pass


class JsonlSinkSource(DataSource):
    """``df.write.format("pyjsonl_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:  # noqa: D102 — API contract
        return "pyjsonl_sink"

    def writer(self, schema, overwrite: bool):  # noqa: D102 — API contract
        return JsonlSinkWriter(self.options, schema)

    def streamWriter(self, schema, overwrite: bool):  # noqa: D102, N802 — API contract
        return JsonlStreamWriter(self.options, schema)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkSource)
