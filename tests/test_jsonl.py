"""JSONL source/sink: round-trip fidelity, corrupt-line isolation,
and shard sizing."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.sources.jsonl_source import (
    CORRUPT_COL,
    corrupt_line_audit,
    read_jsonl,
    write_jsonl,
)
from image_matadata_batchprocessing_aws_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_jsonl_roundtrip_preserves_documents(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(
        spark, out,
        "doc_id long, text string, lang string, source string, n_chars long",
        keep_corrupt=False,
    )
    orig = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in docs.collect()}
    got = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in back.collect()}
    assert got == orig  # byte-faithful round trip, unicode included


def test_jsonl_corrupt_lines_isolate_per_row(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok"}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also ok"}),
        '{"doc_id": "not-a-long", "text": 3}',
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    audit = corrupt_line_audit(df, "doc_id").collect()[0]
    assert (audit.good_lines, audit.corrupt_lines) == (2, 2)
    assert audit.probe_nonnull == 2  # the type-mismatch row parsed doc_id NULL
    good = df.where(F.col(CORRUPT_COL).isNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    # keep_corrupt=False = DROPMALFORMED: only fully-parsed rows
    # survive a column-referencing plan...
    clean = read_jsonl(spark, str(p), "doc_id long, text string", keep_corrupt=False)
    assert clean.columns == ["doc_id", "text"]
    assert {(r.doc_id, r.text) for r in clean.collect()} == {(1, "ok"), (2, "also ok")}
    # ...but a bare count() references NO data columns: Spark only
    # tokenizes (dropping the not-JSON line) without converting
    # fields, so the failed-field row still counts — the documented
    # DROPMALFORMED landmine this source's docstring warns about
    assert clean.count() == 3


def test_jsonl_sink_shards_by_record_count(spark, tmp_path):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    out = str(tmp_path / "sharded")
    write_jsonl(df.coalesce(1), out, max_records_per_file=30)
    parts = glob.glob(f"{out}/part-*")
    assert len(parts) == 4  # 30+30+30+10
    total = sum(1 for f in parts for _ in open(f))
    assert total == 100
