"""Custom Python Data Source plugin: registration, partition planning,
determinism, option handling."""

from __future__ import annotations

from image_matadata_batchprocessing_aws_spark.sources import pysource


def _read(spark, n_docs, n_parts):
    pysource.register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", str(n_docs))
        .option("n_partitions", str(n_parts))
        .load()
    )


def test_pysource_generates_full_deterministic_corpus(spark):
    df = _read(spark, 37, 5)
    rows = {r.doc_id: (r.text, r.lang, r.n_chars) for r in df.collect()}
    assert set(rows) == set(range(37))  # every doc exactly once
    for d in (0, 7, 36):
        text = pysource.doc_text(d)
        assert rows[d] == (text, pysource.LANGS[d % 4], len(text))
    # re-read is identical (a generator SOURCE, not a random fixture)
    again = {r.doc_id: (r.text, r.lang, r.n_chars) for r in _read(spark, 37, 5).collect()}
    assert again == rows


def test_pysource_partition_count_and_placement(spark):
    df = _read(spark, 40, 4)
    import pyspark.sql.functions as F

    parts = (
        df.select(F.spark_partition_id().alias("p"), "doc_id")
        .groupBy("p")
        .count()
        .collect()
    )
    assert len(parts) == 4 and all(r["count"] == 10 for r in parts)


def test_pysource_partitions_dont_change_results(spark):
    import pyspark.sql.functions as F

    def fp(n_parts):
        return _read(spark, 64, n_parts).agg(
            F.sum("doc_id"), F.sum("n_chars"), F.count("*")
        ).collect()[0]

    assert tuple(fp(1)) == tuple(fp(7)) == tuple(fp(64))


def test_pysource_stream_replays_batch_corpus_exactly(spark, tmp_path):
    """The stream reader must replay the batch corpus exactly across
    micro-batches (offsets advance by batch_size until exhausted) —
    stream == batch at the source level."""
    pysource.register(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("n_docs", "50")
        .option("batch_size", "20")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pysource_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: (r.text, r.lang, r.n_chars)
        for r in spark.sql("SELECT * FROM pysource_stream").collect()
    }
    want = {r.doc_id: (r.text, r.lang, r.n_chars) for r in _read(spark, 50, 4).collect()}
    assert got == want


def test_python_datasource_writer_roundtrip(spark, tmp_path):
    """sources/pysink.py: the custom Python DataSource WRITER — write
    documents through the plugin (temp-then-rename two-phase commit),
    read the JSONL back, and require exact row equality plus the
    _SUCCESS manifest naming exactly the visible part files."""
    import os

    from image_matadata_batchprocessing_aws_spark.sources.pysink import register_sink
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    register_sink(spark)
    out = str(tmp_path / "sink")
    src = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    src.repartition(4).write.format("pyjsonl_sink").option("path", out).mode(
        "append"
    ).save()

    files = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    manifest = open(os.path.join(out, "_SUCCESS")).read().split()
    assert manifest == files and len(files) == 4
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]

    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        f"{out}/*.jsonl"
    )
    got = sorted(tuple(r) for r in back.collect())
    exp = sorted(tuple(r) for r in src.collect())
    assert got == exp and len(got) > 0


def test_python_datasource_stream_writer(spark, tmp_path):
    """The STREAMING side of the plugin sink: events stream through
    writeStream.format('pyjsonl_sink') across micro-batches; every
    input row lands exactly once, per-epoch manifests name exactly the
    visible files, and no temp files survive."""
    import glob as _glob
    import os

    from image_matadata_batchprocessing_aws_spark.sources.pysink import register_sink
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    register_sink(spark)
    src_dir = str(tmp_path / "in")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type")
    ev.repartition(3).write.mode("overwrite").parquet(src_dir)
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("pyjsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert not _glob.glob(f"{out}/*.tmp")
    manifests = sorted(_glob.glob(f"{out}/_SUCCESS-*"))
    assert len(manifests) >= 2  # multiple epochs actually ran
    named = sorted(
        n for m in manifests for n in open(m).read().split()
    )
    on_disk = sorted(
        os.path.basename(p) for p in _glob.glob(f"{out}/batch-*.jsonl")
    )
    assert named == on_disk
    back = spark.read.schema("event_id long, event_type string").json(
        f"{out}/batch-*.jsonl"
    )
    got = sorted(tuple(r) for r in back.collect())
    exp = sorted(tuple(r) for r in ev.collect())
    assert got == exp and len(got) > 0


def test_stream_writer_epoch_replay_is_idempotent(tmp_path):
    """Replaying commit(epoch) after a crash must not leave the first
    attempt's batch files visible (write() uses fresh uuids per
    attempt, so commit clears its own epoch's files first)."""
    import os

    from pyspark.sql.types import StructField, StructType, StringType

    from image_matadata_batchprocessing_aws_spark.sources.pysink import (
        JsonlCommit,
        JsonlStreamWriter,
    )

    schema = StructType([StructField("a", StringType())])
    w = JsonlStreamWriter({"path": str(tmp_path)}, schema)
    for attempt in ("first", "second"):
        for i in range(2):
            name = f"{attempt}{i}.jsonl"
            open(os.path.join(tmp_path, name + ".tmp"), "w").write("{}\n")
        w.commit([JsonlCommit(f"{attempt}0.jsonl"), JsonlCommit(f"{attempt}1.jsonl")], 7)
    visible = sorted(f for f in os.listdir(tmp_path) if f.startswith("batch-"))
    assert visible == ["batch-7-second0.jsonl", "batch-7-second1.jsonl"]
    manifest = open(os.path.join(tmp_path, "_SUCCESS-7")).read().split()
    assert manifest == visible


def test_batch_writer_abort_tolerates_failed_tasks(tmp_path):
    """abort receives None for failed tasks (API contract) and must
    still clean the successful tasks' temp files."""
    import os

    from pyspark.sql.types import StructField, StructType, StringType

    from image_matadata_batchprocessing_aws_spark.sources.pysink import (
        JsonlCommit,
        JsonlSinkWriter,
    )

    schema = StructType([StructField("a", StringType())])
    w = JsonlSinkWriter({"path": str(tmp_path)}, schema)
    open(os.path.join(tmp_path, "ok.jsonl.tmp"), "w").write("{}\n")
    w.abort([None, JsonlCommit("ok.jsonl"), None])
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
