"""Property-style invariants (SURVEY section 5): resize geometry under
hypothesis, cross-engine hash parity, union-of-chunks equivalence,
scaling idempotence."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64, md5_int64_sql
from image_matadata_batchprocessing_aws_spark.multimodal.images import resize_with_padding
from image_matadata_batchprocessing_aws_spark.operators.scale import zscore_scale
from image_matadata_batchprocessing_aws_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@settings(max_examples=50, deadline=None)
@given(h=st.integers(1, 300), w=st.integers(1, 300))
def test_resize_with_padding_geometry(h, w):
    img = np.full((h, w, 3), 200, dtype=np.uint8)
    out = resize_with_padding(img, 224)
    assert out.shape == (224, 224, 3)
    nz_rows = np.where(out.any(axis=(1, 2)))[0]
    nz_cols = np.where(out.any(axis=(0, 2)))[0]
    nh, nw = len(nz_rows), len(nz_cols)
    # aspect preserved: the longer side fills the canvas
    assert max(nh, nw) in (223, 224)
    # content centered within one pixel
    assert abs(nz_rows[0] - (224 - nz_rows[-1] - 1)) <= 1
    assert abs(nz_cols[0] - (224 - nz_cols[-1] - 1)) <= 1


def test_md5_int64_cross_engine_parity(spark):
    tricky = ["", " ", "a", "Zürich", "0|the quick brown", "名前", "x" * 500, "NA", "🙂"]
    df = spark.createDataFrame([(s,) for s in tricky], "s string")
    got = {
        r.s: r.h for r in df.select("s", md5_int64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in tricky:
        (expected,) = con.execute(
            f"SELECT {md5_int64_sql('?')}", [s]
        ).fetchone()
        assert got[s] == expected, s


def test_union_of_chunks_equals_whole_read(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    parts = li.randomSplit([0.3, 0.3, 0.4], seed=7)
    import functools

    reunited = functools.reduce(lambda a, b: a.unionByName(b), parts)
    assert reunited.count() == li.count()
    a = reunited.agg(F.round(F.sum("l_extendedprice"), 2), F.sum("l_orderkey")).collect()
    b = li.agg(F.round(F.sum("l_extendedprice"), 2), F.sum("l_orderkey")).collect()
    assert a == b


def test_ffill_partitioned_matches_single_window(spark):
    from image_matadata_batchprocessing_aws_spark.operators.impute import ffill, ffill_partitioned

    e = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("v"))
    )
    scale_path = {r.event_id: r.v for r in ffill_partitioned(e, ["v"], "event_id").collect()}
    reference = {r.event_id: r.v for r in ffill(e, ["v"], order_by="event_id").collect()}
    assert scale_path == reference


def test_minhash_empty_result_on_all_unique_docs(spark):
    from image_matadata_batchprocessing_aws_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"totally unique document number {i} about topic {i * 7}") for i in range(6)],
        "doc_id long, text string",
    )
    assert minhash_lsh_pairs(docs, threshold=0.9).count() == 0


def test_zscore_idempotent_on_standardized_data(spark):
    e = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    once = zscore_scale(e, ["value"])
    stats = once.agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    ).collect()[0]
    assert abs(stats.m) < 1e-9 and abs(stats.s - 1.0) < 1e-9
    twice = zscore_scale(once, ["value"])
    merged = once.select("event_id", F.col("value").alias("v1")).join(
        twice.select("event_id", F.col("value").alias("v2")), "event_id"
    )
    max_diff = merged.agg(F.max(F.abs(F.col("v1") - F.col("v2")))).collect()[0][0]
    assert max_diff < 1e-9


def test_global_row_number_matches_single_window(spark):
    """Two-pass numbering == a keyless row_number window, on a frame
    spread over many partitions with an adversarial initial layout."""
    from pyspark.sql import Window

    from image_matadata_batchprocessing_aws_spark.operators.batching import global_row_number

    e = load_table(spark, SF_SMOKE, "events").select("event_id").repartition(13)
    got = {
        r.event_id: r.pos
        for r in global_row_number(e, ["event_id"], "pos").collect()
    }
    w = Window.orderBy("event_id")
    want = {
        r.event_id: r.pos
        for r in e.withColumn("pos", (F.row_number().over(w) - 1).cast("long")).collect()
    }
    assert got == want


def test_shuffle_deterministic_partitioning_invariant(spark):
    """The permutation is a pure function of (key, seed): repartitioning
    must not change any position, and a different seed must."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import shuffle_deterministic

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = {r.doc_id: r.shuffle_pos for r in shuffle_deterministic(d, "doc_id", "s1").collect()}
    b = {
        r.doc_id: r.shuffle_pos
        for r in shuffle_deterministic(d.repartition(17), "doc_id", "s1").collect()
    }
    assert a == b
    c = {r.doc_id: r.shuffle_pos for r in shuffle_deterministic(d, "doc_id", "s2").collect()}
    assert c != a  # independent permutation per seed
    # positions form an exact 0..n-1 permutation in every case
    assert sorted(a.values()) == list(range(len(a)))


@settings(max_examples=25, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=2, max_value=16),
    stride_delta=st.integers(min_value=0, max_value=8),
)
def test_chunking_covers_every_token(spark, n_tokens, chunk, stride_delta):
    """Every token of a doc appears in at least one chunk; chunk_ids are
    dense 0..m-1; no chunk exceeds the token budget."""
    from image_matadata_batchprocessing_aws_spark.queries.chunking import chunk_documents

    stride = max(1, chunk - stride_delta)  # stride <= chunk => full coverage
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    ids = sorted(r.chunk_id for r in rows)
    assert ids == list(range(len(rows)))
    seen = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert 1 <= len(toks) <= chunk
        assert r.n_chunk_tokens == len(toks)
        seen.update(toks)
    assert seen == {f"w{i}" for i in range(n_tokens)}


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=2, max_value=8),
    vocab=st.integers(min_value=3, max_value=8),
    k=st.integers(min_value=2, max_value=4),
)
def test_duplicated_spans_match_bruteforce(spark, seed, n_docs, vocab, k):
    """duplicated_spans == a brute-force Python reference on random
    small-vocab corpora (small vocab => real collisions): same maximal
    runs, spans never overlap within a doc, every span >= k tokens."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        duplicated_spans,
    )

    rng = np.random.default_rng(seed)
    docs = {
        i: [f"t{rng.integers(vocab)}" for _ in range(int(rng.integers(k, 20)))]
        for i in range(n_docs)
    }
    # brute force: count every positional k-gram corpus-wide, mark
    # duplicated positions, merge consecutive runs
    from collections import Counter

    counts = Counter()
    for toks in docs.values():
        for i in range(len(toks) - k + 1):
            counts[tuple(toks[i : i + k])] += 1
    expect = set()
    for d, toks in docs.items():
        dup = [
            i
            for i in range(len(toks) - k + 1)
            if counts[tuple(toks[i : i + k])] >= 2
        ]
        run = []
        for i in dup:
            if run and i == run[-1] + 1:
                run.append(i)
            else:
                if run:
                    expect.add((d, run[0], run[-1] + k - 1, len(run)))
                run = [i]
        if run:
            expect.add((d, run[0], run[-1] + k - 1, len(run)))
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
        for r in duplicated_spans(df, k=k, materialize=False).collect()
    }
    assert got == expect
    # invariants: spans >= k tokens; distinct runs may overlap in TOKEN
    # space, but never by k or more (that would be one run)
    per_doc = {}
    for d, s, e, _ in got:
        assert e - s + 1 >= k
        per_doc.setdefault(d, []).append((s, e))
    for spans in per_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > s1 and e1 - s2 + 1 < k  # overlap bounded by k-1
    # dup_fraction must stay in [0, 1] even with overlapping spans
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        doc_dup_fraction,
    )

    fr = doc_dup_fraction(
        duplicated_spans(df, k=k, materialize=False), df
    ).collect()
    assert all(0.0 <= r.dup_fraction <= 1.0 for r in fr)


def test_r04_operators_partitioning_invariant(spark):
    """sessionize / ewma_trailing / interpolate_linear must return
    identical values under any input partitioning — the determinism
    property every keyed-window operator claims in its docstring."""
    from datetime import datetime, timedelta

    from image_matadata_batchprocessing_aws_spark.operators.impute import interpolate_linear
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        ewma_trailing,
        sessionize,
    )

    rng = np.random.default_rng(12)
    t0 = datetime(2024, 1, 1)
    rows = []
    for k in range(5):
        t = 0
        for i in range(80):
            t += int(rng.integers(1, 90))  # minutes; some gaps > 30
            v = None if rng.uniform() < 0.2 else round(float(rng.uniform(0, 9)), 3)
            rows.append((k, i, t0 + timedelta(minutes=t), v))
    df = spark.createDataFrame(rows, "k long, i long, ts timestamp, v double")

    def run(frame):
        s = sessionize(frame, "k", "ts", "i", gap_minutes=30)
        e = ewma_trailing(
            frame.where(F.col("v").isNotNull()), "k", "ts", "v", "i", lookback=20
        )
        ii = interpolate_linear(frame, ["v"], order_by="ts", partition_by=["k"])
        return (
            sorted((r.k, r.i, r.session_seq) for r in s.collect()),
            sorted((r.k, r.i, r.ewma) for r in e.collect()),
            sorted((r.k, r.i, r.v) for r in ii.collect()),
        )

    a = run(df.repartition(13))
    b = run(df.repartition(2, "k"))
    assert a == b


def test_r04_eval_operators_partitioning_invariant(spark):
    """roc_auc / confusion_metrics / cohens_kappa / rouge_pair_scores
    claim exact-integer determinism — identical output under any input
    partitioning."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        cohens_kappa,
        confusion_metrics,
        roc_auc,
        rouge_pair_scores,
    )

    rng = np.random.default_rng(7)
    rows = [
        (
            round(float(rng.uniform(0, 1)), 3),
            int(rng.integers(0, 2)),
            ["a", "b", "c"][int(rng.integers(0, 3))],
            ["a", "b", "c"][int(rng.integers(0, 3))],
        )
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "s double, y int, p string, t string")
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(list("abcdefg"), size=12))) for i in range(30)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 28, 2)], "id_a long, id_b long"
    )

    def run(frame, dframe):
        return (
            sorted(map(tuple, roc_auc(frame, "s", "y").collect())),
            sorted(map(tuple, confusion_metrics(frame, "p", "t").collect())),
            sorted(map(tuple, cohens_kappa(frame, "p", "t").collect())),
            sorted(map(tuple, rouge_pair_scores(dframe, pairs).collect())),
        )

    a = run(df.repartition(17), docs.repartition(9))
    b = run(df.repartition(3, "p"), docs.coalesce(1))
    assert a == b
