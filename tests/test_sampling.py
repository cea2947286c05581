"""Properties of deterministic sampling and sequence packing: the whole
point of hash sampling is invariance (rerun, partitioning, corpus
growth), so that is what we assert — plus packing's offset arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.sampling import (
    hash_sample,
    hash_sample_stratified,
    pack_documents,
)


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 7 + 1).cast("long").alias("n_tokens"),
    )


def test_hash_sample_invariant_under_partitioning(spark):
    d = _corpus(spark)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in hash_sample(d.repartition(17), "doc_id", 0.3).collect()}
    assert a == b and 0 < len(a) < 400


def test_hash_sample_stable_under_corpus_growth(spark):
    # a doc's keep/drop decision never flips when other rows arrive
    small = _corpus(spark, 100)
    big = _corpus(spark, 400)
    from_small = {r.doc_id for r in hash_sample(small, "doc_id", 0.3).collect()}
    from_big = {
        r.doc_id for r in hash_sample(big, "doc_id", 0.3).where("doc_id < 100").collect()
    }
    assert from_small == from_big


def test_hash_sample_salt_decorrelates(spark):
    d = _corpus(spark)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.5, salt="a").collect()}
    b = {r.doc_id for r in hash_sample(d, "doc_id", 0.5, salt="b").collect()}
    assert a != b  # independent draws
    # both are ~half; their overlap is ~quarter (loose bounds)
    assert 100 < len(a) < 300 and 100 < len(b) < 300
    assert len(a & b) < min(len(a), len(b))


def test_stratified_fractions_respected(spark):
    d = _corpus(spark)
    out = hash_sample_stratified(
        d, "doc_id", "grp", {"0": 1.0, "1": 0.2}
    )
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts.get("0") == 134  # stratum kept whole (ids ≡ 0 mod 3)
    assert 0 < counts.get("1", 0) < 80  # downsampled well below its 133
    assert "2" not in counts  # absent stratum dropped


def test_pack_documents_offset_arithmetic(spark):
    d = _corpus(spark, 60)
    out = pack_documents(
        d, token_col="n_tokens", order_by="doc_id", budget=16, partition_by="grp"
    ).collect()
    by_grp: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.grp, r.doc_id)):
        by_grp.setdefault(r.grp, []).append(r)
    for rows in by_grp.values():
        expect_offset = 0
        for r in rows:
            assert r.pack_offset == expect_offset
            assert r.pack_id == expect_offset // 16
            expect_offset += r.n_tokens


def test_chunk_documents_overlap_and_tail(spark):
    from image_matadata_batchprocessing_aws_spark.queries.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, stride=3)
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens) for r in out.collect()}
    # doc 1: 10 tokens, starts 0,3,6,9 -> 4 chunks; overlap of 1 token
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert got[(1, 3)] == ("t9", 1)  # tail partial chunk kept
    # doc 2: single token -> exactly one chunk
    assert got[(2, 0)] == ("solo", 1)
    assert len(got) == 5


def test_quota_sample_exact_counts_and_partitioning_invariance(spark):
    from image_matadata_batchprocessing_aws_spark.operators.sampling import quota_sample

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = quota_sample(docs, "doc_id", "lang", 5)
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 5 and len(by_lang["de"]) == 5
    # small stratum: returned whole, not padded
    tiny = quota_sample(docs.where("doc_id < 4"), "doc_id", "lang", 5)
    assert tiny.count() == 4
    # repartitioning must not change the selection
    out2 = quota_sample(docs.repartition(13), "doc_id", "lang", 5)
    got2 = {(r.lang, r.doc_id) for r in out2.collect()}
    assert got2 == {(lang, d) for lang, ds in by_lang.items() for d in ds}


def test_token_budget_select_whole_docs_within_budget(spark):
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        token_budget_select,
    )

    rows = [(i, "en", 10) for i in range(10)] + [(100, "de", 7), (101, "de", 8)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = token_budget_select(docs, "doc_id", "lang", "n_tokens", budget=35)
    got = {r.lang: [] for r in out.collect()}
    for r in out.collect():
        got[r.lang].append(r)
    # en: 10-token docs, budget 35 -> exactly 3 kept (30 <= 35 < 40)
    assert len(got["en"]) == 3
    assert max(r.budget_used for r in got["en"]) == 30
    # de: 7 + 8 = 15 <= 35 -> both kept regardless of order
    assert len(got["de"]) == 2
    # whole docs only: no row's running total exceeds the budget
    assert all(r.budget_used <= 35 for rs in got.values() for r in rs)


def test_weighted_sample_deterministic_exact_n_and_weight_sensitive(spark):
    """A-Res weighted sampling: exactly n rows, stable under
    re-partitioning, a dominant weight is always selected, zero/negative
    weights never are, and the global top-n plans as a distributed
    TakeOrderedAndProject (no global sort, no single-partition window)."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 10.0) for i in range(500)]
    rows.append((900, 1e12))  # dominant weight: p(excluded) astronomically small
    rows.append((901, 0.0))   # never sampled
    rows.append((902, -5.0))  # never sampled
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, "doc_id", "w", 50, salt="s1")
    got = {r.doc_id for r in out.collect()}
    assert len(got) == 50
    assert 900 in got and 901 not in got and 902 not in got
    again = {r.doc_id for r in weighted_sample(df.repartition(17), "doc_id", "w", 50, salt="s1").collect()}
    assert again == got
    other = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 50, salt="s2").collect()}
    assert other != got  # independent draw under a different salt
    plan = weighted_sample(df, "doc_id", "w", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_negative_sample_deterministic_and_matches_hash(spark):
    import hashlib

    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        SAMPLE_DELIM,
        negative_sample,
    )

    corpus = spark.createDataFrame([(i,) for i in range(100)], "vec_id long")
    anchors = spark.createDataFrame([(0,), (7,), (23,)], "vec_id long")
    out = negative_sample(corpus, anchors, k=4, seed=9)
    got = {(r.anchor_id, r.neg_rank): r.neg_id for r in out.collect()}

    def draw(a, j):
        s = f"{a}{SAMPLE_DELIM}{j}{SAMPLE_DELIM}9"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 100

    for a in (0, 7, 23):
        for j in range(4):
            idx = draw(a, j)  # ids are 0..99 so index == id
            if idx == a:
                assert (a, j) not in got  # self-draw dropped, not redrawn
            else:
                assert got[(a, j)] == idx, (a, j)
    # rerun over a different partitioning: identical
    again = {
        (r.anchor_id, r.neg_rank): r.neg_id
        for r in negative_sample(
            corpus.repartition(7), anchors.repartition(2), k=4, seed=9
        ).collect()
    }
    assert again == got


def test_group_kfold_never_splits_a_group(spark):
    from image_matadata_batchprocessing_aws_spark.operators.sampling import group_kfold
    from pyspark.sql import functions as F

    rows = [(i, f"src{i % 17}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, source string")
    out = group_kfold(df, "source", k=4)
    per_group = out.groupBy("source").agg(
        F.countDistinct("fold").alias("nf")
    ).collect()
    assert all(r.nf == 1 for r in per_group)
    assert out.select("fold").distinct().count() > 1  # actually spreads
    # growth-stable: a new row of a known group joins its fold
    extra = group_kfold(
        spark.createDataFrame([(999, "src3")], "id long, source string"),
        "source", k=4,
    ).collect()[0].fold
    base = {r.source: r.fold for r in out.select("source", "fold").distinct().collect()}
    assert extra == base["src3"]


def test_temperature_sampling_upweights_low_resource_strata(spark):
    """alpha=0.5: the rare stratum's target share exceeds its natural
    share, the dominant stratum's shrinks; a clamped stratum (rate 1.0)
    keeps everything and stays visible in the report."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        TEMP_RATE_DENOM,
        temperature_rates,
        temperature_sample,
    )

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, lang string")
    rates = {r.stratum: r for r in
             temperature_rates(df, "lang", alpha=0.5, target_total=200).collect()}
    assert rates["small"].target_share > 0.1      # natural share was 0.1
    assert rates["big"].target_share < 0.9
    # shares sum to ~1
    assert abs(rates["small"].target_share + rates["big"].target_share - 1.0) < 1e-5
    kept = temperature_sample(df, "id", "lang", alpha=0.5, target_total=200)
    by = {r.lang: r.n for r in kept.groupBy("lang").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # realized counts track rate * n within hash noise
    exp_small = rates["small"].rate_ppm / TEMP_RATE_DENOM * 100
    assert abs(by.get("small", 0) - exp_small) < 30


def test_temperature_sampling_rerun_stable(spark):
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, lang string")
    a = sorted(r.id for r in temperature_sample(df, "id", "lang").collect())
    b = sorted(r.id for r in temperature_sample(df.repartition(7), "id", "lang").collect())
    assert a == b
