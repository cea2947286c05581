from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.text import (
    add_fingerprint,
    add_lang_id,
    add_quality_score,
    add_token_stats,
)
from image_matadata_batchprocessing_aws_spark.sources.csv_source import read_csv
from pyspark.sql import types as T


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "  a bb  ccc ")], "doc_id long, text string")
    r = add_token_stats(df).collect()[0]
    assert r.n_tokens == 3
    assert r.n_chars_nospace == 6
    assert abs(r.avg_token_len - 2.0) < 1e-9


def test_quality_and_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat sat"), (3, "zebra xylophone quartz")],
        "doc_id long, text string",
    )
    q = {r.doc_id: r.quality for r in add_quality_score(df).collect()}
    assert q[1] == q[2]
    fp = {r.doc_id: r.fingerprint for r in add_fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]
    assert all(v >= 0 for v in fp.values())


def test_lang_id_emits_known_code(spark):
    df = spark.createDataFrame([(1, "the weather in the north")], "doc_id long, text string")
    r = add_lang_id(df).collect()[0]
    assert r.lang_pred in {"en", "de", "fr", "es", "zh"}


def test_schemad_csv_with_sentinels(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("id,country,road_index\n1,  us ,0.5\n2,NA,\n3,<NA>,1.5\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("country", T.StringType()),
            T.StructField("road_index", T.DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema)
    rows = {r.id: (r.country, r.road_index) for r in df.collect()}
    assert rows[1] == ("  us ", 0.5)  # trim is a separate operator
    assert rows[2] == (None, None)
    assert rows[3] == (None, 1.5)


def test_bpe_tokens_split_words_digits_punct(spark):
    from pyspark.sql import functions as F

    from image_matadata_batchprocessing_aws_spark.operators.text import bpe_token_count, bpe_tokens

    row = (
        spark.createDataFrame([("Hello, world! v2.0 costs $35",)], "t string")
        .select(bpe_tokens("t").alias("toks"), bpe_token_count("t").alias("n"))
        .collect()[0]
    )
    assert row.toks == ["Hello", ",", "world", "!", "v", "2", ".", "0", "costs", "$", "35"]
    assert row.n == 11


def test_repetition_stats_flags_boilerplate(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "a quick brown fox jumps over lazy dogs"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    # doc 1: 7 bigrams, "buy now" appears 4 times -> 4/7; 2 distinct of 8 tokens
    assert out[1].n_tokens == 8 and out[1].n_bigrams == 7
    assert abs(out[1].top_bigram_frac - round(4 / 7, 4)) < 1e-9
    assert out[1].dup_token_frac == 0.75
    # doc 2: all tokens and bigrams unique
    assert out[2].top_bigram_frac == round(1 / 7, 4)
    assert out[2].dup_token_frac == 0.0


def test_line_repetition_stats_line_and_paragraph_grain(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import line_repetition_stats

    df = spark.createDataFrame(
        [
            # 4 lines, "menu" twice: dup_line_frac = (4-3)/4;
            # chars in duplicated lines = 2*4 of 4+4+9+11 = 8/28
            (1, "menu\nmenu\nabout us!\ncontact us!"),
            (2, "one\ntwo\nthree"),
            # paragraph-grain doc: blank-line separated, chorus repeats
            (3, "chorus line\n\nverse one\n\nchorus line"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_repetition_stats(df).collect()}
    assert out[1].n_lines == 4
    assert out[1].dup_line_frac == 0.25
    assert out[1].dup_line_char_frac == round(8 / 28, 4)
    assert out[2].dup_line_frac == 0.0 and out[2].dup_line_char_frac == 0.0
    # paragraph grain: 3 paragraphs, "chorus line" twice
    para = {
        r.doc_id: r
        for r in line_repetition_stats(df, delim="\n\n").collect()
    }
    assert para[3].n_lines == 3
    assert para[3].dup_line_frac == round(1 / 3, 4)
    assert para[3].dup_line_char_frac == round(22 / 31, 4)


def test_redact_scrubs_email_phone_numbers(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import redact

    df = spark.createDataFrame(
        [
            (1, "mail jane.doe+x@corp.example.org or call +1 (555) 123-4567 room 42"),
            (2, "no pii here"),
        ],
        "id long, t string",
    )
    out = {r.id: r for r in redact(df, "t").collect()}
    assert out[1].redacted == "mail [EMAIL] or call [PHONE] room [NUM]"
    assert out[1].n_redactions == 3
    assert out[2].redacted == "no pii here" and out[2].n_redactions == 0


def test_drop_common_lines_boilerplate_removal(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import drop_common_lines

    banner = "ACCEPT COOKIES TO CONTINUE"
    footer = "(c) example corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique prose about owls\n\n{footer}"),
            (2, f"{banner}\ndifferent text about rivers\n{footer}"),
            (3, f"{banner}\nthird essay entirely\n{footer}"),
            (4, "a document with no boilerplate at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in drop_common_lines(docs, max_doc_freq=1).collect()}
    assert out[1].text_kept == "unique prose about owls\n"  # blank line survives
    assert out[1].n_lines_dropped == 2  # banner + footer
    assert out[2].text_kept == "different text about rivers"
    assert out[3].text_kept == "third essay entirely"
    assert out[4].text_kept == "a document with no boilerplate at all"
    assert out[4].n_lines_dropped == 0


def test_drop_common_lines_keeps_fully_boilerplate_doc_row(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import drop_common_lines

    docs = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "other")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in drop_common_lines(docs, max_doc_freq=1).collect()}
    assert set(out) == {1, 2, 3}  # no doc row vanishes
    assert out[1].text_kept == "" and out[1].n_lines_dropped == 1
    assert out[3].text_kept == "other"


def test_drop_common_lines_regex_metachar_delimiter(spark):
    """Delimiter is literal, not regex: '.' must split on dots only."""
    from image_matadata_batchprocessing_aws_spark.operators.text import drop_common_lines

    docs = spark.createDataFrame(
        [(1, "shared sentence.unique one"), (2, "shared sentence.unique two")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in drop_common_lines(docs, max_doc_freq=1, delim=".").collect()}
    assert out[1].text_kept == "unique one"
    assert out[2].text_kept == "unique two"
    assert out[1].n_lines_dropped == 1


def test_bm25_ranks_term_rich_docs_first(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark join vector spark join vector spark"),
            (2, "spark appears once in this much longer document about nothing"),
            (3, "entirely unrelated prose with no matching terms at all"),
            (4, "join join"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_rank(docs, ["spark", "join", "vector"], top_k=10).collect()
    order = [r.doc_id for r in rows]
    assert order[0] == 1  # richest doc first
    assert 3 not in order  # no matching terms -> no row
    assert len(order) == 3
    scores = {r.doc_id: r.bm25 for r in rows}
    assert scores[1] > scores[4] > 0 and scores[2] > 0


def test_charlm_scores_natural_text_above_gibberish(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import charlm_score

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the rug"),
            (3, "the dog sat on the mat"),
            (4, "qzx jvq wkf pzy bqx"),  # trigrams shared with nothing
            (5, "ab"),                   # < 3 chars -> no trigrams, no row
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in charlm_score(docs).collect()}
    assert 5 not in out
    assert set(out) == {1, 2, 3, 4}
    # the three near-identical prose docs share trigrams -> high bits;
    # the gibberish doc's trigrams are singletons -> every count is 1,
    # bit length 1, mean exactly 1.0
    assert out[4].charlm_bits == 1.0
    for d in (1, 2, 3):
        assert out[d].charlm_bits > 1.5
    # n_trigrams = len(normalized) - 2
    assert out[1].n_trigrams == len("the cat sat on the mat") - 2


def test_charlm_whitespace_normalization_collapses_runs(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import charlm_score

    docs = spark.createDataFrame(
        [(1, "a  b\t c"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in charlm_score(docs).collect()}
    # both normalize to "a b c" -> identical trigram sets and scores
    assert out[1].n_trigrams == out[2].n_trigrams == 3
    assert out[1].charlm_bits == out[2].charlm_bits


def test_tfidf_keywords_rank_rare_terms_first(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common words everywhere"),
            (3, "common words again and again"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    top1 = sorted(by_doc[1], key=lambda r: r.rank)[0]
    # zebra: tf=3, df=1, N=3 -> tfidf 9.0 beats common (tf=2, df=3 -> 2.0)
    assert top1.token == "zebra" and top1.tfidf == 9.0
    assert all(len(v) <= 2 for v in by_doc.values())
    # ranks are 1..k and deterministic
    assert [r.rank for r in sorted(by_doc[1], key=lambda r: r.rank)] == [1, 2]


def test_jsonl_source_roundtrip_with_explicit_schema(spark, tmp_path):
    """JSONL is a first-class source: write the events slice as
    newline-delimited JSON, read it back with an EXPLICIT schema (no
    inference job — the same no-inferSchema rule as CSV), values
    identical.  PERMISSIVE mode parks malformed lines in
    _corrupt_record instead of failing the scan."""
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type"
    ).limit(50)
    p = str(tmp_path / "ev_json")
    e.write.mode("overwrite").json(p)
    back = spark.read.schema("event_id long, user_id long, event_type string").json(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, e.collect()))
    # corrupt-line isolation
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"event_id": 1, "user_id": 2, "event_type": "click"}\nnot-json\n')
    parsed = spark.read.schema(
        "event_id long, user_id long, event_type string, _corrupt_record string"
    ).json(str(bad))
    rows = parsed.collect()
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1
    assert sum(1 for r in rows if r.event_id == 1) == 1


def test_orc_sink_and_scan_roundtrip(spark, tmp_path):
    """ORC is the second columnar format Spark ships built-in: writer ->
    reader round-trip must be value-identical to the parquet source,
    with predicate pushdown available on the scan."""
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    from tests.conftest import SF_SMOKE

    c = load_table(spark, SF_SMOKE, "customer")
    p = str(tmp_path / "cust_orc")
    c.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == c.schema
    assert sorted(r.c_custkey for r in back.collect()) == sorted(
        r.c_custkey for r in c.collect()
    )
    plan = back.where(F.col("c_custkey") == 7)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan  # scan-level pushdown on ORC too


def test_redact_pii_luhn_gated_cross_engine(spark):
    import duckdb
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.operators.text import redact_pii, redact_pii_sql

    def luhn_py(s):
        ds = [int(c) for c in s.replace(" ", "").replace("-", "")][::-1]
        return sum(d if i % 2 == 0 else (d * 2 - 9 if d * 2 > 9 else d * 2)
                   for i, d in enumerate(ds)) % 10 == 0

    valid_card = "4539 1488 0343 6467"
    invalid_card = "4539 1488 0343 6468"
    assert luhn_py(valid_card) and not luhn_py(invalid_card)
    docs = [
        f"pay with {valid_card} now",
        f"order id {invalid_card} stays",
        "host 10.0.0.1 and bad 300.1.2.3",
        "ssn 123-45-6789 leaked",
        "clean text with no pii at all",
        f"two cards {valid_card} and 4716-4615-8332-2103",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "i long, text string"
    )
    got = {
        (r.i): (r.redacted, r.n_cards) for r in redact_pii(df, "text").collect()
    }
    assert got[0] == ("pay with [CARD] now", 1)
    assert got[1] == (f"order id {invalid_card} stays", 0)
    assert got[2] == ("host [IP] and bad 300.1.2.3", 0)
    assert got[3] == ("ssn [SSN] leaked", 0)
    assert got[4] == ("clean text with no pii at all", 0)
    assert got[5][1] == 2 and "[CARD] and [CARD]" in got[5][0]
    # dialect parity: the generated twin must agree byte for byte
    red_sql, n_sql = redact_pii_sql("text")
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"i": range(len(docs)), "text": docs}))
    expected = {
        i: (r, n)
        for i, r, n in con.execute(
            f"SELECT i, {red_sql}, {n_sql} FROM d"
        ).fetchall()
    }
    assert got == expected


def test_llr_ranks_frequent_collocation_over_rare_coincidence(spark):
    """PMI's failure mode: a once-co-occurring hapax pair outranks a
    20x-attested collocation.  LLR weights evidence, so the frequent
    pair wins."""
    from image_matadata_batchprocessing_aws_spark.operators.text import llr_bigrams

    docs = ["strong coffee every day"] * 20 + ["zyzzyva qwerty"] + [
        "coffee day strong night" for _ in range(5)
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = llr_bigrams(df, "text", min_count=1, top_k=10).collect()
    ranks = {(r.w1, r.w2): i for i, r in enumerate(out)}
    assert ranks[("strong", "coffee")] < ranks[("zyzzyva", "qwerty")]
    by_pair = {(r.w1, r.w2): r for r in out}
    assert by_pair[("strong", "coffee")].pair_count == 20


def test_sentence_budget_chunks_respect_boundaries(spark):
    from image_matadata_batchprocessing_aws_spark.operators.text import (
        sentence_budget_chunks,
    )

    text = "aaaa. bbbb. cccc. " + "d" * 50 + ". eeee."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        sentence_budget_chunks(df, budget_chars=10).collect(),
        key=lambda r: r.chunk_id,
    )
    # sentences are 4,4,4,50,4 chars; next-fit assigns by START offset
    # (a chunk may overflow by its last sentence, same contract as
    # compaction_plan): starts 0,4,8 -> chunk 0; start 12 -> chunk 1
    # (the oversized sentence alone); start 62 -> chunk 6
    assert out[0].n_sentences == 3 and out[0].n_chars == 12
    assert any(r.n_sentences == 1 and r.n_chars == 50 for r in out)  # oversized alone
    assert sum(r.n_chars for r in out) == 4 + 4 + 4 + 50 + 4  # nothing split or lost


def test_parse_fixed_width_nulls_blank_fields(spark):
    from image_matadata_batchprocessing_aws_spark.sources.csv_source import (
        parse_fixed_width,
    )

    df = spark.createDataFrame(
        [("0000000042AB000000000100",), ("          CD            ",)],
        "line string",
    )
    out = parse_fixed_width(
        df, "line",
        [("k", 1, 10, "long"), ("s", 11, 2, "string"), ("v", 13, 12, "long")],
    ).collect()
    assert (out[0].k, out[0].s, out[0].v) == (42, "AB", 100)
    assert out[1].k is None and out[1].s == "CD" and out[1].v is None


def test_rake_prefers_cohesive_phrases(spark):
    """'deep learning' (words that only appear together in a long run)
    outscores the isolated frequent word; phrase boundaries respect
    both stopwords and punctuation."""
    from image_matadata_batchprocessing_aws_spark.operators.text import rake_keyphrases

    docs = [(i, "deep learning systems beat the baseline. baseline") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.phrase: r for r in rake_keyphrases(
        df, min_phrase_count=1, top_k=20).collect()}
    assert "deep learning systems beat" in out     # stopword 'the' splits here
    assert "baseline" in out                       # punctuation isolates it too
    assert out["deep learning systems beat"].rake_score > out["baseline"].rake_score
    assert not any("the" in p.split() for p in out)  # stopwords never in phrases
