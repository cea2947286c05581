"""Gopher quality rules (Rae et al. 2021, A1.1): each rule exercised by
a planted fixture that violates exactly that rule."""

from __future__ import annotations

from image_matadata_batchprocessing_aws_spark.operators.text import add_gopher_rules

#: A compliant base document: >10 words, mean word length in range,
#: alphabetic, two Gopher stop words, no symbols/bullets/ellipses.
GOOD = "the quick brown fox jumps over and over the lazy dog near the old stone wall today"


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in add_gopher_rules(df, min_words=10, **kw).collect()}


def test_each_rule_fires_independently(spark):
    line12 = "the fox and hound walked along the river bank very early today"
    texts = [
        GOOD,                                            # 0: passes everything
        "the and words here remain fine today",          # 1: word count < 10
        "be to a b c d e f g h i j k l",                 # 2: mean word len < 3
        GOOD + " tag# tag#",                             # 3: symbol ratio > 0.1
        "\n".join(["- the lazy and old wall stands here today"] * 10),  # 4: bullets
        "\n".join([line12] * 4 + [line12 + "..."] * 2),  # 5: ellipses > 30%
        " ".join(["123 456"] * 10) + " the and",         # 6: alpha ratio < 0.8
        "zebra quokka wombat lorises galago fossa " * 3,  # 7: no stop words
    ]
    rows = _run(spark, texts)
    assert rows[0]["gopher_pass"] is True
    assert rows[1]["r_word_count"] is False and rows[1]["gopher_pass"] is False
    assert rows[2]["r_word_len"] is False
    assert rows[3]["r_symbol"] is False
    assert rows[4]["r_bullet"] is False
    assert rows[5]["r_ellipsis"] is False
    assert rows[6]["r_alpha"] is False
    assert rows[7]["r_stop"] is False
    # every failing fixture violates ONLY its target rule (plus pass)
    rule_cols = [
        "r_word_count", "r_word_len", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stop",
    ]
    for doc, rule in zip(range(1, 8), rule_cols):
        fails = [c for c in rule_cols if rows[doc][c] is False]
        assert fails == [rule], (doc, fails)


def test_statistics_are_measured(spark):
    rows = _run(spark, [GOOD])
    r = rows[0]
    assert r["n_words"] == len(GOOD.split())
    assert r["stop_hits"] == 2  # 'the' and 'and'
    assert r["alpha_ratio"] == 1.0
    assert 3.0 <= r["mean_word_len"] <= 10.0


def test_thresholds_are_parameters(spark):
    rows = _run(spark, [GOOD], min_stop_hits=5)
    assert rows[0]["r_stop"] is False  # same text, stricter knob


def test_stays_jvm_side(spark):
    from image_matadata_batchprocessing_aws_spark.plans import assert_no_python_udf

    df = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    assert_no_python_udf(add_gopher_rules(df))


def test_compression_ratio_invariants(spark):
    """DEFLATE output is library-versioned, so the operator is pinned
    by invariants: repetition compresses below prose, ratios are in
    (0, ~1.1], empty text yields NULL, and the op is deterministic."""
    from image_matadata_batchprocessing_aws_spark.operators.text import (
        compression_ratio,
    )

    prose = (
        "The quick brown fox jumps over the lazy dog while seven wizards "
        "briskly vexed a gymnast with quartz jugs of foam in dim light."
    )
    spam = "buy now " * 40
    rows = [(1, prose), (2, spam), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[2].compression_ratio < out[1].compression_ratio  # spam compresses
    assert 0.0 < out[2].compression_ratio < 0.2
    assert 0.3 < out[1].compression_ratio <= 1.1
    assert out[3].compression_ratio is None and out[3].n_bytes == 0
    assert out[4].compression_ratio is None
    assert out[1].n_bytes == len(prose.encode())
    # deterministic across runs
    again = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
    assert again == {k: v.compression_ratio for k, v in out.items()}
