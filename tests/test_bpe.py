"""BPE vocabulary training on the word-frequency table: the Sennrich
et al. (2016) worked example, greedy-overlap semantics, and stopping."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
    word_freq,
)


def _sennrich_vocab(spark):
    rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    return spark.createDataFrame(rows, "word string, freq long")


def test_bpe_train_sennrich_example(spark):
    words = _sennrich_vocab(spark)
    merges, symbols = bpe_train(words, n_merges=5, min_count=2)
    got = [(a, b, c) for _, a, b, c in merges]
    # the paper's first merges: es(9), est(9), est</w>(9), lo(7), low(7)
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", EOW, 9)
    assert got[3] == ("l", "o", 7)
    assert got[4] == ("lo", "w", 7)
    syms = {r.word: list(r.syms) for r in symbols.collect()}
    assert syms["newest"] == ["n", "e", "w", "est" + EOW]
    assert syms["widest"] == ["w", "i", "d", "est" + EOW]
    assert syms["low"] == ["low", EOW]


def test_bpe_greedy_overlap(spark):
    words = spark.createDataFrame([("aaaa", 10)], "word string, freq long")
    merges, symbols = bpe_train(words, n_merges=1, min_count=2)
    # (a,a) appears 3 times overlapping but greedy scan merges twice
    assert [(a, b) for _, a, b, _ in merges] == [("a", "a")]
    syms = symbols.collect()[0].syms
    assert list(syms) == ["aa", "aa", EOW]


def test_bpe_min_count_stops(spark):
    # every pair occurs once -> nothing reaches min_count=2
    words = spark.createDataFrame([("ab", 1), ("cd", 1)], "word string, freq long")
    merges, _ = bpe_train(words, n_merges=10, min_count=2)
    assert merges == []


def test_bpe_segment_matches_training_state(spark):
    words = _sennrich_vocab(spark)
    merges, symbols = bpe_train(words, n_merges=5)
    seg = bpe_segment(words, merges)
    want = {r.word: list(r.syms) for r in symbols.collect()}
    got = {r.word: list(r.syms) for r in seg.collect()}
    assert got == want
    # and an unseen word segments with learned subwords
    unseen = spark.createDataFrame([("lowest", 1)], "word string, freq long")
    out = bpe_segment(unseen, merges).collect()[0].syms
    assert list(out) == ["low", "est" + EOW]


def test_word_freq_uses_bpe_pretokens(spark):
    df = spark.createDataFrame(
        [("the cat, the hat",), ("cat!",)], "text string"
    )
    wf = {r.word: r.freq for r in word_freq(df).collect()}
    assert wf == {"the": 2, "cat": 2, "hat": 1, ",": 1, "!": 1}


def test_bpe_tokenize_arrow_equivalent_to_segment_replay(spark):
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.operators.bpe import bpe_tokenize_arrow

    # train on a richer corpus so merges chain (multi-level subwords)
    rng = np.random.default_rng(8)
    pool = ["lowering", "lowest", "newest", "widest", "slowest", "low", "wide"]
    rows = [(w, int(rng.integers(1, 20))) for w in pool]
    words = spark.createDataFrame(rows, "word string, freq long")
    merges, _ = bpe_train(words, n_merges=25, min_count=1)
    assert len(merges) >= 10  # enough depth to matter

    # unseen words exercise partial matches
    test_words = spark.createDataFrame(
        [("slowing",), ("widening",), ("newlow",), ("x",)], "word string"
    )
    replay = {r.word: list(r.syms) for r in bpe_segment(test_words, merges).collect()}
    arrow = {r.word: list(r.syms) for r in bpe_tokenize_arrow(test_words, merges).collect()}
    assert arrow == replay
