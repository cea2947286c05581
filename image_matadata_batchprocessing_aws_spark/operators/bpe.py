"""Distributed byte-pair-encoding vocabulary training (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public method), DataFrame-first.

The classic formulation trains on the WORD-FREQUENCY table, not the
corpus: BPE statistics are invariant to where a word occurs, so a
100 TB corpus compresses to a vocabulary-sized (word, freq) table in
ONE aggregation pass, and every merge round after that iterates over
the compact table only.  That is the whole scale story — the corpus is
touched exactly once.

Per merge round (all JVM-side expressions, no Python in the loop):

- adjacent symbol pairs explode from each word's symbol array,
  weighted by word frequency, and one groupBy sums pair counts
  (a shuffle over the VOCABULARY, not the corpus);
- the argmax pair (deterministic tiebreak: count desc, then lexical)
  is a 1-row collect — the same bounded fit-statistic pattern as
  k-means centroids;
- the merge applies map-side as a greedy left-to-right array fold
  (``F.aggregate``), and the table ``localCheckpoint``s so the
  iterative lineage stays linear (the ``connected_components``
  pattern).

Segmenting text with a trained merge list replays the folds in rank
order — fine for the bounded merge counts used here; a production
tokenizer at 100 TB would broadcast the finished vocab into a
linear-scan Arrow UDF instead of replaying ``n_merges`` map passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.operators.text import bpe_tokens

#: End-of-word marker (Sennrich et al. section 3.2): distinguishes
#: "est" inside "estimate" from "est</w>" ending "larg-est", so merges
#: learned at word ends never leak into word interiors.
EOW = "</w>"


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-sized pass.
    Pre-tokenization is the same ``BPE_SPLIT`` regex the token-count
    functions use (letter runs / digit runs / single punctuation)."""
    return (
        df.select(F.explode(bpe_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into characters + the end-of-word marker."""
    return words.select(
        "word",
        "freq",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the symbol table."""
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("a"),
        F.slice("syms", 2, n - 1).alias("b"),
    )
    return (
        symbols.where(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(syms_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) -> a+b inside one
    symbol array: fold each symbol onto an accumulator, fusing it with
    the accumulator tail when the tail is ``a`` and the symbol is ``b``
    (so "aaa" under merge (a,a) becomes ["aa","a"], the standard BPE
    greedy scan)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame,
    n_merges: int = 50,
    min_count: int = 2,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table.

    Returns ``(merges, symbols)``: the learned merge list as
    ``[(rank, left, right, pair_count), ...]`` (driver-side — bounded
    by ``n_merges``, the same size class as a k-means centroid list)
    and the final symbol table ``(word, freq, syms)``.  Training stops
    early when the best remaining pair falls below ``min_count`` (the
    Sennrich stopping rule for noisy singleton pairs)."""
    symbols = _initial_symbols(words).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(symbols)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["pair_count"])
        merges.append((rank, a, b, cnt))
        symbols = symbols.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges, symbols


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    word_col: str = "word",
    out: str = "syms",
    checkpoint_every: int = 10,
) -> DataFrame:
    """Segment words with a trained merge list: replay the merges in
    rank order as map-side folds.  Expression depth grows with the
    merge count, so the plan ``localCheckpoint``s every
    ``checkpoint_every`` merges to keep codegen trees bounded."""
    cur = df.withColumn(
        out, F.concat(F.split(F.col(word_col), ""), F.array(F.lit(EOW)))
    )
    for i, (_, a, b, _cnt) in enumerate(sorted(merges)):
        cur = cur.withColumn(out, _apply_merge(F.col(out), a, b))
        if (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=False)
    return cur


def bpe_tokenize_arrow(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    word_col: str = "word",
    out: str = "syms",
) -> DataFrame:
    """Production-path tokenizer: the trained merge list broadcasts into
    an Arrow ``mapInPandas`` stage that greedily applies the LOWEST-RANK
    applicable merge per word (the standard BPE tokenize loop — provably
    equivalent to replaying merges in rank order, which
    ``test_bpe.py`` asserts against :func:`bpe_segment`).

    This is the accepted Python slow path for BULK tokenization: one
    O(merges) dict probe per adjacent pair instead of ``n_merges``
    full map passes, no per-merge plan growth, Arrow batch transfer —
    the trade the multimodal decode stage already documents.  Schema:
    input columns pass through, ``out`` appends ``array<string>``."""
    ranks = {(a, b): r for r, a, b, _ in merges}

    def tokenize_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            # merge ALL occurrences of the chosen pair, left to right
            a, b = syms[best_i], syms[best_i + 1]
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        return syms

    fields = df.schema.fields
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in fields]
        + [f"`{out}` array<string>"]
    )

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [tokenize_word(w) for w in pdf[word_col]]
            yield pdf

    return df.mapInPandas(run, out_schema)
