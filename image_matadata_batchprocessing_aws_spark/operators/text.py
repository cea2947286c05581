"""Text-analysis operators for the documents table (Stage 5 / north star).

All tokenization stays JVM-side (split / higher-order functions) — no
Python in the hot path.  The language-ID heuristic is the one operator
with a driver-side profile table (tiny, broadcast).

Scale: every operator here is embarrassingly parallel (per-row map) or
a token-explode + reduce; the explode output is bounded by total token
count, and aggregations combine map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Tiny stopword list used by quality scoring (shared with oracles).
STOPWORDS = ["the", "a", "of", "and", "to"]

TOKEN_SPLIT = r"\s+"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_SPLIT)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (see :func:`bpe_token_count` for the
    subword-style variant)."""
    return F.size(tokens(col)).cast("long")


#: BPE-style pre-tokenization: letter runs, digit runs, and individual
#: punctuation marks each become a token — the split a GPT-2-family
#: byte-pair tokenizer applies before merges, so its count tracks real
#: LLM token budgets far closer than whitespace counts do.
BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokens.  NOTE: pass the pattern via ``F.lit`` and the
    explicit group index 0 — Spark's default idx is 1 (errors on
    group-less patterns), and embedding the pattern in a SQL string
    literal would eat the ``\\s`` escape."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT), F.lit(0))


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col)).cast("long")


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token count, non-space char count, average token length."""
    toks = tokens(text_col)
    nospace = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("long"),
            "n_chars_nospace": nospace.cast("long"),
            "avg_token_len": F.round(nospace / F.size(toks), 4),
        }
    )


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score: length-normalized token size x
    (1 - stopword ratio).  Mirrors common LLM-corpus quality filters.

    ``quality`` rounds via the tie-safe ``floor(x*1e4 + 0.5)/1e4`` form
    (r09): ``round()`` disagrees between engines exactly when the
    double's shortest decimal repr lands on a half (Spark rounds the
    shortest repr HALF_UP, DuckDB rounds the binary value), which is
    what flipped 0.5659/0.566 at sf0.1.  The floor form is the same
    chain of correctly-rounded IEEE ops on both engines, so identical
    input doubles give identical output bits at every scale."""
    toks = tokens(text_col)
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    stop_ratio = stop / n
    avg_len = F.length(F.regexp_replace(F.col(text_col), r"\s", "")) / n
    q = F.least(F.lit(1.0), avg_len / 8.0) * (1.0 - stop_ratio)
    return df.withColumns(
        {
            "n_tokens": n.cast("long"),
            "stop_ratio": F.round(stop_ratio, 4),
            "quality": F.floor(q * 10000.0 + 0.5) / 10000.0,
        }
    )


def add_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Deterministic 60-bit document fingerprint (md5-derived — portable
    across engines; see functions.md5_int64)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    return df.withColumn(out, md5_int64(F.lower(F.trim(F.col(text_col)))))


#: Character-bigram profiles for a toy language-ID heuristic.  Real
#: deployments plug in fasttext/cld3 via a pandas UDF; the engine surface
#: (profile broadcast + score argmax) is what matters here.
_LANG_PROFILES = {
    "en": ["th", "he", "in", "er", "an"],
    "de": ["en", "er", "ch", "de", "ei"],
    "fr": ["es", "le", "de", "en", "re"],
    "es": ["de", "la", "os", "en", "ar"],
    "zh": ["zh", "sh", "ng", "ia", "uo"],
}


def add_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """N-gram-overlap language ID: score = count of profile bigrams present;
    argmax wins (ties broken by language code order). Rows-only check —
    the heuristic itself is engine-internal."""
    text = F.lower(F.col(text_col))
    scores = F.array(
        *[
            F.struct(
                sum(
                    (F.when(text.contains(bg), 1).otherwise(0) for bg in profile),
                    F.lit(0),
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, profile in sorted(_LANG_PROFILES.items())
        ]
    )
    best = F.array_max(scores)
    return df.withColumn(out, best["lang"])


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: the share of all
    token bigrams taken by the single most frequent bigram
    (``top_bigram_frac``) and the fraction of duplicated tokens
    (``dup_token_frac``).  High values flag boilerplate / keyword-stuffed
    documents that repetition filters drop from LLM training corpora.

    Scale: ``dup_token_frac`` is map-side only (array_distinct on the
    row's own tokens).  The bigram mode needs a count-per-(doc, bigram)
    — explode then two hash aggregations, both combining map-side, keyed
    by doc so the shuffle is bounded by total bigram count.  No Python.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    base = df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round((n - F.size(F.array_distinct(toks))) / n, 4).alias("dup_token_frac"),
        F.explode(bigrams).alias("bigram"),
    )
    per_bigram = base.groupBy(id_col, "n_tokens", "dup_token_frac", "bigram").agg(
        F.count("*").alias("cnt")
    )
    return per_bigram.groupBy(id_col, "n_tokens", "dup_token_frac").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.round(F.max("cnt") / F.sum("cnt"), 4).alias("top_bigram_frac"),
    )


def line_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """The Gopher repetition filters at line grain (Rae et al. 2021,
    appendix A1.2): ``dup_line_frac`` — the fraction of lines that are
    repeats of an earlier-seen line — and ``dup_line_char_frac`` — the
    fraction of characters living in lines that occur more than once.
    Pass ``delim="\\n\\n"`` for the paragraph-grain variants of the same
    two rules.  These catch boilerplate (nav bars, cookie banners,
    lyrics choruses) that token-grain ``repetition_stats`` misses.

    Scale: explode + two hash aggregations keyed by document — partial
    aggregation combines map-side, the shuffle carries (doc, line-hash
    grain) rows bounded by total line count, never full documents
    side-by-side.  Zero Python.
    """
    lines = F.split(F.col(text_col), delim)
    base = df.select(
        F.col(id_col),
        F.explode(lines).alias("__line"),
    )
    per_line = base.groupBy(id_col, "__line").agg(F.count("*").alias("__cnt"))
    chars = F.length("__line") * F.col("__cnt")
    return per_line.groupBy(id_col).agg(
        F.sum("__cnt").cast("long").alias("n_lines"),
        F.round(
            (F.sum("__cnt") - F.count("*")) / F.sum("__cnt"), 4
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("__cnt") > 1, chars).otherwise(F.lit(0)))
            / F.sum(chars),
            4,
        ).alias("dup_line_char_frac"),
    )


#: Redaction patterns, applied IN ORDER (emails before phones before bare
#: number runs, so an address's digits are consumed by the email rule and
#: never double-counted).  Plain character-class regexes only — identical
#: semantics under Java regex (Spark) and DuckDB's RE2.
REDACT_PATTERNS = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\+?[0-9][0-9()\- ]{6,}[0-9]"),
    ("NUM", r"[0-9]+"),
]


def redact(df: DataFrame, text_col: str, out: str = "redacted") -> DataFrame:
    """PII/number scrub for corpus cleaning: replaces each pattern with
    its ``[LABEL]`` token and counts redactions per row.  Pure map-side
    JVM regex — no shuffle, no Python; at 100 TB this runs at scan
    speed inside whole-stage codegen."""
    cur = F.col(text_col)
    total = F.lit(0)
    for label, pat in REDACT_PATTERNS:
        total = total + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, f"[{label}]")
    return df.withColumns({out: cur, "n_redactions": total.cast("long")})


def normalize_chars(col: Column | str) -> Column:
    """Lowercase + collapse whitespace runs to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def char_trigrams(col: Column | str) -> Column:
    """Character trigrams (with multiplicity) of an ALREADY-MATERIALIZED
    string column.  Two traps here:

    - the input must be a plain column attribute, not an expression: the
      ``transform`` lambda evaluates its argument once per element, so a
      regex-normalization expression inlined here runs O(len) times —
      O(len^2) total (measured 70x slowdown).  Normalize into a real
      column first (:func:`normalize_chars` in its own ``select``).
    - the explicit ``when`` guard matters: ``sequence(1, 0)`` counts
      DOWN (Spark defaults to step -1 when start > stop) instead of
      yielding an empty range, so short strings need the empty-array
      branch, not the sequence."""
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s) - 2
    return F.when(
        n >= 1, F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(s, i, 3))
    ).otherwise(F.array().cast("array<string>"))


def charlm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-trigram language-model quality score (the CCNet/KenLM
    perplexity-filter idea, self-trained on the corpus): per document,
    the mean quantized log2-frequency of its trigrams under the corpus
    trigram distribution.  Natural prose reuses frequent trigrams and
    scores high; gibberish / binary junk hits rare trigrams and scores
    low — threshold on ``charlm_bits`` to drop it.

    Cross-engine exactness: float ``ln`` differs by ulps between JVM and
    C libm, so the log2 is quantized to the integer BIT LENGTH of the
    trigram count (``floor(log2 cnt) + 1``, via base-2 string length —
    exact in any engine).  Integer sums are associative, so any
    parallelism yields identical scores; the single final division is
    the same IEEE op on both sides.

    Scale shape: the model is bounded by charset^3 (~1e5-1e6 rows
    regardless of corpus size) => BROADCAST; the per-doc explode feeds a
    broadcast hash join and partially-aggregates map-side, so the only
    shuffle carries ~one row per document.  The model subtree re-executes
    once for the probe side — persist it when reusing across queries.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    norm = df.repartition(par).select(
        F.col(id_col), normalize_chars(text_col).alias("__s")
    )
    tris = norm.select(F.col(id_col), char_trigrams("__s").alias("__tris"))
    # explode_OUTER, not explode: inner explode makes the optimizer infer
    # a size(__tris) > 0 filter and push it to the SCAN with the alias
    # chain inlined — re-running the whole normalize+trigram build (with
    # the regex re-evaluated per element, i.e. O(len^2)) once per row as
    # a scan predicate.  Outer explode infers nothing; the inner join on
    # __tri drops the null rows the outer form emits for empty arrays.
    ex = tris.select(id_col, F.explode_outer("__tris").alias("__tri"))
    model = ex.groupBy("__tri").agg(F.count("*").alias("__cnt"))
    bits = F.length(F.conv(F.col("__cnt"), 10, 2)).cast("long")
    return (
        ex.join(F.broadcast(model), "__tri")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(bits).alias("__bits"),
        )
        .select(
            id_col,
            "n_trigrams",
            F.round(F.col("__bits") / F.col("n_trigrams"), 4).alias("charlm_bits"),
        )
    )


#: Keyword tokenization: lowercase letter runs of length >= 2.
KEYWORD_PATTERN = r"[a-z]{2,}"


def tfidf_keywords(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` keywords per document by tf-idf.  The idf is the RAW
    inverse document-frequency ratio ``N / df`` (no log): ranking by
    ``tf * N / df`` is cross-engine exact — integer products divided
    once, the same IEEE op in any engine — where a float ``log`` idf
    could flip ranks between engines by an ulp.  Stopwords self-damp
    (df ~ N drives the ratio toward tf alone).

    Scale shape: tf is ONE hash aggregation keyed (doc, token),
    computed once; df rides a ``count over (partition by token)`` window
    on tf's output instead of a tf-vs-tf self-join — the join form
    recomputed the regex explode + aggregation for each side (measured
    ~1.9x the work; the r03 bench drift, VERDICT r3 item 6).  One
    exchange by token for the window, then the final top-k window
    partitions BY DOCUMENT, so no global sort and no single-partition
    window at any corpus size."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(KEYWORD_PATTERN), F.lit(0))
        ).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    n_docs = df.agg(F.count("*").alias("__n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", (F.col("tf") * F.col("__n_docs")).cast("double") / F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "df", F.round("tfidf", 4).alias("tfidf"))
    )


def drop_common_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 1,
    delim: str = "\n",
) -> DataFrame:
    """CCNet/Gopher-style line-level dedup: drop every line whose
    document frequency exceeds ``max_doc_freq`` (boilerplate — headers,
    cookie banners, license footers — repeats across documents; prose
    does not).  Blank lines always survive.

    Returns one row per input doc: ``(id, text_kept, n_lines_kept,
    n_lines_dropped)`` — a doc whose every line is boilerplate keeps its
    row with an empty ``text_kept``, so downstream joins never lose keys.

    Scale shape: explode lines (bounded by total line count), one
    groupBy per distinct line for document frequency, one join back, one
    groupBy(doc) to reassemble (order restored via ``array_sort`` on the
    captured line position — ``collect_list`` order is not deterministic
    and must never be relied on).  At 100 TB join/group on
    ``xxhash64(line)`` instead of the raw text to keep shuffle keys
    small; raw lines here keep the op DuckDB-oracle-exact.
    """
    import re as _re

    # F.split takes a REGEX; the oracle's string_split is literal — quote
    # the delimiter so both engines split on the same literal string
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), F.lit(_re.escape(delim))))
    ).select(F.col(id_col), F.col("pos"), F.col("col").alias("__line"))
    freq = (
        lines.where(F.col("__line") != "")
        .groupBy("__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
    )
    flagged = lines.join(freq, "__line", "left").select(
        F.col(id_col),
        "pos",
        "__line",
        ((F.col("__line") == "") | (F.col("__df") <= max_doc_freq)).alias("__keep"),
    )
    entries = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("__line"), F.col("__keep")))
    )
    kept = F.filter(entries, lambda x: x["__keep"])
    return flagged.groupBy(id_col).agg(
        F.array_join(F.transform(kept, lambda x: x["__line"]), delim).alias("text_kept"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(entries) - F.size(kept)).cast("long").alias("n_lines_dropped"),
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Okapi BM25 ranking of documents for a bag-of-words query (public
    formula; Robertson & Zaragoza 2009).  Returns the ``top_k`` docs by
    rounded score with a deterministic id tiebreak.

    Scale shape: tokens explode but are FILTERED TO QUERY TERMS before
    any shuffle (posting lists for |q| terms only, not the whole vocab);
    term statistics (df per term, N, avgdl) are a handful of rows,
    broadcast back; the scoring join is per-(doc, term) on the tiny term
    key.  At 100 TB the df/avgdl statistics come from a precomputed
    index table rather than a rescan — the query-side plan is identical.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__t"), F.size(toks).alias("__dl"))
    # explode_outer: inner explode would infer a size(__t) > 0 scan filter
    # with the tokenization inlined (re-split per row at the scan); the
    # isin filter below drops the outer form's null rows anyway
    ex = base.select(
        F.col(id_col), F.col("__dl"), F.explode_outer("__t").alias("__term")
    ).where(F.col("__term").isin(query_terms))
    tf = ex.groupBy(id_col, "__dl", "__term").agg(F.count("*").alias("__tf"))
    stats = base.agg(
        F.count("*").alias("__N"), F.avg("__dl").alias("__avgdl")
    )
    dfreq = tf.groupBy("__term").agg(F.count_distinct(F.col(id_col)).alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                1.0
                + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1))
            / (
                F.col("__tf")
                + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(F.round(F.sum("__s"), 4).alias("bm25"))
    return agg.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(top_k)


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` bigram collocations by pointwise mutual
    information over the alpha-token stream (``KEYWORD_PATTERN``
    tokenization, same as :func:`tfidf_keywords`).

    Reports ``pmi = ln(lift)`` but RANKS on the raw lift ratio
    ``(c_xy/N_bi) / ((c_x/N_uni) * (c_y/N_uni))`` — integer counts
    through identical double divisions in both engines, so the order is
    reproducible where a log could wobble an ulp (the
    ``tfidf_keywords`` playbook); ties break on the word pair.

    Scale shape: the token explode is the data-sized pass; bigram and
    unigram counts are partial-agg groupBys (map-side combine), the
    two 1-row totals broadcast, and the unigram join keys on the
    post-``min_count`` bigram table — candidate-sized, not
    corpus-sized.  The final global top-k sorts only rows that survive
    ``min_count``."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(KEYWORD_PATTERN), F.lit(0)
    )
    base = df.select(toks.alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("__c"))
    )
    bg = base.select(
        F.explode(
            F.expr(
                "zip_with(slice(__t, 1, greatest(size(__t) - 1, 0)),"
                " slice(__t, 2, greatest(size(__t) - 1, 0)),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("__bg")
    ).select("__bg.w1", "__bg.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("__cxy"))
    n_uni = uni.agg(F.sum("__c").alias("__nu"))
    n_bi = bgc.agg(F.sum("__cxy").alias("__nb"))
    u1 = uni.select(F.col("w").alias("__w1k"), F.col("__c").alias("__cx"))
    u2 = uni.select(F.col("w").alias("__w2k"), F.col("__c").alias("__cy"))
    cand = (
        bgc.where(F.col("__cxy") >= min_count)
        .join(u1, F.col("w1") == F.col("__w1k"))
        .join(u2, F.col("w2") == F.col("__w2k"))
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    lift = (F.col("__cxy").cast("double") / F.col("__nb").cast("double")) / (
        (F.col("__cx").cast("double") / F.col("__nu").cast("double"))
        * (F.col("__cy").cast("double") / F.col("__nu").cast("double"))
    )
    scored = cand.select(
        "w1",
        "w2",
        F.col("__cxy").cast("long").alias("pair_count"),
        lift.alias("__lift"),
        F.round(F.log(lift), 6).alias("pmi"),
    )
    return (
        scored.orderBy(F.col("__lift").desc(), "w1", "w2")
        .limit(top_k)
        .drop("__lift")
    )


def chi2_tokens(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    min_df: int = 10,
    top_k: int = 50,
) -> DataFrame:
    """Chi-squared token/label association for feature selection.

    ``label`` is a boolean per-document expression (e.g. ``lang ==
    'en'``).  Token presence is per-document (``array_distinct`` before
    the explode).  The 2x2 contingency counts stay exact BIGINTs; the
    statistic ``N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))`` is computed with
    the squared term in double (``(ad-bc)`` itself fits int64, its
    square may not).

    Scale shape: one explode + one partial-agg groupBy(token); the
    doc/label totals are a broadcast 1-row aggregate; ranking sorts
    only tokens passing ``min_df``.  Rank key is the exact integer pair
    ``((ad-bc)^2-as-double / margins)`` — a single division of
    deterministic operands — with the token as tie-break."""
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(KEYWORD_PATTERN), F.lit(0))
    )
    base = df.select(toks.alias("__t"), label.cast("long").alias("__y"))
    totals = base.agg(
        F.count("*").alias("__n"), F.sum("__y").alias("__npos")
    )
    tok = (
        base.select(F.explode("__t").alias("token"), "__y")
        .groupBy("token")
        .agg(F.count("*").alias("__df"), F.sum("__y").alias("__a"))
        .where(F.col("__df") >= min_df)
        .crossJoin(F.broadcast(totals))
    )
    a = F.col("__a")
    b = F.col("__df") - F.col("__a")
    c = F.col("__npos") - F.col("__a")
    d = F.col("__n") - F.col("__npos") - b
    det = (a * d - b * c).cast("double")
    chi2 = (
        F.col("__n").cast("double")
        * det
        * det
        / ((a + b) * (c + d)).cast("double")
        / ((a + c) * (b + d)).cast("double")
    )
    out = tok.select(
        "token",
        F.col("__df").cast("long").alias("doc_freq"),
        a.cast("long").alias("n_pos_docs"),
        F.round(chi2, 4).alias("chi2"),
    )
    return out.orderBy(F.col("chi2").desc(), "token").limit(top_k)


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick text vectors (Weinberger et al. 2009): every
    whitespace token hashes to a dimension ``md5_int32(w) % dim`` with
    a sign from the next hash bit, and the vector entry is the signed
    term count — a vocabulary-free embedding that feeds the ANN / PCA /
    MMR stack directly from text, no model required.

    Output is the sparse grain ``(id, dim_idx, weight)`` with exact
    zero-weight entries dropped (sign cancellation); densify with a
    pivot or array assembly when a consumer needs fixed-width rows.

    Scale shape: token explode (map-side) then ONE partial-agg
    ``groupBy(id, dim_idx)`` — the shuffle carries at most ``dim`` rows
    per document.  All hash arithmetic is md5-derived (the house base
    hash), so the DuckDB twin is bit-identical.
    """
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32

    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__w")
    ).withColumn("__h", md5_int32("__w"))
    return (
        toks.groupBy(
            id_col, (F.col("__h") % dim).cast("long").alias("dim_idx")
        )
        .agg(
            F.sum(
                F.when(F.expr(f"(__h div {int(dim)}) % 2") == 0, 1).otherwise(-1)
            ).alias("weight")
        )
        .where(F.col("weight") != 0)
        .select(id_col, "dim_idx", F.col("weight").cast("long").alias("weight"))
    )


#: The Gopher quality-filter stop-word set (Rae et al. 2021, A1.1) —
#: distinct from the scoring STOPWORDS above: a doc must contain at
#: least ``min_stop_hits`` of these to pass the rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def add_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher corpus-quality rules (Rae et al. 2021, appendix A1.1)
    as one map-side expression set — the published heuristics LLM
    pretraining pipelines apply before dedup:

    - word count within [min_words, max_words];
    - mean word length within [min_word_len, max_word_len];
    - symbol-to-word ratio (``#`` or ``...``) <= max_symbol_ratio;
    - <= max_bullet_ratio of lines starting with a bullet;
    - <= max_ellipsis_ratio of lines ending with an ellipsis;
    - >= min_alpha_ratio of words containing an alphabetic char;
    - >= min_stop_hits distinct stop words from GOPHER_STOPWORDS.

    Adds the measured statistics, one boolean per rule, and
    ``gopher_pass`` (AND of all rules).  Zero Python, zero shuffle.
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    n = F.size(toks)
    mean_len = F.length(F.regexp_replace(c, r"\s", "")) / n
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#")))
    n_ellipsis = (F.length(c) - F.length(F.replace(c, F.lit("...")))) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis) / n
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("- ")
                | x.startswith("* ")
                | x.startswith("•"),
            )
        )
        / n_lines
    )
    ellipsis_ratio = F.size(F.filter(lines, lambda x: x.endswith("..."))) / n_lines
    alpha_ratio = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))) / n
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = F.array_contains(toks, w).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    rules = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_word_len": (mean_len >= min_word_len) & (mean_len <= max_word_len),
        "r_symbol": symbol_ratio <= max_symbol_ratio,
        "r_bullet": bullet_ratio <= max_bullet_ratio,
        "r_ellipsis": ellipsis_ratio <= max_ellipsis_ratio,
        "r_alpha": alpha_ratio >= min_alpha_ratio,
        "r_stop": stop_hits >= min_stop_hits,
    }
    passed = None
    for r in rules.values():
        passed = r if passed is None else passed & r
    return df.withColumns(
        {
            "n_words": n.cast("long"),
            "mean_word_len": F.round(mean_len, 4),
            "symbol_ratio": F.round(symbol_ratio, 4),
            "bullet_ratio": F.round(bullet_ratio, 4),
            "ellipsis_ratio": F.round(ellipsis_ratio, 4),
            "alpha_ratio": F.round(alpha_ratio, 4),
            "stop_hits": stop_hits.cast("long"),
            **rules,
            "gopher_pass": passed,
        }
    )


#: Checksum-free PII patterns for :func:`redact_pii` — RE2-safe (no
#: lookarounds; \b is supported by both Java regex and RE2), mirrored
#: textually in the SQL twin.
PII_PATTERNS = [
    ("IP", r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
           r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
]

#: Card CANDIDATE shape: 13-19 digits with optional single space/dash
#: separators.  Candidates are only redacted when the Luhn checksum
#: validates — a 16-digit order id with a failing checksum stays.
CARD_CANDIDATE = r"\b[0-9](?:[ -]?[0-9]){11,17}[0-9]\b"


def luhn_valid(col: Column) -> Column:
    """Luhn checksum over a digit string with optional space/dash
    separators — pure JVM expression (ascii math over a reversed
    position sequence), identical construction in :func:`luhn_sql`."""
    s = F.regexp_replace(col, r"[ -]", "")
    n = F.length(s)
    digit = lambda i: F.ascii(F.substring(s, (n - i + F.lit(1)).cast("int"), 1)) - 48  # noqa: E731
    term = lambda i: F.when(  # noqa: E731
        i % 2 == 1, digit(i)
    ).otherwise(
        F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(digit(i) * 2)
    )
    total = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + term(i)
    )
    return total % 10 == 0


def luhn_sql(expr: str) -> str:
    """DuckDB twin of :func:`luhn_valid` (same reversed-position sum).
    A pure inline expression — no subquery — so it can sit inside a
    ``list_filter`` lambda; the digit-string expression is inlined at
    each use site instead of aliased."""
    s = f"replace(replace({expr}, ' ', ''), '-', '')"
    d = f"(ascii(substr({s}, len({s}) - i + 1, 1)) - 48)"
    return (
        f"(list_sum(list_transform(range(1, len({s}) + 1), i -> "
        f"CASE WHEN i % 2 = 1 THEN {d} "
        f"WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)) % 10 = 0)"
    )


def redact_pii_sql(expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`redact_pii`, generated from the SAME
    ``CARD_CANDIDATE`` / ``PII_PATTERNS`` tables (the html.py move).
    Returns a STRUCT-free two-expression tuple ``(redacted, n_cards)``
    as a SQL snippet pair — callers select both."""
    cands = f"list_distinct(regexp_extract_all({expr}, '{CARD_CANDIDATE}'))"
    valid = f"list_filter({cands}, x -> {luhn_sql('x')})"
    cur = f"list_reduce(list_prepend({expr}, {valid}), (acc, x) -> replace(acc, x, '[CARD]'))"
    for label, pat in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        cur = f"regexp_replace({cur}, '{sql_pat}', '[{label}]', 'g')"
    n_cards = f"CAST(len({valid}) AS BIGINT)"
    return cur, n_cards


def redact_pii(df: DataFrame, text_col: str, out: str = "redacted") -> DataFrame:
    """Deeper PII scrub than :func:`redact`: Luhn-VALIDATED card numbers
    (checksum-failing digit runs are left alone — they are ids, not
    cards), IPv4 addresses (octet-range checked in the pattern), and
    SSN-shaped ids.  Card validation can't live in a regex, so the
    shape is extract-candidates -> filter by checksum -> fold
    ``replace`` over the validated list; still pure JVM expressions,
    map-side, no Python.  Adds ``n_cards`` (validated count) alongside
    the redacted text."""
    cands = F.array_distinct(
        F.regexp_extract_all(F.col(text_col), F.lit(CARD_CANDIDATE), 0)
    )
    valid = F.filter(cands, luhn_valid)
    cur = F.aggregate(
        valid, F.col(text_col), lambda acc, x: F.replace(acc, x, F.lit("[CARD]"))
    )
    for label, pat in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, f"[{label}]")
    return df.withColumns({out: cur, "n_cards": F.size(valid).cast("long")})


#: Literal alternation of the classic UTF-8-decoded-as-cp1252 artifacts
#: (ftfy's most common cases): accented latin as "\u00c3"-pairs, smart
#: punctuation as "\u00e2\u20ac"-triples, NBSP/degree as "\u00c2"-pairs.
#: A literal alternation -- no classes, no escapes -- so the Java and
#: RE2 dialects cannot diverge; mirrored verbatim in the oracle.
MOJIBAKE_PATTERN = (
    "\u00c3\u00a9|\u00c3\u00a8|\u00c3\u00a1|\u00c3\u00b3|\u00c3\u00ba|"
    "\u00c3\u00bc|\u00c3\u00b6|\u00c3\u00a4|\u00c3\u00b1|\u00c3\u00a7|"
    "\u00e2\u20ac\u2122|\u00e2\u20ac\u0153|\u00e2\u20ac\u009d|"
    "\u00e2\u20ac\u201c|\u00e2\u20ac\u201d|\u00e2\u20ac\u00a6|"
    "\u00c2\u00b0|\u00c2\u00b7|\u00c2 "
)

#: C0 control chars that should never appear in clean text (tab/LF/CR
#: excluded).  Hex escapes work identically in Java regex and RE2.
CONTROL_PATTERN = "[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]"


def add_encoding_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-quality screen for crawled corpora (the ftfy-lite gate
    run before quality filtering): counts mojibake digraphs (UTF-8
    bytes mis-decoded as cp1252 and re-encoded), U+FFFD replacement
    characters (lossy prior transcode), and stray C0 controls, plus the
    ASCII character ratio.  ``enc_suspect`` ORs the three counters.
    One map-side projection -- regexp_count over the scan, zero Python,
    zero shuffle."""
    c = F.col(text_col)
    n_moji = F.regexp_count(c, F.lit(MOJIBAKE_PATTERN))
    n_repl = F.regexp_count(c, F.lit("\ufffd"))
    n_ctrl = F.regexp_count(c, F.lit(CONTROL_PATTERN))
    ascii_ratio = F.length(F.regexp_replace(c, "[^\\x00-\\x7F]", "")) / F.length(c)
    return df.withColumns(
        {
            "n_mojibake": n_moji.cast("long"),
            "n_replacement": n_repl.cast("long"),
            "n_control": n_ctrl.cast("long"),
            "ascii_ratio": F.round(ascii_ratio, 4),
            "enc_suspect": (n_moji > 0) | (n_repl > 0) | (n_ctrl > 0),
        }
    )


COMPRESSION_SCHEMA = (
    "doc_id long, n_bytes long, n_compressed long, compression_ratio double"
)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """DEFLATE compression ratio per document — the classic
    repetition/quality proxy (CCNet-style corpus filtering uses
    exactly this): boilerplate, template spam, and keyword stuffing
    compress far below natural prose, so a low ratio is a cheap
    high-recall junk signal that needs no model.

    zlib is stdlib, so this is a real codec, not a seam — but DEFLATE
    output bytes are library-version-dependent, so the operator is
    verified by unit-tested INVARIANTS (monotonicity on planted
    repetition, bounds, determinism) rather than a SQL twin.  Runs as
    one Arrow ``mapInPandas`` stage (the multimodal-decode posture:
    bytes-in, scalars-out, no shuffle); everything downstream of the
    ratio is plain JVM filtering.
    """
    import zlib

    from collections.abc import Iterator as _Iter

    import pandas as _pd

    def ratios(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            ids, nb, nc, rr = [], [], [], []
            for i, s in zip(pdf[id_col], pdf[text_col]):
                raw = (s or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                ids.append(int(i))
                nb.append(len(raw))
                nc.append(len(comp))
                rr.append(round(len(comp) / len(raw), 4) if raw else None)
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compression_ratio": rr,
                }
            )

    return df.select(id_col, text_col).mapInPandas(ratios, COMPRESSION_SCHEMA)


NFC_SCHEMA = "doc_id long, text_nfc string, changed boolean"


def unicode_nfc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode NFC normalization (UAX #15 canonical composition) — the
    first transform of any serious text pipeline: combining sequences
    compose (e + U+0301 -> é), Hangul jamo syllables form, singleton
    compatibility points map (U+2126 OHM -> U+03A9 Ω), and already-
    composed text passes through unchanged, so exact-hash dedup stops
    treating byte-different renderings of identical text as distinct.

    Spark has no NFC builtin, so this is an Arrow ``mapInPandas``
    stage over stdlib ``unicodedata`` — and because DuckDB ships
    ``nfc_normalize``, the oracle is a rare CROSS-LIBRARY conformance
    check: two independent UAX #15 implementations must agree
    character-for-character.  Map-side, no shuffle.
    """
    import unicodedata

    from collections.abc import Iterator as _Iter

    import pandas as _pd

    def norm(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            ids, out, chg = [], [], []
            for i, s in zip(pdf[id_col], pdf[text_col]):
                ids.append(int(i))
                if s is None:
                    out.append(None)
                    chg.append(None)
                else:
                    n = unicodedata.normalize("NFC", s)
                    out.append(n)
                    chg.append(n != s)
            yield _pd.DataFrame({"doc_id": ids, "text_nfc": out, "changed": chg})

    return df.select(id_col, text_col).mapInPandas(norm, NFC_SCHEMA)


def llr_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``top_k`` bigram collocations by Dunning's log-likelihood
    ratio (Dunning 1993) — the significance-grounded companion of
    :func:`pmi_bigrams`: PMI over-rewards rare pairs (two hapaxes
    co-occurring once get huge PMI), LLR weights the evidence, so it
    is the one production collocation extractors rank on.

    2x2 contingency per bigram over the BIGRAM stream: k11 = c(w1,w2),
    row total c(w1, *), column total c(*, w2), N = all bigrams.  LLR =
    2 * sum O*ln(O*N/(R*C)) over the four cells (zero cells contribute
    zero).  All eight inputs are exact integers; the four ln terms
    evaluate in one fixed textual sequence on both engines and the
    score rounds to ``round_digits`` before the (score, pair) rank.

    Same scale shape as PMI: one data-sized token explode, partial-agg
    groupBys, candidate-sized joins after ``min_count``.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(KEYWORD_PATTERN), F.lit(0)
    )
    base = df.select(toks.alias("__t"))
    bg = base.select(
        F.explode(
            F.expr(
                "zip_with(slice(__t, 1, greatest(size(__t) - 1, 0)),"
                " slice(__t, 2, greatest(size(__t) - 1, 0)),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("__bg")
    ).select("__bg.w1", "__bg.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("__k11"))
    r1 = bg.groupBy("w1").agg(F.count("*").alias("__r"))
    c2 = bg.groupBy("w2").agg(F.count("*").alias("__c"))
    nb = bgc.agg(F.sum("__k11").alias("__n"))
    cand = (
        bgc.where(F.col("__k11") >= min_count)
        .join(r1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nb))
    )
    k11 = F.col("__k11").cast("double")
    r = F.col("__r").cast("double")
    c = F.col("__c").cast("double")
    n = F.col("__n").cast("double")
    k12 = r - k11
    k21 = c - k11
    k22 = n - r - c + k11

    def term(o, row, col):
        return F.when(o > 0, o * F.log(o * n / (row * col))).otherwise(F.lit(0.0))

    llr = F.lit(2.0) * (
        term(k11, r, c)
        + term(k12, r, n - c)
        + term(k21, n - r, c)
        + term(k22, n - r, n - c)
    )
    scored = cand.select(
        "w1",
        "w2",
        F.col("__k11").cast("long").alias("pair_count"),
        F.round(llr, round_digits).alias("llr"),
    )
    w = Window.orderBy(F.col("llr").desc(), "w1", "w2")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_k)
        .select("w1", "w2", "pair_count", "llr")
    )


def sentence_budget_chunks(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    budget_chars: int = 256,
) -> DataFrame:
    """Sentence-boundary-respecting chunker: sentences (the
    ``[.!?]+`` segmentation shared with the sentence/readability
    queries) pack into chunks of ~``budget_chars`` by next-fit over a
    per-document cumulative sum — chunk = (cumsum - len) div budget —
    so no sentence is ever split mid-thought, unlike the fixed
    character windows of ``chunk_documents``.  A sentence longer than
    the budget becomes its own over-full chunk (split hint, same
    contract as ``compaction_plan``).

    One map-side explode + one keyed window; chunk ids are stable
    under rerun/partitioning because the order key is the split
    position.  Returns one row per chunk with sentence count, char
    total, and fill ratio.
    """
    parts = df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"[.!?]+")).alias("part_idx", "__s"),
    )
    s = F.trim(F.col("__s"))
    sized = parts.where(s != "").select(
        "doc_id", "part_idx", F.length(s).alias("__len")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("part_idx").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    chunked = sized.select(
        "doc_id",
        "part_idx",
        "__len",
        F.floor(
            (F.sum("__len").over(w) - F.col("__len")).cast("double")
            / F.lit(float(budget_chars))
        ).alias("chunk_id"),
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum("__len").cast("long").alias("n_chars"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "n_sentences",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double") / F.lit(float(budget_chars)), 4
            ).alias("fill_ratio"),
        )
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    min_phrase_count: int = 2,
    top_k: int = 40,
    round_digits: int = 4,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — PHRASE-level
    keywords where tf-idf/PMI/LLR work on words and bigrams: candidate
    phrases are maximal stopword-free token runs (split at stopwords
    AND punctuation), scored by sum over member words of
    degree(word)/freq(word) — words that co-occur in long phrases
    outrank frequent-but-isolated ones.

    All set math is exact integers: phrase segmentation is the islands
    trick (phrase id = running count of boundary tokens, one keyed
    window over positions); degree/freq ratios quantize to BIGINT
    before the per-phrase sum so scores are partitioning-independent.
    Map-side explodes + keyed groupBys throughout.
    """
    stopwords = stopwords if stopwords is not None else STOPWORDS
    frags = df.select(
        F.col(id_col).alias("__row"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[^a-z ]+")
        ).alias("frag_idx", "__frag"),
    )
    toks = frags.select(
        "__row",
        "frag_idx",
        F.posexplode(F.split(F.trim(F.col("__frag")), r" +")).alias("pos", "w"),
    ).where(F.col("w") != "")
    is_stop = F.col("w").isin(stopwords).cast("long")
    w_ord = Window.partitionBy("__row", "frag_idx").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = toks.select(
        "__row", "frag_idx", "pos", "w",
        F.sum(is_stop).over(w_ord).alias("__pid"),
        is_stop.alias("__is_stop"),
    ).where(F.col("__is_stop") == 0)
    phrases = (
        marked.groupBy("__row", "frag_idx", "__pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("w")))
                    ),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase")
        )
    )
    members = phrases.select(
        "phrase", F.posexplode(F.split(F.col("phrase"), " ")).alias("__i", "w")
    )
    word_stats = members.groupBy("w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum(F.size(F.split(F.col("phrase"), " "))).alias("__deg"),
    )
    wscore_q = F.round(
        F.col("__deg").cast("double") / F.col("__freq").cast("double") * F.lit(1e6)
    ).cast("long")
    scored = (
        members.join(word_stats.select("w", wscore_q.alias("__ws_q")), "w")
        .groupBy("phrase", "__i")
        .agg(F.first("__ws_q").alias("__ws_q"))  # one row per member slot
        .groupBy("phrase")
        .agg(F.sum("__ws_q").alias("__score_q"))
    )
    counts = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return (
        scored.join(counts, "phrase")
        .where(F.col("n_occurrences") >= min_phrase_count)
        .select(
            "phrase",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.round(F.col("__score_q").cast("double") / F.lit(1e6), round_digits).alias(
                "rake_score"
            ),
        )
        .orderBy(F.col("rake_score").desc(), "phrase")
        .limit(top_k)
    )
