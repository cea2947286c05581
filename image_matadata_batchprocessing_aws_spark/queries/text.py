"""Text-analysis queries over the documents table (Stage 5).

Token/char statistics, quality scoring, per-language aggregates,
portable fingerprints, and the language-ID heuristic (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.text import (
    BPE_SPLIT,
    STOPWORDS,
    add_fingerprint,
    add_lang_id,
    add_quality_score,
    add_token_stats,
    bpe_token_count,
    token_count,
)
from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
from image_matadata_batchprocessing_aws_spark.queries.util import t

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = add_token_stats(t(spark, sf, "documents"))
    return d.select("doc_id", "n_tokens", "n_chars_nospace", "avg_token_len")


def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    d = add_quality_score(t(spark, sf, "documents"))
    return d.select("doc_id", "n_tokens", "stop_ratio", "quality")


def text_lang_agg(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = add_fingerprint(t(spark, sf, "documents"))
    return d.select("doc_id", "fingerprint")


def text_token_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace vs BPE-style pre-token counts per doc — the budget a
    GPT-family tokenizer would actually charge (letter runs / digit runs
    / punctuation marks), plus the inflation ratio."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
    )
    return d.withColumn(
        "bpe_ratio", F.round(F.col("n_bpe_tokens") / F.col("n_ws_tokens"), 4)
    )


def text_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filter signals: top-bigram share and
    duplicate-token fraction per document (docs with <2 tokens have no
    bigrams and drop out on both engines)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import repetition_stats

    d = repetition_stats(t(spark, sf, "documents"))
    return d.select(
        "doc_id", "n_tokens", "dup_token_frac", "n_bigrams", "top_bigram_frac"
    )


def text_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus scrub over the events props payload: number runs (and any
    email/phone shapes) replaced by [LABEL] tokens, with per-row
    redaction counts."""
    from image_matadata_batchprocessing_aws_spark.operators.text import redact

    d = redact(t(spark, sf, "events").select("event_id", "props"), "props")
    return d.select("event_id", "redacted", "n_redactions")


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic n-gram language ID — scored against the same profile
    table on both engines (oracle generated from the profile dict, so
    the two can't drift)."""
    d = add_lang_id(t(spark, sf, "documents"))
    return d.select("doc_id", "lang", "lang_pred")


def text_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style boilerplate removal: lines shared by 2+ docs drop (on
    the single-line synthetic corpus this empties exact-duplicate texts,
    keeping every doc's row).  Multi-line recall is fixture-tested."""
    from image_matadata_batchprocessing_aws_spark.operators.text import drop_common_lines

    return drop_common_lines(
        t(spark, sf, "documents"), "text", "doc_id", max_doc_freq=1
    )


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_lang_agg": text_lang_agg,
    "text_fingerprint": text_fingerprint,
    "text_token_bpe": text_token_bpe,
    "text_repetition_stats": text_repetition_stats,
    "text_line_dedup": text_line_dedup,
    "text_lang_id": text_lang_id,
}

ORACLES = {
    "text_token_stats": r"""
        WITH b AS (
          SELECT doc_id,
                 len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                 length(regexp_replace(text, '\s', '', 'g')) AS n_chars_nospace
          FROM documents)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_chars_nospace AS BIGINT) AS n_chars_nospace,
               round(n_chars_nospace / CAST(n_tokens AS DOUBLE), 4) AS avg_token_len
        FROM b
    """,
    "text_quality_score": rf"""
        WITH b AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS toks,
                 length(regexp_replace(text, '\s', '', 'g')) AS nospace
          FROM documents),
        s AS (
          SELECT doc_id,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS n_stop,
                 nospace
          FROM b)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               round(n_stop / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
               floor(least(1.0, (nospace / CAST(n_tokens AS DOUBLE)) / 8.0)
                     * (1.0 - n_stop / CAST(n_tokens AS DOUBLE))
                     * 10000.0 + 0.5) / 10000.0 AS quality
        FROM s
    """,
    "text_lang_agg": """
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
               count(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
    "text_fingerprint": f"""
        SELECT doc_id, {md5_int64_sql("lower(trim(text))")} AS fingerprint
        FROM documents
    """,
    "text_repetition_stats": r"""
        WITH b AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
          FROM documents),
        s AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 round((len(toks) - len(list_distinct(toks)))
                       / CAST(len(toks) AS DOUBLE), 4) AS dup_token_frac,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM b),
        c AS (
          SELECT doc_id, n_tokens, dup_token_frac, bigram, count(*) AS cnt
          FROM s GROUP BY doc_id, n_tokens, dup_token_frac, bigram)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, dup_token_frac,
               CAST(sum(cnt) AS BIGINT) AS n_bigrams,
               round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 4) AS top_bigram_frac
        FROM c GROUP BY doc_id, n_tokens, dup_token_frac
    """,
    "text_token_bpe": rf"""
        WITH b AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
                 CAST(len(regexp_extract_all(text, '{BPE_SPLIT}')) AS BIGINT) AS n_bpe_tokens
          FROM documents)
        SELECT doc_id, n_ws_tokens, n_bpe_tokens,
               round(n_bpe_tokens / CAST(n_ws_tokens AS DOUBLE), 4) AS bpe_ratio
        FROM b
    """,
}


def _lang_id_oracle() -> str:
    """SQL twin of operators.text.add_lang_id, generated from the same
    profile dict so the two can't drift.  argmax = max (score, lang)
    struct, i.e. ties go to the lexicographically larger code — mirrored
    here by ORDER BY score DESC, lang DESC."""
    from image_matadata_batchprocessing_aws_spark.operators.text import _LANG_PROFILES

    arms = []
    for lang, profile in sorted(_LANG_PROFILES.items()):
        score = " + ".join(
            f"(CASE WHEN contains(lt, '{bg}') THEN 1 ELSE 0 END)" for bg in profile
        )
        arms.append(f"SELECT doc_id, '{lang}' AS plang, {score} AS score FROM t")
    union = "\n          UNION ALL ".join(arms)
    return f"""
        WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
        s AS ({union}),
        r AS (SELECT doc_id, plang,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, plang DESC) AS rn
              FROM s)
        SELECT d.doc_id, d.lang, r.plang AS lang_pred
        FROM documents d JOIN r ON d.doc_id = r.doc_id AND r.rn = 1
    """


ORACLES["text_lang_id"] = _lang_id_oracle()


def _redact_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.text import REDACT_PATTERNS

    sql = "WITH s0 AS (SELECT event_id, props AS t, 0 AS n FROM events)"
    prev = "s0"
    for i, (label, pat) in enumerate(REDACT_PATTERNS, start=1):
        sql += (
            f", s{i} AS (SELECT event_id,"
            f" regexp_replace(t, '{pat}', '[{label}]', 'g') AS t,"
            f" n + len(regexp_extract_all(t, '{pat}')) AS n FROM {prev})"
        )
        prev = f"s{i}"
    return sql + (
        f" SELECT event_id, t AS redacted, CAST(n AS BIGINT) AS n_redactions FROM {prev}"
    )


QUERIES["text_redact"] = text_redact
ORACLES["text_redact"] = _redact_oracle()

# Line-level dedup oracle: aligned unnests give (line, pos); doc
# frequency over non-blank lines; string_agg skips NULLed-out dropped
# lines; left join from documents keeps fully-boilerplate docs.
ORACLES["text_line_dedup"] = """
    WITH sp AS (
      SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents),
    lines AS (
      SELECT doc_id,
             unnest(parts) AS line,
             unnest(range(1, len(parts) + 1)) AS pos
      FROM sp),
    freq AS (
      SELECT line, count(DISTINCT doc_id) AS df
      FROM lines WHERE line <> '' GROUP BY line),
    flagged AS (
      SELECT l.doc_id, l.pos, l.line,
             (l.line = '' OR f.df <= 1) AS keep
      FROM lines l LEFT JOIN freq f USING (line))
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '')
             AS text_kept,
           CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_lines_kept,
           CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_lines_dropped
    FROM flagged GROUP BY doc_id
"""


def text_charlm_score(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet/KenLM-style perplexity filter, self-trained: mean quantized
    log2 corpus-frequency of each doc's char trigrams.  The bit-length
    quantization keeps the score integer-exact across engines (float ln
    differs by ulps between JVM and C libm)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import charlm_score

    return charlm_score(t(spark, sf, "documents"))


def text_tfidf_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 keywords per doc by tf-idf (raw-ratio idf — exact integer
    products and one IEEE division, so ranks can't drift cross-engine)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import tfidf_keywords

    return tfidf_keywords(t(spark, sf, "documents"), k=5)


QUERIES["text_charlm_score"] = text_charlm_score
QUERIES["text_tfidf_keywords"] = text_tfidf_keywords

# Trigrams via substring over a whitespace-normalized string; DuckDB's
# range(a, b) is end-exclusive so range(1, greatest(len-2,0)+1) yields
# exactly the 1..len-2 trigram starts (empty below 3 chars). bin(cnt)
# mirrors Spark's conv(cnt, 10, 2) digit-for-digit.
ORACLES["text_charlm_score"] = r"""
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
      FROM documents),
    tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(length(s) - 2, 0) + 1),
                                   i -> substring(s, i, 3))) AS tri
      FROM norm),
    model AS (SELECT tri, count(*) AS cnt FROM tri GROUP BY tri)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           round(CAST(sum(length(bin(m.cnt))) AS DOUBLE)
                 / count(*), 4) AS charlm_bits
    FROM tri t JOIN model m USING (tri)
    GROUP BY t.doc_id
"""

ORACLES["text_tfidf_keywords"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, token, tf, df,
             CAST(tf * n_docs AS DOUBLE) / df AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token ASC) AS rnk
      FROM scored)
    SELECT doc_id, CAST(rnk AS BIGINT) AS rank, token,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           round(tfidf, 4) AS tfidf
    FROM ranked WHERE rnk <= 5
"""


def text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical text normalization (the pre-dedup/pre-tokenize pass):
    casefold, strip punctuation to spaces, collapse whitespace runs,
    trim.  Pure map-side regexp chain (whole-stage codegen); the corpus
    is ASCII so both engines' lower() and regex classes agree exactly
    (DuckDB's regexp_replace needs the 'g' flag to match Spark's
    replace-all)."""
    from image_matadata_batchprocessing_aws_spark.queries.util import t as _t

    d = _t(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9\\s]", " "),
            "\\s+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


QUERIES["text_normalize"] = text_normalize
ORACLES["text_normalize"] = r"""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                 '\s+', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm
    FROM n
"""


NGRAM_TOPK = 5


def text_ngram_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language top-5 word bigrams WITH multiplicity (corpus phrase
    statistics — the grouped-heavy-hitter complement of the per-doc
    tf-idf keywords).  Bigram build is two slices + zip_with (tokens
    traversed twice, never per-gram); the count groupBy partially
    aggregates map-side and the top-k window partitions BY LANGUAGE —
    no global sort.  At extreme cardinality the exact count swaps for
    the Count-Min estimate (operators/sketches.cms_build), same
    downstream shape."""
    from image_matadata_batchprocessing_aws_spark.operators.text import tokens
    from image_matadata_batchprocessing_aws_spark.queries.util import t as _t
    from pyspark.sql import Window

    d = _t(spark, sf, "documents").select("lang", tokens("text").alias("__t"))
    k = F.size("__t") - 1
    grams = F.zip_with(
        F.slice("__t", 1, F.greatest(k, F.lit(0))),
        F.slice("__t", 2, F.greatest(k, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counted = (
        d.select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "gram")
    return (
        counted.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= NGRAM_TOPK)
        .select("lang", "gram", F.col("n").cast("long").alias("n"), "rn")
    )


QUERIES["text_ngram_topk"] = text_ngram_topk
ORACLES["text_ngram_topk"] = rf"""
    WITH toks AS (SELECT lang, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    grams AS (SELECT lang,
                     unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i+1])) AS gram
              FROM toks),
    counted AS (SELECT lang, gram, count(*) AS n FROM grams GROUP BY 1, 2),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY lang
                         ORDER BY n DESC, gram) AS rn
               FROM counted)
    SELECT lang, gram, CAST(n AS BIGINT) AS n, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {NGRAM_TOPK}
"""


# --- sentence segmentation ------------------------------------------------


def text_sentences(spark: SparkSession, sf: str) -> DataFrame:
    """Regex sentence segmentation with per-sentence stats — the unit
    below the document (chunkers, readability scores, curriculum
    heuristics all want it).  Split on terminal-punctuation runs
    ``[.!?]+`` (deliberately RE2-compatible — no lookbehind, so the
    DuckDB twin splits on the identical pattern); empty fragments drop
    but keep their original split position, so the (doc, part) key is
    stable under both engines.  Pure map-side: split, posexplode,
    filter, measure."""
    d = t(spark, sf, "documents")
    parts = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias("part_idx", "__s")
    )
    s = F.trim(F.col("__s"))
    return parts.where(s != "").select(
        "doc_id",
        F.col("part_idx").cast("long").alias("part_idx"),
        F.length(s).cast("long").alias("n_chars"),
        F.size(F.split(s, r"\s+")).cast("long").alias("n_tokens"),
    )


QUERIES["text_sentences"] = text_sentences
ORACLES["text_sentences"] = r"""
    WITH parts AS (
      SELECT doc_id, string_split_regex(text, '[.!?]+') AS arr
      FROM documents),
    pos AS (
      SELECT doc_id, arr, unnest(range(len(arr))) AS i FROM parts),
    s AS (SELECT doc_id, i AS part_idx, trim(arr[i + 1]) AS sent FROM pos)
    SELECT doc_id, CAST(part_idx AS BIGINT) AS part_idx,
           CAST(length(sent) AS BIGINT) AS n_chars,
           CAST(len(string_split_regex(sent, '\s+')) AS BIGINT) AS n_tokens
    FROM s WHERE sent <> ''
"""


# --- readability ------------------------------------------------------------


def text_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Readability profile per document — the quality-scoring companion
    built on the sentence segmenter: sentence count, mean sentence
    length (tokens), mean token length (chars), and a Flesch-style
    grade PROXY (0.39 * tokens/sentence + 11.8 * chars/token - 15.59,
    the ARI/FK shape with chars-per-token standing in for syllables —
    honest about being a proxy; exact rational arithmetic, one rounded
    double).  Everything derives from one sentence explode + one
    groupBy."""
    d = t(spark, sf, "documents")
    parts = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias("part_idx", "__s")
    )
    s = F.trim(F.col("__s"))
    sent = parts.where(s != "").select(
        "doc_id",
        F.size(F.split(s, r"\s+")).cast("long").alias("__n_tok"),
        F.length(F.regexp_replace(s, r"\s+", "")).cast("long").alias("__n_chr"),
    )
    agg = sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.sum("__n_tok").alias("__tok"),
        F.sum("__n_chr").alias("__chr"),
    )
    tok = F.col("__tok").cast("double")
    return agg.select(
        "doc_id",
        "n_sentences",
        F.col("__tok").cast("long").alias("n_tokens"),
        F.round(tok / F.col("n_sentences").cast("double"), 4).alias("tokens_per_sentence"),
        F.round(F.col("__chr").cast("double") / tok, 4).alias("chars_per_token"),
        F.round(
            F.lit(0.39) * (tok / F.col("n_sentences").cast("double"))
            + F.lit(11.8) * (F.col("__chr").cast("double") / tok)
            - F.lit(15.59),
            4,
        ).alias("grade_proxy"),
    )


QUERIES["text_readability"] = text_readability
ORACLES["text_readability"] = r"""
    WITH parts AS (
      SELECT doc_id, string_split_regex(text, '[.!?]+') AS arr FROM documents),
    pos AS (SELECT doc_id, arr, unnest(range(len(arr))) AS i FROM parts),
    s AS (SELECT doc_id, trim(arr[i + 1]) AS sent FROM pos),
    sent AS (
      SELECT doc_id,
             len(string_split_regex(sent, '\s+')) AS n_tok,
             length(regexp_replace(sent, '\s+', '', 'g')) AS n_chr
      FROM s WHERE sent <> ''),
    agg AS (
      SELECT doc_id, count(*) AS n_sentences,
             sum(n_tok) AS tok, sum(n_chr) AS chr
      FROM sent GROUP BY doc_id)
    SELECT doc_id,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(tok AS BIGINT) AS n_tokens,
           round(CAST(tok AS DOUBLE) / CAST(n_sentences AS DOUBLE), 4)
             AS tokens_per_sentence,
           round(CAST(chr AS DOUBLE) / CAST(tok AS DOUBLE), 4) AS chars_per_token,
           round(0.39 * (CAST(tok AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 + 11.8 * (CAST(chr AS DOUBLE) / CAST(tok AS DOUBLE)) - 15.59, 4)
             AS grade_proxy
    FROM agg
"""
