"""Flagship composition query: a pretraining-corpus builder.

The LLM-data operators are useful individually, but a real corpus build
chains them.  ``pipeline_pretraining_corpus`` composes, as ONE lazy
Catalyst plan (C4/Gopher-style):

1. quality + language gate        (map-side expressions, pushdown-safe)
2. exact dedup, keep-first        (one shuffle on a content hash)
3. benchmark decontamination      (broadcast n-gram probe, anti-join)
4. deterministic hash sampling    (map-side predicate, rerun-stable)

Every stage is an operator with its own oracle-checked query elsewhere
in the registry; this query proves the COMPOSITION is engine-exact too
(one DuckDB SQL twin mirrors the whole chain).  Scale: stages 1 and 4
are map-side; stage 2 shuffles 60-bit hashes, never text; stage 3
broadcasts only the benchmark shingle set.  Nothing in the chain
collects, caches, or breaks the single-plan laziness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.dedup import (
    decontamination_report,
    exact_dedup_keep_first,
)
from image_matadata_batchprocessing_aws_spark.operators.sampling import (
    hash_sample,
    sample_predicate_sql,
)
from image_matadata_batchprocessing_aws_spark.operators.text import (
    STOPWORDS,
    add_quality_score,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

QUALITY_MIN = 0.5
LANGS = ("en", "de", "es")
SAMPLE_FRACTION = 0.5
SAMPLE_SALT = "corpus-v1"
DECONTAM_N = 4


def pipeline_pretraining_corpus(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    kept = add_quality_score(train).where(
        (F.col("quality") >= QUALITY_MIN) & F.col("lang").isin(*LANGS)
    )
    deduped = exact_dedup_keep_first(kept)
    contaminated = decontamination_report(
        deduped, bench, n=DECONTAM_N, min_hits=1
    ).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    sampled = hash_sample(clean, "doc_id", SAMPLE_FRACTION, salt=SAMPLE_SALT)
    return sampled.select("doc_id", "lang", "n_tokens", "stop_ratio", "quality")


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_PIPELINE_ORACLE = rf"""
    WITH train AS (
      SELECT * FROM documents WHERE doc_id % 50 <> 0),
    scored AS (
      SELECT doc_id, lang, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             round(n_stop / CAST(len(toks) AS DOUBLE), 4) AS stop_ratio,
             round(least(1.0, (nospace / CAST(len(toks) AS DOUBLE)) / 8.0)
                   * (1.0 - n_stop / CAST(len(toks) AS DOUBLE)), 4) AS quality
      FROM (
        SELECT doc_id, lang, text,
               string_split_regex(trim(text), '\s+') AS toks,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x IN ({_STOP_SQL}))) AS n_stop,
               length(regexp_replace(text, '\s', '', 'g')) AS nospace
        FROM train)),
    kept AS (
      SELECT * FROM scored
      WHERE quality >= {QUALITY_MIN} AND lang IN ('en', 'de', 'es')),
    keepfirst AS (
      SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keep
      FROM kept GROUP BY 1),
    dd AS (
      SELECT k.* FROM kept k
      JOIN keepfirst g ON md5(lower(trim(k.text))) = g.h AND k.doc_id = g.keep),
    sh4 AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 4
               THEN list_transform(range(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
               ELSE CAST([] AS VARCHAR[]) END) AS s
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents)),
    bench_sh AS (
      SELECT DISTINCT unnest(s) AS shingle FROM sh4 WHERE doc_id % 50 = 0),
    contaminated AS (
      SELECT DISTINCT e.doc_id
      FROM (SELECT sh4.doc_id, unnest(s) AS shingle
            FROM sh4 JOIN dd USING (doc_id)) e
      JOIN bench_sh USING (shingle))
    SELECT doc_id, lang, n_tokens, stop_ratio, quality
    FROM dd
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND {sample_predicate_sql("doc_id", SAMPLE_FRACTION, SAMPLE_SALT)}
"""

QUERIES = {"pipeline_pretraining_corpus": pipeline_pretraining_corpus}
ORACLES = {"pipeline_pretraining_corpus": _PIPELINE_ORACLE}
