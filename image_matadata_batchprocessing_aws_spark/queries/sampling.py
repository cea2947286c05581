"""Reproducible-sampling and sequence-packing queries (Stage 5).

Hash-based deterministic sampling (the production replacement for the
reference's RNG splits, ``train.py:144`` /
``Best-Model-architecture-for-local.py:106-109``) and GPT-style context
-window packing — both bit-reproducible in DuckDB, so fully
oracle-checked, unlike ``rand()``-based sampling which no oracle can
mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.operators.sampling import (
    SAMPLE_DENOM,
    hash_sample,
    hash_sample_stratified,
    pack_documents,
    sample_predicate_sql,
    shuffle_deterministic,
    shuffle_sql,
    weighted_sample_sql,
)
from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
from image_matadata_batchprocessing_aws_spark.operators.text import token_count
from image_matadata_batchprocessing_aws_spark.queries.util import t

SAMPLE_FRACTION = 0.2
#: Downsample the high-resource language, keep the rest — the standard
#: language-rebalancing move in pretraining-corpus prep.
STRATA_FRACTIONS = {"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
PACK_BUDGET = 512


def sample_hash_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~20% corpus sample keyed on doc_id: rerun-stable,
    partitioning-independent, pure map-side filter."""
    return hash_sample(t(spark, sf, "documents"), "doc_id", SAMPLE_FRACTION).select(
        "doc_id", "lang", "n_chars"
    )


def sample_stratified_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Language-rebalanced sample: en down to 25%, others kept whole."""
    return hash_sample_stratified(
        t(spark, sf, "documents"), "doc_id", "lang", STRATA_FRACTIONS
    ).select("doc_id", "lang")


def pack_context_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language packed pretraining stream: docs ordered by id, cut
    into 512-token context windows (exclusive-cumsum offset).  Sharding
    by lang is the parallel scale path — each shard packs independently."""
    d = t(spark, sf, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("n_tokens")
    )
    return pack_documents(
        d, token_col="n_tokens", order_by="doc_id", budget=PACK_BUDGET, partition_by="lang"
    )


def sample_shuffle_docs(spark: SparkSession, sf: str) -> DataFrame:
    """O3 — deterministic global shuffle of the corpus: md5-permuted
    order, reproducible across engines (unlike rand(), which no oracle
    can mirror); two-pass numbering, no single-partition window."""
    return shuffle_deterministic(
        t(spark, sf, "documents"), "doc_id", seed="42"
    ).select("doc_id", "shuffle_pos")


QUOTA_N = 50
TOKEN_BUDGET = 5_000


def sample_quota_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-quota sampling: precisely 50 docs per language (hash order),
    for specs phrased as counts rather than fractions."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import quota_sample

    return quota_sample(
        t(spark, sf, "documents"), "doc_id", "lang", QUOTA_N
    ).select("doc_id", "lang", "quota_rank")


def sample_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy token-budget selection: fill 5k whitespace tokens per
    language in hash order, whole docs only — the "N tokens per language"
    mixture spec as one per-stratum window pass."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        token_budget_select,
    )

    d = t(spark, sf, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("n_tokens")
    )
    return token_budget_select(
        d, "doc_id", "lang", "n_tokens", TOKEN_BUDGET
    ).select("doc_id", "lang", "n_tokens", "budget_used")


#: Corpus-mixture weights by SOURCE (the Pile/Dolma-style move: keep
#: curated sources whole, downsample the bulk crawl).  The synthetic
#: corpus ships sources src0..src19; src0-src4 play the curated slice.
#: Values are keep-fractions; >1x upsampling belongs to the training
#: consumer (epoch repeats), not the sampler.
SOURCE_MIX = {f"src{i}": (1.0 if i < 5 else 0.3) for i in range(20)}


def sample_source_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus mixing: per-source keep-fractions applied with the same
    deterministic hash predicate as every sampler here — map-side only,
    rerun/partitioning/growth-stable."""
    return hash_sample_stratified(
        t(spark, sf, "documents"), "doc_id", "source", SOURCE_MIX, salt="mix-v1"
    ).select("doc_id", "source", "lang")


WEIGHTED_N = 200


def sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted corpus sampling: exactly 200 docs drawn WITHOUT
    replacement with probability proportional to n_chars
    (Efraimidis-Spirakis A-Res over a deterministic md5 uniform) — the
    "prefer long documents" selection move, rerun/partitioning-stable,
    planned as a distributed partial top-n (TakeOrderedAndProject)."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        weighted_sample,
    )

    d = t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample(d, "doc_id", "n_chars", WEIGHTED_N, salt="wsample-v1")


CURRICULUM_STAGES = 4


def sample_curriculum(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum staging: per language, docs are split into 4
    equal-population difficulty stages by length (short-first curricula —
    ntile over (n_chars, doc_id)).  The window partitions on lang, so at
    100 TB each stratum stages independently after one shuffle on the
    stratum key; a global curriculum would instead quantize against
    approx-quantile cut points (agg_quantile_bound's sketch) to avoid a
    single ordered partition."""
    from pyspark.sql import Window

    d = t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.ntile(CURRICULUM_STAGES).over(w).cast("long").alias("stage"),
    )


def sample_curriculum_global(spark: SparkSession, sf: str) -> DataFrame:
    """The GLOBAL curriculum variant promised in sample_curriculum's
    docstring: quartile cut points come from one tiny aggregate
    (broadcast back), and staging is three map-side comparisons — no
    ordered window anywhere, so there is no single-partition stage to
    saturate at 100 TB.  Cut points round to 4 decimals on both engines
    (Spark percentile == DuckDB quantile_cont, linear interpolation)."""
    d = t(spark, sf, "documents").select("doc_id", "n_chars")
    cuts = d.agg(
        F.round(F.expr("percentile(n_chars, 0.25)"), 4).alias("q1"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("q2"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 4).alias("q3"),
    )
    stage = (
        F.lit(1)
        + (F.col("n_chars") > F.col("q1")).cast("int")
        + (F.col("n_chars") > F.col("q2")).cast("int")
        + (F.col("n_chars") > F.col("q3")).cast("int")
    )
    return d.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "n_chars", stage.cast("long").alias("stage")
    )


SPLIT_SPEC = [("train", 0.70), ("val", 0.15), ("test", 0.15)]
SPLIT_SALT = "split-v1"


def sample_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment (the oracle-checkable
    upgrade of the reference's seeded randomSplit, SURVEY O4): one md5
    per doc bucketed by cumulative thresholds — disjoint cover, stable
    under reruns/partitioning/growth, pure map-side."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        split_assign,
    )

    d = t(spark, sf, "documents").select("doc_id", "lang")
    return split_assign(d, "doc_id", SPLIT_SPEC, salt=SPLIT_SALT)


WEIGHTED_PER_LANG = 30


def sample_weighted_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language length-weighted sampling without replacement
    (operators/sampling.weighted_sample_grouped): exactly 30 docs per
    language, inclusion probability proportional to n_chars — the
    stratified form of sample_weighted, one shuffle on the stratum."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        weighted_sample_grouped,
    )

    d = t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_grouped(
        d, "doc_id", "lang", "n_chars", WEIGHTED_PER_LANG, salt="wsample-v1"
    )


QUERIES = {
    "sample_weighted_lang": sample_weighted_lang,
    "sample_split_assign": sample_split_assign,
    "sample_curriculum": sample_curriculum,
    "sample_curriculum_global": sample_curriculum_global,
    "sample_hash_docs": sample_hash_docs,
    "sample_stratified_lang": sample_stratified_lang,
    "sample_shuffle_docs": sample_shuffle_docs,
    "pack_context_windows": pack_context_windows,
    "sample_quota_lang": sample_quota_lang,
    "sample_token_budget": sample_token_budget,
    "sample_source_mixture": sample_source_mixture,
    "sample_weighted": sample_weighted,
}


def _stratified_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{v}' THEN {int(f * SAMPLE_DENOM)}"
        for v, f in sorted(STRATA_FRACTIONS.items())
    )
    return f"(CASE {cases} ELSE 0 END)"


def _source_mix_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{v}' THEN {int(f * SAMPLE_DENOM)}"
        for v, f in sorted(SOURCE_MIX.items())
    )
    return f"(CASE {cases} ELSE 0 END)"


def _split_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        split_assign_sql,
    )

    return f"""
        SELECT doc_id, lang,
               {split_assign_sql("doc_id", SPLIT_SPEC, SPLIT_SALT)} AS split
        FROM documents
    """


def _weighted_lang_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        weighted_sample_sql,
    )

    wkey = weighted_sample_sql("doc_id", "n_chars", 0, salt="wsample-v1")
    return f"""
        WITH r AS (SELECT doc_id, lang, n_chars,
                          row_number() OVER (PARTITION BY lang
                            ORDER BY {wkey} DESC, doc_id) AS wrank
                   FROM documents WHERE n_chars > 0)
        SELECT doc_id, lang, n_chars, CAST(wrank AS BIGINT) AS wrank
        FROM r WHERE wrank <= {WEIGHTED_PER_LANG}
    """


ORACLES = {
    "sample_weighted_lang": _weighted_lang_oracle(),
    "sample_split_assign": _split_oracle(),
    "sample_curriculum": f"""
        SELECT doc_id, lang, n_chars,
               CAST(ntile({CURRICULUM_STAGES})
                    OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT)
                 AS stage
        FROM documents
    """,
    "sample_curriculum_global": """
        WITH cuts AS (SELECT round(quantile_cont(n_chars, 0.25), 4) AS q1,
                             round(quantile_cont(n_chars, 0.5), 4) AS q2,
                             round(quantile_cont(n_chars, 0.75), 4) AS q3
                      FROM documents)
        SELECT doc_id, n_chars,
               CAST(1 + (n_chars > q1)::INT + (n_chars > q2)::INT
                      + (n_chars > q3)::INT AS BIGINT) AS stage
        FROM documents CROSS JOIN cuts
    """,
    "sample_hash_docs": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {sample_predicate_sql("doc_id", SAMPLE_FRACTION)}
    """,
    "sample_stratified_lang": f"""
        SELECT doc_id, lang FROM documents
        WHERE ({md5_int64_sql("CAST(doc_id AS VARCHAR) || chr(31) || ''")} % {SAMPLE_DENOM})
              < {_stratified_threshold_sql()}
    """,
    "sample_shuffle_docs": f"""
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY {shuffle_sql("doc_id", "42")}, doc_id) - 1
                    AS BIGINT) AS shuffle_pos
        FROM documents
    """,
    "pack_context_windows": rf"""
        WITH toks AS (
          SELECT doc_id, lang,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        offs AS (
          SELECT doc_id, lang, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS pack_offset
          FROM toks)
        SELECT doc_id, lang, n_tokens, pack_offset,
               CAST(floor(pack_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id
        FROM offs
    """,
    "sample_quota_lang": f"""
        WITH r AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY {shuffle_sql("doc_id")}, doc_id) AS quota_rank
          FROM documents)
        SELECT doc_id, lang, CAST(quota_rank AS BIGINT) AS quota_rank
        FROM r WHERE quota_rank <= {QUOTA_N}
    """,
    "sample_source_mixture": f"""
        SELECT doc_id, source, lang FROM documents
        WHERE ({md5_int64_sql("CAST(doc_id AS VARCHAR) || chr(31) || 'mix-v1'")}
               % {SAMPLE_DENOM}) < {_source_mix_threshold_sql()}
    """,
    "sample_weighted": f"""
        WITH k AS (
          SELECT doc_id, lang, n_chars,
                 {weighted_sample_sql("doc_id", "n_chars", WEIGHTED_N, "wsample-v1")} AS wkey
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, lang, n_chars, wkey FROM k
        ORDER BY wkey DESC, doc_id ASC LIMIT {WEIGHTED_N}
    """,
    "sample_token_budget": rf"""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        s AS (
          SELECT doc_id, lang, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY lang
                                     ORDER BY {shuffle_sql("doc_id")}, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS budget_used
          FROM d)
        SELECT doc_id, lang, n_tokens, CAST(budget_used AS BIGINT) AS budget_used
        FROM s WHERE budget_used <= {TOKEN_BUDGET}
    """,
}


def sample_bootstrap(spark: SparkSession, sf: str) -> DataFrame:
    """Resampling WITH REPLACEMENT, deterministically: each row
    replicates md5(id) % 4 times (0..3 copies, mean 1.5 — the
    hash-derived stand-in for a Poisson(1) bootstrap draw; honest proxy,
    same plan shape), via explode(sequence) — no collect, no Python, and
    rerun-stable like every sampler here.  Output compares original vs
    resampled counts and means per return flag — the bootstrap loop's
    inner statistic."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64

    li = t(spark, sf, "lineitem")
    reps = (md5_int64(F.concat_ws(":", "l_orderkey", "l_linenumber")) % 4).cast("int")
    boot = li.withColumn("__r", reps).where(F.col("__r") > 0).withColumn(
        "__i", F.explode(F.sequence(F.lit(1), F.col("__r")))
    )
    qs = F.round(F.col("l_quantity") * 100).cast("long")
    orig = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_orig"),
        F.sum(qs).alias("__s_orig"),
    )
    bs = boot.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_boot"),
        F.sum(qs).alias("__s_boot"),
    )
    return orig.join(bs, "l_returnflag").select(
        "l_returnflag",
        F.col("n_orig").cast("long").alias("n_orig"),
        F.col("n_boot").cast("long").alias("n_boot"),
        F.round(F.col("__s_orig").cast("double") / 100.0 / F.col("n_orig"), 6).alias("mean_orig"),
        F.round(F.col("__s_boot").cast("double") / 100.0 / F.col("n_boot"), 6).alias("mean_boot"),
    )


QUERIES["sample_bootstrap"] = sample_bootstrap

from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql as _mi64  # noqa: E402

ORACLES["sample_bootstrap"] = f"""
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS qs,
             ({_mi64("l_orderkey || ':' || l_linenumber")}) % 4 AS r
      FROM lineitem),
    orig AS (SELECT l_returnflag, count(*) AS n_orig, sum(qs) AS s_orig
             FROM li GROUP BY l_returnflag),
    boot AS (SELECT l_returnflag, sum(r) AS n_boot, sum(qs * r) AS s_boot
             FROM li WHERE r > 0 GROUP BY l_returnflag)
    SELECT o.l_returnflag,
           CAST(o.n_orig AS BIGINT) AS n_orig,
           CAST(b.n_boot AS BIGINT) AS n_boot,
           round(CAST(o.s_orig AS DOUBLE) / 100.0 / o.n_orig, 6) AS mean_orig,
           round(CAST(b.s_boot AS DOUBLE) / 100.0 / b.n_boot, 6) AS mean_boot
    FROM orig o JOIN boot b USING (l_returnflag)
"""
