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
             floor(least(1.0, (nospace / CAST(len(toks) AS DOUBLE)) / 8.0)
                   * (1.0 - n_stop / CAST(len(toks) AS DOUBLE))
                   * 10000.0 + 0.5) / 10000.0 AS quality
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


# --- the embedding-modality corpus builder --------------------------------

EMB_NORM_LO_Q = 0.05
EMB_NORM_HI_Q = 0.95


def pipeline_embedding_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The EMBEDDING twin of the flagship text corpus builder — the
    stages a vector store runs before serving: (1) norm-band quality
    gate (P05..P95 exact-percentile bounds — degenerate and outlier
    vectors out), (2) semantic dedup over the survivors
    (cluster-bounded pairs -> connected components -> keep group
    minimum), (3) int8 scalar quantization of the kept vectors.  One
    lazy composition; the gate is map-side after a 1-row broadcast, the
    dedup pair search is cluster-bounded, quantization is map-side —
    nothing data-sized shuffles except the pair/components stages, which
    are contamination-sized."""
    from image_matadata_batchprocessing_aws_spark.functions import l2_norm
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import semantic_dedup
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        SEM_THRESHOLD,
        _emb,
        _fixed_centroids,
    )

    e = _emb(spark, sf)
    n = e.withColumn("__norm", l2_norm(F.col("e")))
    bounds = n.agg(
        F.percentile("__norm", F.lit(EMB_NORM_LO_Q)).alias("__lo"),
        F.percentile("__norm", F.lit(EMB_NORM_HI_Q)).alias("__hi"),
    )
    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        track_persist,
    )

    # the gate output is consumed by three separate ACTIONS (the
    # centroid collect, the components checkpoint inside semantic_dedup,
    # and the final materialization), each of which would re-run the
    # scan + norm + percentile-broadcast gate — persist it once (r08;
    # released by the session's release_persisted() hook)
    gated = track_persist(
        n.crossJoin(F.broadcast(bounds))
        .where((F.col("__norm") >= F.col("__lo")) & (F.col("__norm") <= F.col("__hi")))
        .select("vec_id", "e")
    )
    cents = _fixed_centroids(gated)
    dd = semantic_dedup(gated, cents, "e", "vec_id", SEM_THRESHOLD)
    kept = gated.join(
        dd.where(F.col("keep")).select("vec_id", F.col("component").cast("long").alias("component")),
        "vec_id",
    )
    maxabs = F.array_max(F.transform("e", F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform("e", lambda x: F.round(x / scale).cast("int"))
    recon_err = F.array_max(
        F.zip_with("e", q, lambda x, c: F.abs(x - c.cast("double") * scale))
    )
    l1 = F.aggregate(q, F.lit(0).cast("long"), lambda acc, c: acc + F.abs(c))
    return kept.select(
        "vec_id",
        "component",
        F.round(scale, 6).alias("scale"),
        l1.alias("code_l1"),
        F.round(recon_err, 6).alias("max_err"),
    )


def _embedding_pipeline_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        CENT_MOD_KM,
        SEM_THRESHOLD,
    )

    return f"""
        WITH RECURSIVE v0 AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        nrm AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nm FROM v0),
        bq AS (SELECT quantile_cont(nm, {EMB_NORM_LO_Q}) AS lo,
                      quantile_cont(nm, {EMB_NORM_HI_Q}) AS hi FROM nrm),
        v AS (SELECT vec_id, e FROM nrm, bq WHERE nm >= lo AND nm <= hi),
        cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS cv
                  FROM v WHERE vec_id % {CENT_MOD_KM} = 0),
        dists AS (SELECT v.vec_id, c.cid,
                         row_number() OVER (PARTITION BY v.vec_id
                                            ORDER BY list_distance(v.e, c.cv), c.cid)
                           AS rn
                  FROM v CROSS JOIN cents c),
        assigned AS (SELECT vec_id, cid FROM dists WHERE rn = 1),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM assigned a
              JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
              JOIN v va ON va.vec_id = a.vec_id
              JOIN v vb ON vb.vec_id = b.vec_id
              WHERE list_dot_product(va.e, va.e) <> 0
                AND list_dot_product(vb.e, vb.e) <> 0
                AND round(list_cosine_similarity(va.e, vb.e), 6) >= {SEM_THRESHOLD}),
        edges AS (SELECT id_a AS ea, id_b AS eb FROM p
                  UNION ALL SELECT id_b AS ea, id_a AS eb FROM p),
        reach(src, node) AS (
            SELECT ea AS src, ea AS node FROM edges
            UNION
            SELECT r.src, g.eb FROM reach r JOIN edges g ON r.node = g.ea),
        comp AS (SELECT src AS vec_id, min(node) AS component
                 FROM reach GROUP BY src),
        kept AS (SELECT v.vec_id, v.e,
                        CAST(coalesce(c.component, v.vec_id) AS BIGINT) AS component
                 FROM v LEFT JOIN comp c ON v.vec_id = c.vec_id
                 WHERE v.vec_id = coalesce(c.component, v.vec_id)),
        s AS (SELECT vec_id, component, e,
                     list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
              FROM kept),
        q AS (SELECT vec_id, component, e, scale,
                     list_transform(e, x -> CAST(round(x / scale) AS INT)) AS codes
              FROM s)
        SELECT vec_id, component,
               round(scale, 6) AS scale,
               CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) AS code_l1,
               round(list_max(list_transform(list_zip(e, codes),
                     p -> abs(p[1] - CAST(p[2] AS DOUBLE) * scale))), 6) AS max_err
        FROM q
    """


QUERIES["pipeline_embedding_corpus"] = pipeline_embedding_corpus
ORACLES["pipeline_embedding_corpus"] = _embedding_pipeline_oracle()
