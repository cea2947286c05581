"""Deduplication queries over documents (Stage 5 / north star).

Exact hash dedup, shingle-Jaccard, MinHash+LSH, SimHash — all with
bit-exact DuckDB oracles (hashes are md5-derived; see
functions.md5_int64), plus embedding-cosine near-dup.

On the synthetic corpus most near-dup result sets are small or empty
(no true dups are planted) — the operators' recall is proven on crafted
duplicate fixtures in tests/test_dedup.py; the oracles here prove the
pipeline math is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
from image_matadata_batchprocessing_aws_spark.operators.dedup import (
    exact_dedup_groups,
    exact_dedup_keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from image_matadata_batchprocessing_aws_spark.functions import cosine_sim, dot, l2_norm
from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components
from image_matadata_batchprocessing_aws_spark.operators.similarity import (
    add_lsh_bucket,
    as_double_array,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.4
#: Lower bar for the components graph: denser edges -> multi-hop groups,
#: which actually exercises the star-contraction rounds.
CC_COSINE_THRESHOLD = 0.1

# Shared oracle CTE fragments --------------------------------------------

_SHINGLES_CTE = r"""
        toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                        ELSE CAST([] AS VARCHAR[]) END) AS s
               FROM toks),
        ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
                  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        jac AS (SELECT p.id_a, p.id_b,
                       round(p.inter / CAST(sa.sz + sb.sz - p.inter AS DOUBLE), 4) AS jaccard
                FROM pairs p
                JOIN sizes sa ON p.id_a = sa.doc_id
                JOIN sizes sb ON p.id_b = sb.doc_id)
"""


def dedup_exact_groups(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup_groups(t(spark, sf, "documents"))


def dedup_exact_rows(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup_keep_first(t(spark, sf, "documents")).select("doc_id")


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_jaccard_pairs(
        t(spark, sf, "documents"), threshold=JACCARD_THRESHOLD
    )


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(
        t(spark, sf, "documents"), threshold=JACCARD_THRESHOLD
    )


def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ingest dedup: every 10th doc plays the incoming batch,
    the rest the settled corpus.  Exact content-hash matches exit before
    shingling; the MinHash band join is new-vs-corpus only."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        incremental_dedup_report,
    )

    docs = t(spark, sf, "documents")
    return incremental_dedup_report(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        threshold=JACCARD_THRESHOLD,
    )


#: Exact-substring span resolution in tokens (Lee et al. use 50 BPE
#: tokens at web scale; the synthetic corpus's planted repeats are
#: sentence-sized, so 5 words exercises the run-merge properly).
SUBSTR_K = 5


def dedup_substr_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring dedup, detection stage: maximal duplicated token
    spans (>= SUBSTR_K tokens, >= 2 corpus-wide occurrences) per doc —
    the distributed stand-in for a suffix-array scan."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        duplicated_spans,
    )

    return duplicated_spans(t(spark, sf, "documents"), k=SUBSTR_K)


def dedup_substr_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring dedup, policy stage: per-doc duplicated-token
    fraction (0.0 for clean docs) — what a drop/trim threshold reads."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        doc_dup_fraction,
        duplicated_spans,
    )

    docs = t(spark, sf, "documents")
    return doc_dup_fraction(duplicated_spans(docs, k=SUBSTR_K), docs)


def dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware near-dup resolution — the POLICY stage most dedup
    pipelines actually ship: MinHash-LSH pairs -> connected components ->
    within each duplicate group keep the HIGHEST-QUALITY member (longest
    text, doc_id tiebreak), not the arbitrary minimum id.  Singleton
    docs skip the window entirely (anti-join + literal keep=true), so
    the rank window runs only over the pair-sized component table —
    at 100 TB that's the contamination, not the corpus."""
    docs = t(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD).select("id_a", "id_b")
    comps = connected_components(pairs, out_id="doc_id")
    meta = docs.select("doc_id", "n_chars")
    in_comp = meta.join(comps, "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    ranked = in_comp.select(
        "doc_id",
        F.col("component").cast("long").alias("component"),
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.row_number().over(w) == 1).alias("keep"),
    )
    singles = meta.join(comps.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.col("doc_id").cast("long").alias("component"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(True).alias("keep"),
    )
    return ranked.unionByName(singles)


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return simhash(t(spark, sf, "documents"))


def dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return simhash_pairs(t(spark, sf, "documents"))


def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute verification; the LSH-bucketed
    scale path is similarity.ann_lsh_bucket)."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    # per-row norms below the join (r08): l2_norm once per vector, not
    # once per pair — dot/(na*nb) is cosine_sim's exact expression tree,
    # so the round-4 values are bit-identical
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        l2_norm(F.col("e")).alias("__na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        l2_norm(F.col("e")).alias("__nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = pairs.select(
        "id_a",
        "id_b",
        F.round(
            dot(F.col("ea"), F.col("eb")) / (F.col("__na") * F.col("__nb")), 4
        ).alias("cosine"),
    )
    return sim.where(F.col("cosine") >= COSINE_THRESHOLD)


def _lsh_pair_frame(spark: SparkSession, sf: str, threshold: float) -> DataFrame:
    """Sign-projection LSH candidate pairs + exact cosine verification
    within buckets (the embedding near-dup scale path)."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    b = add_lsh_bucket(e, "e", "bucket").withColumn("__n", l2_norm(F.col("e")))
    a = b.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), F.col("__n").alias("na"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), F.col("__n").alias("nb"), "bucket"
    )
    pairs = a.join(c, "bucket").where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path for embedding near-dup: sign-projection LSH buckets
    assigned map-side, candidate pairs from a bucket equi-join (small int
    key — never the all-pairs cross join), exact cosine verification
    within buckets only.  Norms precomputed per side (one array pass per
    pair)."""
    return _lsh_pair_frame(spark, sf, COSINE_THRESHOLD)


def dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs resolved into duplicate GROUPS: LSH-bucketed
    embedding pairs form an undirected graph; each connected component is
    one group, labeled by its minimum vec_id (the canonical doc to keep).
    Resolved by alternating large-star/small-star (O(log n) rounds) —
    the one genuinely iterative operator in the inventory (oracled via
    DuckDB's recursive CTE).  Pairs come from the LSH scale path, not the
    quadratic all-pairs baseline, so the whole query is 100-TB-shaped; a
    low threshold densifies the graph into multi-hop components."""
    pairs = _lsh_pair_frame(spark, sf, CC_COSINE_THRESHOLD)
    return connected_components(pairs, out_id="vec_id")


def dedup_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word 4-gram
    with a (simulated) benchmark slice — ``doc_id % 50 == 0`` stands in
    for an eval set.  The benchmark shingle set broadcasts; the training
    corpus is scanned once (operators/dedup.decontamination_report)."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        decontamination_report,
    )

    docs = t(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    return decontamination_report(train, bench, n=4, min_hits=1)


LEV_PREFIX = 80  # edit distance over a bounded prefix: O(80^2) per pair
LEV_MAX = 20


def dedup_levenshtein(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance near-dup verification: MinHash-LSH proposes the
    candidate pairs, and a bounded-prefix Levenshtein confirms them —
    the char-level fuzzy metric set-based Jaccard can't express
    (transpositions, small in-place edits).  The prefix cap keeps the
    DP quadratic in a CONSTANT (80^2), not document length; both
    engines implement the classic unit-cost DP, so the distance is
    integer-exact.

    Candidate source matters at scale: SimHash banding was measured
    producing ~100x more candidates on this vocab-heavy corpus (264 s at
    sf0.1 — near-identical token distributions collapse SimHash bands),
    while the Jaccard-thresholded MinHash pairs stay small and make the
    verify stage O(|true near-dups|)."""
    docs = t(spark, sf, "documents")
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD).select(
        "id_a", "id_b"
    )
    txt = docs.select(
        "doc_id", F.substring("text", 1, LEV_PREFIX).alias("__pfx")
    )
    a = txt.select(F.col("doc_id").alias("id_a"), F.col("__pfx").alias("__pa"))
    b = txt.select(F.col("doc_id").alias("id_b"), F.col("__pfx").alias("__pb"))
    return (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__pa", "__pb").cast("long").alias("lev"),
        )
        .where(F.col("lev") <= LEV_MAX)
    )


QUERIES = {
    "dedup_levenshtein": dedup_levenshtein,
    "dedup_substr_spans": dedup_substr_spans,
    "dedup_substr_fraction": dedup_substr_fraction,
    "dedup_keep_best": dedup_keep_best,
    "dedup_exact_groups": dedup_exact_groups,
    "dedup_components": dedup_components,
    "dedup_exact_rows": dedup_exact_rows,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dedup_decontaminate": dedup_decontaminate,
    "dedup_incremental": dedup_incremental,
}


def _simhash_oracle(bits: int = 16) -> str:
    bit_sums = ",\n                 ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE 0 END) AS b{j}" for j in range(bits)
    )
    sim_terms = " + ".join(
        f"(CASE WHEN b{j} * 2 >= n THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return rf"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
          FROM documents),
        h AS (SELECT doc_id, {md5_int64_sql("tok")} AS h FROM ex),
        bitsum AS (
          SELECT doc_id, count(*) AS n,
                 {bit_sums}
          FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({sim_terms} AS BIGINT) AS simhash FROM bitsum
    """


def _simhash_pairs_oracle(bits: int = 16, max_hamming: int = 3) -> str:
    base = _simhash_oracle(bits)
    # reuse the per-doc simhash as a subquery; all-pairs is fine at oracle scale
    return f"""
        WITH s AS ({base})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _minhash_hash_sql() -> str:
    """The universal-hash family, inlined with the SAME coefficients the
    Spark side uses (operators.dedup.minhash_params)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    a, b = minhash_params(8)
    a_list = "[" + ", ".join(str(v) for v in a) + "]"
    b_list = "[" + ", ".join(str(v) for v in b) + "]"
    return (
        f"({a_list}[seed + 1] * ({md5_int32_sql('shingle')} % {MINHASH_PRIME}) "
        f"+ {b_list}[seed + 1]) % {MINHASH_PRIME}"
    )


_MINHASH_ORACLE = rf"""
        WITH {_SHINGLES_CTE},
        seeds AS (SELECT unnest(range(8)) AS seed),
        mh AS (SELECT doc_id, seed, min({_minhash_hash_sql()}) AS h
               FROM ex CROSS JOIN seeds GROUP BY doc_id, seed),
        sig AS (SELECT doc_id, list(h ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
        bandix AS (SELECT unnest(range(4)) AS bi),
        bands AS (SELECT doc_id, bi,
                         md5(sig[2 * bi + 1] || '|' || sig[2 * bi + 2]) AS band_key
                  FROM sig CROSS JOIN bandix),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a
                 JOIN bands b ON a.bi = b.bi AND a.band_key = b.band_key
                            AND a.doc_id < b.doc_id)
        SELECT c.id_a, c.id_b, j.jaccard
        FROM cand c JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
        WHERE j.jaccard >= {JACCARD_THRESHOLD}
"""


ORACLES = {
    "dedup_levenshtein": f"""
        WITH mp AS ({_MINHASH_ORACLE})
        SELECT mp.id_a, mp.id_b,
               CAST(levenshtein(substr(da.text, 1, {LEV_PREFIX}),
                                substr(db.text, 1, {LEV_PREFIX})) AS BIGINT) AS lev
        FROM mp
        JOIN documents da ON mp.id_a = da.doc_id
        JOIN documents db ON mp.id_b = db.doc_id
        WHERE levenshtein(substr(da.text, 1, {LEV_PREFIX}),
                          substr(db.text, 1, {LEV_PREFIX})) <= {LEV_MAX}
    """,
    "dedup_decontaminate": r"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(CASE WHEN len(t) >= 4
                        THEN list_transform(range(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                        ELSE CAST([] AS VARCHAR[]) END) AS s
               FROM toks),
        nonempty AS (SELECT * FROM sh WHERE len(s) > 0),
        bench AS (SELECT DISTINCT unnest(s) AS shingle FROM nonempty
                  WHERE doc_id % 50 = 0),
        tr AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS set_size,
                      unnest(s) AS shingle
               FROM nonempty WHERE doc_id % 50 <> 0)
        SELECT doc_id, count(*) AS n_hits, set_size,
               round(count(*) / CAST(set_size AS DOUBLE), 4) AS overlap_frac
        FROM tr JOIN bench USING (shingle)
        GROUP BY doc_id, set_size
        HAVING count(*) >= 1
    """,
    "dedup_exact_groups": """
        SELECT md5(lower(trim(text))) AS text_hash,
               min(doc_id) AS canonical_id, count(*) AS n_dups
        FROM documents GROUP BY 1
    """,
    "dedup_exact_rows": """
        WITH g AS (SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keep
                   FROM documents GROUP BY 1)
        SELECT d.doc_id FROM documents d
        JOIN g ON md5(lower(trim(d.text))) = g.h AND d.doc_id = g.keep
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "dedup_minhash_lsh": _MINHASH_ORACLE,
    "dedup_simhash": _simhash_oracle(),
    "dedup_simhash_pairs": _simhash_pairs_oracle(),
    "dedup_embedding_cosine": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.ce, b.ce), 4) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.ce, b.ce), 4) >= {COSINE_THRESHOLD}
    """,
    "dedup_embedding_lsh": None,  # built lazily below (needs plane literals)
}


def _embedding_lsh_oracle(threshold: float = COSINE_THRESHOLD) -> str:
    from image_matadata_batchprocessing_aws_spark.operators.similarity import lsh_projections

    def proj_sql(plane: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"

    terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, {proj_sql(p)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(lsh_projections())
    )
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        b AS (SELECT vec_id, e, CAST({terms} AS BIGINT) AS bucket FROM v)
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               round(list_cosine_similarity(a.e, c.e), 4) AS cosine
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        WHERE round(list_cosine_similarity(a.e, c.e), 4) >= {threshold}
    """


ORACLES["dedup_embedding_lsh"] = _embedding_lsh_oracle()

# Components via recursive CTE: reachability closure, then min reachable
# id per vertex == the component label the Spark side converges to.
# Pair CTE = the LSH scale path at the densified threshold (must mirror
# dedup_components' Spark-side pair generation exactly).
ORACLES["dedup_components"] = f"""
    WITH RECURSIVE cc_pairs AS ({_embedding_lsh_oracle(CC_COSINE_THRESHOLD)}),
    cc_edges AS (SELECT id_a AS va, id_b AS vb FROM cc_pairs
                 UNION ALL SELECT id_b AS va, id_a AS vb FROM cc_pairs),
    cc_reach(src, node) AS (
        SELECT va AS src, va AS node FROM cc_edges
        UNION
        SELECT r.src, g.vb FROM cc_reach r JOIN cc_edges g ON r.node = g.va
    )
    SELECT src AS vec_id, CAST(min(node) AS BIGINT) AS component
    FROM cc_reach GROUP BY src
"""

ORACLES["dedup_incremental"] = rf"""
        WITH {_SHINGLES_CTE},
        newd AS (SELECT doc_id, md5(lower(trim(text))) AS ch FROM documents
                 WHERE doc_id % 10 = 0),
        corph AS (SELECT md5(lower(trim(text))) AS ch, min(doc_id) AS match_id
                  FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
        exact AS (SELECT n.doc_id, c.match_id FROM newd n JOIN corph c USING (ch)),
        rest AS (SELECT doc_id FROM newd
                 WHERE doc_id NOT IN (SELECT doc_id FROM exact)),
        seeds AS (SELECT unnest(range(8)) AS seed),
        mh AS (SELECT doc_id, seed, min({_minhash_hash_sql()}) AS h
               FROM ex CROSS JOIN seeds GROUP BY doc_id, seed),
        sig AS (SELECT doc_id, list(h ORDER BY seed) AS sig FROM mh GROUP BY doc_id),
        bandix AS (SELECT unnest(range(4)) AS bi),
        bands AS (SELECT doc_id, bi,
                         md5(sig[2 * bi + 1] || '|' || sig[2 * bi + 2]) AS band_key
                  FROM sig CROSS JOIN bandix),
        cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corp_id
                 FROM bands a
                 JOIN rest r ON a.doc_id = r.doc_id
                 JOIN bands b ON a.bi = b.bi AND a.band_key = b.band_key
                 WHERE b.doc_id % 10 <> 0),
        inter AS (SELECT c.new_id, c.corp_id, count(*) AS inter
                  FROM cand c
                  JOIN ex ea ON ea.doc_id = c.new_id
                  JOIN ex eb ON eb.doc_id = c.corp_id AND eb.shingle = ea.shingle
                  GROUP BY 1, 2),
        near AS (SELECT i.new_id AS doc_id, min(i.corp_id) AS match_id
                 FROM inter i
                 JOIN sizes sa ON sa.doc_id = i.new_id
                 JOIN sizes sb ON sb.doc_id = i.corp_id
                 WHERE round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 4)
                       >= {JACCARD_THRESHOLD}
                 GROUP BY 1)
        SELECT doc_id, 'exact_dup' AS status, match_id FROM exact
        UNION ALL
        SELECT doc_id, 'near_dup' AS status, match_id FROM near
        UNION ALL
        SELECT doc_id, 'unique' AS status, CAST(NULL AS BIGINT) AS match_id
        FROM rest WHERE doc_id NOT IN (SELECT doc_id FROM near)
"""

_SUBSTR_GRAM_FP = md5_int64_sql(
    f"array_to_string(list_slice(t, pos + 1, pos + {SUBSTR_K}), ' ')"
)

#: Shared CTE chain for the exact-substring pair: positional k-grams ->
#: corpus-wide multiplicity -> consecutive-run merge (the pos -
#: row_number grouping trick, identical on both engines).
_SUBSTR_RUNS = rf"""
        toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE trim(text) <> ''),
        pos AS (
          SELECT doc_id, t, unnest(range(len(t) - {SUBSTR_K - 1})) AS pos
          FROM toks WHERE len(t) >= {SUBSTR_K}),
        grams AS (
          SELECT doc_id, pos, {_SUBSTR_GRAM_FP} AS fp
          FROM pos),
        dup AS (SELECT fp FROM grams GROUP BY fp HAVING count(*) >= 2),
        hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (fp)),
        runs AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
          FROM hits)
"""

ORACLES["dedup_substr_spans"] = f"""
        WITH {_SUBSTR_RUNS}
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {SUBSTR_K - 1} AS BIGINT) AS span_end,
               CAST(count(*) AS BIGINT) AS n_dup_grams
        FROM runs GROUP BY doc_id, grp
"""

ORACLES["dedup_substr_fraction"] = rf"""
        WITH {_SUBSTR_RUNS},
        spans AS (
          SELECT doc_id, min(pos) AS s, max(pos) + {SUBSTR_K - 1} AS e
          FROM runs GROUP BY doc_id, grp),
        -- interval union: spans are maximal in k-gram position space but
        -- can overlap by up to k-1 TOKENS; islands pass mirrors Spark
        flagged AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      -1) THEN 1 ELSE 0 END AS new_isl
          FROM spans),
        islanded AS (
          SELECT doc_id, s, e,
                 sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                                    ROWS UNBOUNDED PRECEDING) AS isl
          FROM flagged),
        un AS (SELECT doc_id, min(s) AS s, max(e) AS e
               FROM islanded GROUP BY doc_id, isl),
        cover AS (SELECT doc_id, sum(e - s + 1) AS dup_toks
                  FROM un GROUP BY doc_id),
        alltoks AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens
          FROM documents)
        SELECT a.doc_id,
               CAST(a.n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(c.dup_toks, 0) AS BIGINT) AS dup_tokens,
               round(CAST(coalesce(c.dup_toks, 0) AS DOUBLE)
                     / CAST(greatest(a.n_tokens, 1) AS DOUBLE), 6)
                 AS dup_fraction
        FROM alltoks a LEFT JOIN cover c USING (doc_id)
"""

ORACLES["dedup_keep_best"] = f"""
    WITH RECURSIVE kb_pairs AS ({_MINHASH_ORACLE}),
    kb_edges AS (SELECT id_a AS va, id_b AS vb FROM kb_pairs
                 UNION ALL SELECT id_b AS va, id_a AS vb FROM kb_pairs),
    kb_reach(src, node) AS (
        SELECT va AS src, va AS node FROM kb_edges
        UNION
        SELECT r.src, g.vb FROM kb_reach r JOIN kb_edges g ON r.node = g.va),
    kb_comp AS (SELECT src AS doc_id, min(node) AS component
                FROM kb_reach GROUP BY src),
    kb_m AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
                    d.n_chars
             FROM documents d LEFT JOIN kb_comp c USING (doc_id))
    SELECT doc_id, CAST(component AS BIGINT) AS component,
           CAST(n_chars AS BIGINT) AS n_chars,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, doc_id) = 1 AS keep
    FROM kb_m
"""


def dedup_substr_mask(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring dedup, ACT stage: documents rebuilt with every
    duplicated span cut out (interval union -> covered positions ->
    anti-join -> ordered reassembly)."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import (
        remove_duplicated_spans,
    )

    return remove_duplicated_spans(t(spark, sf, "documents"), k=SUBSTR_K)


QUERIES["dedup_substr_mask"] = dedup_substr_mask

ORACLES["dedup_substr_mask"] = rf"""
        WITH {_SUBSTR_RUNS},
        spans AS (
          SELECT doc_id, min(pos) AS s, max(pos) + {SUBSTR_K - 1} AS e
          FROM runs GROUP BY doc_id, grp),
        flagged AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      -1) THEN 1 ELSE 0 END AS new_isl
          FROM spans),
        islanded AS (
          SELECT doc_id, s, e,
                 sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                                    ROWS UNBOUNDED PRECEDING) AS isl
          FROM flagged),
        un AS (SELECT doc_id, min(s) AS s, max(e) AS e
               FROM islanded GROUP BY doc_id, isl),
        covered AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM un),
        alltoks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE trim(text) <> ''),
        tokpos AS (
          SELECT doc_id, t, unnest(range(len(t))) AS pos FROM alltoks),
        tok AS (SELECT doc_id, pos, t[pos + 1] AS tk FROM tokpos),
        kept AS (
          SELECT k.doc_id, k.pos, k.tk FROM tok k
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = k.doc_id AND c.pos = k.pos)),
        rebuilt AS (
          SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id),
        counts AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens
          FROM documents)
        SELECT c.doc_id,
               coalesce(r.clean_text, '') AS clean_text,
               CAST(c.n_tokens AS BIGINT) AS n_tokens,
               CAST(c.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        FROM counts c LEFT JOIN rebuilt r USING (doc_id)
"""
