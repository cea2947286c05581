"""Sketch queries: Bloom-filter decontamination and Count-Min heavy
hitters — the fixed-size-summary twins of the exact membership/count
operators, fully oracled because the sketches are md5-deterministic
(DuckDB reproduces every counter and every false positive exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
from image_matadata_batchprocessing_aws_spark.operators.dedup import shingle_df
from image_matadata_batchprocessing_aws_spark.operators.sketches import (
    bloom_build,
    bloom_capacity,
    bloom_dense,
    bloom_hit,
    cms_build,
    cms_estimate,
)
from image_matadata_batchprocessing_aws_spark.queries.util import t

#: Bloom sizing: k=6 hashes, 64 bits per inserted key, m rounded up to a
#: power of two FROM THE DATA (``bloom_capacity``) — a fixed m would
#: saturate as the benchmark set grows with scale factor (measured: a
#: 2^13 sketch flags 100% of sf0.1's corpus).  At 64 bits/key the fill
#: factor stays ~0.09 at every SF, so per-probe FP is ~1e-6 and even
#: documents with hundreds of shingles stay below 1e-3 doc-level FP.
#: The capacity rule is integer-exact in SQL too, so the oracle sizes
#: the very same m.
BLOOM_K = 6
BLOOM_BITS_PER_KEY = 64

#: Count-Min sizing: d=3 rows of w=512 counters (12 KiB of longs).
CMS_D = 3
CMS_W = 512
CMS_TOPK = 20


def sketch_bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination: the benchmark slice's word 4-gram
    shingles build a 1 KiB sketch (distributed bit_or groupBy, collected
    like any fit statistic); training docs probe it map-side — zero join,
    zero shuffle on the corpus scan.  ``exact_hit`` audits each flagged
    doc against the exact broadcast-join path: no false negatives ever
    (guaranteed), false positives show as (bloom_hit, NOT exact_hit) and
    are identical in the DuckDB twin because positions are md5-derived.

    Sketch twin of :func:`queries.dedup.dedup_decontaminate` (same
    eval-set split, same shingle construction)."""
    docs = t(spark, sf, "documents")
    # three consumers walk the shingle table (bench count, sketch build,
    # train probe): persist so tokenize+shingle runs once, not three
    # times (measured ~2.4x on the whole query at sf0.1).  No cross-call
    # cache growth: Spark's cache manager keys on the analyzed plan, so
    # every call over the same sf dir maps to the SAME cache entry.
    sh = track_persist(shingle_df(docs, "text", "doc_id", n=4).where(F.size("__sh") > 0))
    bench = (
        sh.where(F.col("doc_id") % 50 == 0)
        .select(F.explode("__sh").alias("shingle"))
        .distinct()
    )
    # two fit-statistic jobs: size the sketch from the key count, then
    # build it (both bounded by the benchmark set, not the corpus)
    m = bloom_capacity(bench.count(), BLOOM_BITS_PER_KEY)
    dense = bloom_dense(bloom_build(bench, "shingle", BLOOM_K, m).collect(), m)
    train = sh.where(F.col("doc_id") % 50 != 0)
    # explode + SCALAR probe (not exists over the array: HOF lambdas
    # skip constant folding, re-evaluating the sketch literal per
    # element).  The probe filter is map-side; only HIT shingle rows —
    # roughly the true contamination plus the tiny FP tail — reach a
    # shuffle.  Materialized once because both the candidate list and
    # the exact audit read it.
    hitrows = (
        train.select("doc_id", F.explode("__sh").alias("shingle"))
        .where(bloom_hit(F.col("shingle"), dense, BLOOM_K, m))
        .localCheckpoint(eager=False)
    )
    cand = hitrows.select("doc_id").distinct()
    # exact verification on the bloom-flagged CANDIDATE rows only (the
    # sketch has no false negatives, so every truly-shared shingle is a
    # hit row) — the same verify-candidates-only principle as LSH dedup
    exact = (
        hitrows.join(F.broadcast(bench), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("exact_hit", F.lit(True))
    )
    return cand.join(exact, "doc_id", "left").select(
        "doc_id",
        F.lit(True).alias("bloom_hit"),
        F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
    )


#: Fixed sketch size for the merge demo (both halves and the direct
#: build must share one m, so it cannot be data-sized).
BLOOM_MERGE_M = 1 << 14


def sketch_bloom_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom mergeability, proven in-query: build byte tables for two
    disjoint halves of the customer key set, OR-merge them
    (groupBy byte, bit_or — the same shape HLL merges with max), and
    compare byte-for-byte against the direct single-pass build over all
    keys.  Output is the merged byte table plus an ``equal`` flag that
    must be TRUE on every row — with this, all three sketches (Bloom,
    Count-Min via sum, HLL via max) carry an engine-checked merge
    story: per-shard sketches union without rescanning shards."""
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("k")
    )
    h1 = bloom_build(c.where(F.col("k").cast("long") % 2 == 0), "k", BLOOM_K, BLOOM_MERGE_M)
    h2 = bloom_build(c.where(F.col("k").cast("long") % 2 != 0), "k", BLOOM_K, BLOOM_MERGE_M)
    merged = (
        h1.unionByName(h2)
        .groupBy("byte_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(c, "k", BLOOM_K, BLOOM_MERGE_M).select(
        "byte_idx", F.col("bits").alias("__direct")
    )
    return (
        merged.join(direct, "byte_idx", "full")
        .select(
            "byte_idx",
            F.col("bits").cast("long").alias("bits"),
            (F.col("bits") == F.col("__direct")).alias("equal"),
        )
    )


def sketch_countmin_heavy(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min heavy hitters over the event stream's user ids: build a
    3x512 counter sketch in one explode+groupBy pass (shuffle bounded at
    d*w rows per task by partial aggregation), then point-query every
    candidate against the broadcast counter table.  Estimates are
    deterministic overcounts (est_cnt >= exact_cnt always); the top-k by
    estimate is compared against exact counts computed in the same
    query, and the oracle reproduces both sides exactly."""
    ev = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    counters = cms_build(ev, "user_id", CMS_D, CMS_W)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    est = cms_estimate(exact, counters, "user_id", CMS_D, CMS_W)
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("est_cnt").cast("long").alias("est_cnt"),
        )
        .orderBy(F.col("est_cnt").desc(), "user_id")
        .limit(CMS_TOPK)
    )


def join_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Runtime-filter join (the Bloom-join pattern engines apply under
    the hood, here as an explicit operator): the filtered build side
    (BUILDING-segment customers) summarizes its join keys into a Bloom
    sketch; the probe side (orders) drops non-matching rows MAP-SIDE at
    the scan, before any exchange.  False positives are harmless — the
    join itself re-verifies every surviving row — so the result is
    bit-identical to the plain join, which is exactly what the oracle
    states.  At 100 TB this turns a full-fact-table shuffle into a
    shuffle of just the matching fraction."""
    c = (
        t(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    m = bloom_capacity(c.count(), BLOOM_BITS_PER_KEY)
    dense = bloom_dense(
        bloom_build(
            c.select(F.col("c_custkey").cast("string").alias("k")), "k", BLOOM_K, m
        ).collect(),
        m,
    )
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    pre = o.where(bloom_hit(F.col("o_custkey").cast("string"), dense, BLOOM_K, m))
    return pre.join(c, pre["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


QUERIES = {
    "sketch_bloom_decontaminate": sketch_bloom_decontaminate,
    "sketch_bloom_merge": sketch_bloom_merge,
    "sketch_countmin_heavy": sketch_countmin_heavy,
    "join_bloom_prefilter": join_bloom_prefilter,
}

#: Shared with queries/dedup.py's decontaminate oracle: word 4-gram
#: shingles, distinct per doc, empty-shingle docs dropped.
_SHINGLES_4 = r"""
        toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                 FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(CASE WHEN len(t) >= 4
                        THEN list_transform(range(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                        ELSE CAST([] AS VARCHAR[]) END) AS s
               FROM toks),
        nonempty AS (SELECT * FROM sh WHERE len(s) > 0)
"""

_BLOOM_POS = md5_int64_sql("i || ':' || shingle")


_BLOOM_MERGE_POS = md5_int64_sql("i || ':' || CAST(c_custkey AS VARCHAR)")

ORACLES_BLOOM_MERGE = rf"""
        WITH seeds AS (SELECT unnest(range({BLOOM_K})) AS i),
        pos AS (SELECT c_custkey, ({_BLOOM_MERGE_POS}) % {BLOOM_MERGE_M} AS p
                FROM customer CROSS JOIN seeds),
        bits AS (SELECT DISTINCT p // 8 AS byte_idx,
                        CAST(pow(2, p % 8) AS INT) AS mask
                 FROM pos)
        SELECT CAST(byte_idx AS BIGINT) AS byte_idx,
               CAST(bit_or(mask) AS BIGINT) AS bits,
               TRUE AS equal
        FROM bits GROUP BY byte_idx
"""

ORACLES = {
    "sketch_bloom_merge": ORACLES_BLOOM_MERGE,
    "sketch_bloom_decontaminate": rf"""
        WITH {_SHINGLES_4},
        bench AS (SELECT DISTINCT unnest(s) AS shingle FROM nonempty
                  WHERE doc_id % 50 = 0),
        msel AS (SELECT CAST(pow(2, greatest(8,
                       length(bin({BLOOM_BITS_PER_KEY} * count(*) - 1)))) AS BIGINT) AS m
                 FROM bench),
        seeds AS (SELECT unnest(range({BLOOM_K})) AS i),
        bits AS (SELECT DISTINCT ({_BLOOM_POS}) % m AS p
                 FROM bench CROSS JOIN seeds CROSS JOIN msel),
        tr AS (SELECT doc_id, unnest(s) AS shingle FROM nonempty
               WHERE doc_id % 50 <> 0),
        pr AS (SELECT doc_id, shingle, i, ({_BLOOM_POS}) % m AS p
               FROM tr CROSS JOIN seeds CROSS JOIN msel),
        hits AS (SELECT doc_id FROM pr JOIN bits USING (p)
                 GROUP BY doc_id, shingle HAVING count(*) = {BLOOM_K}),
        bloomdocs AS (SELECT DISTINCT doc_id FROM hits),
        exactdocs AS (SELECT DISTINCT tr.doc_id FROM tr JOIN bench USING (shingle))
        SELECT b.doc_id, TRUE AS bloom_hit,
               (e.doc_id IS NOT NULL) AS exact_hit
        FROM bloomdocs b LEFT JOIN exactdocs e ON b.doc_id = e.doc_id
    """,
    "sketch_countmin_heavy": rf"""
        WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        seeds AS (SELECT unnest(range({CMS_D})) AS r),
        h AS (SELECT r, ({md5_int64_sql("r || ':' || CAST(user_id AS VARCHAR)")}) % {CMS_W} AS c,
                     user_id
              FROM ev CROSS JOIN seeds),
        counters AS (SELECT r, c, count(*) AS cnt FROM h GROUP BY r, c),
        probes AS (SELECT DISTINCT user_id, r, c FROM h),
        est AS (SELECT user_id, min(cnt) AS est_cnt
                FROM probes JOIN counters USING (r, c) GROUP BY user_id),
        exact AS (SELECT user_id, count(*) AS exact_cnt FROM ev GROUP BY user_id)
        SELECT user_id, exact_cnt, est_cnt
        FROM exact JOIN est USING (user_id)
        ORDER BY est_cnt DESC, user_id LIMIT {CMS_TOPK}
    """,
    "join_bloom_prefilter": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
    """,
}


# --- HyperLogLog distinct sketch ------------------------------------------

from image_matadata_batchprocessing_aws_spark.operators.sketches import (  # noqa: E402
    hll_alpha,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from image_matadata_batchprocessing_aws_spark.operators.dedup import (  # noqa: E402
    word_shingles,
)
from image_matadata_batchprocessing_aws_spark.operators.caching import track_persist  # noqa: E402

HLL_P = 9  # 512 registers, ~4.6% standard error


def sketch_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-cardinality demo: per-language distinct word-3-gram
    estimates (thousands per language — the regime the raw harmonic-mean
    formula is built for; the corpus's word VOCABULARY is only ~31 terms,
    squarely in linear-counting territory, so 3-grams are the honest
    pick) from 512-register HLL sketches, PLUS a global '__all__' row
    computed by MERGING the per-language register tables (groupBy bucket,
    max reg) — the corpus is scanned once; the rollup never rescans it.
    Exact distinct counts ride along so the driver row locks the
    estimator's accuracy, not just its determinism."""
    d = t(spark, sf, "documents")
    # three consumers (register build, per-lang exact, global exact):
    # persist so the shingle construction runs once (plan-keyed cache,
    # same no-growth argument as sketch_bloom_decontaminate)
    tok = track_persist(
        d.select("lang", F.explode(word_shingles(F.col("text"), n=3)).alias("token"))
        .where(F.col("token") != "")
    )
    regs = hll_registers(tok, "token", ["lang"], p=HLL_P)
    # the register table is tiny (langs * 512 rows) and feeds BOTH the
    # per-language estimate and the merged rollup: pin it
    regs = regs.localCheckpoint(eager=False)
    per = hll_estimate(regs, ["lang"], p=HLL_P)
    merged = hll_estimate(hll_merge(regs, []), [], p=HLL_P).select(
        F.lit("__all__").alias("lang"), "n_buckets_set", "est"
    )
    exact_per = tok.groupBy("lang").agg(
        F.count_distinct("token").alias("exact_distinct")
    )
    exact_all = tok.agg(
        F.lit("__all__").alias("lang"),
        F.count_distinct("token").alias("exact_distinct"),
    )
    return per.unionByName(merged).join(
        exact_per.unionByName(exact_all), "lang"
    ).select("lang", "n_buckets_set", "est", F.col("exact_distinct").cast("long").alias("exact_distinct"))


QUERIES["sketch_hll_distinct"] = sketch_hll_distinct

_HLL_M = 1 << HLL_P
_HLL_RHO_MAX = 60 - HLL_P + 1
#: The full numerator alpha*m^2*2^rho_max as ONE Python-computed double
#: literal embedded in both engines (repr round-trips doubles exactly),
#: so the estimate's only float op is a single division on each side.
_HLL_NUM = repr(hll_alpha(_HLL_M) * _HLL_M * _HLL_M * float(1 << _HLL_RHO_MAX))

_HLL_H = md5_int64_sql("token")

ORACLES["sketch_hll_distinct"] = rf"""
        WITH toks AS (
          SELECT lang, string_split_regex(trim(text), '\s+') AS t FROM documents),
        sh AS (SELECT lang,
                      list_distinct(CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                        ELSE CAST([] AS VARCHAR[]) END) AS s
               FROM toks),
        tok AS (SELECT lang, unnest(s) AS token FROM sh),
        tk AS (SELECT lang, token FROM tok WHERE token <> ''),
        hashed AS (
          SELECT lang, token, ({_HLL_H}) % {_HLL_M} AS bucket,
                 ({_HLL_H}) // {_HLL_M} AS v
          FROM tk),
        regs AS (
          SELECT lang, bucket,
                 max({_HLL_RHO_MAX} - CASE WHEN v > 0 THEN length(bin(v)) ELSE 0 END)
                   AS reg
          FROM hashed GROUP BY lang, bucket),
        allregs AS (
          SELECT lang, bucket, reg FROM regs
          UNION ALL
          SELECT '__all__' AS lang, bucket, max(reg) AS reg
          FROM regs GROUP BY bucket),
        agg AS (
          SELECT lang, count(*) AS n_set,
                 sum(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - reg)) AS sum_set
          FROM allregs GROUP BY lang),
        est AS (
          SELECT lang, n_set,
                 round({_HLL_NUM} / CAST(sum_set
                       + ({_HLL_M} - n_set) * (CAST(1 AS BIGINT) << {_HLL_RHO_MAX})
                       AS DOUBLE), 4) AS est
          FROM agg),
        exact AS (
          SELECT lang, count(DISTINCT token) AS exact_distinct FROM tk GROUP BY lang
          UNION ALL
          SELECT '__all__' AS lang, count(DISTINCT token) AS exact_distinct FROM tk)
        SELECT e.lang, CAST(e.n_set AS BIGINT) AS n_buckets_set, e.est,
               CAST(x.exact_distinct AS BIGINT) AS exact_distinct
        FROM est e JOIN exact x ON e.lang = x.lang
"""


def sketch_hll_windowed(spark: SparkSession, sf: str) -> DataFrame:
    """Per-hour distinct-user estimates from HOURLY HLL REGISTER TABLES —
    the streaming-dashboard shape: each hour keeps m registers, hourly
    cardinalities read off them, and (the point of mergeability) the
    register tables roll up to a '__all__' day-scale estimate WITHOUT
    rescanning events.  Exact distincts ride along per window."""
    ev = t(spark, sf, "events").withColumn(
        "hour_ms", F.unix_millis(F.date_trunc("hour", "ts"))
    )
    regs = hll_registers(ev, "user_id", ["hour_ms"], p=HLL_P).localCheckpoint(
        eager=False
    )
    per = hll_estimate(regs, ["hour_ms"], p=HLL_P)
    merged = hll_estimate(hll_merge(regs, []), [], p=HLL_P).select(
        F.lit(-1).cast("long").alias("hour_ms"), "n_buckets_set", "est"
    )
    exact_per = ev.groupBy("hour_ms").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    exact_all = ev.agg(
        F.lit(-1).cast("long").alias("hour_ms"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return per.unionByName(merged).join(
        exact_per.unionByName(exact_all), "hour_ms"
    ).select(
        "hour_ms",
        "n_buckets_set",
        "est",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


QUERIES["sketch_hll_windowed"] = sketch_hll_windowed

_HLL_HW = md5_int64_sql("CAST(user_id AS VARCHAR)")

ORACLES["sketch_hll_windowed"] = rf"""
        WITH ev AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, user_id
          FROM events WHERE user_id IS NOT NULL),
        hashed AS (
          SELECT hour_ms, user_id, ({_HLL_HW}) % {_HLL_M} AS bucket,
                 ({_HLL_HW}) // {_HLL_M} AS v
          FROM ev),
        regs AS (
          SELECT hour_ms, bucket,
                 max({_HLL_RHO_MAX} - CASE WHEN v > 0 THEN length(bin(v)) ELSE 0 END)
                   AS reg
          FROM hashed GROUP BY hour_ms, bucket),
        allregs AS (
          SELECT hour_ms, bucket, reg FROM regs
          UNION ALL
          SELECT CAST(-1 AS BIGINT) AS hour_ms, bucket, max(reg) AS reg
          FROM regs GROUP BY bucket),
        agg AS (
          SELECT hour_ms, count(*) AS n_set,
                 sum(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - reg)) AS sum_set
          FROM allregs GROUP BY hour_ms),
        est AS (
          SELECT hour_ms, n_set,
                 round({_HLL_NUM} / CAST(sum_set
                       + ({_HLL_M} - n_set) * (CAST(1 AS BIGINT) << {_HLL_RHO_MAX})
                       AS DOUBLE), 4) AS est
          FROM agg),
        exact AS (
          SELECT hour_ms, count(DISTINCT user_id) AS exact_distinct
          FROM ev GROUP BY hour_ms
          UNION ALL
          SELECT CAST(-1 AS BIGINT) AS hour_ms, count(DISTINCT user_id) FROM ev)
        SELECT e.hour_ms, CAST(e.n_set AS BIGINT) AS n_buckets_set, e.est,
               CAST(x.exact_distinct AS BIGINT) AS exact_distinct
        FROM est e JOIN exact x ON e.hour_ms = x.hour_ms
"""
