"""Oracle-ready queries for the r04 operator additions — staged through
r04 (registry growth frozen while the driver-evidence backlog drained,
VERDICT r3 item 1) and REGISTERED in r05 (``queries.__init__._MODULES``
append; VERDICT r4 item 1).

``tests/test_r05_queue.py`` runs every pair through the same
normalize-and-compare harness ``tools/check_oracle.py`` uses, so each
query carried full oracle-level confidence before it ever reached the
driver.  New r05 work stages in ``queries/r06_queue.py`` the same way.

Float-parity notes (the house rules, same as ``queries/etl.py``):
values quantize to scaled BIGINTs before any accumulation, and both
engines run the SAME textual scalar arithmetic — including writing
``(1.0 - 0.2)`` rather than ``0.8`` in the EWMA oracle, because the
subtraction's double differs from the literal by 1 ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from image_matadata_batchprocessing_aws_spark.queries.util import t

EWMA_ALPHA = 0.2
EWMA_LOOKBACK = 20
RQ_LOOKBACK = 15
RQ_MIN_PERIODS = 5


def ts_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user trailing EWMA of event values (nulls filtered — Spark's
    ``collect_list`` skips nulls while DuckDB's ``list`` keeps them, so
    the contract excludes them explicitly)."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import ewma_trailing

    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    out = ewma_trailing(
        e, "user_id", "ts", "value", "event_id",
        alpha=EWMA_ALPHA, lookback=EWMA_LOOKBACK,
    )
    return out.select("user_id", "event_id", "ewma")


def etl_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Sentinel-null linear interpolation: error-event values null out
    (the ``etl_sentinel_ffill`` convention), then interpolate
    time-weighted on epoch-ms — the gap-aware upgrade of that query's
    ffill."""
    from image_matadata_batchprocessing_aws_spark.operators.impute import interpolate_linear

    e = (
        t(spark, sf, "events")
        .withColumn("ts_ms", F.unix_millis("ts"))
        .withColumn(
            "v", F.when(F.col("event_type") != "error", F.col("value"))
        )
    )
    out = interpolate_linear(
        e, ["v"], order_by=["ts_ms", "event_id"], partition_by=["user_id"],
        x_col="ts_ms",
    )
    return out.select(
        "user_id", "event_id", F.round(F.col("v"), 6).alias("v_interp")
    )


def ts_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import rolling_quantile

    e = t(spark, sf, "events")
    out = rolling_quantile(
        e, "user_id", "ts", "value", "event_id",
        q=0.5, lookback=RQ_LOOKBACK, min_periods=RQ_MIN_PERIODS,
    )
    return out.select("user_id", "event_id", "rolling_q")


QUERIES = {
    "ts_ewma": ts_ewma,
    "etl_interpolate": etl_interpolate,
    "ts_rolling_median": ts_rolling_median,
}

ORACLES = {
    "ts_ewma": f"""
        WITH b AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 CAST(round(value * 10000.0) AS BIGINT) AS xs
          FROM events WHERE value IS NOT NULL),
        l AS (
          SELECT user_id, event_id,
                 list(xs) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING
                                AND CURRENT ROW) AS hist
          FROM b)
        SELECT user_id, event_id,
               round(list_reduce(
                       list_transform(hist, x -> CAST(x AS DOUBLE)),
                       (acc, x) -> (1.0 - {EWMA_ALPHA}) * acc + {EWMA_ALPHA} * x
                     ) / 10000.0, 6) AS ewma
        FROM l
    """,
    "etl_interpolate": """
        WITH b AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 CASE WHEN event_type <> 'error' THEN value END AS v
          FROM events),
        n AS (
          SELECT user_id, event_id, v, CAST(ts_ms AS DOUBLE) AS x,
                 last_value(v IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN v IS NOT NULL
                                 THEN CAST(ts_ms AS DOUBLE) END IGNORE NULLS)
                   OVER wb AS px,
                 first_value(v IGNORE NULLS) OVER wf AS nv,
                 first_value(CASE WHEN v IS NOT NULL
                                  THEN CAST(ts_ms AS DOUBLE) END IGNORE NULLS)
                   OVER wf AS nx
          FROM b
          WINDOW
            wb AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wf AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, event_id,
               round(CASE WHEN v IS NOT NULL THEN v
                          WHEN pv IS NULL THEN NULL
                          WHEN nv IS NULL OR nx = px THEN pv
                          ELSE pv + (nv - pv) * (x - px) / (nx - px)
                     END, 6) AS v_interp
        FROM n
    """,
    "ts_rolling_median": f"""
        WITH b AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events)
        SELECT user_id, event_id,
               CASE WHEN count(value) OVER w >= {RQ_MIN_PERIODS}
                    THEN round(quantile_cont(value, 0.5) OVER w, 6)
               END AS rolling_q
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                     ROWS BETWEEN {RQ_LOOKBACK - 1} PRECEDING AND CURRENT ROW)
    """,
}


def etl_zorder_auto(spark: SparkSession, sf: str) -> DataFrame:
    """Auto-quantized Z-order key (maintenance.quantize_linear feeding
    zorder_key): per-column min/max fit in one broadcast row, map-side
    bucketing with null/zero-spread guards, then the bit interleave —
    the no-hand-tuning version of ``etl_zorder_key``."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        quantize_linear,
        zorder_key,
    )

    c = t(spark, sf, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_nationkey").cast("double").alias("nat"),
    )
    q = quantize_linear(c, ["bal", "nat"], bits=8)
    return q.select(
        "c_custkey",
        "bal_q",
        "nat_q",
        zorder_key(["bal_q", "nat_q"], bits=8).alias("zkey"),
    )


ORACLES["etl_zorder_auto"] = """
    WITH st AS (SELECT min(CAST(c_acctbal AS DOUBLE)) AS mn_bal,
                       max(CAST(c_acctbal AS DOUBLE)) AS mx_bal,
                       min(CAST(c_nationkey AS DOUBLE)) AS mn_nat,
                       max(CAST(c_nationkey AS DOUBLE)) AS mx_nat
                FROM customer),
    b AS (SELECT c_custkey,
                 CAST(c_acctbal AS DOUBLE) AS bal,
                 CAST(c_nationkey AS DOUBLE) AS nat,
                 mn_bal, mx_bal, mn_nat, mx_nat
          FROM customer, st),
    q AS (SELECT c_custkey,
                 CASE WHEN bal IS NULL OR (mx_bal - mn_bal) = 0 THEN 0 ELSE least(CAST(floor(((bal - mn_bal) / (mx_bal - mn_bal)) * 256.0) AS BIGINT), 255) END AS bal_q,
                 CASE WHEN nat IS NULL OR (mx_nat - mn_nat) = 0 THEN 0 ELSE least(CAST(floor(((nat - mn_nat) / (mx_nat - mn_nat)) * 256.0) AS BIGINT), 255) END AS nat_q
          FROM b)
    SELECT c_custkey, bal_q, nat_q,
           CAST((((bal_q >> 0) & 1) << 0) + (((bal_q >> 1) & 1) << 2) + (((bal_q >> 2) & 1) << 4) + (((bal_q >> 3) & 1) << 6) + (((bal_q >> 4) & 1) << 8) + (((bal_q >> 5) & 1) << 10) + (((bal_q >> 6) & 1) << 12) + (((bal_q >> 7) & 1) << 14) + (((nat_q >> 0) & 1) << 1) + (((nat_q >> 1) & 1) << 3) + (((nat_q >> 2) & 1) << 5) + (((nat_q >> 3) & 1) << 7) + (((nat_q >> 4) & 1) << 9) + (((nat_q >> 5) & 1) << 11) + (((nat_q >> 6) & 1) << 13) + (((nat_q >> 7) & 1) << 15) AS BIGINT) AS zkey
    FROM q
"""
QUERIES["etl_zorder_auto"] = etl_zorder_auto


def semdedup_bounded_checks(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-checkable invariants for the budget-bounded SemDeDup
    (``semantic_dedup_bounded``) run with a pair budget small enough to
    force hot-cell sub-splitting on this corpus: labeling must still
    cover every vector, keep exactly one representative per component,
    keep the minimum id, and never label upward.  The oracle states the
    invariants as constants plus the SQL-computed corpus size (the
    ``kmeans_invariants`` pattern — a driver row turns red if the
    splitting machinery ever breaks the output contract)."""
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import (
        semantic_dedup_bounded,
    )
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        SEM_THRESHOLD,
        _emb,
        _fixed_centroids,
    )

    e = _emb(spark, sf)
    cents = _fixed_centroids(e)
    out = semantic_dedup_bounded(
        e, cents, vec_col="e", id_col="vec_id",
        threshold=SEM_THRESHOLD, pair_budget=200,
    )
    per_comp = out.groupBy("component").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.min("vec_id").alias("min_id"),
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.col("component") <= F.col("vec_id")).alias("component_le_id"),
        F.min(F.col("keep") == (F.col("vec_id") == F.col("component"))).alias(
            "keep_is_component_rep"
        ),
    ).crossJoin(
        per_comp.agg(
            F.min(F.col("n_keep") == 1).alias("one_keep_per_component"),
            F.min(F.col("min_id") == F.col("component")).alias("component_is_min_id"),
        )
    )


def text_bpe_first_merge(spark: SparkSession, sf: str) -> DataFrame:
    """BPE round-0 with a full oracle (the ``kmeans_round_update``
    pattern): the first merge is the argmax over frequency-weighted
    adjacent character pairs of the initial symbol table — exactly
    SQL-expressible, so the pair-counting + argmax-tiebreak machinery
    the whole trainer iterates gets an exact DuckDB row.  The ITERATION
    is pinned by the Sennrich worked-example unit test."""
    from image_matadata_batchprocessing_aws_spark.operators.bpe import bpe_train, word_freq

    docs = t(spark, sf, "documents")
    merges, _ = bpe_train(word_freq(docs, "text"), n_merges=1, min_count=2)
    rows = [(r, a, b, c) for r, a, b, c in merges]
    return spark.createDataFrame(
        rows, "merge_rank int, merge_left string, merge_right string, pair_count long"
    )


QUERIES["semdedup_bounded_checks"] = semdedup_bounded_checks
QUERIES["text_bpe_first_merge"] = text_bpe_first_merge

ORACLES["semdedup_bounded_checks"] = """
    SELECT (SELECT count(*) FROM embeddings) AS n_rows,
           true AS component_le_id,
           true AS keep_is_component_rep,
           true AS one_keep_per_component,
           true AS component_is_min_id
"""

ORACLES["text_bpe_first_merge"] = r"""
    WITH words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS w
            FROM documents)
      GROUP BY 1),
    p AS (
      SELECT substr(word, CAST(i AS INT), 1) AS a,
             CASE WHEN i < length(word)
                  THEN substr(word, CAST(i + 1 AS INT), 1)
                  ELSE '</w>' END AS b,
             freq
      FROM words, LATERAL unnest(range(1, length(word) + 1)) AS u(i))
    SELECT CAST(0 AS INT) AS merge_rank,
           a AS merge_left, b AS merge_right,
           CAST(sum(freq) AS BIGINT) AS pair_count
    FROM p
    GROUP BY a, b
    ORDER BY pair_count DESC, a, b
    LIMIT 1
"""


def embedding_negative_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive negatives for every 50th vector: the hash-derived
    uniform draw (``sampling.negative_sample``) with its exact SQL twin
    — row_number index, md5-mod draw, equi-join resolution."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        negative_sample,
    )
    from image_matadata_batchprocessing_aws_spark.queries.similarity import _emb

    e = _emb(spark, sf).select("vec_id")
    anchors = e.where(F.col("vec_id") % 50 == 0)
    return negative_sample(e, anchors, k=4, seed=9)


QUERIES["embedding_negative_sample"] = embedding_negative_sample


def _negative_sample_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
    from image_matadata_batchprocessing_aws_spark.operators.sampling import SAMPLE_DELIM

    h = md5_int64_sql(
        f"CAST(anchor_id AS VARCHAR) || '{SAMPLE_DELIM}' || "
        f"CAST(j AS VARCHAR) || '{SAMPLE_DELIM}' || '9'"
    )
    return f"""
        WITH idx AS (
          SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS i
          FROM embeddings),
        n AS (SELECT count(*) AS n FROM embeddings),
        d AS (
          SELECT e.vec_id AS anchor_id, CAST(u.j AS INT) AS neg_rank, u.j,
                 ({h}) % (SELECT n FROM n) AS i
          FROM embeddings e, LATERAL unnest(range(0, 4)) AS u(j)
          WHERE e.vec_id % 50 = 0)
        SELECT anchor_id, neg_rank, idx.vec_id AS neg_id
        FROM d JOIN idx USING (i)
        WHERE idx.vec_id <> anchor_id
    """


ORACLES["embedding_negative_sample"] = _negative_sample_oracle()


DSIR_BUCKETS = 512
DSIR_TAKE = 150
DSIR_SEED = 3
DSIR_TARGET_SOURCE = "src7"


def sample_dsir(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): select documents
    whose hashed unigram+bigram distribution matches the ``src7`` target
    slice — likelihood-ratio scoring + Gumbel top-k, all exactly
    SQL-expressible (``operators/dsir.py``)."""
    from image_matadata_batchprocessing_aws_spark.operators.dsir import dsir_resample

    docs = t(spark, sf, "documents")
    source = docs.select("doc_id", "text")
    target = docs.where(F.col("source") == DSIR_TARGET_SOURCE).select(
        "doc_id", "text"
    )
    return dsir_resample(
        source, target, n_take=DSIR_TAKE, buckets=DSIR_BUCKETS, seed=DSIR_SEED
    )


QUERIES["sample_dsir"] = sample_dsir


def _dsir_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
    from image_matadata_batchprocessing_aws_spark.operators.dsir import LLR_SCALE
    from image_matadata_batchprocessing_aws_spark.operators.sampling import SAMPLE_DENOM

    B = DSIR_BUCKETS
    hg = md5_int64_sql("g")
    hd = md5_int64_sql(f"CAST(doc_id AS VARCHAR) || chr(31) || '{DSIR_SEED}'")
    u = f"((({hd}) % {SAMPLE_DENOM} + 1) / {float(SAMPLE_DENOM + 1)!r})"

    def grams(cte: str) -> str:
        return f"""
          SELECT doc_id, ({hg}) % {B} AS bucket FROM (
            SELECT s.doc_id, u.g FROM {cte} s, LATERAL unnest(s.w) AS u(g)
            UNION ALL
            SELECT s.doc_id,
                   s.w[CAST(i AS INT)] || ' ' || s.w[CAST(i + 1 AS INT)] AS g
            FROM {cte} s, LATERAL unnest(range(1, len(s.w))) AS u(i))
        """

    return f"""
        WITH srcw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        tgtw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                 WHERE source = '{DSIR_TARGET_SOURCE}'),
        sg AS ({grams("srcw")}),
        tg AS ({grams("tgtw")}),
        sc AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
               FROM sg GROUP BY 1, 2),
        sdist AS (SELECT bucket, sum(cnt) AS s_cnt FROM sc GROUP BY 1),
        tdist AS (SELECT bucket, CAST(count(*) AS BIGINT) AS t_cnt
                  FROM tg GROUP BY 1),
        tot AS (SELECT (SELECT sum(s_cnt) FROM sdist) AS s_total,
                       (SELECT sum(t_cnt) FROM tdist) AS t_total),
        llr AS (
          SELECT coalesce(sdist.bucket, tdist.bucket) AS bucket,
                 CAST(round((ln((coalesce(t_cnt, 0) + 1.0)
                                / (CAST(t_total AS DOUBLE) + {float(B)!r}))
                           - ln((coalesce(s_cnt, 0) + 1.0)
                                / (CAST(s_total AS DOUBLE) + {float(B)!r})))
                           * {float(LLR_SCALE)!r}) AS BIGINT) AS llr_scaled
          FROM sdist FULL JOIN tdist ON sdist.bucket = tdist.bucket, tot),
        scores AS (
          SELECT sc.doc_id,
                 sum(sc.cnt * coalesce(llr.llr_scaled, 0)) AS lw
          FROM sc LEFT JOIN llr ON sc.bucket = llr.bucket
          GROUP BY 1)
        SELECT doc_id,
               round(CAST(lw AS DOUBLE) / {float(LLR_SCALE)!r}, 6) AS logw,
               round(CAST(lw AS DOUBLE) / {float(LLR_SCALE)!r}
                     + (- ln(- ln({u}))), 6) AS key
        FROM scores
        ORDER BY key DESC, doc_id
        LIMIT {DSIR_TAKE}
    """


ORACLES["sample_dsir"] = _dsir_oracle()


def pipeline_contrastive_triplets(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive training triplets in one lazy plan: anchors are
    vectors with at least one semantic near-neighbor (the cluster-
    bounded pair search), the positive is the least-id such neighbor,
    and two hash-drawn uniform negatives come from
    ``sampling.negative_sample`` — every stage individually oracled,
    composed end to end here."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        negative_sample,
    )
    from image_matadata_batchprocessing_aws_spark.operators.semdedup import (
        semantic_pairs,
    )
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        SEM_THRESHOLD,
        _emb,
        _fixed_centroids,
    )

    e = _emb(spark, sf)
    cents = _fixed_centroids(e)
    # both unionAll branches below re-read the pair table — checkpoint
    # so the cluster-bounded pair search runs once, not twice (r08)
    pairs = semantic_pairs(e, cents, vec_col="e", id_col="vec_id",
                           threshold=SEM_THRESHOLD).localCheckpoint(eager=False)
    # symmetrize, then one positive per anchor (least neighbor id)
    sym = pairs.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("pos_id")
    ).unionAll(
        pairs.select(F.col("id_b").alias("anchor_id"), F.col("id_a").alias("pos_id"))
    )
    pos = sym.groupBy("anchor_id").agg(F.min("pos_id").alias("pos_id"))
    anchors = pos.select(F.col("anchor_id").alias("vec_id"))
    negs = negative_sample(e.select("vec_id"), anchors, k=2, seed=5)
    return (
        pos.join(negs, "anchor_id")
        .where((F.col("neg_id") != F.col("pos_id")))
        .select("anchor_id", "pos_id", "neg_rank", "neg_id")
    )


QUERIES["pipeline_contrastive_triplets"] = pipeline_contrastive_triplets


def _triplets_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql
    from image_matadata_batchprocessing_aws_spark.queries.similarity import (
        CENT_MOD_KM,
        SEM_THRESHOLD,
    )

    h = md5_int64_sql("CAST(anchor_id AS VARCHAR) || chr(31) || "
                      "CAST(j AS VARCHAR) || chr(31) || '5'")
    return f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        cents AS (SELECT vec_id AS cid, e AS ce FROM v
                  WHERE vec_id % {CENT_MOD_KM} = 0),
        dists AS (SELECT v.vec_id, c.cid,
                         row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY round(list_cosine_similarity(v.e, c.ce), 6)
                                      DESC, c.cid) AS rn
                  FROM v CROSS JOIN cents c),
        assigned AS (SELECT vec_id, cid FROM dists WHERE rn = 1),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM assigned a
              JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
              JOIN v va ON va.vec_id = a.vec_id
              JOIN v vb ON vb.vec_id = b.vec_id
              WHERE list_dot_product(va.e, va.e) <> 0
                AND list_dot_product(vb.e, vb.e) <> 0
                AND round(list_cosine_similarity(va.e, vb.e), 6)
                      >= {SEM_THRESHOLD}),
        sym AS (SELECT id_a AS anchor_id, id_b AS pos_id FROM p
                UNION ALL SELECT id_b, id_a FROM p),
        pos AS (SELECT anchor_id, min(pos_id) AS pos_id FROM sym GROUP BY 1),
        idx AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS i
                FROM embeddings),
        n AS (SELECT count(*) AS n FROM embeddings),
        d AS (SELECT pos.anchor_id, pos.pos_id, CAST(u.j AS INT) AS neg_rank,
                     ({h}) % (SELECT n FROM n) AS i
              FROM pos, LATERAL unnest(range(0, 2)) AS u(j))
        SELECT anchor_id, pos_id, neg_rank, idx.vec_id AS neg_id
        FROM d JOIN idx USING (i)
        WHERE idx.vec_id <> anchor_id AND idx.vec_id <> pos_id
    """


ORACLES["pipeline_contrastive_triplets"] = _triplets_oracle()


SPLIT_FRACTIONS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
SPLIT_SALT = "dedup-split-v1"


def sample_split_dedup_aware(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-proof train/val/test split: the split hash keys on the
    normalized CONTENT hash, not the doc id, so exact duplicates can
    never straddle a split boundary (a val doc whose twin sits in train
    silently inflates eval).  Pure composition of the oracled pieces:
    ``dedup.content_hash`` + ``sampling.split_assign``."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import content_hash
    from image_matadata_batchprocessing_aws_spark.operators.sampling import split_assign

    d = t(spark, sf, "documents").select(
        "doc_id", content_hash("text").alias("text_hash")
    )
    return split_assign(d, "text_hash", SPLIT_FRACTIONS, salt=SPLIT_SALT).select(
        "doc_id", "split"
    )


QUERIES["sample_split_dedup_aware"] = sample_split_dedup_aware


def _split_dedup_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.sampling import split_assign_sql

    expr = split_assign_sql("md5(lower(trim(text)))", SPLIT_FRACTIONS, salt=SPLIT_SALT)
    return f"SELECT doc_id, {expr} AS split FROM documents"


ORACLES["sample_split_dedup_aware"] = _split_dedup_oracle()


def join_fuzzy_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """Record linkage against a deterministically-dirtied feed: every
    customer name gets one character overwritten (an OCR-style
    substitution), then ``joins.fuzzy_join`` links the feeds back,
    blocking on a 4-char digit window so the quadratic edit-distance
    verify runs per block, not per corpus."""
    from image_matadata_batchprocessing_aws_spark.operators.joins import fuzzy_join

    c = t(spark, sf, "customer").select("c_custkey", "c_name")
    dirty = c.select(
        (F.col("c_custkey") + 1_000_000).alias("feed_id"),
        F.concat(
            F.substring("c_name", 1, 9), F.lit("X"),
            F.expr("substring(c_name, 11, 100)"),
        ).alias("feed_name"),
    )
    out = fuzzy_join(
        c, dirty, "c_name", "feed_name", max_edit=2,
        block_left=F.substring(F.col("c_name"), 15, 4),
        block_right=F.substring(F.col("feed_name"), 15, 4),
    )
    return out.select("c_custkey", "feed_id", "edit_distance")


QUERIES["join_fuzzy_linkage"] = join_fuzzy_linkage

ORACLES["join_fuzzy_linkage"] = """
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS feed_id,
             substr(c_name, 1, 9) || 'X' || substr(c_name, 11, 100) AS feed_name
      FROM customer)
    SELECT c.c_custkey, d.feed_id,
           CAST(levenshtein(c.c_name, d.feed_name) AS INT) AS edit_distance
    FROM customer c
    JOIN dirty d
      ON substr(c.c_name, 15, 4) = substr(d.feed_name, 15, 4)
    WHERE levenshtein(c.c_name, d.feed_name) <= 2
"""


HITS_ITERS = 2
HITS_TOPK = 30


def graph_hits(spark: SparkSession, sf: str) -> DataFrame:
    """HITS on the DIRECTED customer->supplier bipartite graph (the
    natural hub/authority split: customers endorse the suppliers their
    orders touch).  Fixed-point scaled-long rounds
    (``graph.hits_scaled``) make the result engine-exact; the oracle
    unrolls the same half-rounds as CTEs.  Top-30 authorities."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import HITS_SCALE, hits_scaled

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    out = hits_scaled(edges, iterations=HITS_ITERS, scale=HITS_SCALE)
    return (
        out.orderBy(F.desc("auth_scaled"), F.asc("node"))
        .limit(HITS_TOPK)
        .select("node", "hub_scaled", "auth_scaled")
    )


QUERIES["graph_hits"] = graph_hits


def _hits_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.graph import HITS_SCALE

    s = HITS_SCALE
    parts = [f"""
        WITH e AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        h0 AS (SELECT node, {s} // (SELECT n FROM nn) AS v FROM nodes)"""]
    prev_h = "h0"
    for r in (1, 2):
        parts.append(f""",
        ar{r} AS (SELECT e.dst AS node, sum(h.v) AS raw
                  FROM {prev_h} h JOIN e ON h.node = e.src GROUP BY 1),
        a{r} AS (SELECT nodes.node,
                        coalesce(ar{r}.raw, 0) * {s}
                          // (SELECT sum(raw) FROM ar{r}) AS v
                 FROM nodes LEFT JOIN ar{r} ON nodes.node = ar{r}.node),
        hr{r} AS (SELECT e.src AS node, sum(a.v) AS raw
                  FROM a{r} a JOIN e ON a.node = e.dst GROUP BY 1),
        h{r} AS (SELECT nodes.node,
                        coalesce(hr{r}.raw, 0) * {s}
                          // (SELECT sum(raw) FROM hr{r}) AS v
                 FROM nodes LEFT JOIN hr{r} ON nodes.node = hr{r}.node)""")
        prev_h = f"h{r}"
    parts.append(f"""
        SELECT nodes.node,
               CAST(h{HITS_ITERS}.v AS BIGINT) AS hub_scaled,
               CAST(a{HITS_ITERS}.v AS BIGINT) AS auth_scaled
        FROM nodes
        JOIN h{HITS_ITERS} ON nodes.node = h{HITS_ITERS}.node
        JOIN a{HITS_ITERS} ON nodes.node = a{HITS_ITERS}.node
        ORDER BY auth_scaled DESC, nodes.node
        LIMIT {HITS_TOPK}""")
    return "".join(parts)


ORACLES["graph_hits"] = _hits_oracle()


CHURN_GAP_HOURS = 24


def agg_survival_churn(spark: SparkSession, sf: str) -> DataFrame:
    """User-churn survival curve: per-user activity span in HOURS is
    the duration (the synthetic events table spans days, not months); a
    user whose last event predates the corpus horizon by more than
    ``CHURN_GAP_HOURS`` counts as churned (event), otherwise censored
    (still active).  Kaplan-Meier over the spans
    (``stats.kaplan_meier``) — the standard retention estimator,
    engine-exact via scaled-log products."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import kaplan_meier

    e = t(spark, sf, "events").withColumn("ts_ms", F.unix_millis("ts"))
    horizon = e.agg(F.max("ts_ms").alias("__hz"))
    units = (
        e.groupBy("user_id")
        .agg(F.min("ts_ms").alias("__first"), F.max("ts_ms").alias("__last"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.floor(
                (F.col("__last") - F.col("__first")) / F.lit(3600000.0)
            ).cast("long").alias("dur"),
            (
                F.col("__last")
                < F.col("__hz") - F.lit(CHURN_GAP_HOURS * 3600000)
            ).cast("int").alias("evt"),
        )
    )
    return kaplan_meier(units, "dur", "evt")


QUERIES["agg_survival_churn"] = agg_survival_churn

ORACLES["agg_survival_churn"] = f"""
    WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
    hz AS (SELECT max(ts_ms) AS h FROM e),
    units AS (
      SELECT user_id,
             CAST(floor((max(ts_ms) - min(ts_ms)) / 3600000.0) AS BIGINT) AS dur,
             CAST(max(ts_ms) < (SELECT h FROM hz)
                               - {CHURN_GAP_HOURS * 3600000} AS INT) AS evt
      FROM e GROUP BY user_id),
    per_t AS (
      SELECT dur AS t, sum(evt) AS d, sum(1 - evt) AS c
      FROM units GROUP BY 1),
    risk AS (
      SELECT t, d, c,
             sum(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n
      FROM per_t),
    lf AS (
      SELECT t, d, c, n,
             CAST(round((CASE WHEN d < n
                              THEN ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))
                              ELSE 0.0 END) * 1000000000.0) AS BIGINT) AS lnf,
             CASE WHEN d = n THEN 1 ELSE 0 END AS z
      FROM risk),
    acc AS (
      SELECT t, d, c, n,
             sum(lnf) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS lnsum,
             max(z) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS zeroed
      FROM lf)
    SELECT t, CAST(n AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           round(CASE WHEN zeroed = 1 THEN 0.0
                      ELSE exp(CAST(lnsum AS DOUBLE) / 1000000000.0) END, 6)
             AS survival
    FROM acc WHERE d > 0 ORDER BY t
"""


def etl_target_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value (``encode.target_encode``): the leakage-guarded mean-encoding
    every tabular feature pipeline ships, scaled-BIGINT exact."""
    from image_matadata_batchprocessing_aws_spark.operators.encode import target_encode

    o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    out = target_encode(o, ["o_orderpriority"], "o_totalprice", target_digits=2)
    return out.select(
        "o_orderkey", F.col("o_orderpriority_te").alias("priority_te")
    )


QUERIES["etl_target_encode"] = etl_target_encode

ORACLES["etl_target_encode"] = """
    WITH s AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS ys
      FROM orders),
    g AS (
      SELECT o_orderpriority, sum(ys) AS sm, count(ys) AS cnt
      FROM s GROUP BY 1)
    SELECT o_orderkey,
           round(CASE WHEN cnt > 1
                      THEN CAST(sm - ys AS DOUBLE) / CAST(cnt - 1 AS DOUBLE)
                           / 100.0 END, 6) AS priority_te
    FROM s JOIN g USING (o_orderpriority)
"""


def eval_roc_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped ROC AUC (tie-corrected Mann-Whitney): how well does
    order price rank urgent orders, per order status."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import roc_auc

    o = t(spark, sf, "orders").withColumn(
        "__y",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0),
    )
    return roc_auc(o, "o_totalprice", "__y", group_by=["o_orderstatus"]).orderBy(
        "o_orderstatus"
    )


QUERIES["eval_roc_auc"] = eval_roc_auc

ORACLES["eval_roc_auc"] = """
    WITH per AS (
      SELECT o_orderstatus, o_totalprice AS s,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS p,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS n
      FROM orders GROUP BY 1, 2),
    cum AS (
      SELECT o_orderstatus, p, n,
             coalesce(sum(n) OVER (PARTITION BY o_orderstatus ORDER BY s ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
      FROM per),
    agg AS (
      SELECT o_orderstatus, sum(p * (2 * cumneg + n)) AS u2,
             sum(p) AS np, sum(n) AS nn
      FROM cum GROUP BY 1)
    SELECT o_orderstatus, CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round(CAST(u2 AS DOUBLE) / CAST(2 * np * nn AS DOUBLE), 6) AS auc
    FROM agg ORDER BY o_orderstatus
"""


def eval_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability-diagram bins: min-max-normalized price as the
    pseudo-probability that an order is finalized ('F')."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import calibration_bins

    o = t(spark, sf, "orders")
    mm = o.agg(F.min("o_totalprice").alias("__mn"), F.max("o_totalprice").alias("__mx"))
    base = o.crossJoin(F.broadcast(mm)).select(
        ((F.col("o_totalprice") - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))).alias(
            "p"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    return calibration_bins(base, "p", "y", n_bins=10).orderBy("bin")


QUERIES["eval_calibration"] = eval_calibration

ORACLES["eval_calibration"] = """
    WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    b AS (
      SELECT least(CAST(floor((o_totalprice - mn) / (mx - mn) * 10) AS BIGINT), 9) AS bin,
             CAST(round((o_totalprice - mn) / (mx - mn) * 1000000.0) AS BIGINT) AS p6,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders CROSS JOIN mm),
    tot AS (SELECT count(*) AS nt FROM orders),
    a AS (SELECT bin, count(*) AS n, sum(p6) AS sp6, sum(y) AS sy FROM b GROUP BY bin)
    SELECT bin, CAST(n AS BIGINT) AS n,
           round(CAST(sp6 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS confidence,
           round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy,
           round(CAST(sp6 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                 - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gap,
           round(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS weight
    FROM a CROSS JOIN tot ORDER BY bin
"""


def text_pmi_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 bigram collocations by PMI over the document corpus
    (ranked on the exact lift ratio, reported as ln)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import pmi_bigrams

    return pmi_bigrams(t(spark, sf, "documents"), min_count=5, top_k=50)


QUERIES["text_pmi_bigrams"] = text_pmi_bigrams

ORACLES["text_pmi_bigrams"] = r"""
    WITH d AS (SELECT regexp_extract_all(lower(text), '[a-z]{2,}') AS tk FROM documents),
    uni AS (SELECT u AS w, count(*) AS cx
            FROM (SELECT unnest(tk) AS u FROM d) GROUP BY 1),
    idx AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM d WHERE len(tk) >= 2),
    bg AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM idx),
    bgc AS (SELECT w1, w2, count(*) AS cxy FROM bg GROUP BY 1, 2),
    nu AS (SELECT sum(cx) AS nuv FROM uni),
    nb AS (SELECT sum(cxy) AS nbv FROM bgc),
    cand AS (
      SELECT w1, w2, cxy, u1.cx AS cx, u2.cx AS cy
      FROM bgc JOIN uni u1 ON bgc.w1 = u1.w JOIN uni u2 ON bgc.w2 = u2.w
      WHERE cxy >= 5),
    sc AS (
      SELECT w1, w2, CAST(cxy AS BIGINT) AS pair_count,
             (CAST(cxy AS DOUBLE) / CAST(nbv AS DOUBLE))
             / ((CAST(cx AS DOUBLE) / CAST(nuv AS DOUBLE))
                * (CAST(cy AS DOUBLE) / CAST(nuv AS DOUBLE))) AS lift
      FROM cand CROSS JOIN nu CROSS JOIN nb)
    SELECT w1, w2, pair_count, round(ln(lift), 6) AS pmi
    FROM sc ORDER BY lift DESC, w1, w2 LIMIT 50
"""


def text_chi2_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-squared token/label association: which tokens mark English
    documents (presence-based, min doc-freq 10)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import chi2_tokens

    return chi2_tokens(
        t(spark, sf, "documents"), F.col("lang") == "en", min_df=10, top_k=50
    )


QUERIES["text_chi2_tokens"] = text_chi2_tokens

ORACLES["text_chi2_tokens"] = r"""
    WITH d AS (
      SELECT list_distinct(regexp_extract_all(lower(text), '[a-z]{2,}')) AS tk,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    tot AS (SELECT count(*) AS n, sum(y) AS npos FROM d),
    tk AS (SELECT u AS token, count(*) AS dfq, sum(y) AS a
           FROM (SELECT unnest(tk) AS u, y FROM d) GROUP BY 1
           HAVING count(*) >= 10),
    sc AS (
      SELECT token, dfq, a, dfq - a AS b, npos - a AS c,
             n - npos - (dfq - a) AS dd, n
      FROM tk CROSS JOIN tot),
    x AS (
      SELECT token, CAST(dfq AS BIGINT) AS doc_freq, CAST(a AS BIGINT) AS n_pos_docs,
             round(CAST(n AS DOUBLE)
                   * CAST(a * dd - b * c AS DOUBLE) * CAST(a * dd - b * c AS DOUBLE)
                   / CAST((a + b) * (c + dd) AS DOUBLE)
                   / CAST((a + c) * (b + dd) AS DOUBLE), 4) AS chi2
      FROM sc)
    SELECT token, doc_freq, n_pos_docs, chi2
    FROM x ORDER BY chi2 DESC, token LIMIT 50
"""


def agg_js_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence of the language mix from
    the corpus-wide mix — the pre-reweighting mixture diagnostic."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import js_mixture_divergence

    return js_mixture_divergence(
        t(spark, sf, "documents"), "source", "lang"
    ).orderBy("source")


QUERIES["agg_js_mixture"] = agg_js_mixture

ORACLES["agg_js_mixture"] = """
    WITH cell AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
    g AS (SELECT source, sum(c) AS ng FROM cell GROUP BY 1),
    ct AS (SELECT lang, sum(c) AS nc FROM cell GROUP BY 1),
    tt AS (SELECT sum(c) AS n FROM cell),
    grid AS (
      SELECT g.source, ct.lang, g.ng, ct.nc, tt.n, coalesce(cell.c, 0) AS c
      FROM g CROSS JOIN ct CROSS JOIN tt
      LEFT JOIN cell ON cell.source = g.source AND cell.lang = ct.lang),
    term AS (
      SELECT source, ng,
             CAST(round((CASE WHEN c > 0
                 THEN (CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
                      * ln((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
                           / ((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE)
                               + CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
                 ELSE 0.0 END
               + (CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln((CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
                      / ((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE)
                          + CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0)))
               * 1000000000.0) AS BIGINT) AS t9
      FROM grid)
    SELECT source, CAST(ng AS BIGINT) AS n_rows,
           round(0.5 * CAST(sum(t9) AS DOUBLE) / 1000000000.0, 6) AS js_divergence
    FROM term GROUP BY source, ng ORDER BY source
"""


KCORE_K = 10
KCORE_ROUNDS = 3


def eval_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Score the n-gram language-ID heuristic against the documents
    table's gold ``lang`` column: per-class precision/recall/F1 from
    the exact confusion matrix — the eval loop a labeling pipeline
    runs before trusting a heuristic at corpus scale."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import confusion_metrics
    from image_matadata_batchprocessing_aws_spark.operators.text import add_lang_id

    d = add_lang_id(t(spark, sf, "documents"))
    return confusion_metrics(d, "lang_pred", "lang").orderBy("cls")


QUERIES["eval_confusion"] = eval_confusion


def _confusion_oracle() -> str:
    """Confusion SQL over the lang-ID twin (same generated profile SQL
    as ``text_lang_id``, so predictions can't drift between the two)."""
    from image_matadata_batchprocessing_aws_spark.queries.text import _lang_id_oracle

    return f"""
    WITH pl AS ({_lang_id_oracle()}),
    cell AS (SELECT lang AS y, lang_pred AS p, count(*) AS c FROM pl GROUP BY 1, 2),
    truth AS (SELECT y AS cls, sum(c) AS support FROM cell GROUP BY 1),
    pred AS (SELECT p AS cls, sum(c) AS predicted FROM cell GROUP BY 1),
    tp AS (SELECT y AS cls, sum(c) AS tp FROM cell WHERE y = p GROUP BY 1),
    j AS (SELECT coalesce(truth.cls, pred.cls) AS cls,
                 coalesce(support, 0) AS support,
                 coalesce(predicted, 0) AS predicted
          FROM truth FULL OUTER JOIN pred ON truth.cls = pred.cls),
    m AS (SELECT j.cls, j.support, j.predicted, coalesce(tp.tp, 0) AS tp
          FROM j LEFT JOIN tp ON j.cls = tp.cls)
    SELECT cls, CAST(support AS BIGINT) AS support,
           CAST(predicted AS BIGINT) AS predicted, CAST(tp AS BIGINT) AS tp,
           round(CASE WHEN predicted > 0
                 THEN CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE) END, 6)
               AS "precision",
           round(CASE WHEN support > 0
                 THEN CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END, 6) AS recall,
           round(CASE WHEN support + predicted > 0
                 THEN CAST(2 * tp AS DOUBLE)
                      / CAST(support + predicted AS DOUBLE) END, 6) AS f1
    FROM m ORDER BY cls
    """


ORACLES["eval_confusion"] = _confusion_oracle()


def eval_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa between two order annotators: a price-band rule
    and the stated priority collapsed to the same three bands — does
    price agree with priority beyond chance?"""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import cohens_kappa

    o = t(spark, sf, "orders").select(
        F.when(F.col("o_totalprice") < 100000, "LOW")
        .when(F.col("o_totalprice") < 200000, "MID")
        .otherwise("HIGH")
        .alias("rater_a"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "HIGH")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "MID")
        .otherwise("LOW")
        .alias("rater_b"),
    )
    return cohens_kappa(o, "rater_a", "rater_b")


QUERIES["eval_kappa"] = eval_kappa

ORACLES["eval_kappa"] = """
    WITH r AS (
      SELECT CASE WHEN o_totalprice < 100000 THEN 'LOW'
                  WHEN o_totalprice < 200000 THEN 'MID' ELSE 'HIGH' END AS a,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'HIGH'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'MID' ELSE 'LOW' END AS b
      FROM orders),
    cell AS (SELECT a, b, count(*) AS c FROM r GROUP BY 1, 2),
    pe AS (SELECT coalesce(sum(ra.ra * cb.cb), 0) AS pe_num
           FROM (SELECT a, sum(c) AS ra FROM cell GROUP BY 1) ra
           JOIN (SELECT b, sum(c) AS cb FROM cell GROUP BY 1) cb ON ra.a = cb.b),
    tot AS (SELECT sum(c) AS n,
                   sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree
            FROM cell)
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
           round(CASE WHEN n * n - pe_num != 0
                 THEN CAST(agree * n - pe_num AS DOUBLE)
                      / CAST(n * n - pe_num AS DOUBLE) END, 6) AS kappa
    FROM tot CROSS JOIN pe
"""


def graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """Three k-core peel rounds (k=10) on the bidirectional
    customer-supplier graph ``graph_pagerank`` builds — the coreness
    sieve that trims low-signal nodes before authority ranking.
    Output: every surviving node with its post-peel degree."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import kcore_peel

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    surv = kcore_peel(edges, k=KCORE_K, rounds=KCORE_ROUNDS)
    return surv.select(
        F.expr("node % 2").cast("long").alias("node_kind"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        "degree",
    ).orderBy("node_kind", "entity_id")


QUERIES["graph_kcore"] = graph_kcore


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled peel rounds as CTEs — the ``pagerank_scaled`` fixed-round
    playbook: each round re-derives degrees over the surviving edge set
    and keeps vertices at >= k."""
    parts = [
        """
    WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e0 AS (SELECT c AS src, s AS dst FROM pairs
           UNION ALL SELECT s AS src, c AS dst FROM pairs)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    a{r} AS (SELECT src FROM e{r - 1} GROUP BY 1 HAVING count(*) >= {k}),
    e{r} AS (SELECT e.src, e.dst FROM e{r - 1} e
             JOIN a{r} ON e.src = a{r}.src
             JOIN a{r} b ON e.dst = b.src)"""
        )
    parts.append(
        f"""
    SELECT CAST(src % 2 AS BIGINT) AS node_kind,
           CAST(src // 2 AS BIGINT) AS entity_id,
           CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    return "".join(parts)


ORACLES["graph_kcore"] = _kcore_oracle()


PCA_ITERS = 4


def embedding_pca_top(spark: SparkSession, sf: str) -> DataFrame:
    """Top principal component of the embedding corpus via fixed-point
    power iteration over the (renormalized) scatter matrix — the
    anisotropy / dominant-direction diagnostic an embedding pipeline
    runs before whitening.  Bit-exact: every accumulation is
    scaled-BIGINT and both engines' integer divisions truncate."""
    from image_matadata_batchprocessing_aws_spark.operators.pca import pca_top_component_scaled

    return pca_top_component_scaled(
        t(spark, sf, "embeddings"), "embedding", iterations=PCA_ITERS
    ).orderBy("dim_idx")


QUERIES["embedding_pca_top"] = embedding_pca_top


def _pca_chain(iterations: int = PCA_ITERS) -> str:
    """Shared unrolled power-iteration CTE chain mirroring
    ``operators/pca.pca_top_component_scaled`` constant for constant
    (used by both the PCA oracle and the whitening oracle)."""
    from image_matadata_batchprocessing_aws_spark.operators.pca import (
        PCA_Q,
        PCA_S_SCALE,
        PCA_V_SCALE,
    )

    parts = [
        f"""
    WITH q AS (
      SELECT vec_id, ord - 1 AS i,
             CAST(round(CAST(u AS DOUBLE) * {PCA_Q}) AS BIGINT) AS x
      FROM (SELECT vec_id, unnest(embedding) AS u,
                   generate_subscripts(embedding, 1) AS ord
            FROM embeddings)),
    m AS (SELECT i, sum(x) // count(*) AS mn FROM q GROUP BY 1),
    c AS (SELECT q.vec_id, q.i, q.x - m.mn AS c FROM q JOIN m USING (i)),
    p AS (SELECT a.i AS i, b.i AS j, (a.c * b.c) // {PCA_Q} AS p
          FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i),
    st AS (SELECT i, j, sum(p) AS s FROM p GROUP BY 1, 2),
    s AS (SELECT i, j, s FROM st
          UNION ALL SELECT j AS i, i AS j, s FROM st WHERE i != j),
    sd AS (SELECT greatest(max(abs(s)) // {PCA_S_SCALE}, 1) AS d FROM s),
    sn AS (SELECT i, j, s // d AS s FROM s CROSS JOIN sd),
    v0 AS (SELECT DISTINCT i AS j, CAST({PCA_V_SCALE} AS BIGINT) AS v FROM sn)"""
    ]
    for r in range(1, iterations + 1):
        parts.append(
            f""",
    w{r} AS (SELECT sn.i, sum(sn.s * v{r - 1}.v) AS w
             FROM sn JOIN v{r - 1} ON sn.j = v{r - 1}.j GROUP BY 1),
    d{r} AS (SELECT greatest(max(abs(w)) // {PCA_V_SCALE}, 1) AS d FROM w{r}),
    v{r} AS (SELECT i AS j, w // d AS v FROM w{r} CROSS JOIN d{r})"""
        )
    return "".join(parts)


def _pca_oracle(iterations: int = PCA_ITERS) -> str:
    return (
        _pca_chain(iterations)
        + f"""
    SELECT CAST(j AS BIGINT) AS dim_idx, CAST(v AS BIGINT) AS loading_scaled
    FROM v{iterations} ORDER BY 1"""
    )


ORACLES["embedding_pca_top"] = _pca_oracle()


def embedding_whiten_top(spark: SparkSession, sf: str) -> DataFrame:
    """All-but-the-top anisotropy correction end-to-end: PCA the
    corpus, collect the d-sized mean/loading fit statistics, project
    the dominant direction out of every vector, and report per-vector
    squared norms before/after — the energy the common direction held.
    Norm monotonicity holds up to one truncation quantum (1e-6)."""
    from image_matadata_batchprocessing_aws_spark.operators.pca import (
        PCA_Q,
        pca_top_component_scaled,
        remove_top_component_scaled,
    )

    emb = t(spark, sf, "embeddings")
    qarr = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * PCA_Q).cast("long")
    )
    means = (
        emb.select(qarr.alias("__q"))
        .select(F.posexplode("__q").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
        .select("i", F.expr("sx div n").alias("m"))
        .collect()
    )
    mean_q = [int(r["m"]) for r in sorted(means, key=lambda r: r["i"])]
    # the means above double as the PCA pass's centering statistics —
    # pass them through so the corpus is scanned once for means (r08)
    loadings = [
        int(r["loading_scaled"])
        for r in pca_top_component_scaled(emb, iterations=PCA_ITERS, mean_q=mean_q)
        .orderBy("dim_idx")
        .collect()
    ]
    return remove_top_component_scaled(
        emb, "embedding", "vec_id", mean_q, loadings
    ).orderBy("vec_id")


QUERIES["embedding_whiten_top"] = embedding_whiten_top


def _whiten_oracle(iterations: int = PCA_ITERS) -> str:
    from image_matadata_batchprocessing_aws_spark.operators.pca import (
        PCA_COEFF_SCALE,
        PCA_Q,
    )

    return (
        _pca_chain(iterations)
        + f""",
    dvv AS (SELECT sum(v * v) AS dvv FROM v{iterations}),
    dr AS (SELECT greatest(dvv // {PCA_COEFF_SCALE}, 1) AS dr FROM dvv),
    dcv AS (SELECT c.vec_id, sum(c.c * v.v) AS dcv
            FROM c JOIN v{iterations} v ON c.i = v.j GROUP BY 1),
    x AS (SELECT c.vec_id, c.i,
                 c.c - ((dcv.dcv // dr.dr) * v.v) // {PCA_COEFF_SCALE} AS x
          FROM c JOIN v{iterations} v ON c.i = v.j
          JOIN dcv ON c.vec_id = dcv.vec_id CROSS JOIN dr),
    nb AS (SELECT vec_id, sum(c * c) // {PCA_Q} AS nb FROM c GROUP BY 1),
    na AS (SELECT vec_id, sum(x * x) // {PCA_Q} AS na FROM x GROUP BY 1)
    SELECT nb.vec_id, CAST(nb AS BIGINT) AS norm2_before_scaled,
           CAST(na AS BIGINT) AS norm2_after_scaled
    FROM nb JOIN na ON nb.vec_id = na.vec_id ORDER BY nb.vec_id"""
    )


ORACLES["embedding_whiten_top"] = _whiten_oracle()


MMR_K = 5
MMR_QUERY_ID = 0


def search_mmr_diverse(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy MMR over the embedding corpus: vec 0 is the query, the
    other vectors are candidates, lambda = 0.7 — five picks balancing
    relevance against redundancy, every round map-side with the picked
    vectors as literals."""
    from image_matadata_batchprocessing_aws_spark.operators.mmr import MMR_Q, mmr_select

    emb = t(spark, sf, "embeddings")
    qrow = (
        emb.where(F.col("vec_id") == MMR_QUERY_ID)
        .select(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * MMR_Q).cast("long"),
            ).alias("__q")
        )
        .collect()[0]
    )
    picks = mmr_select(
        emb.where(F.col("vec_id") != MMR_QUERY_ID),
        "vec_id",
        "embedding",
        [int(x) for x in qrow["__q"]],
        k=MMR_K,
    )
    return spark.createDataFrame(
        [(p["rank"], p["id"], p["score10"]) for p in picks],
        "rank long, id long, score10 long",
    )


QUERIES["search_mmr_diverse"] = search_mmr_diverse


def _mmr_oracle(k: int = MMR_K) -> str:
    from image_matadata_batchprocessing_aws_spark.operators.mmr import MMR_Q

    parts = [
        f"""
    WITH qv AS (
      SELECT vec_id, ord - 1 AS i,
             CAST(round(CAST(u AS DOUBLE) * {MMR_Q}) AS BIGINT) AS x
      FROM (SELECT vec_id, unnest(embedding) AS u,
                   generate_subscripts(embedding, 1) AS ord
            FROM embeddings)),
    qq AS (SELECT i, x FROM qv WHERE vec_id = {MMR_QUERY_ID}),
    rel AS (SELECT a.vec_id, sum(a.x * q.x) // {MMR_Q} AS rel
            FROM qv a JOIN qq q USING (i)
            WHERE a.vec_id != {MMR_QUERY_ID} GROUP BY 1),
    s1 AS (SELECT vec_id, 7 * rel AS score FROM rel
           ORDER BY score DESC, vec_id LIMIT 1)"""
    ]
    for r in range(2, k + 1):
        prev = r - 1
        excl = " UNION ALL ".join(f"SELECT vec_id FROM s{i}" for i in range(1, r))
        parts.append(
            f""",
    p{prev} AS (SELECT i, x FROM qv
                WHERE vec_id = (SELECT vec_id FROM s{prev})),
    sim{prev} AS (SELECT a.vec_id, sum(a.x * p.x) // {MMR_Q} AS s
                  FROM qv a JOIN p{prev} p USING (i)
                  WHERE a.vec_id != {MMR_QUERY_ID} GROUP BY 1)"""
        )
        ms = (
            f"greatest({', '.join(f'sim{i}.s' for i in range(1, r))})"
            if r > 2
            else "sim1.s"
        )
        joins = " ".join(
            f"JOIN sim{i} ON rel.vec_id = sim{i}.vec_id" for i in range(1, r)
        )
        parts.append(
            f""",
    s{r} AS (SELECT rel.vec_id, 7 * rel.rel - 3 * {ms} AS score
             FROM rel {joins}
             WHERE rel.vec_id NOT IN ({excl})
             ORDER BY score DESC, rel.vec_id LIMIT 1)"""
        )
    finals = "\n    UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id AS id, CAST(score AS BIGINT) AS score10 FROM s{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"""
    SELECT * FROM ({finals}) ORDER BY rank""")
    return "".join(parts)


ORACLES["search_mmr_diverse"] = _mmr_oracle()


MRR_N_QUERIES = 20


def eval_mrr(spark: SparkSession, sf: str) -> DataFrame:
    """Mean-reciprocal-rank harness over the embedding corpus: the
    first MRR_N_QUERIES vectors are queries, same-label candidates are
    relevant, similarity is the exact integer dot product.  The rank
    of the first relevant comes from aggregate counts, never a
    per-query ranking window."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import mrr_first_relevant
    from image_matadata_batchprocessing_aws_spark.operators.mmr import MMR_Q

    emb = t(spark, sf, "embeddings")
    qv = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * MMR_Q).cast("long")
    )
    q = emb.where(F.col("vec_id") < MRR_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        qv.alias("__qv"),
        F.col("label").alias("__ql"),
    )
    c = emb.where(F.col("vec_id") >= MRR_N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        qv.alias("__cv"),
        F.col("label").alias("__cl"),
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        F.expr(
            f"aggregate(zip_with(__qv, __cv, (a, b) -> a * b), 0L,"
            f" (acc, x) -> acc + x) div {MMR_Q}"
        ).alias("sim"),
        (F.col("__ql") == F.col("__cl")).alias("rel"),
    )
    return mrr_first_relevant(
        pairs, "query_id", "cand_id", "sim", "rel"
    ).orderBy("query_id")


QUERIES["eval_mrr"] = eval_mrr


def _mrr_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.mmr import MMR_Q

    return f"""
    WITH qv AS (
      SELECT vec_id, label, ord - 1 AS i,
             CAST(round(CAST(u AS DOUBLE) * {MMR_Q}) AS BIGINT) AS x
      FROM (SELECT vec_id, label, unnest(embedding) AS u,
                   generate_subscripts(embedding, 1) AS ord
            FROM embeddings)),
    sim AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             any_value(q.label) = any_value(c.label) AS rel,
             sum(q.x * c.x) // {MMR_Q} AS sim
      FROM qv q JOIN qv c ON q.i = c.i
      WHERE q.vec_id < {MRR_N_QUERIES} AND c.vec_id >= {MRR_N_QUERIES}
      GROUP BY 1, 2),
    best AS (
      SELECT query_id, sim AS bs, cand_id AS bid FROM sim WHERE rel
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, cand_id ASC) = 1),
    rnk AS (
      SELECT b.query_id,
             1 + count(*) FILTER (WHERE s.sim > b.bs
                                  OR (s.sim = b.bs AND s.cand_id < b.bid)) AS r
      FROM best b JOIN sim s ON s.query_id = b.query_id
      GROUP BY 1)
    SELECT query_id, CAST(r AS BIGINT) AS first_rank,
           CAST(1000000000 // r AS BIGINT) AS rr_scaled
    FROM rnk ORDER BY query_id
"""


ORACLES["eval_mrr"] = _mrr_oracle()


def eval_rouge_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """ROUGE-1 audit of the near-dup candidate pairs: clipped unigram
    overlap P/R/F1 for every Jaccard-candidate pair — the secondary
    signal a dedup reviewer uses to judge borderline pairs."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import ngram_jaccard_pairs
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import rouge_pair_scores
    from image_matadata_batchprocessing_aws_spark.queries.dedup import JACCARD_THRESHOLD

    docs = t(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    return rouge_pair_scores(docs, pairs).orderBy("id_a", "id_b")


QUERIES["eval_rouge_pairs"] = eval_rouge_pairs


def _rouge_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.dedup import (
        _SHINGLES_CTE,
        JACCARD_THRESHOLD,
    )

    return rf"""
    WITH {_SHINGLES_CTE},
    cand AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
    tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS g
            FROM documents),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
    lens AS (SELECT doc_id, sum(c) AS len FROM cnt GROUP BY 1),
    ov AS (SELECT p.id_a, p.id_b, sum(least(a.c, b.c)) AS ov
           FROM cand p
           JOIN cnt a ON a.doc_id = p.id_a
           JOIN cnt b ON b.doc_id = p.id_b AND b.g = a.g
           GROUP BY 1, 2),
    o AS (SELECT p.id_a, p.id_b, coalesce(ov.ov, 0) AS ov,
                 la.len AS la, lb.len AS lb
          FROM cand p
          LEFT JOIN ov ON ov.id_a = p.id_a AND ov.id_b = p.id_b
          JOIN lens la ON la.doc_id = p.id_a
          JOIN lens lb ON lb.doc_id = p.id_b)
    SELECT id_a, id_b, CAST(ov AS BIGINT) AS overlap,
           round(CASE WHEN lb > 0 THEN ov / CAST(lb AS DOUBLE) END, 6) AS rouge_p,
           round(CASE WHEN la > 0 THEN ov / CAST(la AS DOUBLE) END, 6) AS rouge_r,
           round(CASE WHEN la + lb > 0
                 THEN 2 * ov / CAST(la + lb AS DOUBLE) END, 6) AS rouge_f
    FROM o ORDER BY id_a, id_b
"""


ORACLES["eval_rouge_pairs"] = _rouge_oracle()


def etl_corpus_card(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus card — the one-stop data-card report a corpus
    release ships: volume (docs, whitespace tokens, mean chars),
    exact-duplicate rate (md5 text hash), and the dominant language
    with its share.  Every stat is an exact count or a single division
    of exact counts."""
    from image_matadata_batchprocessing_aws_spark.operators.text import token_count

    d = t(spark, sf, "documents")
    vol = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
        F.sum("n_chars").alias("__sc"),
        F.countDistinct(F.md5("text")).alias("__nd"),
    )
    lang_cell = d.groupBy("source", "lang").agg(F.count("*").alias("__c"))
    top_lang = (
        lang_cell.groupBy("source")
        .agg(
            F.max(
                F.struct(F.col("__c").alias("c"), F.col("lang").alias("lang"))
            ).alias("__t")
        )
        .select("source", F.col("__t.lang").alias("top_lang"), F.col("__t.c").alias("__tc"))
    )
    return (
        vol.join(top_lang, "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.col("__sc").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("avg_chars"),
            F.round(
                (F.col("n_docs") - F.col("__nd")).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            "top_lang",
            F.round(
                F.col("__tc").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("top_lang_share"),
        )
        .orderBy("source")
    )


QUERIES["etl_corpus_card"] = etl_corpus_card

ORACLES["etl_corpus_card"] = r"""
    WITH vol AS (
      SELECT source, count(*) AS n_docs,
             sum(len(string_split_regex(trim(text), '\s+'))) AS n_tokens,
             sum(n_chars) AS sc,
             count(DISTINCT md5(text)) AS nd
      FROM documents GROUP BY 1),
    cell AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
    top AS (SELECT source, lang AS top_lang, c AS tc FROM cell
            QUALIFY row_number() OVER (PARTITION BY source
                                       ORDER BY c DESC, lang DESC) = 1)
    SELECT v.source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(sc AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS avg_chars,
           round(CAST(n_docs - nd AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
           top_lang,
           round(CAST(tc AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS top_lang_share
    FROM vol v JOIN top ON v.source = top.source
    ORDER BY v.source
"""


SEMANTIC_DECON_THRESHOLD = 0.4
SEMANTIC_DECON_EVAL_LABEL = 9


def decontaminate_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space decontamination: flag training vectors whose
    cosine to ANY held-out eval vector (label 9 as the benchmark
    stand-in) reaches the threshold — the semantic sibling of the
    n-gram `dedup_decontaminate`.  The eval side broadcasts; the
    per-train max collapses the pair explosion back to one row per
    flagged vector."""
    from image_matadata_batchprocessing_aws_spark.functions import dot, l2_norm

    e = t(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    # norms precomputed per ROW below the join (r08): each side's
    # l2_norm is evaluated once per vector instead of once per PAIR —
    # dot/(na*nb) is the exact cosine_sim expression tree, so the
    # doubles (and the round-4 values the oracle matches) are identical
    ev = e.where(F.col("label") == SEMANTIC_DECON_EVAL_LABEL).select(
        F.col("e").alias("ev"), l2_norm(F.col("e")).alias("__nb")
    )
    tr = e.where(F.col("label") != SEMANTIC_DECON_EVAL_LABEL).select(
        "vec_id", "e", l2_norm(F.col("e")).alias("__na")
    )
    mx = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            F.round(
                dot(F.col("e"), F.col("ev")) / (F.col("__na") * F.col("__nb")), 4
            ).alias("__c"),
        )
        .groupBy("vec_id")
        .agg(F.max("__c").alias("max_eval_cosine"))
    )
    return (
        mx.where(F.col("max_eval_cosine") >= SEMANTIC_DECON_THRESHOLD)
        .select("vec_id", "max_eval_cosine")
        .orderBy("vec_id")
    )


QUERIES["decontaminate_semantic"] = decontaminate_semantic

ORACLES["decontaminate_semantic"] = f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    ev AS (SELECT e FROM e WHERE label = {SEMANTIC_DECON_EVAL_LABEL}),
    tr AS (SELECT vec_id, e FROM e WHERE label != {SEMANTIC_DECON_EVAL_LABEL}),
    mx AS (SELECT tr.vec_id,
                  max(round(list_cosine_similarity(tr.e, ev.e), 4)) AS max_eval_cosine
           FROM tr CROSS JOIN ev GROUP BY 1)
    SELECT vec_id, max_eval_cosine FROM mx
    WHERE max_eval_cosine >= {SEMANTIC_DECON_THRESHOLD}
    ORDER BY vec_id
"""


K_ANON_K = 8


def etl_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit of customers on the (nation, market-segment)
    quasi-identifier pair: every equivalence class smaller than k=8 is
    a re-identification risk a release gate must suppress."""
    from image_matadata_batchprocessing_aws_spark.operators.audit import k_anonymity_audit

    return k_anonymity_audit(
        t(spark, sf, "customer"), ["c_nationkey", "c_mktsegment"], k=K_ANON_K
    ).orderBy("c_nationkey", "c_mktsegment")


QUERIES["etl_k_anonymity"] = etl_k_anonymity

ORACLES["etl_k_anonymity"] = f"""
    SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_size
    FROM customer GROUP BY 1, 2 HAVING count(*) < {K_ANON_K}
    ORDER BY 1, 2
"""


def agg_benford(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-significant-digit audit of line-item extended
    prices: observed digit shares against the log10(1 + 1/d)
    expectation — the classic fabricated-data / corruption screen for
    numeric columns.  The digit is exact string arithmetic; only the
    reference probability touches a log, rounded to 6 digits on both
    engines (ulp-safe)."""
    li = t(spark, sf, "lineitem")
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    tot = li.agg(F.count("*").alias("__n"))
    obs = (
        li.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("observed"))
        .crossJoin(F.broadcast(tot))
    )
    benford_p = F.round(F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 6)
    share = F.col("observed").cast("double") / F.col("__n").cast("double")
    return obs.select(
        "digit",
        F.col("observed").cast("long").alias("observed"),
        F.round(share, 6).alias("observed_share"),
        benford_p.alias("benford_p"),
        F.round(share - F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 6).alias(
            "deviation"
        ),
    ).orderBy("digit")


QUERIES["agg_benford"] = agg_benford

ORACLES["agg_benford"] = """
    WITH tot AS (SELECT count(*) AS n FROM lineitem),
    obs AS (SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   count(*) AS observed
            FROM lineitem GROUP BY 1)
    SELECT digit, CAST(observed AS BIGINT) AS observed,
           round(CAST(observed AS DOUBLE) / CAST(n AS DOUBLE), 6) AS observed_share,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
           round(CAST(observed AS DOUBLE) / CAST(n AS DOUBLE)
                 - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS deviation
    FROM obs CROSS JOIN tot ORDER BY digit
"""


HASH_EMBED_DIM = 64


def text_hash_embed(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-free hashing-trick vectors for every document — the
    bridge from raw text into the vector stack (ANN, PCA, MMR) with no
    trained model in the loop."""
    from image_matadata_batchprocessing_aws_spark.operators.text import hash_embed

    return hash_embed(
        t(spark, sf, "documents"), dim=HASH_EMBED_DIM
    ).orderBy("doc_id", "dim_idx")


QUERIES["text_hash_embed"] = text_hash_embed


def _hash_embed_oracle(dim: int = HASH_EMBED_DIM) -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql

    return rf"""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
                 FROM documents),
    h AS (SELECT doc_id, {md5_int32_sql('w')} AS h FROM tok),
    agg AS (SELECT doc_id, h % {dim} AS dim_idx,
                   sum(CASE WHEN (h // {dim}) % 2 = 0 THEN 1 ELSE -1 END) AS weight
            FROM h GROUP BY 1, 2)
    SELECT doc_id, CAST(dim_idx AS BIGINT) AS dim_idx,
           CAST(weight AS BIGINT) AS weight
    FROM agg WHERE weight != 0 ORDER BY doc_id, dim_idx
"""


ORACLES["text_hash_embed"] = _hash_embed_oracle()


HE_KNN_QUERIES = 10
HE_KNN_K = 5


def search_hash_embed_knn(spark: SparkSession, sf: str) -> DataFrame:
    """Text-to-text retrieval with no model in the loop: hashing-trick
    vectors -> SPARSE cosine via a dim-keyed inner-product join (the
    classic sparse-matmul shape — never densify, never cross join) ->
    top-k per query.  Cosine divides the exact integer dot by the
    sqrt of exact integer norm products (sqrt is correctly-rounded
    IEEE, so both engines emit the same double)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import hash_embed
    from pyspark.sql import Window

    he = hash_embed(t(spark, sf, "documents"), dim=HASH_EMBED_DIM)
    q = he.where(F.col("doc_id") < HE_KNN_QUERIES).select(
        F.col("doc_id").alias("qid"), "dim_idx", F.col("weight").alias("wq")
    )
    dot = (
        q.join(
            he.select(
                F.col("doc_id").alias("cid"), "dim_idx", F.col("weight").alias("wc")
            ),
            "dim_idx",
        )
        .where(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("wq") * F.col("wc")).alias("__dot"))
    )
    n2 = he.groupBy("doc_id").agg(F.sum(F.col("weight") * F.col("weight")).alias("__n2"))
    cos = (
        dot.join(n2.select(F.col("doc_id").alias("qid"), F.col("__n2").alias("__nq")), "qid")
        .join(n2.select(F.col("doc_id").alias("cid"), F.col("__n2").alias("__nc")), "cid")
        .select(
            "qid",
            "cid",
            F.round(
                F.col("__dot").cast("double")
                / F.sqrt((F.col("__nq") * F.col("__nc")).cast("double")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        cos.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= HE_KNN_K)
        .select("qid", "cid", "cosine", F.col("rnk").cast("long").alias("rnk"))
        .orderBy("qid", "rnk")
    )


QUERIES["search_hash_embed_knn"] = search_hash_embed_knn


def _he_knn_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32_sql

    dim = HASH_EMBED_DIM
    return rf"""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
                 FROM documents),
    hh AS (SELECT doc_id, {md5_int32_sql('w')} AS h FROM tok),
    he AS (SELECT doc_id, h % {dim} AS dim_idx,
                  sum(CASE WHEN (h // {dim}) % 2 = 0 THEN 1 ELSE -1 END) AS weight
           FROM hh GROUP BY 1, 2 HAVING sum(CASE WHEN (h // {dim}) % 2 = 0
                                               THEN 1 ELSE -1 END) != 0),
    dt AS (SELECT q.doc_id AS qid, c.doc_id AS cid,
                  sum(q.weight * c.weight) AS dot
           FROM he q JOIN he c ON q.dim_idx = c.dim_idx AND q.doc_id != c.doc_id
           WHERE q.doc_id < {HE_KNN_QUERIES} GROUP BY 1, 2),
    n2 AS (SELECT doc_id, sum(weight * weight) AS n2 FROM he GROUP BY 1),
    cos AS (SELECT qid, cid,
                   round(CAST(dot AS DOUBLE)
                         / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)), 4) AS cosine
            FROM dt JOIN n2 a ON dt.qid = a.doc_id JOIN n2 b ON dt.cid = b.doc_id),
    r AS (SELECT qid, cid, cosine,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, cid ASC) AS rnk
          FROM cos)
    SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {HE_KNN_K} ORDER BY qid, rnk
"""


ORACLES["search_hash_embed_knn"] = _he_knn_oracle()


def stream_confusion_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the live windowed model-quality monitor: hourly
    confusion metrics of the value-band predictor against the true
    event type — per (window, class) P/R/F1 from exact cells (the
    stream side computes the same cells as its single aggregation;
    tests assert stream == batch)."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import confusion_metrics
    from image_matadata_batchprocessing_aws_spark.streaming.events import event_type_predictor

    e = t(spark, sf, "events").select(
        F.unix_millis(F.date_trunc("hour", "ts")).alias("window_start_ms"),
        event_type_predictor().alias("__pred"),
        F.col("event_type").alias("__truth"),
    )
    return confusion_metrics(
        e, "__pred", "__truth", group_by=["window_start_ms"]
    ).orderBy("window_start_ms", "cls")


QUERIES["stream_confusion_windows"] = stream_confusion_windows

ORACLES["stream_confusion_windows"] = """
    WITH lab AS (
      SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS w,
             CASE WHEN value < 20 THEN 'view'
                  WHEN value < 35 THEN 'click'
                  WHEN value < 60 THEN 'signup'
                  WHEN value < 100 THEN 'purchase'
                  ELSE 'error' END AS p,
             event_type AS y
      FROM events),
    cell AS (SELECT w, y, p, count(*) AS c FROM lab GROUP BY 1, 2, 3),
    truth AS (SELECT w, y AS cls, sum(c) AS support FROM cell GROUP BY 1, 2),
    pred AS (SELECT w, p AS cls, sum(c) AS predicted FROM cell GROUP BY 1, 2),
    tp AS (SELECT w, y AS cls, sum(c) AS tp FROM cell WHERE y = p GROUP BY 1, 2),
    j AS (SELECT coalesce(truth.w, pred.w) AS w,
                 coalesce(truth.cls, pred.cls) AS cls,
                 coalesce(support, 0) AS support,
                 coalesce(predicted, 0) AS predicted
          FROM truth FULL OUTER JOIN pred
            ON truth.w = pred.w AND truth.cls = pred.cls),
    m AS (SELECT j.w, j.cls, j.support, j.predicted, coalesce(tp.tp, 0) AS tp
          FROM j LEFT JOIN tp ON j.w = tp.w AND j.cls = tp.cls)
    SELECT w AS window_start_ms, cls,
           CAST(support AS BIGINT) AS support,
           CAST(predicted AS BIGINT) AS predicted,
           CAST(tp AS BIGINT) AS tp,
           round(CASE WHEN predicted > 0
                 THEN CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE) END, 6)
               AS "precision",
           round(CASE WHEN support > 0
                 THEN CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END, 6) AS recall,
           round(CASE WHEN support + predicted > 0
                 THEN CAST(2 * tp AS DOUBLE)
                      / CAST(support + predicted AS DOUBLE) END, 6) AS f1
    FROM m ORDER BY window_start_ms, cls
"""


def pipeline_entity_resolution(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution end-to-end — the third flagship composition:
    blocked fuzzy linkage (OCR-dirtied feed vs clean feed) -> connected
    components over the match edges -> survivorship (canonical record =
    minimum id, i.e. the clean feed's row).  One row per record with
    its resolved entity, the surviving canonical name, and the entity's
    size (singletons stay their own entity via the left join)."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import connected_components
    from image_matadata_batchprocessing_aws_spark.operators.joins import fuzzy_join

    c = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("record_id"), F.col("c_name").alias("name")
    )
    dirty = t(spark, sf, "customer").select(
        (F.col("c_custkey") + 1_000_000).alias("record_id"),
        F.concat(
            F.substring("c_name", 1, 9), F.lit("X"),
            F.expr("substring(c_name, 11, 100)"),
        ).alias("name"),
    )
    records = c.unionByName(dirty)
    pairs = fuzzy_join(
        c.withColumnRenamed("record_id", "c_custkey").withColumnRenamed(
            "name", "c_name"
        ),
        dirty.withColumnRenamed("record_id", "feed_id").withColumnRenamed(
            "name", "feed_name"
        ),
        "c_name",
        "feed_name",
        max_edit=2,
        block_left=F.substring(F.col("c_name"), 15, 4),
        block_right=F.substring(F.col("feed_name"), 15, 4),
    ).select("c_custkey", "feed_id")
    cc = connected_components(pairs, src="c_custkey", dst="feed_id")
    resolved = records.join(
        cc.select(F.col("id").alias("record_id"), "component"),
        "record_id",
        "left",
    ).select(
        "record_id",
        "name",
        F.coalesce("component", "record_id").alias("entity_id"),
    )
    canon = resolved.groupBy("entity_id").agg(
        F.min("record_id").alias("__canon_id"), F.count("*").alias("group_size")
    )
    canon_named = canon.join(
        resolved.select(
            F.col("record_id").alias("__canon_id"),
            F.col("name").alias("canonical_name"),
        ),
        "__canon_id",
    )
    return (
        resolved.join(
            canon_named.select("entity_id", "canonical_name", "group_size"),
            "entity_id",
        )
        .select(
            "record_id",
            F.col("entity_id").cast("long").alias("entity_id"),
            "canonical_name",
            F.col("group_size").cast("long").alias("group_size"),
        )
        .orderBy("record_id")
    )


QUERIES["pipeline_entity_resolution"] = pipeline_entity_resolution

ORACLES["pipeline_entity_resolution"] = """
    WITH RECURSIVE dirty AS (
      SELECT c_custkey + 1000000 AS record_id,
             substr(c_name, 1, 9) || 'X' || substr(c_name, 11, 100) AS name
      FROM customer),
    pairs AS (
      SELECT c.c_custkey AS va, d.record_id AS vb
      FROM customer c JOIN dirty d
        ON substr(c.c_name, 15, 4) = substr(d.name, 15, 4)
      WHERE levenshtein(c.c_name, d.name) <= 2),
    edges AS (SELECT va, vb FROM pairs UNION ALL SELECT vb, va FROM pairs),
    reach(src, node) AS (
        SELECT va AS src, va AS node FROM edges
        UNION
        SELECT r.src, g.vb FROM reach r JOIN edges g ON r.node = g.va),
    cc AS (SELECT src AS record_id, min(node) AS comp FROM reach GROUP BY 1),
    records AS (
      SELECT c_custkey AS record_id, c_name AS name FROM customer
      UNION ALL SELECT record_id, name FROM dirty),
    resolved AS (
      SELECT r.record_id, r.name,
             coalesce(cc.comp, r.record_id) AS entity_id
      FROM records r LEFT JOIN cc ON r.record_id = cc.record_id),
    canon AS (SELECT entity_id, min(record_id) AS canon_id,
                     count(*) AS group_size
              FROM resolved GROUP BY 1),
    named AS (SELECT c.entity_id, r.name AS canonical_name, c.group_size
              FROM canon c JOIN resolved r ON r.record_id = c.canon_id)
    SELECT v.record_id, CAST(v.entity_id AS BIGINT) AS entity_id,
           n.canonical_name, CAST(n.group_size AS BIGINT) AS group_size
    FROM resolved v JOIN named n ON v.entity_id = n.entity_id
    ORDER BY v.record_id
"""


# --- REAL GIF decode with a closed-form oracle -----------------------------

GIF_N_DOCS = 30


def multimodal_gif_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL GIF (LZW) decoding, oracle-checked (extends S9 beyond
    PNG/BMP/PPM/JPEG; reference decode: ``process_test_train_Images.py:45``
    via PIL, which reads GIF natively): solid-color GIFs from the
    pure-stdlib encoder — alternating interlaced/progressive-scan
    layouts — are decoded by the pure LZW decoder through the full
    Arrow ``mapInPandas`` pipeline.  GIF is palette-lossless, so after
    the integral aspect-preserving resize the per-channel pixel sums
    are exactly ``color * visible_pixels`` — the same closed form the
    PNG twin uses (no reconstruction error term, unlike JPEG)."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_gif
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    rows = []
    for doc_id in range(GIF_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
        rows.append(
            (
                doc_id,
                f"{doc_id}.gif",
                bytearray(encode_gif(img, interlace=doc_id % 2 == 1)),
            )
        )
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    decoded = decode_images(entries, use_real_codec=True, normalize=False)

    def chan_sum(c: int):
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id",
        F.col("channels").cast("long").alias("channels"),
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_gif_decode"] = multimodal_gif_decode


def _gif_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import (
        PNG_DIMS,
        _png_content_pixels,
    )

    pix_case = " ".join(
        f"WHEN {i} THEN {px}" for i, px in enumerate(_png_content_pixels())
    )
    return f"""
        SELECT doc_id,
               CAST(3 AS BIGINT) AS channels,
               CAST(224 AS BIGINT) AS height,
               CAST(224 AS BIGINT) AS width,
               CAST((doc_id % 251) * px AS BIGINT) AS r_sum,
               CAST(((doc_id * 7) % 251) * px AS BIGINT) AS g_sum,
               CAST(((doc_id * 13) % 251) * px AS BIGINT) AS b_sum
        FROM (SELECT unnest(range({GIF_N_DOCS})) AS doc_id),
             LATERAL (SELECT CASE doc_id % {len(PNG_DIMS)} {pix_case} END AS px)
    """


ORACLES["multimodal_gif_decode"] = _gif_oracle()


# --- exact Jaccard join via prefix filtering -------------------------------


def dedup_jaccard_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard-threshold self-join (All-Pairs /
    SSJoin): same answer as ``dedup_ngram_jaccard`` — the oracle IS that
    query's brute-force posting-list SQL — but candidates come from each
    doc's ``L - ceil(t*L) + 1`` rarest shingles only (15x fewer
    candidate pairs on this corpus; the gap widens with corpus
    commonality).  The scale story: ``ngram_jaccard_pairs`` keeps hot
    shingles out of the join only by dropping them (``max_df``, which
    changes the answer); the prefix filter skips them provably
    losslessly."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    return jaccard_prefix_pairs(t(spark, sf, "documents"), threshold=0.5)


QUERIES["dedup_jaccard_prefix"] = dedup_jaccard_prefix


def _jaccard_prefix_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.dedup import _SHINGLES_CTE

    return f"""
        WITH {_SHINGLES_CTE}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
    """


ORACLES["dedup_jaccard_prefix"] = _jaccard_prefix_oracle()


# --- REAL progressive-JPEG decode with the bitstream-free oracle -----------

JPEG_PROG_N_DOCS = 24


def multimodal_jpeg_progressive(spark: SparkSession, sf: str) -> DataFrame:
    """REAL progressive (SOF2) JPEG decoding, oracle-checked: the full
    T.81 Annex G entropy layer — spectral selection, successive
    approximation (DC+AC first and refinement passes), refinement ZRL —
    must transport every coefficient bit-exactly, so the decoded
    solid-color fixtures match the SAME bitstream-free reference values
    as the baseline twin ``multimodal_jpeg_decode`` (the two entropy
    codings carry identical quantized coefficients).  Decoder
    additionally validated against a real libjpeg-produced progressive
    file in ``tests/test_codecs.py``."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_jpeg
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    rows = []
    for doc_id in range(JPEG_PROG_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
        q = 75 if doc_id % 2 == 0 else 90
        ss = "4:4:4" if doc_id % 4 < 2 else "4:2:0"
        rows.append(
            (
                doc_id,
                f"{doc_id}.jpg",
                bytearray(encode_jpeg(img, quality=q, subsampling=ss, progressive=True)),
            )
        )
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    decoded = decode_images(entries, use_real_codec=True, normalize=False)

    def chan_sum(c: int):
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id",
        F.col("channels").cast("long").alias("channels"),
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_jpeg_progressive"] = multimodal_jpeg_progressive


def _jpeg_prog_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import (
        PNG_DIMS,
        _jpeg_expected_rgb,
        _png_content_pixels,
    )

    vals = [_jpeg_expected_rgb(i) for i in range(JPEG_PROG_N_DOCS)]
    r_case = " ".join(f"WHEN {i} THEN {v[0]}" for i, v in enumerate(vals))
    g_case = " ".join(f"WHEN {i} THEN {v[1]}" for i, v in enumerate(vals))
    b_case = " ".join(f"WHEN {i} THEN {v[2]}" for i, v in enumerate(vals))
    pix_case = " ".join(
        f"WHEN {i} THEN {px}" for i, px in enumerate(_png_content_pixels())
    )
    return f"""
        SELECT doc_id,
               CAST(3 AS BIGINT) AS channels,
               CAST(224 AS BIGINT) AS height,
               CAST(224 AS BIGINT) AS width,
               CAST((CASE doc_id {r_case} END) * px AS BIGINT) AS r_sum,
               CAST((CASE doc_id {g_case} END) * px AS BIGINT) AS g_sum,
               CAST((CASE doc_id {b_case} END) * px AS BIGINT) AS b_sum
        FROM (SELECT unnest(range({JPEG_PROG_N_DOCS})) AS doc_id),
             LATERAL (SELECT CASE doc_id % {len(PNG_DIMS)} {pix_case} END AS px)
    """


ORACLES["multimodal_jpeg_progressive"] = _jpeg_prog_oracle()


# --- KMV sketch: distinct + intersection estimates -------------------------

KMV_K = 128


def _user_day(spark: SparkSession, sf: str):
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    return e.withColumn(
        "user_day",
        F.concat_ws(
            "#", F.col("user_id").cast("string"), F.date_format("ts", "yyyy-MM-dd")
        ),
    )


def sketch_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """KMV distinct-count estimation (Beyer et al. 2007) of user-days
    per event type — the visitor-counting sketch whose register table
    is k rows per group at ANY corpus size; exact distinct alongside
    for judgeable error.  Bit-reproducible: house md5 hashes and
    literal-identical estimator arithmetic in the DuckDB twin."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    e = _user_day(spark, sf)
    sk = kmv_sketch(e, "user_day", ["event_type"], k=KMV_K)
    est = kmv_estimate(sk, ["event_type"], k=KMV_K)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_day").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_sketch", "est_distinct",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


def sketch_kmv_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """KMV set-INTERSECTION estimate — the operation HLL cannot do:
    click vs purchase user-day overlap from two k-row sketches (merge,
    Jaccard of sketch memberships, inter = jaccard * union_est), with
    the exact overlap alongside."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        kmv_jaccard_pair,
        kmv_sketch,
    )

    e = _user_day(spark, sf)
    sk = kmv_sketch(e, "user_day", ["event_type"], k=KMV_K)
    est = kmv_jaccard_pair(sk, "event_type", "click", "purchase", k=KMV_K)
    clicks = e.where(F.col("event_type") == "click").select("user_day").distinct()
    purch = e.where(F.col("event_type") == "purchase").select("user_day").distinct()
    exact = (
        clicks.join(purch, "user_day", "left_semi")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("exact_inter"))
        .withColumn("__j", F.lit(1))
    )
    return est.withColumn("__j", F.lit(1)).join(exact, "__j").select(
        "group_a", "group_b", "k_used", "n_both",
        "jaccard_est", "union_est", "inter_est",
        F.col("exact_inter").cast("long").alias("exact_inter"),
    )


QUERIES["sketch_kmv_distinct"] = sketch_kmv_distinct
QUERIES["sketch_kmv_intersect"] = sketch_kmv_intersect


def _kmv_key_sql() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    return md5_int64_sql(
        "CAST(user_id AS VARCHAR) || '#' || strftime(ts, '%Y-%m-%d')"
    )


def _kmv_oracles() -> tuple[str, str]:
    h = _kmv_key_sql()
    space = "1152921504606846976.0"  # 2^60, the md5_int64 hash space
    distinct_sql = f"""
        WITH keys AS (
          SELECT DISTINCT event_type, {h} AS hv
          FROM events WHERE user_id IS NOT NULL),
        rk AS (SELECT event_type, hv,
                      row_number() OVER (PARTITION BY event_type ORDER BY hv) AS pos
               FROM keys),
        sk AS (SELECT * FROM rk WHERE pos <= {KMV_K}),
        agg AS (SELECT event_type, count(*) AS n_sketch,
                       max(CASE WHEN pos = {KMV_K} THEN hv END) AS hk
                FROM sk GROUP BY 1),
        exact AS (SELECT event_type, count(*) AS exact_distinct FROM keys GROUP BY 1)
        SELECT a.event_type, CAST(a.n_sketch AS BIGINT) AS n_sketch,
               round(CASE WHEN a.n_sketch < {KMV_K} THEN CAST(a.n_sketch AS DOUBLE)
                          ELSE {KMV_K - 1}.0 * {space} / CAST(a.hk AS DOUBLE)
                     END, 4) AS est_distinct,
               CAST(e.exact_distinct AS BIGINT) AS exact_distinct
        FROM agg a JOIN exact e ON a.event_type = e.event_type
    """
    intersect_sql = f"""
        WITH keys AS (
          SELECT DISTINCT event_type, {h} AS hv
          FROM events
          WHERE user_id IS NOT NULL AND event_type IN ('click', 'purchase')),
        rk AS (SELECT event_type, hv,
                      row_number() OVER (PARTITION BY event_type ORDER BY hv) AS pos
               FROM keys),
        sk AS (SELECT * FROM rk WHERE pos <= {KMV_K}),
        mg AS (SELECT hv, row_number() OVER (ORDER BY hv) AS pos
               FROM (SELECT DISTINCT hv FROM sk)),
        merged AS (SELECT hv, pos FROM mg WHERE pos <= {KMV_K}),
        stats AS (
          SELECT count(*) AS k_used,
                 max(CASE WHEN pos = {KMV_K} THEN hv END) AS hk,
                 sum(CASE WHEN hv IN (SELECT hv FROM sk WHERE event_type = 'click')
                           AND hv IN (SELECT hv FROM sk WHERE event_type = 'purchase')
                          THEN 1 ELSE 0 END) AS n_both
          FROM merged),
        exact AS (
          SELECT count(*) AS exact_inter FROM (
            SELECT hv FROM keys WHERE event_type = 'click'
            INTERSECT
            SELECT hv FROM keys WHERE event_type = 'purchase'))
        SELECT 'click' AS group_a, 'purchase' AS group_b,
               CAST(s.k_used AS BIGINT) AS k_used,
               CAST(s.n_both AS BIGINT) AS n_both,
               round(CAST(s.n_both AS DOUBLE) / CAST(s.k_used AS DOUBLE), 4)
                 AS jaccard_est,
               round(u.union_est, 4) AS union_est,
               round(CAST(s.n_both AS DOUBLE) / CAST(s.k_used AS DOUBLE)
                     * u.union_est, 4) AS inter_est,
               CAST(e.exact_inter AS BIGINT) AS exact_inter
        FROM stats s, exact e,
             LATERAL (SELECT CASE WHEN s.k_used < {KMV_K}
                                  THEN CAST(s.k_used AS DOUBLE)
                                  ELSE {KMV_K - 1}.0 * {space} / CAST(s.hk AS DOUBLE)
                             END AS union_est) u
    """
    return distinct_sql, intersect_sql


ORACLES["sketch_kmv_distinct"], ORACLES["sketch_kmv_intersect"] = _kmv_oracles()


# --- REAL lossless-WebP (VP8L) decode with a closed-form oracle ------------

WEBP_N_DOCS = 30


def _webp_expected(doc_id: int) -> tuple[int, int, int, int, int]:
    """(h, w, r_sum, g_sum, b_sum) closed forms for fixture ``doc_id``.
    All PNG_DIMS divide 224, so the aspect-preserving resize scale is an
    integer s and every source pixel becomes an s x s block: sums are
    value x s^2 x (source-pixel count).  Even docs are solid (simple
    prefix codes in the stream); odd docs carry a vertical green
    gradient (normal length-limited Huffman codes), whose green sum is
    s^2 * w * (h*base + h*(h-1)/2) with no mod-256 wrap by
    construction."""
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
    s = min(224 // h, 224 // w)
    v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
    if doc_id % 2 == 0:
        r_sum, g_sum, b_sum = (v[0] * h * w * s * s, v[1] * h * w * s * s, v[2] * h * w * s * s)
    else:
        base = doc_id % 20
        g_total = h * base + h * (h - 1) // 2
        r_sum = v[0] * h * w * s * s
        g_sum = g_total * w * s * s
        b_sum = v[2] * h * w * s * s
    return h, w, r_sum, g_sum, b_sum


def multimodal_webp_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL lossless-WebP decoding, oracle-checked (closes the WEBP
    format seam of S9; reference decode: ``process_test_train_Images.py:45``
    via PIL): VP8L files from the pure-python encoder — solid colors
    (simple prefix codes) alternating with vertical-gradient images
    (normal length-limited canonical Huffman codes) — are decoded by
    the pure VP8L decoder (``multimodal/webp.py``: RIFF walk, canonical
    prefix codes, LZ77/color-cache machinery) through the full Arrow
    ``mapInPandas`` pipeline; per-channel pixel sums after the integral
    aspect-preserving resize are compared against closed forms (VP8L is
    lossless, so no reconstruction error term)."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.multimodal.webp import (
        encode_webp_lossless,
    )
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    rows = []
    for doc_id in range(WEBP_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
        if doc_id % 2 == 1:
            base = doc_id % 20
            img[:, :, 1] = (base + np.arange(h, dtype=np.int64))[:, None] % 256
        rows.append((doc_id, f"{doc_id}.webp", bytearray(encode_webp_lossless(img))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    decoded = decode_images(entries, use_real_codec=True, normalize=False)

    def chan_sum(c: int):
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id",
        F.col("channels").cast("long").alias("channels"),
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_webp_decode"] = multimodal_webp_decode


def _webp_oracle() -> str:
    rows = []
    for doc_id in range(WEBP_N_DOCS):
        _h, _w, r_sum, g_sum, b_sum = _webp_expected(doc_id)
        rows.append(f"({doc_id}, {r_sum}, {g_sum}, {b_sum})")
    values = ", ".join(rows)
    return f"""
        SELECT doc_id,
               CAST(3 AS BIGINT) AS channels,
               CAST(224 AS BIGINT) AS height,
               CAST(224 AS BIGINT) AS width,
               CAST(r_sum AS BIGINT) AS r_sum,
               CAST(g_sum AS BIGINT) AS g_sum,
               CAST(b_sum AS BIGINT) AS b_sum
        FROM (VALUES {values}) AS t(doc_id, r_sum, g_sum, b_sum)
    """


ORACLES["multimodal_webp_decode"] = _webp_oracle()


# --- REAL WAV/PCM decode with an integer-exact oracle ----------------------

WAV_N_DOCS = 24
WAV_M = 1999  # sawtooth modulus; samples span [-999, 999]


def multimodal_wav_stats(spark: SparkSession, sf: str) -> DataFrame:
    """REAL WAV/PCM audio decoding, oracle-checked (the audio twin of
    ``multimodal_png_decode``; reference treats media as opaque files —
    this closes the librosa seam named in ``multimodal/media.py`` for
    uncompressed audio): PCM16 WAVs holding a deterministic integer
    sawtooth ``s[i] = ((i*a + b) % M) - M//2`` — alternating mono and
    stereo (stats are channel 0, so stereo also proves de-interleave)
    at four sample rates — are decoded by the pure RIFF parser through
    the Arrow ``mapInPandas`` pipeline (``audio.wav_pcm_stats``), and
    the INTEGER-EXACT per-blob statistics (sum |s|, sum s^2, peak,
    sign-transition count) are recomputed by DuckDB from the same
    closed-form sample generator."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        encode_wav_pcm16,
        wav_pcm_stats,
    )

    rows = []
    for d in range(WAV_N_DOCS):
        rate = 4000 + 500 * (d % 4)
        n = rate // 2  # 0.5 s
        a, b = 769 + 2 * d, d * 31
        ch0 = ((np.arange(n, dtype=np.int64) * a + b) % WAV_M) - WAV_M // 2
        if d % 2 == 1:  # stereo: channel 1 is a different stream
            ch1 = ((np.arange(n, dtype=np.int64) * 13 + 7) % WAV_M) - WAV_M // 2
            samples = np.stack([ch0, ch1], axis=1)
        else:
            samples = ch0
        rows.append((d, f"{d}.wav", bytearray(encode_wav_pcm16(samples, rate))))
    audio = spark.createDataFrame(rows, "doc_id long, file_name string, content binary")
    stats = wav_pcm_stats(audio.select("file_name", "content"))
    return (
        stats.join(audio.select("doc_id", "file_name"), "file_name")
        .select(
            "doc_id",
            F.col("sample_rate").cast("long").alias("sample_rate"),
            F.col("channels").cast("long").alias("channels"),
            F.col("n_samples").cast("long").alias("n_samples"),
            F.col("sum_abs").cast("long").alias("sum_abs"),
            F.col("sum_sq").cast("long").alias("sum_sq"),
            F.col("peak").cast("long").alias("peak"),
            F.col("zero_crossings").cast("long").alias("zero_crossings"),
        )
    )


QUERIES["multimodal_wav_stats"] = multimodal_wav_stats

ORACLES["multimodal_wav_stats"] = f"""
    WITH params AS (
      SELECT doc_id, 4000 + 500 * (doc_id % 4) AS rate,
             769 + 2 * doc_id AS a, doc_id * 31 AS b,
             1 + (doc_id % 2) AS channels
      FROM (SELECT unnest(range({WAV_N_DOCS})) AS doc_id)),
    samples AS (
      SELECT p.doc_id, t.i,
             ((t.i * p.a + p.b) % {WAV_M}) - {WAV_M // 2} AS s
      FROM params p,
           LATERAL (SELECT unnest(range(p.rate // 2)) AS i) t),
    lagged AS (
      SELECT doc_id, i, s,
             lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM samples),
    agg AS (
      SELECT doc_id, count(*) AS n_samples, sum(abs(s)) AS sum_abs,
             sum(s * s) AS sum_sq, max(abs(s)) AS peak,
             sum(CASE WHEN prev IS NOT NULL AND ((prev < 0) != (s < 0))
                      THEN 1 ELSE 0 END) AS zero_crossings
      FROM lagged GROUP BY 1)
    SELECT p.doc_id, CAST(p.rate AS BIGINT) AS sample_rate,
           CAST(p.channels AS BIGINT) AS channels,
           CAST(g.n_samples AS BIGINT) AS n_samples,
           CAST(g.sum_abs AS BIGINT) AS sum_abs,
           CAST(g.sum_sq AS BIGINT) AS sum_sq,
           CAST(g.peak AS BIGINT) AS peak,
           CAST(g.zero_crossings AS BIGINT) AS zero_crossings
    FROM params p JOIN agg g ON p.doc_id = g.doc_id
"""


# --- REAL MJPEG-AVI frame sampling with a bitstream-free oracle ------------

VIDEO_N_DOCS = 12


def _video_frame_color(d: int, j: int) -> tuple[int, int, int]:
    return ((d * 17 + j * 29) % 251, (d * 7 + j * 11) % 251, (d * 13 + j * 5) % 251)


def multimodal_video_frames(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video frame decoding, oracle-checked (the video twin of
    ``multimodal_jpeg_decode``; closes the ffmpeg seam of
    ``media.sample_video_frames`` for the one genuinely decodable
    codec): MJPEG AVIs of solid 8x8 frames are container-walked and
    JPEG-decoded by ``multimodal/video.py`` through the Arrow
    ``mapInPandas`` sampler (every 2nd frame, max 4), and each sampled
    frame's pixel sum is compared against the bitstream-free reference
    pipeline's reconstruction (solid 8x8 = one DCT block, so the
    closed form is (r'+g'+b') * 64 with r'g'b' from
    ``jpeg_reference_pipeline``)."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.video import (
        decode_video_frames,
        encode_avi_mjpeg,
    )

    rows = []
    for d in range(VIDEO_N_DOCS):
        frames = []
        for j in range(6 + d % 5):
            img = np.zeros((8, 8, 3), dtype=np.uint8)
            img[:, :] = _video_frame_color(d, j)
            frames.append(img)
        q = 75 if d % 2 == 0 else 90
        rows.append((d, f"{d}.avi", bytearray(encode_avi_mjpeg(frames, fps=10, quality=q))))
    videos = spark.createDataFrame(rows, "doc_id long, file_name string, content binary")
    out = decode_video_frames(
        videos.select("file_name", "content"), every_n=2, max_frames=4, normalize=False
    )
    frame_sum = F.aggregate(
        F.col("frame"), F.lit(0.0), lambda acc, x: acc + x
    ).cast("long")
    return (
        out.where(F.col("decode_error").isNull())
        .join(videos.select("doc_id", "file_name"), "file_name")
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("height").cast("long").alias("height"),
            F.col("width").cast("long").alias("width"),
            frame_sum.alias("frame_sum"),
        )
    )


QUERIES["multimodal_video_frames"] = multimodal_video_frames


def _video_oracle() -> str:
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        jpeg_reference_pipeline,
    )

    values = []
    for d in range(VIDEO_N_DOCS):
        n = 6 + d % 5
        q = 75 if d % 2 == 0 else 90
        picked = list(range(0, n, 2))[:4]
        for j in picked:
            img = np.zeros((8, 8, 3), dtype=np.uint8)
            img[:, :] = _video_frame_color(d, j)
            rec = jpeg_reference_pipeline(img, quality=q)
            s = int(rec.astype(np.int64).sum())
            values.append(f"({d}, {j}, {s})")
    return f"""
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(8 AS BIGINT) AS height, CAST(8 AS BIGINT) AS width,
               CAST(frame_sum AS BIGINT) AS frame_sum
        FROM (VALUES {", ".join(values)}) AS t(doc_id, frame_idx, frame_sum)
    """


ORACLES["multimodal_video_frames"] = _video_oracle()


# --- CDC apply, join IVM, DP release ---------------------------------------


def _cdc_feed(o: DataFrame) -> DataFrame:
    """The deterministic synthetic CDC feed over orders shared by
    ``etl_apply_cdc`` (type-1 replay) and ``etl_scd2_build`` (type-2
    history); ``_CDC_FEED_SQL`` is its DuckDB twin."""

    def change(cond, op, ts, key, status, price):
        return o.where(cond).select(
            key.alias("o_orderkey"),
            F.col("o_custkey"),
            status.alias("o_orderstatus"),
            F.round(price, 2).alias("o_totalprice"),
            F.lit(ts).alias("change_ts"),
            F.lit(op).alias("op"),
        )

    k = F.col("o_orderkey")
    p = F.col("o_totalprice")
    return (
        change(k % 7 == 0, "U", 1, k, F.lit("U1"), p + 100)
        .unionByName(change(k % 3 == 0, "U", 2, k, F.lit("U2"), p + 200))
        .unionByName(change(k % 11 == 0, "D", 3, k, F.lit("X"), p))
        .unionByName(change((k % 13 == 0) & (k % 11 != 0), "U", 3, k, F.lit("U3"), p + 300))
        .unionByName(change((k % 13 == 0) & (k % 11 != 0), "D", 3, k, F.lit("X"), p))
        .unionByName(change(k % 17 == 0, "I", 1, k + 100000000, F.lit("N"), p))
    )


_CDC_FEED_SQL = """
        SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
               round(o_totalprice + 100, 2) AS o_totalprice,
               1 AS change_ts, 'U' AS op
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U2', round(o_totalprice + 200, 2), 2, 'U'
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'X', round(o_totalprice, 2), 3, 'D'
        FROM orders WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U3', round(o_totalprice + 300, 2), 3, 'U'
        FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'X', round(o_totalprice, 2), 3, 'D'
        FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'N', round(o_totalprice, 2), 1, 'I'
        FROM orders WHERE o_orderkey % 17 = 0
"""


def etl_apply_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """Apply a CDC change feed to a base snapshot
    (``maintenance.apply_cdc``): latest change per key wins, final D
    deletes, I inserts new keys, same-timestamp races break D > U.
    The feed is synthesized deterministically from orders (U at ts1 for
    keys %7, a later U at ts2 for %3, D at ts3 for %11, a same-ts U+D
    race at ts3 for %13, and I of fresh keys for %17) so the DuckDB
    twin can rebuild the identical feed and state a full QUALIFY
    replay.  Plan shape: the feed reduces on ONE keyed window bounded
    by feed size; the base never shuffles (broadcast anti-join)."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import apply_cdc

    o = t(spark, sf, "orders")
    base = o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    out = apply_cdc(base, _cdc_feed(o), "o_orderkey")
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


QUERIES["etl_apply_cdc"] = etl_apply_cdc

ORACLES["etl_apply_cdc"] = f"""
    WITH changes AS ({_CDC_FEED_SQL}),
    latest AS (
        SELECT * FROM changes
        QUALIFY row_number() OVER (
            PARTITION BY o_orderkey
            ORDER BY change_ts DESC,
                     CASE op WHEN 'D' THEN 2 WHEN 'U' THEN 1 ELSE 0 END DESC) = 1),
    survivors AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest))
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           o_orderstatus, o_totalprice
    FROM survivors
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
           o_orderstatus, o_totalprice
    FROM latest WHERE op <> 'D'
"""


def etl_incremental_join(spark: SparkSession, sf: str) -> DataFrame:
    """Insert-only join IVM (``maintenance.incremental_join_delta``):
    orders and lineitem each split at 1997-01-01 into old/delta; the
    maintained view = stored old join + the three delta terms
    (dA*B_old, A_old*dB, dA*dB) — the two FULL tables are never joined
    to each other.  The oracle states the IVM identity itself: a full
    recompute of the join aggregate."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        incremental_join_delta,
    )

    o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
    cut = "1997-01-01"
    a_old, a_new = o.where(o.o_orderdate < cut), o.where(o.o_orderdate >= cut)
    b_old, b_new = li.where(li.l_shipdate < cut), li.where(li.l_shipdate >= cut)
    on = o.o_orderkey == li.l_orderkey
    old_join = a_old.join(b_old, a_old.o_orderkey == b_old.l_orderkey)
    delta = incremental_join_delta(
        a_old, a_new, b_old, b_new,
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    full = old_join.unionByName(delta)
    return full.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


QUERIES["etl_incremental_join"] = etl_incremental_join

ORACLES["etl_incremental_join"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_extendedprice), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
"""


def agg_dp_noisy(spark: SparkSession, sf: str) -> DataFrame:
    """Epsilon-DP counting release (``stats.dp_noisy_counts``):
    per-market-segment customer counts plus Laplace(1/eps) noise from
    the deterministic hash-uniform inverse CDF — reproducible releases
    whose exact values the DuckDB twin recomputes (round 6 dp swallows
    cross-libm ulp differences in ln)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import dp_noisy_counts

    c = t(spark, sf, "customer")
    return dp_noisy_counts(c, ["c_mktsegment"], epsilon=0.5)


QUERIES["agg_dp_noisy"] = agg_dp_noisy


def _dp_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    h = md5_int64_sql("'dp-v1|' || c_mktsegment")
    return f"""
        WITH agg AS (
          SELECT c_mktsegment, count(*) AS true_count,
                 ({h}) / 1152921504606846976.0 AS u
          FROM customer GROUP BY 1),
        noised AS (
          SELECT c_mktsegment, true_count,
                 -(1.0 / 0.5) * sign(u - 0.5)
                   * ln(greatest(1e-12, 1.0 - 2.0 * abs(u - 0.5))) AS noise
          FROM agg)
        SELECT c_mktsegment, CAST(true_count AS BIGINT) AS true_count,
               round(noise, 6) AS noise,
               round(true_count + noise, 6) AS noisy_count
        FROM noised
    """


ORACLES["agg_dp_noisy"] = _dp_oracle()


# --- item-item collaborative filtering --------------------------------------


def reco_item_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Item-based CF (Sarwar et al. 2001 / Amazon item-to-item;
    ``operators/reco.py``): top-3 cosine co-purchase neighbors per part
    over order baskets.  The self-join is keyed per basket (quadratic
    in BASKET size only, guarded by ``max_basket_items``); support
    joins broadcast; the rank window is bounded per item.  Restricted
    to parts in >= 3 baskets so the result is stable and compact."""
    from image_matadata_batchprocessing_aws_spark.operators.reco import (
        item_cooccurrence_topk,
    )

    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    out = item_cooccurrence_topk(
        li, "l_orderkey", "l_partkey", k=3, min_pair_count=2
    )
    return out.where(F.col("pair_count") >= 2).select(
        F.col("item").cast("long").alias("item"),
        F.col("neighbor").cast("long").alias("neighbor"),
        "pair_count", "cosine",
        F.col("rank").cast("long").alias("rank"),
    )


QUERIES["reco_item_cooccurrence"] = reco_item_cooccurrence

ORACLES["reco_item_cooccurrence"] = """
    WITH pairs AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    support AS (SELECT i, count(*) AS n FROM pairs GROUP BY 1),
    co AS (
        SELECT a.i AS item_a, b.i AS item_b, count(*) AS pair_count
        FROM pairs a JOIN pairs b ON a.b = b.b AND a.i < b.i
        GROUP BY 1, 2 HAVING count(*) >= 2),
    directed AS (
        SELECT item_a, item_b, pair_count FROM co
        UNION ALL
        SELECT item_b, item_a, pair_count FROM co),
    scored AS (
        SELECT d.item_a, d.item_b, d.pair_count,
               round(d.pair_count / sqrt(sa.n * sb.n), 6) AS cosine
        FROM directed d
        JOIN support sa ON d.item_a = sa.i
        JOIN support sb ON d.item_b = sb.i),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY item_a
            ORDER BY cosine DESC, pair_count DESC, item_b ASC) AS rank
        FROM scored)
    SELECT CAST(item_a AS BIGINT) AS item, CAST(item_b AS BIGINT) AS neighbor,
           CAST(pair_count AS BIGINT) AS pair_count, cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
"""


# --- SCD2 history build, bounded BFS, marketing attribution -----------------


def etl_scd2_build(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 SCD history from the shared CDC feed
    (``maintenance.scd2_from_feed``, the type-2 companion of
    ``etl_apply_cdc``): each I/U opens a version valid [ts, next ts);
    deletes close history without opening; same-ts races order
    I < U < D.  One keyed window over the feed — the dimension table is
    never touched.  The twin states the identical lead() replay."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        scd2_from_feed,
    )

    o = t(spark, sf, "orders")
    hist = scd2_from_feed(_cdc_feed(o), "o_orderkey")
    return hist.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        F.col("is_current").cast("boolean").alias("is_current"),
    )


QUERIES["etl_scd2_build"] = etl_scd2_build

ORACLES["etl_scd2_build"] = f"""
    WITH changes AS ({_CDC_FEED_SQL}),
    closed AS (
        SELECT *, lead(change_ts) OVER (
            PARTITION BY o_orderkey
            ORDER BY change_ts ASC,
                     CASE op WHEN 'D' THEN 2 WHEN 'U' THEN 1 ELSE 0 END ASC
        ) AS valid_to
        FROM changes)
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
           o_totalprice,
           CAST(change_ts AS BIGINT) AS valid_from,
           CAST(valid_to AS BIGINT) AS valid_to,
           valid_to IS NULL AS is_current
    FROM closed WHERE op <> 'D'
"""


BFS_MAX_DEPTH = 3
BFS_N_SOURCES = 5


def graph_bfs_levels(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-depth BFS (``graph.bfs_levels``) from the first
    {BFS_N_SOURCES} customers over the bidirectional customer-supplier
    graph (the same edges PageRank walks): per level, node count and an
    id checksum.  Frontier expansion expands each vertex at most once
    (anti-join against visited), so total work is O(reachable edges);
    the oracle is a depth-guarded recursive CTE taking min(dist)."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import bfs_levels

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # every BFS round joins the frontier against this edge plan —
    # materialize the orders⋈lineitem build once (r08; the
    # graph_closeness_sampled move)
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    ).localCheckpoint(eager=False)
    sources = (
        t(spark, sf, "customer")
        .where(F.col("c_custkey") <= BFS_N_SOURCES)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    visited = bfs_levels(edges, sources, max_depth=BFS_MAX_DEPTH)
    return visited.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("node_checksum"),
    ).select(F.col("dist").cast("long").alias("dist"), "n_nodes", "node_checksum")


QUERIES["graph_bfs_levels"] = graph_bfs_levels

ORACLES["graph_bfs_levels"] = f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s, c FROM pairs),
    bfs(node, d) AS (
        SELECT c_custkey * 2, 0 FROM customer WHERE c_custkey <= {BFS_N_SOURCES}
        UNION
        SELECT e.dst, b.d + 1
        FROM bfs b JOIN edges e ON b.node = e.src
        WHERE b.d < {BFS_MAX_DEPTH}),
    m AS (SELECT node, min(d) AS dist FROM bfs GROUP BY 1)
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS node_checksum
    FROM m GROUP BY 1
"""


ATTR_WINDOW_DAYS = 7


def agg_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """First-touch / last-touch marketing attribution: every purchase
    joins its user's click/view/signup touches in the prior
    {ATTR_WINDOW_DAYS} days (keyed on user, so the quadratic term is
    per-user activity, not corpus size); one window per purchase picks
    the first and last touch (ties by event_id); purchases with no
    touch attribute to 'none'.  Output: conversion counts per
    (first_touch, last_touch) pair."""
    from pyspark.sql.window import Window

    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    touches = e.where(F.col("event_type").isin("click", "view", "signup")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("t_type"),
    )
    joined = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")),
        "left",
    )
    w_first = Window.partitionBy("p_id").orderBy(
        F.col("t_ts").asc_nulls_last(), F.col("t_id").asc_nulls_last()
    )
    w_last = Window.partitionBy("p_id").orderBy(
        F.col("t_ts").desc_nulls_last(), F.col("t_id").desc_nulls_last()
    )
    attributed = (
        joined.withColumn("first_touch", F.first("t_type").over(w_first))
        .withColumn("last_touch", F.first("t_type").over(w_last))
        .groupBy("p_id", "first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        attributed.select(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).cast("long").alias("conversions"))
    )


QUERIES["agg_attribution"] = agg_attribution

ORACLES["agg_attribution"] = f"""
    WITH purchases AS (
        SELECT user_id AS p_user, event_id AS p_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    touches AS (
        SELECT user_id AS t_user, event_id AS t_id, ts AS t_ts,
               event_type AS t_type
        FROM events
        WHERE event_type IN ('click', 'view', 'signup') AND user_id IS NOT NULL),
    ranked AS (
        SELECT p.p_id, t.t_type,
               row_number() OVER (PARTITION BY p.p_id
                   ORDER BY t.t_ts ASC NULLS LAST, t.t_id ASC NULLS LAST) AS rf,
               row_number() OVER (PARTITION BY p.p_id
                   ORDER BY t.t_ts DESC NULLS LAST, t.t_id DESC NULLS LAST) AS rl
        FROM purchases p
        LEFT JOIN touches t
          ON p.p_user = t.t_user
         AND t.t_ts < p.p_ts
         AND t.t_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY),
    attributed AS (
        SELECT p_id,
               max(CASE WHEN rf = 1 THEN t_type END) AS first_touch,
               max(CASE WHEN rl = 1 THEN t_type END) AS last_touch
        FROM ranked GROUP BY 1)
    SELECT coalesce(first_touch, 'none') AS first_touch,
           coalesce(last_touch, 'none') AS last_touch,
           CAST(count(*) AS BIGINT) AS conversions
    FROM attributed GROUP BY 1, 2
"""


# --- REAL TIFF decode with a closed-form oracle -----------------------------

TIFF_N_DOCS = 30


def multimodal_tiff_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL baseline-TIFF decoding, oracle-checked (extends the codec
    family to its 6th format; the header sniffer already walks TIFF
    IFDs as JVM exprs — this is the Arrow-stage decode): solid and
    vertical-gradient fixtures rotate through uncompressed / LZW /
    PackBits compression, both predictors, and both byte orders, so
    every strip codec and the horizontal-differencing inverse run
    through the full ``mapInPandas`` pipeline; per-channel pixel sums
    after the integral resize are closed forms (TIFF is lossless)."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.multimodal.tiff import encode_tiff
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    rows = []
    for doc_id in range(TIFF_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        v = (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = v
        if doc_id % 2 == 1:
            base = doc_id % 20
            img[:, :, 1] = (base + np.arange(h, dtype=np.int64))[:, None] % 256
        enc = encode_tiff(
            img,
            compression=(1, 5, 32773)[doc_id % 3],
            predictor=1 + (doc_id // 3) % 2,
            big_endian=doc_id % 5 == 0,
        )
        rows.append((doc_id, f"{doc_id}.tiff", bytearray(enc)))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    decoded = decode_images(entries, use_real_codec=True, normalize=False)

    def chan_sum(c: int):
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id",
        F.col("channels").cast("long").alias("channels"),
        F.col("height").cast("long").alias("height"),
        F.col("width").cast("long").alias("width"),
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_tiff_decode"] = multimodal_tiff_decode


def _tiff_oracle() -> str:
    values = []
    for doc_id in range(TIFF_N_DOCS):
        _h, _w, r_sum, g_sum, b_sum = _webp_expected(doc_id)  # same fixture math
        values.append(f"({doc_id}, {r_sum}, {g_sum}, {b_sum})")
    return f"""
        SELECT doc_id,
               CAST(3 AS BIGINT) AS channels,
               CAST(224 AS BIGINT) AS height,
               CAST(224 AS BIGINT) AS width,
               CAST(r_sum AS BIGINT) AS r_sum,
               CAST(g_sum AS BIGINT) AS g_sum,
               CAST(b_sum AS BIGINT) AS b_sum
        FROM (VALUES {", ".join(values)}) AS t(doc_id, r_sum, g_sum, b_sum)
    """


ORACLES["multimodal_tiff_decode"] = _tiff_oracle()


# --- top navigation paths (session trigrams) --------------------------------

PATHS_GAP_MIN = 30
PATHS_TOPK = 15


def agg_top_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top event-type trigram journeys across gap-based sessions
    (``timeseries.sessionize`` + two lead() steps): the product-analytics
    'common navigation paths' report.  Sessionize, lead(1)/lead(2)
    within (user, session) on the SAME (key, order) sort — Catalyst
    plans one exchange for all three window expressions — then a
    partial-agg count and a deterministic top-k.  The twin restates the
    islands sessionization and leads in ANSI SQL."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import sessionize

    from pyspark.sql.window import Window as W

    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    s = sessionize(e, "user_id", "ts", "event_id", gap_minutes=PATHS_GAP_MIN)
    w = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    tri = (
        s.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path"),
        )
    )
    counts = tri.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return counts.orderBy(F.col("n").desc(), "path").limit(PATHS_TOPK)


QUERIES["agg_top_paths"] = agg_top_paths

ORACLES["agg_top_paths"] = f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > {PATHS_GAP_MIN} * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
      FROM events WHERE user_id IS NOT NULL),
    sess AS (
      SELECT *, sum(new_s) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM ev),
    tri AS (
      SELECT event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS path,
             lead(event_type, 2) OVER w AS e3
      FROM sess
      WINDOW w AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)),
    counts AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE e3 IS NOT NULL GROUP BY 1)
    SELECT path, n FROM counts ORDER BY n DESC, path LIMIT {PATHS_TOPK}
"""


# --- multimodal curation flagship -------------------------------------------

MM_CURATE_N = 40


def _mm_curate_expected():
    """(format, n_files, n_decoded, n_unique_pixels) closed forms, plus
    an '__all__' row whose global distinct count is far below the
    per-format sum — the cross-format collapse the pixel-level dedup
    exists for.  Construction: doc d gets format d%5 of (png, gif, bmp,
    tiff, webp); pixel content is a solid color keyed by d%7
    (gcd(7,5)=1, so every color appears in several formats); every 8th
    doc is truncated to 3 bytes (decode-error row)."""
    per_fmt = {}
    all_colors = set()
    fmts = ("png", "gif", "bmp", "tiff", "webp")
    for d in range(MM_CURATE_N):
        f = fmts[d % 5]
        per_fmt.setdefault(f, {"n_files": 0, "n_ok": 0, "colors": set()})
        per_fmt[f]["n_files"] += 1
        if d % 8 == 0:
            continue  # corrupt
        per_fmt[f]["n_ok"] += 1
        per_fmt[f]["colors"].add(d % 7)
        all_colors.add(d % 7)
    out = {
        f: (v["n_files"], v["n_ok"], len(v["colors"])) for f, v in per_fmt.items()
    }
    out["__all__"] = (
        MM_CURATE_N,
        sum(v["n_ok"] for v in per_fmt.values()),
        len(all_colors),
    )
    return out


def pipeline_multimodal_curation(spark: SparkSession, sf: str) -> DataFrame:
    """FLAGSHIP multimodal curation: mixed-format corpus (PNG / GIF /
    BMP / TIFF / lossless-WEBP from the five pure-python encoders, with
    planted cross-format duplicate pixel content and corrupt members)
    -> REAL decode through the Arrow pipeline with per-row error
    isolation -> pixel-level exact dedup (md5 of the decoded tensor, so
    a PNG and a TIFF of the same image collapse — byte-level hashing
    cannot do that) -> per-format curation report plus an '__all__'
    row whose global distinct count sits far below the per-format sum,
    proving the cross-format collapse happened.  The oracle states the
    construction's closed forms."""
    import hashlib

    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        encode_gif,
        encode_bmp,
        encode_png,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.multimodal.tiff import encode_tiff
    from image_matadata_batchprocessing_aws_spark.multimodal.webp import (
        encode_webp_lossless,
    )

    encoders = {
        "png": lambda im: encode_png(im, interlace=True),
        "gif": encode_gif,
        "bmp": encode_bmp,
        "tiff": lambda im: encode_tiff(im, compression=5, predictor=2),
        "webp": encode_webp_lossless,
    }
    fmts = ("png", "gif", "bmp", "tiff", "webp")
    rows = []
    for d in range(MM_CURATE_N):
        fmt = fmts[d % 5]
        v = d % 7
        img = np.full((16, 16, 3), (v * 20, 255 - v * 20, v), dtype=np.uint8)
        blob = encoders[fmt](img)
        if d % 8 == 0:
            blob = blob[:3]  # corrupt member
        rows.append((d, fmt, f"{d}.{fmt}", bytearray(blob)))
    entries = spark.createDataFrame(
        rows, "doc_id long, fmt string, entry_name string, content binary"
    )
    decoded = decode_images(
        entries.select("entry_name", "content"), use_real_codec=True, normalize=False
    )
    keyed = decoded.join(
        entries.select("fmt", F.col("entry_name").alias("file_name")), "file_name"
    )
    def report_for(frame, label_col):
        counts = frame.groupBy(label_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(F.col("decode_error").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_decoded"),
        )
        uniq = (
            frame.where(F.col("decode_error").isNull())
            .withColumn("pixel_hash", F.md5(F.to_json(F.col("image"))))
            .groupBy(label_col)
            .agg(F.countDistinct("pixel_hash").cast("long").alias("n_unique_pixels"))
        )
        return counts.join(uniq, label_col)

    per_fmt = report_for(keyed, "fmt")
    overall = report_for(keyed.withColumn("fmt", F.lit("__all__")), "fmt")
    return per_fmt.unionByName(overall).select(
        "fmt", "n_files", "n_decoded", "n_unique_pixels"
    )


QUERIES["pipeline_multimodal_curation"] = pipeline_multimodal_curation


def _mm_curate_oracle() -> str:
    rows = [
        f"('{f}', {a}, {b}, {c})" for f, (a, b, c) in sorted(_mm_curate_expected().items())
    ]
    return f"""
        SELECT fmt, CAST(n_files AS BIGINT) AS n_files,
               CAST(n_decoded AS BIGINT) AS n_decoded,
               CAST(n_unique_pixels AS BIGINT) AS n_unique_pixels
        FROM (VALUES {", ".join(rows)}) AS t(fmt, n_files, n_decoded, n_unique_pixels)
    """


ORACLES["pipeline_multimodal_curation"] = _mm_curate_oracle()


# --- one-pass data-quality expectations suite -------------------------------


def etl_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Deequ-style constraint suite over orders (``audit.
    expectations_report``): seven heterogeneous rules (nullability,
    uniqueness, range, set membership, regex shape, row floor) checked
    in ONE aggregate pass; the twin recomputes each violation count with
    the same semantics (regex kept RE2/Java-common)."""
    from image_matadata_batchprocessing_aws_spark.operators.audit import (
        expectations_report,
    )

    o = t(spark, sf, "orders")
    rules = [
        ("not_null", "o_custkey"),
        ("unique", "o_orderkey"),
        ("unique", "o_orderpriority"),  # priorities repeat -> violations > 0
        ("in_range", "o_totalprice", 0.0, 400000.0),
        ("in_set", "o_orderstatus", ["F", "O", "P"]),
        ("matches", "o_orderpriority", "^[1-5]-[A-Z ]+$"),
        ("min_rows", 1000000),  # deliberately above sf0.01 -> shortfall
    ]
    return expectations_report(o, rules).select(
        "rule", "column",
        F.col("violations").cast("long").alias("violations"),
        "passed",
    )


QUERIES["etl_expectations"] = etl_expectations

ORACLES["etl_expectations"] = """
    WITH agg AS (
      SELECT
        count(CASE WHEN o_custkey IS NULL THEN 1 END) AS v0,
        count(o_orderkey) - count(DISTINCT o_orderkey) AS v1,
        count(o_orderpriority) - count(DISTINCT o_orderpriority) AS v2,
        count(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 400000.0
                   THEN 1 END) AS v3,
        count(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                     OR o_orderstatus IS NULL THEN 1 END) AS v4,
        count(CASE WHEN o_orderpriority IS NOT NULL
                    AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                   THEN 1 END) AS v5,
        greatest(0, 1000000 - count(*)) AS v6
      FROM orders)
    SELECT t.rule, t.col AS "column", CAST(t.v AS BIGINT) AS violations,
           t.v = 0 AS passed
    FROM agg, LATERAL (
      VALUES ('not_null', 'o_custkey', v0),
             ('unique', 'o_orderkey', v1),
             ('unique', 'o_orderpriority', v2),
             ('in_range', 'o_totalprice', v3),
             ('in_set', 'o_orderstatus', v4),
             ('matches', 'o_orderpriority', v5),
             ('min_rows', '*', v6)) AS t(rule, col, v)
"""


EXIF_N_DOCS = 40


def multimodal_exif(spark: SparkSession, sf: str) -> DataFrame:
    """EXIF metadata extraction, oracle-checked — the reference's
    namesake capability taken in-band: the reference joins a side CSV
    of per-image metadata (SURVEY section 3.1); real camera files carry
    that metadata as an APP1/TIFF IFD tree inside the JPEG, and this
    query reads it there.  Fixtures are genuine JPEGs (the pure-python
    baseline encoder) with conforming APP1 segments built from
    parametric tags — both byte orders rotate (doc_id % 4 == 0 -> MM),
    every 10th file carries no EXIF at all (nulls are data, not
    errors).  The distributed stage is the Arrow ``mapInPandas`` IFD
    walker; the oracle recomputes every tag from the fixture closed
    forms, with textually identical rational->double arithmetic so
    doubles match bit-for-bit."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_jpeg
    from image_matadata_batchprocessing_aws_spark.multimodal.exif import (
        build_exif_app1,
        extract_exif,
        inject_app1,
    )

    carrier = encode_jpeg(np.full((16, 16, 3), 128, np.uint8))
    rows = []
    for d in range(EXIF_N_DOCS):
        if d % 10 == 9:
            content = carrier
        else:
            app1 = build_exif_app1(
                make=f"Maker-{d % 5}",
                model=f"Model-{d % 7}",
                orientation=1 + d % 8,
                datetime_original=f"2023:01:{d % 28 + 1:02d} 10:00:00",
                pixel_x=640 + 2 * d,
                pixel_y=480 + d,
                iso=100 * (1 + d % 16),
                f_number=(14 + d % 40, 10),
                exposure_time=(1, 30 + d),
                focal_length=(180 + 5 * d, 10),
                gps_lat=("N" if d % 2 == 0 else "S", d % 90, (d * 3) % 60, ((d * 7) % 600, 10)),
                gps_lon=("W" if d % 3 == 0 else "E", (d * 2) % 180, (d * 5) % 60, ((d * 11) % 600, 10)),
                big_endian=d % 4 == 0,
            )
            content = inject_app1(carrier, app1)
        rows.append((d, f"{d}.jpg", bytearray(content)))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    meta = extract_exif(entries)
    out = meta.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    return out.select(
        "doc_id",
        "make",
        "model",
        F.col("orientation").cast("long").alias("orientation"),
        "datetime_original",
        F.col("exif_width").alias("exif_w"),
        F.col("exif_height").alias("exif_h"),
        F.col("iso").cast("long").alias("iso"),
        "f_number",
        "exposure_time",
        "focal_length",
        "gps_lat",
        "gps_lon",
    )


QUERIES["multimodal_exif"] = multimodal_exif

ORACLES["multimodal_exif"] = """
    WITH d AS (SELECT range AS doc_id FROM range(0, 40)),
    v AS (
      SELECT doc_id, doc_id % 10 = 9 AS noexif,
        (doc_id % 90) / 1.0
          + ((doc_id * 3) % 60) / 1.0 / 60.0
          + ((doc_id * 7) % 600) / 10.0 / 3600.0 AS latv,
        ((doc_id * 2) % 180) / 1.0
          + ((doc_id * 5) % 60) / 1.0 / 60.0
          + ((doc_id * 11) % 600) / 10.0 / 3600.0 AS lonv
      FROM d)
    SELECT doc_id,
      CASE WHEN noexif THEN NULL
           ELSE 'Maker-' || CAST(doc_id % 5 AS VARCHAR) END AS make,
      CASE WHEN noexif THEN NULL
           ELSE 'Model-' || CAST(doc_id % 7 AS VARCHAR) END AS model,
      CASE WHEN noexif THEN NULL ELSE 1 + doc_id % 8 END AS orientation,
      CASE WHEN noexif THEN NULL
           ELSE '2023:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                || ' 10:00:00' END AS datetime_original,
      CASE WHEN noexif THEN NULL ELSE 640 + 2 * doc_id END AS exif_w,
      CASE WHEN noexif THEN NULL ELSE 480 + doc_id END AS exif_h,
      CASE WHEN noexif THEN NULL ELSE 100 * (1 + doc_id % 16) END AS iso,
      CASE WHEN noexif THEN NULL
           ELSE (14 + doc_id % 40) / 10.0 END AS f_number,
      CASE WHEN noexif THEN NULL
           ELSE 1.0 / (30 + doc_id) END AS exposure_time,
      CASE WHEN noexif THEN NULL
           ELSE (180 + 5 * doc_id) / 10.0 END AS focal_length,
      CASE WHEN noexif THEN NULL
           WHEN doc_id % 2 = 0 THEN latv ELSE -latv END AS gps_lat,
      CASE WHEN noexif THEN NULL
           WHEN doc_id % 3 = 0 THEN -lonv ELSE lonv END AS gps_lon
    FROM v
"""


PHASH_N_DOCS = 48


def _phash_fixture_bits(d: int):
    """Target dHash bit pattern for fixture doc ``d``: a family base
    pattern (f = d // 4) with member m >= 1 flipping exactly two
    positions, so families are Hamming cliques at threshold 4 (base vs
    member: 2 bits; member vs member: 4 bits)."""
    import numpy as np

    f, m = d // 4, d % 4
    bits = np.zeros((8, 8), dtype=bool)
    for r in range(8):
        for c in range(8):
            bit = ((f * (r + 3) + c * (c + 1) + r) % 3) == 0
            if m >= 1 and ((r == 2 * m - 1 and c == 3) or (r == 2 * m and c == 6)):
                bit = not bit
            bits[r, c] = bit
    return bits


def multimodal_phash_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash image near-dup grouping, oracle-checked end to
    end: fixture PNGs are 8x18 block images built so the decoded
    pixels' dHash equals a closed-form bit pattern (each 8x9 area block
    is two identical pixels; successive blocks step +/-11 so every
    comparison is strict).  The distributed stages are the real PNG
    decode + dHash ``mapInPandas`` and the 6-band Hamming-LSH join
    (recall pigeonhole-complete at threshold 4); the oracle recomputes
    the hashes from the bit definition and applies the plain
    Hamming<=4 pair predicate — equivalent BY CONSTRUCTION to the
    banded join, so a banding bug shows up as a hash-set mismatch."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.phash import dhash_groups, image_dhash

    rows = []
    for d in range(PHASH_N_DOCS):
        bits = _phash_fixture_bits(d)
        g = np.zeros((8, 9), dtype=np.int64)
        g[:, 0] = 160
        for c in range(8):
            g[:, c + 1] = g[:, c] + np.where(bits[:, c], 11, -11)
        img = np.repeat(g, 2, axis=1).astype(np.uint8)[:, :, None].repeat(3, axis=2)
        rows.append((d, f"{d}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    hashed = image_dhash(entries).join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")), "file_name"
    )
    groups = dhash_groups(hashed, max_hamming=4)
    return (
        hashed.select("doc_id", "hash_hi", "hash_lo")
        .join(groups, "doc_id")
        .select("doc_id", "hash_hi", "hash_lo", "group_id", "group_size")
    )


QUERIES["multimodal_phash_groups"] = multimodal_phash_groups

ORACLES["multimodal_phash_groups"] = """
    WITH d AS (SELECT range AS doc_id FROM range(0, 48)),
    cells AS (
      SELECT d.doc_id, r.rr AS r, c.cc AS c,
        (((doc_id // 4) * (r.rr + 3) + c.cc * (c.cc + 1) + r.rr) % 3) = 0
          AS base_bit
      FROM d, range(0, 8) r(rr), range(0, 8) c(cc)),
    tbits AS (
      SELECT doc_id, r, c,
        CASE WHEN doc_id % 4 >= 1
              AND ((r = 2 * (doc_id % 4) - 1 AND c = 3)
                   OR (r = 2 * (doc_id % 4) AND c = 6))
             THEN NOT base_bit ELSE base_bit END AS bit
      FROM cells),
    hashes AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN bit AND r < 4
                      THEN 1::BIGINT << (31 - (r * 8 + c)) ELSE 0 END)
             AS BIGINT) AS hash_hi,
        CAST(SUM(CASE WHEN bit AND r >= 4
                      THEN 1::BIGINT << (31 - ((r - 4) * 8 + c)) ELSE 0 END)
             AS BIGINT) AS hash_lo
      FROM tbits GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
       AND bit_count(xor(a.hash_hi, b.hash_hi))
           + bit_count(xor(a.hash_lo, b.hash_lo)) <= 4),
    nbrs AS (
      SELECT doc_id, doc_id AS nbr FROM hashes
      UNION ALL SELECT id_a, id_b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    grouped AS (SELECT doc_id, MIN(nbr) AS group_id FROM nbrs GROUP BY doc_id),
    sizes AS (SELECT group_id, COUNT(*) AS group_size FROM grouped GROUP BY group_id)
    SELECT h.doc_id, h.hash_hi, h.hash_lo, g.group_id, s.group_size
    FROM hashes h JOIN grouped g USING (doc_id) JOIN sizes s USING (group_id)
"""


def text_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, A1.1) over
    the documents table — the published heuristics a pretraining
    pipeline applies before dedup, as pure map-side expressions; the
    oracle recomputes every statistic and boolean with the same textual
    arithmetic (rule comparisons run on UNROUNDED doubles in both
    engines).  ``min_stop_hits`` pins to 1 here (published default 2):
    the synthetic vocabulary carries only 'the' from the Gopher stop
    set, and 1 keeps the rule discriminative on this corpus instead of
    constant-false."""
    from image_matadata_batchprocessing_aws_spark.operators.text import add_gopher_rules

    d = add_gopher_rules(t(spark, sf, "documents"), min_stop_hits=1)
    return d.select(
        "doc_id", "n_words", "mean_word_len", "alpha_ratio", "stop_hits",
        "r_word_count", "r_word_len", "r_symbol", "r_bullet", "r_ellipsis",
        "r_alpha", "r_stop", "gopher_pass",
    )


QUERIES["text_gopher_rules"] = text_gopher_rules

ORACLES["text_gopher_rules"] = r"""
    WITH w AS (
      SELECT doc_id, text,
        string_split_regex(trim(text), '\s+') AS toks,
        string_split(text, chr(10)) AS lines
      FROM documents),
    s AS (
      SELECT doc_id,
        len(toks) AS n,
        length(regexp_replace(text, '\s', '', 'g')) / len(toks) AS mean_len,
        (length(text) - length(replace(text, '#', ''))
         + (length(text) - length(replace(text, '...', ''))) / 3)
          / len(toks) AS symbol_ratio,
        len(list_filter(lines, l -> starts_with(l, '- ')
            OR starts_with(l, '* ') OR starts_with(l, '•')))
          / len(lines) AS bullet_ratio,
        len(list_filter(lines, l -> ends_with(l, '...')))
          / len(lines) AS ellipsis_ratio,
        len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
          / len(toks) AS alpha_ratio,
        (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END
         + CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END
        ) AS stop_hits
      FROM w)
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_words,
      round(mean_len, 4) AS mean_word_len,
      round(alpha_ratio, 4) AS alpha_ratio,
      CAST(stop_hits AS BIGINT) AS stop_hits,
      (n >= 50 AND n <= 100000) AS r_word_count,
      (mean_len >= 3.0 AND mean_len <= 10.0) AS r_word_len,
      (symbol_ratio <= 0.1) AS r_symbol,
      (bullet_ratio <= 0.9) AS r_bullet,
      (ellipsis_ratio <= 0.3) AS r_ellipsis,
      (alpha_ratio >= 0.8) AS r_alpha,
      (stop_hits >= 1) AS r_stop,
      ((n >= 50 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
       AND (symbol_ratio <= 0.1) AND (bullet_ratio <= 0.9)
       AND (ellipsis_ratio <= 0.3) AND (alpha_ratio >= 0.8)
       AND (stop_hits >= 1)) AS gopher_pass
    FROM s
"""


def etl_url_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-URL normalization + dedup (the first pass of every
    web-corpus pipeline): each document synthesizes a deterministic
    messy crawl URL — odd docs re-crawl their even sibling's page under
    case variants, an explicit default port, a tracking parameter,
    shuffled query order, and a fragment — and the normalizer must
    canonicalize each pair to one URL.  The oracle re-implements the
    FULL normalization (same RE2-safe regexes, same sort/filter) in
    SQL, not just the expected output."""
    from image_matadata_batchprocessing_aws_spark.operators.urls import add_url_canonical

    d = t(spark, sf, "documents").select("doc_id")
    base = (F.col("doc_id") - F.col("doc_id") % 2).cast("long")
    sid = (base % 50).cast("string")
    bid = base.cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("https://www.site"), sid, F.lit(".example.com:443/docs/"),
            bid, F.lit("?id="), bid, F.lit("&a=1&b=2#top"),
        ),
    ).otherwise(
        F.concat(
            F.lit("HTTPS://WWW.SITE"), sid, F.lit(".Example.COM/docs/"),
            bid, F.lit("?b=2&utm_source=feed&a=1&id="), bid,
        )
    )
    out = add_url_canonical(d.withColumn("url", url))
    return out.select(
        "doc_id", "url", "url_norm", "host", "domain", "url_rank", "n_url_dups"
    )


QUERIES["etl_url_normalize"] = etl_url_normalize

ORACLES["etl_url_normalize"] = r"""
    WITH d AS (
      SELECT doc_id, doc_id - doc_id % 2 AS base FROM documents),
    u AS (
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0
          THEN 'https://www.site' || CAST(base % 50 AS VARCHAR)
               || '.example.com:443/docs/' || CAST(base AS VARCHAR)
               || '?id=' || CAST(base AS VARCHAR) || '&a=1&b=2#top'
          ELSE 'HTTPS://WWW.SITE' || CAST(base % 50 AS VARCHAR)
               || '.Example.COM/docs/' || CAST(base AS VARCHAR)
               || '?b=2&utm_source=feed&a=1&id=' || CAST(base AS VARCHAR)
        END AS url
      FROM d),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
          AS path0,
        regexp_extract(url, '\?([^#]*)', 1) AS query
      FROM u),
    norm AS (
      SELECT doc_id, url,
        scheme,
        lower(regexp_extract(auth, '^([^:]*)', 1)) AS host,
        regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        list_sort(list_filter(string_split(query, '&'),
          x -> NOT (x = '' OR starts_with(x, 'utm_')
                    OR starts_with(x, 'fbclid=') OR x = 'fbclid'
                    OR starts_with(x, 'gclid=') OR x = 'gclid'))) AS params
      FROM parts),
    built AS (
      SELECT doc_id, url, host,
        regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
        scheme || '://' || host
          || CASE WHEN port <> ''
                   AND NOT (scheme = 'http' AND port = '80')
                   AND NOT (scheme = 'https' AND port = '443')
              THEN ':' || port ELSE '' END
          || path
          || CASE WHEN len(params) > 0
              THEN '?' || array_to_string(params, '&') ELSE '' END AS url_norm
      FROM norm)
    SELECT doc_id, url, url_norm, host, domain,
      CAST(row_number() OVER (PARTITION BY url_norm ORDER BY doc_id)
           AS BIGINT) AS url_rank,
      CAST(count(*) OVER (PARTITION BY url_norm) AS BIGINT) AS n_url_dups
    FROM built
"""


def pipeline_image_curation(spark: SparkSession, sf: str) -> DataFrame:
    """FOURTH flagship — image-corpus curation end to end: genuine
    JPEGs carrying EXIF -> in-band metadata extraction
    (``extract_exif``) + perceptual hashing over the REAL lossy decode
    (``image_dhash``) -> 6-band Hamming-LSH near-dup groups ->
    keep-best survivorship (highest EXIF resolution, doc_id
    tiebreak).  The fixture geometry makes the lossy path exact: every
    dHash cell is one constant 8x8 JPEG block (DC-only, so
    quantization shifts a block's value by <=~2 while comparisons step
    +/-11), hence the decoded dHash still equals the closed-form bit
    pattern and the oracle recomputes the whole pipeline — hashes,
    groups, resolutions, and the survivorship rank — from first
    principles."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_jpeg
    from image_matadata_batchprocessing_aws_spark.multimodal.exif import (
        build_exif_app1,
        extract_exif,
        inject_app1,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.phash import dhash_groups, image_dhash
    from pyspark.sql import Window

    rows = []
    for d in range(PHASH_N_DOCS):
        bits = _phash_fixture_bits(d)
        g = np.zeros((8, 9), dtype=np.int64)
        g[:, 0] = 160
        for c in range(8):
            g[:, c + 1] = g[:, c] + np.where(bits[:, c], 11, -11)
        img = (
            np.repeat(np.repeat(g, 8, axis=0), 8, axis=1)
            .astype(np.uint8)[:, :, None]
            .repeat(3, axis=2)
        )  # 64x72: one constant JPEG block per dHash cell
        jp = encode_jpeg(img, quality=90)
        app1 = build_exif_app1(
            make=f"Maker-{d % 5}",
            model=f"Model-{d % 7}",
            orientation=1,
            datetime_original="2023:01:01 00:00:00",
            pixel_x=800 + 100 * ((d * 5) % 9),
            pixel_y=600,
            iso=100,
            f_number=(28, 10),
            exposure_time=(1, 125),
            focal_length=(350, 10),
            gps_lat=("N", 0, 0, (0, 1)),
            gps_lon=("E", 0, 0, (0, 1)),
            big_endian=d % 2 == 0,
        )
        rows.append((d, f"{d}.jpg", bytearray(inject_app1(jp, app1))))
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )
    ids = entries.select("doc_id", F.col("entry_name").alias("file_name"))
    hashed = image_dhash(entries).join(ids, "file_name")
    groups = dhash_groups(hashed, max_hamming=4)
    meta = (
        extract_exif(entries)
        .join(ids, "file_name")
        .select(
            "doc_id",
            (F.col("exif_width") * F.col("exif_height")).alias("resolution"),
        )
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("resolution").desc(), F.col("doc_id")
    )
    return (
        groups.join(meta, "doc_id")
        .withColumn("pick", F.row_number().over(w))
        .select(
            "doc_id",
            "group_id",
            "group_size",
            "resolution",
            (F.col("pick") == 1).alias("keep"),
        )
    )


QUERIES["pipeline_image_curation"] = pipeline_image_curation

ORACLES["pipeline_image_curation"] = """
    WITH d AS (SELECT range AS doc_id FROM range(0, 48)),
    cells AS (
      SELECT d.doc_id, r.rr AS r, c.cc AS c,
        (((doc_id // 4) * (r.rr + 3) + c.cc * (c.cc + 1) + r.rr) % 3) = 0
          AS base_bit
      FROM d, range(0, 8) r(rr), range(0, 8) c(cc)),
    tbits AS (
      SELECT doc_id, r, c,
        CASE WHEN doc_id % 4 >= 1
              AND ((r = 2 * (doc_id % 4) - 1 AND c = 3)
                   OR (r = 2 * (doc_id % 4) AND c = 6))
             THEN NOT base_bit ELSE base_bit END AS bit
      FROM cells),
    hashes AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN bit AND r < 4
                      THEN 1::BIGINT << (31 - (r * 8 + c)) ELSE 0 END)
             AS BIGINT) AS hash_hi,
        CAST(SUM(CASE WHEN bit AND r >= 4
                      THEN 1::BIGINT << (31 - ((r - 4) * 8 + c)) ELSE 0 END)
             AS BIGINT) AS hash_lo
      FROM tbits GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
       AND bit_count(xor(a.hash_hi, b.hash_hi))
           + bit_count(xor(a.hash_lo, b.hash_lo)) <= 4),
    nbrs AS (
      SELECT doc_id, doc_id AS nbr FROM hashes
      UNION ALL SELECT id_a, id_b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    grouped AS (SELECT doc_id, MIN(nbr) AS group_id FROM nbrs GROUP BY doc_id),
    sizes AS (SELECT group_id, COUNT(*) AS group_size FROM grouped GROUP BY group_id),
    res AS (
      SELECT doc_id, (800 + 100 * ((doc_id * 5) % 9)) * 600 AS resolution
      FROM d)
    SELECT g.doc_id, g.group_id, s.group_size, r.resolution,
      row_number() OVER (PARTITION BY g.group_id
                         ORDER BY r.resolution DESC, g.doc_id) = 1 AS keep
    FROM grouped g JOIN sizes s USING (group_id) JOIN res r USING (doc_id)
"""


WEB_DOMAIN_QUOTA = 5


def pipeline_web_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Web-corpus curation funnel (the C4/RefinedWeb front half) as one
    lazy plan: synthesized crawl URLs (odd docs re-crawl their even
    sibling under case/port/tracking variants) -> canonical-URL dedup
    (keep rank 1) -> Gopher quality rules -> per-domain quota (cap 5,
    picked by the house md5 hash so the cut is deterministic and
    rerun-stable) -> per-domain funnel report.  The oracle recomputes
    every stage from the fixture construction; it relies on two facts
    the SIBLING queries prove exactly — ``etl_url_normalize`` (the full
    normalization in SQL: the even sibling is the canonical keeper)
    and ``text_gopher_rules`` (symbol/bullet/ellipsis rules are
    constant-true on this corpus, so the funnel applies the four
    discriminative rules).  If the driver corpus ever grows symbols or
    newlines this oracle fails loudly rather than silently."""
    from pyspark.sql import Window

    from image_matadata_batchprocessing_aws_spark.functions import md5_int64
    from image_matadata_batchprocessing_aws_spark.operators.text import add_gopher_rules
    from image_matadata_batchprocessing_aws_spark.operators.urls import add_url_canonical

    d = t(spark, sf, "documents").select("doc_id", "text")
    base = (F.col("doc_id") - F.col("doc_id") % 2).cast("long")
    sid = (base % 50).cast("string")
    bid = base.cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("https://www.site"), sid, F.lit(".example.com:443/docs/"),
            bid, F.lit("?id="), bid, F.lit("&a=1&b=2#top"),
        ),
    ).otherwise(
        F.concat(
            F.lit("HTTPS://WWW.SITE"), sid, F.lit(".Example.COM/docs/"),
            bid, F.lit("?b=2&utm_source=feed&a=1&id="), bid,
        )
    )
    crawled = add_url_canonical(d.withColumn("url", url))
    canonical = crawled.where(F.col("url_rank") == 1)
    quality = add_gopher_rules(canonical, min_stop_hits=1)
    passed = quality.where(F.col("gopher_pass"))
    w = Window.partitionBy("host").orderBy(
        md5_int64(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    kept = passed.withColumn("qrank", F.row_number().over(w)).where(
        F.col("qrank") <= WEB_DOMAIN_QUOTA
    )
    report = (
        crawled.groupBy("host")
        .agg(F.count("*").alias("n_crawled"))
        .join(
            canonical.groupBy("host").agg(F.count("*").alias("n_canonical")),
            "host",
        )
        .join(
            passed.groupBy("host").agg(F.count("*").alias("n_quality")),
            "host",
            "left",
        )
        .join(kept.groupBy("host").agg(F.count("*").alias("n_kept")), "host", "left")
    )
    return report.select(
        "host",
        "n_crawled",
        "n_canonical",
        F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


QUERIES["pipeline_web_corpus"] = pipeline_web_corpus

from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql as _md5_64

ORACLES["pipeline_web_corpus"] = rf"""
    WITH d AS (
      SELECT doc_id, text, doc_id - doc_id % 2 AS base FROM documents),
    u AS (
      SELECT doc_id, text,
        'www.site' || CAST(base % 50 AS VARCHAR) || '.example.com' AS host,
        doc_id % 2 = 0 AS is_canonical
      FROM d),
    quality AS (
      SELECT doc_id, host,
        len(string_split_regex(trim(text), '\s+')) AS n,
        length(regexp_replace(text, '\s', '', 'g'))
          / len(string_split_regex(trim(text), '\s+')) AS mean_len,
        len(list_filter(string_split_regex(trim(text), '\s+'),
            x -> regexp_matches(x, '[a-zA-Z]')))
          / len(string_split_regex(trim(text), '\s+')) AS alpha_ratio,
        CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'the')
             THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'be')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'to')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'of')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'and')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'that')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'have')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split_regex(trim(text), '\s+'), 'with')
               THEN 1 ELSE 0 END AS stop_hits
      FROM u WHERE is_canonical),
    passed AS (
      SELECT doc_id, host FROM quality
      WHERE n >= 50 AND n <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
        AND alpha_ratio >= 0.8 AND stop_hits >= 1),
    kept AS (
      SELECT doc_id, host FROM (
        SELECT doc_id, host,
          row_number() OVER (PARTITION BY host
            ORDER BY {_md5_64("CAST(doc_id AS VARCHAR)")}, doc_id) AS qrank
        FROM passed)
      WHERE qrank <= {WEB_DOMAIN_QUOTA})
    SELECT u.host,
      CAST(count(*) AS BIGINT) AS n_crawled,
      CAST(count(*) FILTER (WHERE u.is_canonical) AS BIGINT) AS n_canonical,
      CAST(count(p.doc_id) AS BIGINT) AS n_quality,
      CAST(count(k.doc_id) AS BIGINT) AS n_kept
    FROM u
    LEFT JOIN passed p ON u.doc_id = p.doc_id
    LEFT JOIN kept k ON u.doc_id = k.doc_id
    GROUP BY u.host
"""


def text_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    """HTML-to-text extraction, oracle-checked byte for byte: each
    document wraps into a synthetic page (title, style + script blocks
    with angle brackets and quotes planted inside, headings, block
    tags, a list with ``&amp;``/``&lt;`` entities, ``<br/>``), the
    RE2-safe rule chain reduces it to visible text, and the DuckDB twin
    runs the IDENTICAL chain generated from the same ``HTML_RULES``
    table — a regex-dialect divergence shows up as a value mismatch."""
    from image_matadata_batchprocessing_aws_spark.operators.html import html_to_text

    d = t(spark, sf, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>D"), did,
        F.lit("</title><style>p { color: #333; }</style>"),
        F.lit('<script type="text/javascript">if (a < b && c > d) { alert("x&y"); }</script>'),
        F.lit("</head><body><h1>Doc "), did,
        F.lit('</h1><div class="main"><p>'), F.col("text"),
        F.lit("</p></div><ul><li>alpha &amp; beta</li><li>a &lt; b</li></ul>"),
        F.lit("<br/>footer</body></html>"),
    )
    out = d.withColumn("extracted", html_to_text(html))
    return out.select(
        "doc_id",
        "extracted",
        F.length("extracted").alias("n_chars"),
        (F.size(F.split(F.col("extracted"), "\n")) ).cast("long").alias("n_lines"),
    )


QUERIES["text_html_extract"] = text_html_extract


def _html_extract_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.html import html_to_text_sql

    html = (
        "'<html><head><title>D' || CAST(doc_id AS VARCHAR)"
        " || '</title><style>p { color: #333; }</style>'"
        " || '<script type=\"text/javascript\">"
        "if (a < b && c > d) { alert(\"x&y\"); }</script>'"
        " || '</head><body><h1>Doc ' || CAST(doc_id AS VARCHAR)"
        " || '</h1><div class=\"main\"><p>' || text"
        " || '</p></div><ul><li>alpha &amp; beta</li>"
        "<li>a &lt; b</li></ul>'"
        " || '<br/>footer</body></html>'"
    )
    extracted = html_to_text_sql(html)
    return f"""
    WITH e AS (SELECT doc_id, {extracted} AS extracted FROM documents)
    SELECT doc_id, extracted,
      CAST(length(extracted) AS BIGINT) AS n_chars,
      CAST(len(string_split(extracted, chr(10))) AS BIGINT) AS n_lines
    FROM e
    """


ORACLES["text_html_extract"] = _html_extract_oracle()


SCENE_N_VIDEOS = 3
SCENE_N_FRAMES = 24
SCENE_LEN = 8


def multimodal_video_scenes(spark: SparkSession, sf: str) -> DataFrame:
    """Scene-change detection over REAL video decode, oracle-checked:
    MJPEG AVIs of solid frames whose luminance drifts <=2/frame within
    a scene and jumps 60 at every ``SCENE_LEN``-th frame.  Each frame
    is DC-only JPEG blocks, so decode error stays within a couple of
    gray levels and the cut/no-cut margins (60 vs 30 vs <=~8) are
    structural — the oracle recomputes the scene layout from the
    fixture formula.  Decode+signature is the Arrow stage; the
    temporal lag/threshold/running-scene-count logic is one keyed
    Spark window."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.video import (
        detect_scene_cuts,
        encode_avi_mjpeg,
        video_frame_signatures,
    )

    rows = []
    for v in range(SCENE_N_VIDEOS):
        frames = []
        for tt in range(SCENE_N_FRAMES):
            val = 40 + 10 * v + 60 * (tt // SCENE_LEN) + (tt % SCENE_LEN) % 3
            frames.append(np.full((16, 16, 3), val, np.uint8))
        rows.append((v, f"{v}.avi", bytearray(encode_avi_mjpeg(frames, quality=90))))
    videos = spark.createDataFrame(
        rows, "video_id long, file_name string, content binary"
    )
    sigs = video_frame_signatures(videos, every_n=1, max_frames=SCENE_N_FRAMES)
    cuts = detect_scene_cuts(sigs, threshold=30.0)
    return cuts.join(
        videos.select("video_id", "file_name"), "file_name"
    ).select(
        "video_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "is_cut",
        F.col("scene_id").cast("long").alias("scene_id"),
    )


QUERIES["multimodal_video_scenes"] = multimodal_video_scenes

ORACLES["multimodal_video_scenes"] = f"""
    SELECT v.range AS video_id,
      t.range AS frame_idx,
      (t.range > 0 AND t.range % {SCENE_LEN} = 0) AS is_cut,
      t.range // {SCENE_LEN} AS scene_id
    FROM range(0, {SCENE_N_VIDEOS}) v, range(0, {SCENE_N_FRAMES}) t
"""


LINE_TOKENS = 3


def text_line_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher line-grain repetition filters (Rae et al. 2021 A1.2) over
    a multi-line corpus built deterministically from ``documents``: each
    text reshapes into ``LINE_TOKENS``-token lines and the first line is
    re-appended ``doc_id % 3`` times, so duplicate-line and
    duplicate-char fractions vary structurally per doc and the oracle
    recomputes the identical construction."""
    from image_matadata_batchprocessing_aws_spark.operators.text import line_repetition_stats

    d = t(spark, sf, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    n_ln = F.ceil(F.size(toks) / F.lit(float(LINE_TOKENS))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_ln - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS)
        ),
    )
    planted = F.concat(
        lines,
        F.array_repeat(
            F.element_at(lines, 1), (F.col("doc_id") % 3).cast("int")
        ),
    )
    multi = d.select("doc_id", F.concat_ws("\n", planted).alias("text"))
    return line_repetition_stats(multi).select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac"
    )


QUERIES["text_line_repetition"] = text_line_repetition

ORACLES["text_line_repetition"] = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), built AS (
      SELECT doc_id,
        list_transform(
          range(CAST(ceil(len(tk) / {float(LINE_TOKENS)}) AS INT)),
          i -> array_to_string(
                 list_slice(tk, i*{LINE_TOKENS}+1, i*{LINE_TOKENS}+{LINE_TOKENS}), ' ')
        ) AS ls
      FROM toks
    ), planted AS (
      SELECT doc_id,
        ls || list_transform(range(CAST(doc_id % 3 AS INT)), i -> ls[1]) AS ls
      FROM built
    ), ex AS (
      SELECT doc_id, unnest(ls) AS line FROM planted
    ), per_line AS (
      SELECT doc_id, line, count(*) AS cnt FROM ex GROUP BY doc_id, line
    )
    SELECT doc_id,
      CAST(sum(cnt) AS BIGINT) AS n_lines,
      round((sum(cnt) - count(*)) / CAST(sum(cnt) AS DOUBLE), 4)
        AS dup_line_frac,
      round(sum(CASE WHEN cnt > 1 THEN length(line)*cnt ELSE 0 END)
            / CAST(sum(length(line)*cnt) AS DOUBLE), 4)
        AS dup_line_char_frac
    FROM per_line GROUP BY doc_id
"""


SIL_N_FILES = 3
SIL_BLOCKS = 6
SIL_BLOCK_FRAMES = 5


def multimodal_audio_silence(spark: SparkSession, sf: str) -> DataFrame:
    """VAD-lite silence segmentation over REAL WAV decode,
    oracle-checked: PCM16 fixtures of 1000-sample blocks alternating
    exact silence (zeros) and a constant 8192 amplitude (RMS exactly
    0.25 after the power-of-two mono scaling), framed 25 ms/25 ms at
    8 kHz so frames tile blocks exactly — silent/voiced state per frame
    is structural, and the oracle recomputes the whole segment layout
    from the fixture formula.  Decode+framing is the Arrow stage; the
    temporal run-length logic is one keyed Spark window
    (``audio.detect_silence_segments``)."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        detect_silence_segments,
        encode_wav_pcm16,
        wav_frame_features,
    )

    rows = []
    for v in range(SIL_N_FILES):
        blocks = [
            np.full(1000, 0 if (b + v) % 2 == 0 else 8192, np.int16)
            for b in range(SIL_BLOCKS)
        ]
        rows.append(
            (v, f"{v}.wav", bytearray(encode_wav_pcm16(np.concatenate(blocks), 8000)))
        )
    audio = spark.createDataFrame(
        rows, "audio_id long, file_name string, content binary"
    )
    frames = wav_frame_features(audio, frame_ms=25, hop_ms=25)
    segs = detect_silence_segments(frames, threshold=0.1)
    return segs.join(audio.select("audio_id", "file_name"), "file_name").select(
        "audio_id",
        F.col("segment_id").cast("long").alias("segment_id"),
        "is_silent",
        "start_frame",
        "end_frame",
        "n_frames",
    )


QUERIES["multimodal_audio_silence"] = multimodal_audio_silence

ORACLES["multimodal_audio_silence"] = f"""
    SELECT v.range AS audio_id,
      b.range AS segment_id,
      (b.range + v.range) % 2 = 0 AS is_silent,
      b.range * {SIL_BLOCK_FRAMES} AS start_frame,
      b.range * {SIL_BLOCK_FRAMES} + {SIL_BLOCK_FRAMES - 1} AS end_frame,
      CAST({SIL_BLOCK_FRAMES} AS BIGINT) AS n_frames
    FROM range(0, {SIL_N_FILES}) v, range(0, {SIL_BLOCKS}) b
"""


def agg_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cohort Mann-Whitney U comparing click-event values against
    all other event values — the nonparametric A/B answer to 'did the
    click distribution shift?'.  Doubled-integer ranks and the integer
    tie term make the statistic bit-exact across engines; the events
    table's planted duplicate values exercise the tie correction for
    real."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import mann_whitney_u

    e = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .withColumn("cohort", (F.col("user_id") % 3).cast("long"))
    )
    return mann_whitney_u(
        e, ["cohort"], F.col("event_type") == "click", "value"
    ).orderBy("cohort")


QUERIES["agg_mann_whitney"] = agg_mann_whitney


def _mann_whitney_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.stats import mann_whitney_u_sql

    src = (
        "(SELECT CAST(user_id % 3 AS BIGINT) AS cohort, event_type, value"
        " FROM events WHERE value IS NOT NULL) AS src"
    )
    return mann_whitney_u_sql(src, "cohort", "event_type = 'click'", "value")


ORACLES["agg_mann_whitney"] = _mann_whitney_oracle()


def eval_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Measure-don't-guess for the flagship near-dup path: recall of
    MinHash-LSH candidate generation against the exact all-pairs
    n-gram-Jaccard ground truth at the same threshold, one summary row.
    (Precision is structurally 1.0 — LSH candidates are exact-Jaccard
    VERIFIED before emission — so the banding stage's only quality axis
    is recall, and this query pins it.)"""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from image_matadata_batchprocessing_aws_spark.queries.dedup import JACCARD_THRESHOLD

    docs = t(spark, sf, "documents")
    ex = ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD).select(
        "id_a", "id_b", F.lit(1).alias("in_exact")
    )
    ls = minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD).select(
        "id_a", "id_b", F.lit(1).alias("in_lsh")
    )
    both = ex.join(ls, ["id_a", "id_b"], "full_outer")
    matched = F.when(
        F.col("in_exact").isNotNull() & F.col("in_lsh").isNotNull(), 1
    ).otherwise(0)
    return both.agg(
        F.sum("in_exact").cast("long").alias("n_exact"),
        F.sum("in_lsh").cast("long").alias("n_lsh"),
        F.sum(matched).cast("long").alias("n_matched"),
        F.round(
            F.sum(matched) / F.sum("in_exact").cast("double"), 4
        ).alias("recall"),
    )


QUERIES["eval_lsh_recall"] = eval_lsh_recall


def _lsh_recall_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.queries.dedup import (
        _MINHASH_ORACLE,
        _SHINGLES_CTE,
        JACCARD_THRESHOLD,
    )

    return f"""
    WITH ex AS (
      WITH {_SHINGLES_CTE}
      SELECT id_a, id_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    mp AS ({_MINHASH_ORACLE}),
    b AS (SELECT e.id_a FROM ex e JOIN mp m
          ON e.id_a = m.id_a AND e.id_b = m.id_b)
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_lsh AS BIGINT) AS n_lsh,
           CAST(n_matched AS BIGINT) AS n_matched,
           round(n_matched / CAST(n_exact AS DOUBLE), 4) AS recall
    FROM (SELECT (SELECT count(*) FROM ex) AS n_exact,
                 (SELECT count(*) FROM mp) AS n_lsh,
                 (SELECT count(*) FROM b) AS n_matched)
    """


ORACLES["eval_lsh_recall"] = _lsh_recall_oracle()


#: 3 Luhn-valid cards, 2 checksum-failing digit runs (stay unredacted).
PII_CARDS = [
    "4539 1488 0343 6467",
    "4716-4615-8332-2103",
    "5425233430109903",
    "4539148803436468",
    "1234 5678 9012 3456",
]


def text_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """Checksum-gated PII scrub, oracle-checked byte for byte: each doc
    gets a planted card number (rotating through Luhn-valid and
    checksum-failing ones), an IPv4 whose second octet walks past 255
    (invalid octets must survive), and an SSN every 4th doc; the DuckDB
    twin is GENERATED from the same pattern tables + Luhn construction
    (``redact_pii_sql``), so a dialect or checksum divergence is a
    value mismatch."""
    from image_matadata_batchprocessing_aws_spark.operators.text import redact_pii

    d = t(spark, sf, "documents").select("doc_id", "text")
    card = F.element_at(
        F.array(*[F.lit(c) for c in PII_CARDS]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    planted = F.concat(
        F.col("text"),
        F.lit(" card "),
        card,
        F.lit(" ip 10."),
        (F.col("doc_id") % 300).cast("string"),
        F.lit(".0.7"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" ssn 123-45-6789")).otherwise(
            F.lit("")
        ),
    )
    out = redact_pii(d.select("doc_id", planted.alias("ptext")), "ptext")
    return out.select("doc_id", "redacted", "n_cards")


QUERIES["text_redact_pii"] = text_redact_pii


def _redact_pii_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.text import redact_pii_sql

    cards = "[" + ", ".join(f"'{c}'" for c in PII_CARDS) + "]"
    red, n_cards = redact_pii_sql("ptext")
    return f"""
    WITH p AS (
      SELECT doc_id,
        text || ' card ' || ({cards})[CAST(doc_id % 5 AS INT) + 1]
             || ' ip 10.' || CAST(doc_id % 300 AS VARCHAR) || '.0.7'
             || CASE WHEN doc_id % 4 = 0 THEN ' ssn 123-45-6789' ELSE '' END
          AS ptext
      FROM documents)
    SELECT doc_id, {red} AS redacted, {n_cards} AS n_cards FROM p
    """


ORACLES["text_redact_pii"] = _redact_pii_oracle()


def multimodal_scene_keyframes(spark: SparkSession, sf: str) -> DataFrame:
    """Keyframe-per-scene selection composed over the scene-cut fixture:
    median frame of each structural 8-frame scene, oracle closed-form
    (frame 8b+3 of scene b)."""
    from image_matadata_batchprocessing_aws_spark.multimodal.video import (
        select_scene_keyframes,
    )

    cuts = multimodal_video_scenes(spark, sf)
    return select_scene_keyframes(cuts, key_col="video_id").select(
        "video_id",
        "scene_id",
        F.col("keyframe_idx").cast("long").alias("keyframe_idx"),
        "n_frames",
    )


QUERIES["multimodal_scene_keyframes"] = multimodal_scene_keyframes

ORACLES["multimodal_scene_keyframes"] = f"""
    SELECT v.range AS video_id,
      b.range AS scene_id,
      b.range * {SCENE_LEN} + {(SCENE_LEN + 1) // 2 - 1} AS keyframe_idx,
      CAST({SCENE_LEN} AS BIGINT) AS n_frames
    FROM range(0, {SCENE_N_VIDEOS}) v,
         range(0, {SCENE_N_FRAMES // SCENE_LEN}) b
"""


AUD_N_FILES = 12
AUD_BLOCKS = 6


def pipeline_audio_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Speech-corpus curation flagship over REAL WAV decode, end to end:
    integer-exact stats gates (min duration, clipping, digital silence)
    -> framing + voiced/silent structure -> per-file acoustic
    fingerprint (ordered quantized frame-RMS sequence) -> exact
    fingerprint dedup with keep-min survivorship -> per-file status +
    speech fraction.  The fixture plants every class: a short file, a
    clipped file, an all-zero file, three content groups with planted
    duplicates (same silence pattern + amplitude), and a same-pattern
    different-amplitude file that must NOT collapse into its group.
    All margins are structural (constant blocks, power-of-two
    amplitudes, frames tiling blocks), so the oracle is the closed-form
    status/fraction table."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        encode_wav_pcm16,
        wav_frame_features,
        wav_pcm_stats,
    )
    from pyspark.sql import Window

    rows = []
    for v in range(AUD_N_FILES):
        nb = 2 if v == 8 else AUD_BLOCKS
        amp = 32767 if v == 9 else 0 if v == 10 else 4096 if v == 11 else 8192
        p = 0 if v >= 8 else v % 3
        blocks = [
            np.full(1000, amp if (b + p) % 3 == 0 else 0, np.int16)
            for b in range(nb)
        ]
        rows.append(
            (v, f"{v}.wav", bytearray(encode_wav_pcm16(np.concatenate(blocks), 8000)))
        )
    audio = spark.createDataFrame(
        rows, "audio_id long, file_name string, content binary"
    )
    ids = audio.select("file_name", "audio_id")
    stats = wav_pcm_stats(audio)
    gate = (
        F.when(F.col("n_samples") < 4000, "too_short")
        .when(F.col("peak") >= 32767, "clipped")
        .when(F.col("sum_abs") == 0, "silent")
    )
    gated = stats.withColumn("gate", gate)
    bad = (
        gated.where(F.col("gate").isNotNull())
        .join(ids, "file_name")
        .select(
            "audio_id",
            F.col("gate").alias("status"),
            F.lit(None).cast("double").alias("speech_frac"),
        )
    )
    good = gated.where(F.col("gate").isNull()).select("file_name")
    frames = wav_frame_features(audio.join(good, "file_name"), frame_ms=25, hop_ms=25)
    q = (F.col("rms") * 32768).cast("long")
    per = frames.groupBy("file_name").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum((q > 0).cast("long")).alias("n_voiced"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("frame_idx"), q.alias("q")))
                    ),
                    lambda x: x["q"].cast("string"),
                ),
            )
        ).alias("sig"),
    )
    wmin = Window.partitionBy("sig")
    dedup = (
        per.join(ids, "file_name")
        .withColumn("keep_id", F.min("audio_id").over(wmin))
        .select(
            "audio_id",
            F.when(F.col("audio_id") == F.col("keep_id"), "kept")
            .otherwise("dup")
            .alias("status"),
            F.round(
                F.col("n_voiced") / F.col("n_frames").cast("double"), 4
            ).alias("speech_frac"),
        )
    )
    return bad.unionByName(dedup)


QUERIES["pipeline_audio_corpus"] = pipeline_audio_corpus

ORACLES["pipeline_audio_corpus"] = f"""
    SELECT range AS audio_id,
      CASE WHEN range = 8 THEN 'too_short'
           WHEN range = 9 THEN 'clipped'
           WHEN range = 10 THEN 'silent'
           WHEN range IN (0, 1, 2, 11) THEN 'kept'
           ELSE 'dup' END AS status,
      CASE WHEN range IN (8, 9, 10) THEN NULL
           ELSE round(10 / CAST(30 AS DOUBLE), 4) END AS speech_frac
    FROM range(0, {AUD_N_FILES})
"""


IMST_N_FILES = 12


def multimodal_image_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Brightness/contrast/entropy curation gates over REAL PNG decode,
    oracle-checked: solid images (entropy exactly 0 bits), half/half
    two-value images (exactly 1 bit), and four-quadrant images (exactly
    2 bits) make every float gate closed-form; the integer histogram is
    the only thing the Arrow stage emits, and the entropy fold
    accumulates by SUBTRACTION (acc - p*log2 p) so the zero-entropy
    case yields +0.0, not -0.0, in both engines."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import image_pixel_stats

    rows = []
    for v in range(IMST_N_FILES):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        cls = v % 3
        if cls == 0:
            img[:, :, :] = 16 * (v % 8) + 3
        elif cls == 1:
            img[:, :8, :] = 32
            img[:, 8:, :] = 224
        else:
            img[:8, :8, :] = 16
            img[:8, 8:, :] = 80
            img[8:, :8, :] = 144
            img[8:, 8:, :] = 208
        rows.append((v, f"{v}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "image_id long, entry_name string, content binary"
    )
    st = image_pixel_stats(entries)
    total = (F.col("n_pixels") * 3).cast("double")
    p = lambda cnt: cnt.cast("double") / total  # noqa: E731
    entropy = F.aggregate(
        F.col("hist"),
        F.lit(0.0),
        lambda acc, cnt: acc
        - F.when(cnt > 0, p(cnt) * F.log2(p(cnt))).otherwise(F.lit(0.0)),
    )
    out = st.join(
        entries.select("image_id", F.col("entry_name").alias("file_name")),
        "file_name",
    )
    return out.select(
        "image_id",
        "n_pixels",
        F.round(F.col("sum_px") / total, 4).alias("mean_px"),
        (F.col("max_px") - F.col("min_px")).cast("long").alias("contrast"),
        F.round(entropy, 4).alias("entropy_bits"),
    )


QUERIES["multimodal_image_stats"] = multimodal_image_stats

ORACLES["multimodal_image_stats"] = f"""
    SELECT range AS image_id,
      CAST(256 AS BIGINT) AS n_pixels,
      CASE range % 3
        WHEN 0 THEN CAST(16 * (range % 8) + 3 AS DOUBLE)
        WHEN 1 THEN 128.0
        ELSE 112.0 END AS mean_px,
      CASE range % 3 WHEN 0 THEN 0 ELSE 192 END AS contrast,
      CAST(CASE range % 3 WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 ELSE 2.0 END
           AS DOUBLE) AS entropy_bits
    FROM range(0, {IMST_N_FILES})
"""


JPEG12_N_DOCS = 20


def _jpeg12_colors(doc_id: int) -> tuple[int, int, int]:
    return ((doc_id * 97) % 4001, (doc_id * 211) % 4001, (doc_id * 331) % 4001)


def multimodal_jpeg12_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL 12-bit (extended sequential SOF1, Pq=1 16-bit quant tables)
    JPEG decoding through the Arrow pipeline: solid 12-bit colors
    encode with the extended-precision Huffman tables, decode to
    uint16, scale to display range, and the per-channel pixel sums
    after integral resize are compared against the bitstream-free
    reference pipeline's reconstruction (computed driver-side per
    fixture color, fixture-sized work) — agreement proves the 16-bit
    DQT parse, the 2048-centered level shift/color convert, and the
    extended Huffman alphabet carry every coefficient bit-exactly."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg,
    )
    from image_matadata_batchprocessing_aws_spark.multimodal.images import decode_images
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import PNG_DIMS

    rows = []
    for doc_id in range(JPEG12_N_DOCS):
        h, w = PNG_DIMS[doc_id % len(PNG_DIMS)]
        r, g, b = _jpeg12_colors(doc_id)
        img = np.zeros((h, w, 3), dtype=np.uint16)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = r, g, b
        q = 75 if doc_id % 2 == 0 else 90
        ss = "4:4:4" if doc_id % 4 < 2 else "4:2:0"
        rows.append(
            (
                doc_id,
                f"{doc_id}.jpg",
                bytearray(
                    encode_jpeg(img, quality=q, subsampling=ss, bit_depth=12)
                ),
            )
        )
    entries = spark.createDataFrame(
        rows, "doc_id long, entry_name string, content binary"
    )

    def df12(name: str, content: bytes) -> np.ndarray:
        return (decode_jpeg(content) >> 4).astype(np.uint8)

    decoded = decode_images(entries, normalize=False, decode_fn=df12)

    def chan_sum(c: int):
        return F.aggregate(
            F.slice(F.col("image"), c * 224 * 224 + 1, 224 * 224),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("long")

    out = decoded.join(
        entries.select("doc_id", F.col("entry_name").alias("file_name")),
        "file_name",
    )
    return out.select(
        "doc_id",
        chan_sum(0).alias("r_sum"),
        chan_sum(1).alias("g_sum"),
        chan_sum(2).alias("b_sum"),
    )


QUERIES["multimodal_jpeg12_decode"] = multimodal_jpeg12_decode


def _jpeg12_oracle() -> str:
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import (
        jpeg_reference_pipeline,
    )
    from image_matadata_batchprocessing_aws_spark.queries.multimodal import (
        _PNG_PIX_CASE,
        PNG_DIMS,
    )

    cases = {c: [] for c in "rgb"}
    for doc_id in range(JPEG12_N_DOCS):
        r, g, b = _jpeg12_colors(doc_id)
        img = np.zeros((8, 8, 3), dtype=np.uint16)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = r, g, b
        q = 75 if doc_id % 2 == 0 else 90
        ref = jpeg_reference_pipeline(img, quality=q, bit_depth=12)[0, 0]
        for c, val in zip("rgb", ref):
            cases[c].append(f"WHEN {doc_id} THEN {int(val) >> 4}")
    rc, gc, bc = (" ".join(cases[c]) for c in "rgb")
    return f"""
    SELECT doc_id,
           CAST((CASE doc_id {rc} END) * px AS BIGINT) AS r_sum,
           CAST((CASE doc_id {gc} END) * px AS BIGINT) AS g_sum,
           CAST((CASE doc_id {bc} END) * px AS BIGINT) AS b_sum
    FROM (SELECT unnest(range({JPEG12_N_DOCS})) AS doc_id),
         LATERAL (SELECT CASE doc_id % {len(PNG_DIMS)} {_PNG_PIX_CASE} END AS px)
    """


ORACLES["multimodal_jpeg12_decode"] = _jpeg12_oracle()


BOTTOMK_K = 64


def sketch_bottomk_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-quantile sketch over lineitem: per returnflag, the
    bottom-64-by-md5 uniform sample of l_quantity read out at p50/p90.
    Deterministic md5 order means the oracle reproduces the EXACT
    sample, so this checks the full sketch construction, not a
    tolerance band."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import (
        bottomk_quantiles,
        bottomk_sample,
    )

    li = t(spark, sf, "lineitem")
    rid = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    s = bottomk_sample(li, rid, "l_quantity", ["l_returnflag"], k=BOTTOMK_K)
    return bottomk_quantiles(s, ["l_returnflag"]).orderBy("l_returnflag")


QUERIES["sketch_bottomk_quantiles"] = sketch_bottomk_quantiles


def _bottomk_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql

    rid = "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
    return f"""
    WITH base AS (
      SELECT l_returnflag, {md5_int64_sql(rid)} AS h, l_quantity AS v
      FROM lineitem WHERE l_quantity IS NOT NULL),
    r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY h)
                 AS pos FROM base),
    s AS (SELECT * FROM r WHERE pos <= {BOTTOMK_K}),
    a AS (SELECT l_returnflag, count(*) AS n, list_sort(list(v)) AS vs
          FROM s GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_sketch,
      vs[CAST(ceil(0.5 * n) AS INT)] AS p50,
      vs[CAST(ceil(0.9 * n) AS INT)] AS p90
    FROM a ORDER BY l_returnflag
    """


ORACLES["sketch_bottomk_quantiles"] = _bottomk_oracle()


def text_encoding_flags(spark: SparkSession, sf: str) -> DataFrame:
    """Encoding-quality screen (ftfy-lite), oracle-checked: documents get
    planted artifacts by doc_id class -- a mojibake digraph, a U+FFFD
    replacement char, a C0 control byte, clean non-ASCII (must NOT
    flag), and clean ASCII -- and both engines run the identical
    literal-alternation patterns over the identical construction."""
    from image_matadata_batchprocessing_aws_spark.operators.text import add_encoding_flags

    d = t(spark, sf, "documents").select("doc_id", "text")
    cls = F.col("doc_id") % 5
    suffix = (
        F.when(cls == 0, F.lit(" caf\u00c3\u00a9"))
        .when(cls == 1, F.lit(" bad\ufffdchar"))
        .when(cls == 2, F.lit(" ctl\x01end"))
        .when(cls == 3, F.lit(" na\u00efve ok"))
        .otherwise(F.lit(" clean"))
    )
    planted = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    out = add_encoding_flags(planted)
    return out.select(
        "doc_id", "n_mojibake", "n_replacement", "n_control",
        "ascii_ratio", "enc_suspect",
    )


QUERIES["text_encoding_flags"] = text_encoding_flags


def _encoding_flags_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.text import (
        CONTROL_PATTERN,
        MOJIBAKE_PATTERN,
    )

    suffix = (
        "CASE CAST(doc_id % 5 AS INT) "
        "WHEN 0 THEN ' caf\u00c3\u00a9' "
        "WHEN 1 THEN ' bad\ufffdchar' "
        "WHEN 2 THEN ' ctl' || chr(1) || 'end' "
        "WHEN 3 THEN ' na\u00efve ok' "
        "ELSE ' clean' END"
    )
    return f"""
    WITH p AS (SELECT doc_id, text || ({suffix}) AS ptext FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(ptext, '{MOJIBAKE_PATTERN}')) AS BIGINT)
        AS n_mojibake,
      CAST(len(regexp_extract_all(ptext, '\ufffd')) AS BIGINT)
        AS n_replacement,
      CAST(len(regexp_extract_all(ptext, '{CONTROL_PATTERN}')) AS BIGINT)
        AS n_control,
      round(length(regexp_replace(ptext, '[^\\x00-\\x7F]', '', 'g'))
            / CAST(length(ptext) AS DOUBLE), 4) AS ascii_ratio,
      (len(regexp_extract_all(ptext, '{MOJIBAKE_PATTERN}')) > 0
       OR len(regexp_extract_all(ptext, '\ufffd')) > 0
       OR len(regexp_extract_all(ptext, '{CONTROL_PATTERN}')) > 0)
        AS enc_suspect
    FROM p
    """


ORACLES["text_encoding_flags"] = _encoding_flags_oracle()


ARITH_FIXDIR = "/root/repo/tests/fixtures/arith"


def multimodal_jpeg_arith_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL arithmetic-coded JPEG (SOF9, T.81 Annex D QM coder) through
    the Arrow decode pipeline (sequential SOF9 and progressive SOF10):
    the committed fixtures were produced by
    the SYSTEM libjpeg-turbo (tools/libjpeg_ref.py — an INDEPENDENT
    encoder, so the probability model cannot be self-consistently
    wrong), cover gray/RGB, 4:4:4 and 4:2:0, and restart markers, and
    each decodes bit-identically to its Huffman twin (entropy coding is
    lossless).  The oracle pins the per-channel pixel sums recorded in
    the fixture manifest at generation time."""
    import json
    import os

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import decode_jpeg

    manifest = json.load(open(os.path.join(ARITH_FIXDIR, "manifest.json")))
    rows = [
        (name, bytearray(open(os.path.join(ARITH_FIXDIR, name), "rb").read()))
        for name, *_ in manifest
    ]
    entries = spark.createDataFrame(rows, "entry_name string, content binary")

    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    def sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = decode_jpeg(bytes(content)).astype(np.int64)
                out.append(
                    (
                        name,
                        img.shape[1],
                        img.shape[0],
                        int(img[:, :, 0].sum()),
                        int(img[:, :, 1].sum()),
                        int(img[:, :, 2].sum()),
                    )
                )
        yield pd.DataFrame(
            out, columns=["entry_name", "w", "h", "r_sum", "g_sum", "b_sum"]
        )

    return entries.mapInPandas(
        sums,
        "entry_name string, w long, h long, r_sum long, g_sum long, b_sum long",
    )


QUERIES["multimodal_jpeg_arith_decode"] = multimodal_jpeg_arith_decode


def _jpeg_arith_oracle() -> str:
    import json
    import os

    manifest = json.load(open(os.path.join(ARITH_FIXDIR, "manifest.json")))
    rows = ",\n        ".join(
        f"('{name}', CAST({w} AS BIGINT), CAST({h} AS BIGINT), "
        f"CAST({r} AS BIGINT), CAST({g} AS BIGINT), CAST({b} AS BIGINT))"
        for name, w, h, r, g, b in manifest
    )
    return f"""
    SELECT * FROM (VALUES
        {rows}
    ) AS t(entry_name, w, h, r_sum, g_sum, b_sum)
    """


ORACLES["multimodal_jpeg_arith_decode"] = _jpeg_arith_oracle()


WEBP_LOSSY_FIXDIR = "/root/repo/tests/fixtures/webp_lossy"


def multimodal_webp_lossy_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Lossy WebP (VP8) through the Arrow pipeline.  The committed
    fixtures pin libwebp's own per-channel decode sums in the manifest;
    since r05 the decode itself is the pure RFC 6386 implementation
    (`multimodal/vp8.py`), so matching the manifest re-proves
    bit-exactness against the system codec inside the Spark plan."""
    import json
    import os
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    manifest = json.load(open(os.path.join(WEBP_LOSSY_FIXDIR, "manifest.json")))
    rows = [
        (name, bytearray(open(os.path.join(WEBP_LOSSY_FIXDIR, name), "rb").read()))
        for name, *_ in manifest
    ]
    entries = spark.createDataFrame(rows, "entry_name string, content binary")

    def sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for name, content in zip(pdf["entry_name"], pdf["content"]):
                img = _real_decode(name, bytes(content)).astype(np.int64)
                out.append(
                    (name, img.shape[1], img.shape[0],
                     int(img[:, :, 0].sum()), int(img[:, :, 1].sum()),
                     int(img[:, :, 2].sum()))
                )
        yield pd.DataFrame(
            out, columns=["entry_name", "w", "h", "r_sum", "g_sum", "b_sum"]
        )

    return entries.mapInPandas(
        sums,
        "entry_name string, w long, h long, r_sum long, g_sum long, b_sum long",
    )


QUERIES["multimodal_webp_lossy_decode"] = multimodal_webp_lossy_decode


def _webp_lossy_oracle() -> str:
    import json
    import os

    manifest = json.load(open(os.path.join(WEBP_LOSSY_FIXDIR, "manifest.json")))
    rows = ",\n        ".join(
        f"('{name}', CAST({w} AS BIGINT), CAST({h} AS BIGINT), "
        f"CAST({r} AS BIGINT), CAST({g} AS BIGINT), CAST({b} AS BIGINT))"
        for name, w, h, r, g, b in manifest
    )
    return f"""
    SELECT * FROM (VALUES
        {rows}
    ) AS t(entry_name, w, h, r_sum, g_sum, b_sum)
    """


ORACLES["multimodal_webp_lossy_decode"] = _webp_lossy_oracle()


GEO_RADIUS = 50  # integer milli-units


def join_geo_radius(spark: SparkSession, sf: str) -> DataFrame:
    """Grid-bucketed spatial radius join, oracle-checked for BOTH recall
    and precision: customers and suppliers get deterministic integer
    milli-unit coordinates, the Spark side runs the 3x3-neighborhood
    cell join (never a cross join), and the DuckDB oracle brute-forces
    the full cross product with the same integer predicate — a missed
    candidate (bucketing bug) or an extra pair (predicate bug) both
    surface as row mismatches.  d2 is an exact integer."""
    from image_matadata_batchprocessing_aws_spark.operators.geo import radius_join_grid

    cust = t(spark, sf, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % 2000).cast("double").alias("x"),
        ((F.col("c_custkey") * 91) % 2000).cast("double").alias("y"),
    )
    supp = t(spark, sf, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53) % 2000).cast("double").alias("x"),
        ((F.col("s_suppkey") * 17) % 2000).cast("double").alias("y"),
    )
    out = radius_join_grid(
        cust, supp, radius=GEO_RADIUS,
        left_cols=["c_custkey"], right_cols=["s_suppkey"],
    )
    return out.select(
        "c_custkey", "s_suppkey", F.col("d2").cast("long").alias("d2")
    )


QUERIES["join_geo_radius"] = join_geo_radius

ORACLES["join_geo_radius"] = f"""
    SELECT c.c_custkey, s.s_suppkey,
      CAST(((c.c_custkey * 37) % 2000 - (s.s_suppkey * 53) % 2000)
           * ((c.c_custkey * 37) % 2000 - (s.s_suppkey * 53) % 2000)
           + ((c.c_custkey * 91) % 2000 - (s.s_suppkey * 17) % 2000)
           * ((c.c_custkey * 91) % 2000 - (s.s_suppkey * 17) % 2000)
           AS BIGINT) AS d2
    FROM customer c CROSS JOIN supplier s
    WHERE ((c.c_custkey * 37) % 2000 - (s.s_suppkey * 53) % 2000)
          * ((c.c_custkey * 37) % 2000 - (s.s_suppkey * 53) % 2000)
          + ((c.c_custkey * 91) % 2000 - (s.s_suppkey * 17) % 2000)
          * ((c.c_custkey * 91) % 2000 - (s.s_suppkey * 17) % 2000)
          <= {GEO_RADIUS * GEO_RADIUS}
"""


HOLT_ALPHA = 0.3
HOLT_BETA = 0.1
HOLT_LOOKBACK = 20


def ts_holt(spark: SparkSession, sf: str) -> DataFrame:
    """Holt level+trend smoothing with one-step forecast per user —
    ``ts_ewma``'s trending sibling; the struct-accumulator fold runs
    the identical IEEE sequence in both engines (the same-typed
    ``list_reduce`` trick: elements map to (level, trend=0) structs and
    the reduce consumes the next element's level field)."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import holt_trailing

    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    out = holt_trailing(
        e, "user_id", "ts", "value", "event_id",
        alpha=HOLT_ALPHA, beta=HOLT_BETA, lookback=HOLT_LOOKBACK,
    )
    return out.select("user_id", "event_id", "holt_level", "holt_forecast")


QUERIES["ts_holt"] = ts_holt

#: DuckDB 1.0's list_reduce mutates the struct accumulator IN PLACE
#: field by field (the 't' expression would see the freshly-written
#: 'l'), so the twin runs the recurrence as a recursive CTE over the
#: frame index instead -- plain column arithmetic, no aliasing, same
#: IEEE sequence as the Spark fold.
_HOLT_STEP_L = (
    f"{HOLT_ALPHA} * CAST(hist[k + 1] AS DOUBLE) "
    f"+ (1.0 - {HOLT_ALPHA}) * (l + t)"
)

ORACLES["ts_holt"] = f"""
    WITH RECURSIVE b AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(round(value * 10000.0) AS BIGINT) AS xs
      FROM events WHERE value IS NOT NULL),
    frames AS (
      SELECT user_id, event_id,
             list(xs) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS BETWEEN {HOLT_LOOKBACK - 1} PRECEDING
                            AND CURRENT ROW) AS hist
      FROM b),
    rec AS (
      SELECT user_id, event_id, hist, 1 AS k,
             CAST(hist[1] AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS t
      FROM frames
      UNION ALL
      SELECT user_id, event_id, hist, k + 1,
             {_HOLT_STEP_L} AS l,
             {HOLT_BETA} * (({_HOLT_STEP_L}) - l) + (1.0 - {HOLT_BETA}) * t
               AS t
      FROM rec WHERE k < len(hist)),
    f AS (SELECT user_id, event_id, l, t FROM rec WHERE k = len(hist))
    SELECT user_id, event_id,
           floor(l / 10000.0 * 1000000.0 + 0.5) / 1000000.0 AS holt_level,
           floor((l + t) / 10000.0 * 1000000.0 + 0.5) / 1000000.0 AS holt_forecast
    FROM f
"""



CUSUM_K = 5.0
CUSUM_H = 60.0


def ts_cusum_shift(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sided tabular CUSUM mean-shift detection per user (Page
    1954) against the global mean — the changepoint sibling of
    ``ts_ewma``/``ts_holt``.  The clamp-at-zero recurrence runs as the
    prefix identity ``S_t = P_t - min(0, running_min(P))`` — two
    stacked keyed windows on one exchange, integer-exact throughout
    (see ``operators/timeseries.cusum_two_sided``)."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        cusum_two_sided,
    )

    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    return cusum_two_sided(
        e, "user_id", "ts", "value", "event_id",
        slack_k=CUSUM_K, threshold_h=CUSUM_H,
    )


QUERIES["ts_cusum_shift"] = ts_cusum_shift

#: The clamp recurrence S_t = max(0, S_{t-1} + d_t) is NOT run
#: recursively: both twins use the exact prefix identity
#: S_t = P_t - min(0, min_{j<=t} P_j), all-integer until the final
#: descale, so parity is bit-exact by construction.
ORACLES["ts_cusum_shift"] = f"""
    WITH b AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(round(value * 10000.0) AS BIGINT) AS xs
      FROM events WHERE value IS NOT NULL),
    tgt AS (SELECT sum(xs) // count(xs) AS target_s FROM b),
    d AS (
      SELECT user_id, event_id, ts_ms,
             xs - (target_s + {int(CUSUM_K * 10000)}) AS d_hi,
             (target_s - {int(CUSUM_K * 10000)}) - xs AS d_lo
      FROM b, tgt),
    p AS (
      SELECT user_id, event_id, ts_ms,
             sum(d_hi) OVER w AS p_hi, sum(d_lo) OVER w AS p_lo
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s AS (
      SELECT user_id, event_id,
             p_hi - least(min(p_hi) OVER w2, 0) AS s_hi,
             p_lo - least(min(p_lo) OVER w2, 0) AS s_lo
      FROM p
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           round(s_hi / 10000.0, 6) AS cusum_hi,
           round(s_lo / 10000.0, 6) AS cusum_lo,
           CAST(CASE WHEN s_hi > {int(CUSUM_H * 10000)}
                       OR s_lo > {int(CUSUM_H * 10000)}
                     THEN 1 ELSE 0 END AS BIGINT) AS alarm
    FROM s
"""


def agg_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Exact two-sample KS statistic per order priority vs the
    complement — the distribution-drift screen (`did this source's
    totals shift vs the rest of the corpus?`) as pure keyed windows
    over the distinct-value grid; integer numerator throughout (see
    ``operators/stats.ks_two_sample``)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import ks_two_sample

    return ks_two_sample(
        t(spark, sf, "orders"), "o_orderpriority", "o_totalprice"
    )


QUERIES["agg_ks_drift"] = agg_ks_drift

from image_matadata_batchprocessing_aws_spark.operators.stats import (  # noqa: E402
    ks_two_sample_sql as _ks_sql,
)

ORACLES["agg_ks_drift"] = _ks_sql("orders", "o_orderpriority", "o_totalprice")


def agg_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence screen on return flag x line status —
    per-cell observed/expected/contribution plus the total statistic
    and dof; integer numerator roots, scaled-BIGINT associative total
    (see ``operators/stats.chi2_independence``)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        chi2_independence,
    )

    return chi2_independence(
        t(spark, sf, "lineitem"), "l_returnflag", "l_linestatus"
    )


QUERIES["agg_chi2_independence"] = agg_chi2_independence

from image_matadata_batchprocessing_aws_spark.operators.stats import (  # noqa: E402
    chi2_independence_sql as _chi2_sql,
)

ORACLES["agg_chi2_independence"] = _chi2_sql(
    "lineitem", "l_returnflag", "l_linestatus"
)


PITCH_N_DOCS = 6
PITCH_N = 1600
PITCH_A = 997
PITCH_M = 1999
PITCH_LAG_MIN = 20
PITCH_LAG_MAX = 80


def _pitch_period(d: int) -> int:
    return 25 + 7 * d  # 25..60, all inside the lag search range


def multimodal_audio_pitch(spark: SparkSession, sf: str) -> DataFrame:
    """REAL pitch detection by integer autocorrelation over decoded
    PCM16 WAVs: fixtures are exactly periodic integer waveforms
    ``s[i] = ((i %% P) * A %% M) - M//2`` with per-doc period P, so the
    autocorrelation argmax lands on P (more aligned terms than any
    multiple) and ``pitch_hz = rate / P`` — and DuckDB recomputes the
    SAME int64 ``ac`` table from the closed form via a lag self-join.
    Odd docs are stereo with a decoy period in channel 1, proving the
    de-interleave picks channel 0."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.audio import (
        encode_wav_pcm16,
        wav_pitch_autocorr,
    )

    rows = []
    for d in range(PITCH_N_DOCS):
        rate = 4000 + 500 * (d % 3)
        p = _pitch_period(d)
        i = np.arange(PITCH_N, dtype=np.int64)
        ch0 = ((i % p) * PITCH_A % PITCH_M) - PITCH_M // 2
        if d % 2 == 1:  # stereo decoy: a different period in channel 1
            ch1 = ((i % (p + 11)) * 601 % PITCH_M) - PITCH_M // 2
            samples = np.stack([ch0, ch1], axis=1)
        else:
            samples = ch0
        rows.append((d, f"{d}.wav", bytearray(encode_wav_pcm16(samples, rate))))
    audio = spark.createDataFrame(rows, "doc_id long, file_name string, content binary")
    out = wav_pitch_autocorr(
        audio.select("file_name", "content"),
        lag_min=PITCH_LAG_MIN, lag_max=PITCH_LAG_MAX, max_samples=PITCH_N,
    )
    return (
        out.join(audio.select("doc_id", "file_name"), "file_name")
        .select(
            "doc_id",
            F.col("sample_rate").cast("long").alias("sample_rate"),
            F.col("n_samples").cast("long").alias("n_samples"),
            F.col("best_lag").cast("long").alias("best_lag"),
            F.col("best_ac").cast("long").alias("best_ac"),
            "pitch_hz",
        )
    )


QUERIES["multimodal_audio_pitch"] = multimodal_audio_pitch

#: DuckDB regenerates channel 0 from the closed form and recomputes
#: the integer autocorrelation via a lag self-join; argmax with
#: smallest-lag tie-break via (ac DESC, lag ASC) row_number.
ORACLES["multimodal_audio_pitch"] = f"""
    WITH params AS (
      SELECT doc_id, 4000 + 500 * (doc_id % 3) AS rate,
             25 + 7 * doc_id AS p
      FROM (SELECT unnest(range({PITCH_N_DOCS})) AS doc_id)),
    samples AS (
      SELECT pr.doc_id, t.i,
             ((t.i % pr.p) * {PITCH_A} % {PITCH_M}) - {PITCH_M // 2} AS s
      FROM params pr,
           LATERAL (SELECT unnest(range({PITCH_N})) AS i) t),
    ac AS (
      SELECT a.doc_id, l.lag, sum(a.s * b.s) AS ac
      FROM (SELECT unnest(range({PITCH_LAG_MIN}, {PITCH_LAG_MAX + 1})) AS lag) l
      CROSS JOIN samples a
      JOIN samples b ON b.doc_id = a.doc_id AND b.i = a.i + l.lag
      GROUP BY 1, 2),
    best AS (
      SELECT doc_id, lag, ac,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY ac DESC, lag ASC) AS rn
      FROM ac)
    SELECT pr.doc_id,
           CAST(pr.rate AS BIGINT) AS sample_rate,
           CAST({PITCH_N} AS BIGINT) AS n_samples,
           CAST(b.lag AS BIGINT) AS best_lag,
           CAST(b.ac AS BIGINT) AS best_ac,
           round(pr.rate / b.lag, 6) AS pitch_hz
    FROM params pr JOIN best b ON b.doc_id = pr.doc_id AND b.rn = 1
"""


def agg_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test per order priority (finished vs
    unfinished orders) — the parametric sibling of ``agg_mann_whitney``
    on integer-exact sufficient statistics with Welch-Satterthwaite
    dof (see ``operators/stats.welch_t_test``)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import welch_t_test

    o = t(spark, sf, "orders")
    return welch_t_test(
        o, ["o_orderpriority"], F.col("o_orderstatus") == "F", "o_totalprice"
    )


QUERIES["agg_welch_ttest"] = agg_welch_ttest

from image_matadata_batchprocessing_aws_spark.operators.stats import (  # noqa: E402
    welch_t_test_sql as _welch_sql,
)

ORACLES["agg_welch_ttest"] = _welch_sql(
    "orders", "o_orderpriority", "o_orderstatus = 'F'", "o_totalprice"
)


EQ_N_FILES = 8


def multimodal_image_equalize(spark: SparkSession, sf: str) -> DataFrame:
    """Histogram equalization over REAL PNG decode, oracle-checked: the
    integer round-half-up CDF remap is recomputed by DuckDB from the
    closed-form per-class level tables (solid = degenerate all-zero,
    half/half -> {0,255}, quadrants -> {0,85,170,255}, and a 128-level
    ramp whose uniform histogram must survive equalization nearly
    unchanged) — see ``images.equalize_image_stats``."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        equalize_image_stats,
    )

    rows = []
    for v in range(EQ_N_FILES):
        cls = v % 4
        if cls == 0:  # solid: degenerate, equalization undefined -> 0
            img = np.full((16, 16, 3), 16 * (v % 8) + 3, dtype=np.uint8)
        elif cls == 1:  # two levels, half/half
            img = np.zeros((16, 16, 3), dtype=np.uint8)
            img[:, :8, :] = 32
            img[:, 8:, :] = 224
        elif cls == 2:  # four quadrants
            img = np.zeros((16, 16, 3), dtype=np.uint8)
            img[:8, :8, :] = 16
            img[:8, 8:, :] = 80
            img[8:, :8, :] = 144
            img[8:, 8:, :] = 208
        else:  # 128-level ramp: uniform histogram
            img = ((np.arange(768) % 128) * 2).astype(np.uint8).reshape(16, 16, 3)
        rows.append((v, f"{v}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "image_id long, entry_name string, content binary"
    )
    out = equalize_image_stats(entries.select("entry_name", "content"))
    return (
        out.join(
            entries.select("image_id", F.col("entry_name").alias("file_name")),
            "file_name",
        )
        .select(
            "image_id",
            F.col("n_pixels").cast("long").alias("n_pixels"),
            F.col("n_levels").cast("long").alias("n_levels"),
            F.col("eq_sum").cast("long").alias("eq_sum"),
            F.col("eq_min").cast("long").alias("eq_min"),
            F.col("eq_max").cast("long").alias("eq_max"),
        )
    )


QUERIES["multimodal_image_equalize"] = multimodal_image_equalize

#: DuckDB rebuilds each image's (value, count) level table from the
#: fixture construction, cumsums it, and applies the IDENTICAL integer
#: round-half-up remap ((cdf-cmin)*255*2 + d) // (2*d).
ORACLES["multimodal_image_equalize"] = f"""
    WITH imgs AS (SELECT unnest(range({EQ_N_FILES})) AS image_id),
    levels AS (
      SELECT image_id, 16 * (image_id % 8) + 3 AS val, 768 AS cnt
      FROM imgs WHERE image_id % 4 = 0
      UNION ALL
      SELECT image_id, v.val, 384 AS cnt
      FROM imgs, (VALUES (32), (224)) v(val) WHERE image_id % 4 = 1
      UNION ALL
      SELECT image_id, v.val, 192 AS cnt
      FROM imgs, (VALUES (16), (80), (144), (208)) v(val)
      WHERE image_id % 4 = 2
      UNION ALL
      SELECT image_id, 2 * k.k AS val, 6 AS cnt
      FROM imgs, (SELECT unnest(range(128)) AS k) k
      WHERE image_id % 4 = 3),
    c AS (
      SELECT image_id, val, cnt,
             sum(cnt) OVER (PARTITION BY image_id ORDER BY val
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cdf
      FROM levels),
    b AS (
      SELECT image_id, val, cnt, cdf,
             min(cdf) OVER (PARTITION BY image_id) AS cmin,
             max(cdf) OVER (PARTITION BY image_id) AS n
      FROM c),
    e AS (
      SELECT image_id, cnt,
             CASE WHEN n - cmin > 0
                  THEN ((cdf - cmin) * 255 * 2 + (n - cmin))
                       // (2 * (n - cmin))
                  ELSE 0 END AS eq
      FROM b)
    SELECT image_id,
           CAST(256 AS BIGINT) AS n_pixels,
           CAST(count(*) AS BIGINT) AS n_levels,
           CAST(sum(cnt * eq) AS BIGINT) AS eq_sum,
           CAST(min(eq) AS BIGINT) AS eq_min,
           CAST(max(eq) AS BIGINT) AS eq_max
    FROM e GROUP BY image_id
"""


def agg_anova_oneway(spark: SparkSession, sf: str) -> DataFrame:
    """One-way ANOVA of order totals across the five priority classes
    — the k-group completion of the Welch/Mann-Whitney pair; integer
    sufficient statistics, quantized between-group terms (see
    ``operators/stats.anova_oneway``)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import anova_oneway

    return anova_oneway(t(spark, sf, "orders"), "o_orderpriority", "o_totalprice")


QUERIES["agg_anova_oneway"] = agg_anova_oneway

from image_matadata_batchprocessing_aws_spark.operators.stats import (  # noqa: E402
    anova_oneway_sql as _anova_sql,
)

ORACLES["agg_anova_oneway"] = _anova_sql(
    "orders", "o_orderpriority", "o_totalprice"
)


ACF_LAG = 1


def ts_autocorr(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user lag-1 serial autocorrelation of event values — the
    is-there-memory-at-all ACF screen ahead of ``ts_ewma``/``ts_holt``;
    one keyed lead() window, integer sufficient statistics (see
    ``operators/timeseries.serial_autocorr``)."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        serial_autocorr,
    )

    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    return serial_autocorr(e, "user_id", "ts", "value", "event_id", lag=ACF_LAG)


QUERIES["ts_autocorr"] = ts_autocorr

from image_matadata_batchprocessing_aws_spark.operators.timeseries import (  # noqa: E402
    serial_autocorr_sql as _acf_sql,
)

ORACLES["ts_autocorr"] = _acf_sql(
    "events", "user_id", "epoch_ms(ts)", "value", "event_id",
    lag=ACF_LAG, where="value IS NOT NULL",
)


CONTAIN_THRESHOLD = 0.6


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Directed shingle CONTAINMENT pairs |A∩B|/|A| — the
    quote/subset detector Jaccard misses (Broder's resemblance vs
    containment); same posting-list shuffle profile as
    ``dedup_ngram_jaccard`` (see ``operators/dedup.containment_pairs``)."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        containment_pairs,
    )

    return containment_pairs(
        t(spark, sf, "documents"), threshold=CONTAIN_THRESHOLD
    )


QUERIES["dedup_containment"] = dedup_containment

ORACLES["dedup_containment"] = rf"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
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
    c AS (SELECT p.id_a, p.id_b, p.inter,
                 round(p.inter / CAST(sa.sz AS DOUBLE), 4) AS cont_ab,
                 round(p.inter / CAST(sb.sz AS DOUBLE), 4) AS cont_ba
          FROM pairs p
          JOIN sizes sa ON p.id_a = sa.doc_id
          JOIN sizes sb ON p.id_b = sb.doc_id)
    SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, cont_ab, cont_ba
    FROM c WHERE greatest(cont_ab, cont_ba) >= {CONTAIN_THRESHOLD}
"""


TILE_N_IMAGES = 6
TILE_GRID = 4


def _tile_value(i: int, r: int, c: int) -> int:
    """Closed-form tile fill value: images 0 and 1 share their c<2
    tiles (the planted 8-tile 'crop' overlap); everything else is
    image-unique."""
    if i == 0:
        return 4 * r + c
    if i == 1:
        return 4 * r + c if c < 2 else 100 + 4 * r + c
    return 60 + 30 * i + 4 * r + c


def multimodal_tile_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Tile-level partial-image overlap over REAL PNG decode: images
    split into a 4x4 tile lattice of exact pixel-sum signatures; a
    position-independent signature join finds the planted 8-tile
    shared region between images 0 and 1 that a whole-image hash
    cannot see (see ``images.image_tile_stats`` /
    ``tile_overlap_pairs``).  DuckDB rebuilds every tile signature
    from the fill formula and runs the same join."""
    import numpy as np

    from image_matadata_batchprocessing_aws_spark.multimodal.codecs import encode_png
    from image_matadata_batchprocessing_aws_spark.multimodal.images import (
        image_tile_stats,
        tile_overlap_pairs,
    )

    rows = []
    for i in range(TILE_N_IMAGES):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        for r in range(TILE_GRID):
            for c in range(TILE_GRID):
                img[4 * r : 4 * r + 4, 4 * c : 4 * c + 4, :] = _tile_value(i, r, c)
        rows.append((i, f"{i}.png", bytearray(encode_png(img))))
    entries = spark.createDataFrame(
        rows, "image_id long, entry_name string, content binary"
    )
    tiles = image_tile_stats(
        entries.select("entry_name", "content"), grid=TILE_GRID
    )
    return tile_overlap_pairs(tiles, min_shared=2).orderBy("file_a", "file_b")


QUERIES["multimodal_tile_overlap"] = multimodal_tile_overlap

ORACLES["multimodal_tile_overlap"] = f"""
    WITH imgs AS (SELECT unnest(range({TILE_N_IMAGES})) AS i),
    cells AS (
      SELECT i, r.r, c.c
      FROM imgs,
           (SELECT unnest(range({TILE_GRID})) AS r) r,
           (SELECT unnest(range({TILE_GRID})) AS c) c),
    sig AS (
      SELECT DISTINCT CAST(i AS VARCHAR) || '.png' AS file_name,
             48 * (CASE WHEN i = 0 THEN 4 * r + c
                        WHEN i = 1 THEN CASE WHEN c < 2 THEN 4 * r + c
                                             ELSE 100 + 4 * r + c END
                        ELSE 60 + 30 * i + 4 * r + c END) AS tile_sum
      FROM cells)
    SELECT a.file_name AS file_a, b.file_name AS file_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM sig a JOIN sig b
      ON a.tile_sum = b.tile_sum AND a.file_name < b.file_name
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY file_a, file_b
"""


def etl_jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """JSONL sink -> source ROUND-TRIP FIDELITY, oracle-checked: the
    documents table writes as sharded newline-JSON, reads back through
    the schema'd PERMISSIVE scan, and the per-(lang, source) report —
    counts, char sums, and an order-independent md5 text fingerprint
    sum — must match DuckDB computing the same directly on the parquet
    (any encoding/escaping loss in either direction breaks the
    fingerprints).  The corpus-interchange format (one doc per line)
    exercised end to end (``sources/jsonl_source.py``)."""
    import tempfile

    from image_matadata_batchprocessing_aws_spark.functions import md5_int32
    from image_matadata_batchprocessing_aws_spark.sources.jsonl_source import (
        read_jsonl,
        write_jsonl,
    )

    docs = t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="jsonl_rt_")
    write_jsonl(docs, out)
    back = read_jsonl(
        spark, out,
        "doc_id long, text string, lang string, source string, n_chars long",
        keep_corrupt=False,
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        # 32-bit fingerprints: 60-bit ones overflow the int64 sum
        F.sum(md5_int32(F.col("text"))).cast("long").alias("text_fp_sum"),
    )


QUERIES["etl_jsonl_roundtrip"] = etl_jsonl_roundtrip

from image_matadata_batchprocessing_aws_spark.functions import (  # noqa: E402
    md5_int32_sql as _md5_32_sql,
)

ORACLES["etl_jsonl_roundtrip"] = f"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum({_md5_32_sql("text")}) AS BIGINT) AS text_fp_sum
    FROM documents GROUP BY 1, 2
"""


def etl_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION read, oracle-checked: an old snapshot
    (3 columns) and a new snapshot (5 columns — ``source`` and
    ``n_chars`` added later) land in one dataset dir; the
    ``mergeSchema`` scan must surface the union schema with NULLs for
    the old files' missing columns — the exact shape a long-lived
    corpus hits every time a field is added.  DuckDB recomputes the
    same per-lang report from the original table with the even/odd
    snapshot split as a CASE."""
    import tempfile

    docs = t(spark, sf, "documents")
    root = tempfile.mkdtemp(prefix="schema_evo_")
    docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang").write.mode(
        "overwrite"
    ).parquet(f"{root}/v1")
    docs.where(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(f"{root}/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/v1", f"{root}/v2"
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("source").isNull(), 1)).cast("long").alias("n_old_schema"),
        F.count("source").cast("long").alias("n_new_schema"),
        F.sum("n_chars").cast("long").alias("sum_chars_new"),
    )


QUERIES["etl_schema_evolution"] = etl_schema_evolution

ORACLES["etl_schema_evolution"] = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT)
             AS n_old_schema,
           CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_new_schema,
           CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
             AS sum_chars_new
    FROM documents GROUP BY 1
"""


def etl_variant_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured path extraction, oracle-checked
    end to end: events re-serialize as nested JSON (object-in-object
    plus an array), parse to VariantType, and typed ``variant_get``
    paths — $.u.user as long, $.vals[1] as double, a missing path's
    NULL — must reproduce the relational aggregate DuckDB computes
    straight from the columns.  The open-format answer to schemaless
    props columns: parse once, extract with types, stay columnar."""
    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    j = e.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.struct(
                    F.col("user_id").alias("user"),
                    F.col("event_type").alias("typ"),
                ).alias("u"),
                F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            )
        ).alias("js")
    )
    v = j.select(F.parse_json("js").alias("v"))
    ex = v.select(
        F.variant_get("v", "$.u.user", "long").alias("user_id"),
        F.variant_get("v", "$.u.typ", "string").alias("event_type"),
        F.variant_get("v", "$.vals[1]", "double").alias("dbl"),
        F.variant_get("v", "$.missing.path", "long").alias("absent"),
    )
    return ex.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users"),
        F.round(F.sum(F.round(F.col("dbl") * 10000).cast("long")) / 10000.0, 4).alias(
            "sum_doubled"
        ),
        F.count("absent").cast("long").alias("n_absent"),
    )


QUERIES["etl_variant_extract"] = etl_variant_extract

ORACLES["etl_variant_extract"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(CAST(round(value * 2 * 10000) AS BIGINT)) / 10000.0, 4)
             AS sum_doubled,
           CAST(0 AS BIGINT) AS n_absent
    FROM events WHERE value IS NOT NULL GROUP BY 1
"""


PYSOURCE_N_DOCS = 500
PYSOURCE_PARTS = 8


def source_python_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """The Spark 4 PYTHON DATA SOURCE plugin end to end, oracle-checked:
    the deterministic synthetic-corpus generator registers as a real
    ``format("synthetic_docs")`` scan (partition planning + per-task
    iterators + Arrow), and DuckDB regenerates the identical corpus
    from the closed form — per-lang counts, char sums, and md5 text
    fingerprints all match bit-for-bit, proving row placement across
    ``PYSOURCE_PARTS`` partitions changes nothing
    (``sources/pysource.py``)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32
    from image_matadata_batchprocessing_aws_spark.sources import pysource

    pysource.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", str(PYSOURCE_N_DOCS))
        .option("n_partitions", str(PYSOURCE_PARTS))
        .load()
    )
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(md5_int32(F.col("text"))).cast("long").alias("text_fp_sum"),
    )


QUERIES["source_python_datasource"] = source_python_datasource

from image_matadata_batchprocessing_aws_spark.sources.pysource import (  # noqa: E402
    LANGS as _PS_LANGS,
    doc_text_sql as _ps_text_sql,
)

ORACLES["source_python_datasource"] = f"""
    WITH d AS (SELECT unnest(range({PYSOURCE_N_DOCS})) AS doc_id),
    langs AS (SELECT * FROM (VALUES {", ".join(f"({i}, '{l}')" for i, l in enumerate(_PS_LANGS))})
              t(idx, lang)),
    docs AS (
      SELECT d.doc_id, l.lang, {_ps_text_sql("d.doc_id")} AS text
      FROM d JOIN langs l ON d.doc_id % {len(_PS_LANGS)} = l.idx)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS sum_chars,
           CAST(sum({_md5_32_sql("text")}) AS BIGINT) AS text_fp_sum
    FROM docs GROUP BY 1
"""


def agg_cramers_v(spark: SparkSession, sf: str) -> DataFrame:
    """Cramér's V (and Tschuprow's T) association effect sizes from
    the chi-square decomposition — the bounded-[0,1] number a drift
    dashboard actually thresholds on, where raw chi-square grows with
    N.  Composes ``stats.chi2_independence``'s per-cell frame down to
    one row; the same quantized-total determinism carries through."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        chi2_independence,
    )

    cells = chi2_independence(
        t(spark, sf, "lineitem"), "l_returnflag", "l_linestatus"
    )
    one = cells.agg(
        F.first("chi2").alias("chi2"),
        F.first("dof").alias("dof"),
        F.sum("observed").alias("n"),
        F.count_distinct("l_returnflag").alias("r"),
        F.count_distinct("l_linestatus").alias("c"),
    )
    nd = F.col("n").cast("double")
    rm = (F.col("r") - 1).cast("double")
    cm = (F.col("c") - 1).cast("double")
    return one.select(
        F.col("chi2"),
        F.col("n").cast("long").alias("n"),
        F.round(F.sqrt(F.col("chi2") / (nd * F.least(rm, cm))), 6).alias("cramers_v"),
        F.round(F.sqrt(F.col("chi2") / (nd * F.sqrt(rm * cm))), 6).alias("tschuprow_t"),
    )


QUERIES["agg_cramers_v"] = agg_cramers_v

ORACLES["agg_cramers_v"] = f"""
    WITH base AS ({_chi2_sql("lineitem", "l_returnflag", "l_linestatus")}),
    one AS (
      SELECT max(chi2) AS chi2, max(dof) AS dof, sum(observed) AS n,
             count(DISTINCT l_returnflag) AS r,
             count(DISTINCT l_linestatus) AS c
      FROM base)
    SELECT chi2, CAST(n AS BIGINT) AS n,
           round(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * least(CAST(r - 1 AS DOUBLE), CAST(c - 1 AS DOUBLE)))), 6)
             AS cramers_v,
           round(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * sqrt(CAST(r - 1 AS DOUBLE) * CAST(c - 1 AS DOUBLE)))), 6)
             AS tschuprow_t
    FROM one
"""


def etl_table_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot reconciliation report: 'old' = orders minus every 7th
    row with pre-bump prices, 'new' = orders minus every 5th row —
    so the diff must classify adds, removes, price changes, and
    untouched rows, with per-column attribution (see
    ``operators/maintenance.table_diff``).  Aggregated to status
    grain; the oracle replays the same simulation relationally."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        table_diff,
    )

    o = t(spark, sf, "orders")
    old = o.where(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.round(F.col("o_totalprice") * 0.9, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    new = o.where(F.col("o_orderkey") % 5 != 0)
    d = table_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
    return d.groupBy("diff_status").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(
            F.when(F.array_contains("changed_cols", "o_totalprice"), 1)
        ).cast("long").alias("n_price_changes"),
        F.count(
            F.when(F.array_contains("changed_cols", "o_orderstatus"), 1)
        ).cast("long").alias("n_status_changes"),
    )


QUERIES["etl_table_diff"] = etl_table_diff

ORACLES["etl_table_diff"] = """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN round(o_totalprice * 0.9, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0),
    new AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0),
    d AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 'changed'
                  ELSE 'unchanged' END AS diff_status,
             CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                   AND o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 1 ELSE 0 END AS price_chg,
             CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                   AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  THEN 1 ELSE 0 END AS status_chg
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
    SELECT diff_status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(price_chg) AS BIGINT) AS n_price_changes,
           CAST(sum(status_chg) AS BIGINT) AS n_status_changes
    FROM d GROUP BY 1
"""


#: (doc_id, [codepoints]) NFC fixtures: combining-sequence composition,
#: precomposed identity, ligature stability, Hangul jamo composition,
#: the OHM->OMEGA singleton, ASCII identity, and a mixed sentence.
NFC_FIXTURES = [
    (0, [0x65, 0x301]),                      # e + combining acute -> é
    (1, [0xE9]),                             # precomposed é (unchanged)
    (2, [0xFB01]),                           # ﬁ ligature (NFC keeps it)
    (3, [0x1100, 0x1161]),                   # Hangul jamo -> 가
    (4, [0x41, 0x42, 0x43]),                 # plain ASCII
    (5, [0x2126]),                           # OHM SIGN -> GREEK OMEGA
    (6, [0x61, 0x75, 0x308, 0x66, 0x2126]),  # mixed: aü(decomposed)fΩ
]


def text_unicode_nfc(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFC normalization as a CROSS-LIBRARY conformance check:
    Python's ``unicodedata`` (the Spark-side Arrow stage) and DuckDB's
    ``nfc_normalize`` must produce character-identical output on
    composition, Hangul, singleton, and identity fixtures — both sides
    build the inputs from raw codepoints, so no literal-escaping
    ambiguity exists anywhere (see ``operators/text.unicode_nfc``)."""
    from image_matadata_batchprocessing_aws_spark.functions import md5_int32
    from image_matadata_batchprocessing_aws_spark.operators.text import unicode_nfc

    rows = [(i, "".join(chr(c) for c in cps)) for i, cps in NFC_FIXTURES]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = unicode_nfc(df)
    return out.select(
        "doc_id",
        F.length("text_nfc").cast("long").alias("n_chars_nfc"),
        F.col("changed").cast("int").cast("long").alias("changed"),
        md5_int32(F.col("text_nfc")).alias("nfc_fp"),
    )


QUERIES["text_unicode_nfc"] = text_unicode_nfc


def _nfc_fixture_sql() -> str:
    vals = ", ".join(
        f"({i}, {' || '.join(f'chr({c})' for c in cps)})" for i, cps in NFC_FIXTURES
    )
    return f"(VALUES {vals}) t(doc_id, text)"


ORACLES["text_unicode_nfc"] = f"""
    WITH f AS (SELECT * FROM {_nfc_fixture_sql()}),
    n AS (SELECT doc_id, text, nfc_normalize(text) AS text_nfc FROM f)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(length(text_nfc) AS BIGINT) AS n_chars_nfc,
           CAST(CASE WHEN text_nfc <> text THEN 1 ELSE 0 END AS BIGINT)
             AS changed,
           CAST({_md5_32_sql("text_nfc")} AS BIGINT) AS nfc_fp
    FROM n
"""


def embedding_jl_project(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss projection of the 64-d embeddings to 8
    dims — the untrained scale lever ahead of PCA/PQ; exploded
    (vec_id, dim, value) grain, identical left-fold IEEE sequence in
    both engines (see ``operators/similarity.jl_project``)."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        jl_project,
    )

    e = t(spark, sf, "embeddings").select("vec_id", F.col("embedding").alias("e"))
    return jl_project(e, "e", "vec_id")


QUERIES["embedding_jl_project"] = embedding_jl_project

from image_matadata_batchprocessing_aws_spark.operators.similarity import (  # noqa: E402
    jl_project_sql as _jl_sql,
)

ORACLES["embedding_jl_project"] = _jl_sql("embeddings", "embedding", "vec_id")


NEYMAN_BUDGET = 2000


def sample_neyman(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman-allocation stratified sample of orders by priority on
    totals: the variance-minimizing budget split N_h*sd_h, all-integer
    allocation chain, md5 keep-predicate — reported per stratum as
    (allocation, rows actually kept); see
    ``operators/sampling.neyman_stratified_sample``."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        neyman_stratified_sample,
    )

    s = neyman_stratified_sample(
        t(spark, sf, "orders"), "o_orderkey", "o_orderpriority",
        "o_totalprice", budget=NEYMAN_BUDGET,
        value_digits=2,  # |scaled|^2 must fit int64 (price ~5e5 -> 5e7 scaled)
    )
    return s.groupBy("o_orderpriority").agg(
        F.first("__alloc").cast("long").alias("alloc"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
    )


QUERIES["sample_neyman"] = sample_neyman

from image_matadata_batchprocessing_aws_spark.functions import (  # noqa: E402
    md5_int64_sql as _md5_64_sql,
)
from image_matadata_batchprocessing_aws_spark.operators.sampling import (  # noqa: E402
    SAMPLE_DENOM as _SDENOM,
)

ORACLES["sample_neyman"] = f"""
    WITH b AS (
      SELECT o_orderkey, o_orderpriority AS s,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS x
      FROM orders),
    per AS (
      SELECT s, count(*) AS n, sum(x) AS sx,
             sum(x * x // 1073741824) AS qhi,
             sum(x * x % 1073741824) AS qlo
      FROM b GROUP BY s),
    e AS (
      SELECT s, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) / 100.0 AS sv,
             (CAST(qhi AS DOUBLE) * 1073741824.0 + CAST(qlo AS DOUBLE))
               / 10000.0 AS q
      FROM per),
    sd AS (
      SELECT s, n,
             CASE WHEN n >= 2
                  THEN sqrt(greatest((q - sv * sv / nd) / (nd - 1.0), 0.0))
                  ELSE 0.0 END AS sd
      FROM e),
    w AS (SELECT s, n,
                 greatest(n * CAST(round(sd * 10000.0) AS BIGINT), n) AS w
          FROM sd),
    tot AS (SELECT sum(w) AS wsum FROM w),
    alloc AS (
      SELECT s, n, least(({NEYMAN_BUDGET} * w) // wsum, n) AS alloc
      FROM w, tot),
    kept AS (
      SELECT b.s, a.alloc
      FROM b JOIN alloc a ON b.s = a.s
      WHERE ({_md5_64_sql("CAST(o_orderkey AS VARCHAR) || chr(31) || ''")} % {_SDENOM})
            < (a.alloc * {_SDENOM}) // a.n)
    SELECT s AS o_orderpriority,
           CAST(max(alloc) AS BIGINT) AS alloc,
           CAST(count(*) AS BIGINT) AS n_sampled
    FROM kept GROUP BY s
"""


HAMPEL_LOOKBACK = 15
HAMPEL_MIN = 5
HAMPEL_K = 3.0


def ts_hampel(spark: SparkSession, sf: str) -> DataFrame:
    """Hampel median/MAD outlier flags per user — the
    spike-robust sibling of ``ts_anomaly_events``; doubled-integer
    sorted-array medians keep both engines bit-identical (see
    ``operators/timeseries.hampel_filter``)."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        hampel_filter,
    )

    e = t(spark, sf, "events").where(F.col("value").isNotNull())
    return hampel_filter(
        e, "user_id", "ts", "value", "event_id",
        lookback=HAMPEL_LOOKBACK, min_periods=HAMPEL_MIN, k=HAMPEL_K,
    )


QUERIES["ts_hampel"] = ts_hampel

ORACLES["ts_hampel"] = f"""
    WITH b AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(round(value * 10000.0) AS BIGINT) AS xs
      FROM events WHERE value IS NOT NULL),
    l AS (
      SELECT user_id, event_id, xs,
             list_sort(list(xs) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms, event_id
                                      ROWS BETWEEN {HAMPEL_LOOKBACK - 1}
                                      PRECEDING AND CURRENT ROW)) AS hist
      FROM b),
    m AS (
      SELECT user_id, event_id, xs, hist, len(hist) AS n,
             CASE WHEN len(hist) % 2 = 1
                  THEN 2 * hist[(len(hist) + 1) // 2]
                  ELSE hist[len(hist) // 2] + hist[len(hist) // 2 + 1]
             END AS med2
      FROM l),
    d AS (
      SELECT user_id, event_id, xs, n, med2,
             list_sort(list_transform(hist, v -> abs(2 * v - med2))) AS devs
      FROM m),
    e AS (
      SELECT user_id, event_id, xs, n, med2,
             CASE WHEN n % 2 = 1
                  THEN 2 * devs[(n + 1) // 2]
                  ELSE devs[n // 2] + devs[n // 2 + 1]
             END AS mad4
      FROM d)
    SELECT user_id, event_id,
           round(med2 / 20000.0, 6) AS rolling_med,
           round(mad4 / 40000.0, 6) AS rolling_mad,
           CASE WHEN n >= {HAMPEL_MIN}
                THEN CAST(CASE WHEN 2.0 * CAST(abs(2 * xs - med2) AS DOUBLE)
                               > {HAMPEL_K * 1.4826} * CAST(mad4 AS DOUBLE)
                          THEN 1 ELSE 0 END AS BIGINT)
           END AS is_outlier
    FROM e
"""


TS_SAMPLE_M = 40


def ts_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded Theil-Sen robust trend per user (median of pairwise
    slopes over a deterministic md5-ranked sample) — the
    contamination-tolerant answer to ``agg_regression``'s OLS slope
    (see ``operators/stats.theil_sen_bounded``)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import (
        theil_sen_bounded,
    )

    e = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .withColumn("ts_ms", F.unix_millis("ts"))
    )
    return theil_sen_bounded(
        e, "user_id", "ts_ms", "value", "event_id", sample_m=TS_SAMPLE_M
    )


QUERIES["ts_theil_sen"] = ts_theil_sen

ORACLES["ts_theil_sen"] = f"""
    WITH b AS (
      SELECT user_id, event_id, epoch_ms(ts) AS x,
             CAST(round(value * 10000.0) AS BIGINT) AS y,
             {_md5_64_sql("CAST(event_id AS VARCHAR) || chr(31) || 'ts'")} AS h
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, x, y,
             row_number() OVER (PARTITION BY user_id ORDER BY h, event_id)
               AS rk
      FROM b),
    s AS (SELECT * FROM r WHERE rk <= {TS_SAMPLE_M}),
    pairs AS (
      SELECT a.user_id,
             CAST(bb.y - a.y AS DOUBLE) / CAST(bb.x - a.x AS DOUBLE)
               AS slope_ms
      FROM s a JOIN s bb
        ON a.user_id = bb.user_id AND a.rk < bb.rk AND a.x <> bb.x)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope_ms, 0.5) * 86400000.0 / 10000.0, 6)
             AS slope_per_day
    FROM pairs GROUP BY user_id
"""


def eval_mcnemar(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar's paired test comparing two cheap is-the-order-big
    heuristics on the SAME orders (priority-based vs status-based,
    gold = totalprice > 150k) — the discordant-cell statistic that
    accuracy deltas can't give you (see
    ``operators/evaluation.mcnemar_test``)."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        mcnemar_test,
    )

    o = t(spark, sf, "orders")
    return mcnemar_test(
        o,
        gold=F.col("o_totalprice") > 150000.0,
        pred_a=F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        pred_b=F.col("o_orderstatus") == "F",
    )


QUERIES["eval_mcnemar"] = eval_mcnemar

ORACLES["eval_mcnemar"] = """
    WITH p AS (
      SELECT CASE WHEN (o_orderpriority IN ('1-URGENT', '2-HIGH'))
                       = (o_totalprice > 150000.0) THEN 1 ELSE 0 END AS a_ok,
             CASE WHEN (o_orderstatus = 'F')
                       = (o_totalprice > 150000.0) THEN 1 ELSE 0 END AS b_ok
      FROM orders),
    agg AS (
      SELECT count(*) AS n, sum(a_ok) AS na, sum(b_ok) AS nb,
             sum(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END) AS c
      FROM p)
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(na AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc_a,
           round(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc_b,
           CAST(b AS BIGINT) AS b_discordant,
           CAST(c AS BIGINT) AS c_discordant,
           round(CASE WHEN b + c > 0
                 THEN CAST(abs(b - c) - 1 AS DOUBLE)
                      * CAST(abs(b - c) - 1 AS DOUBLE)
                      / CAST(b + c AS DOUBLE) END, 6) AS mcnemar_chi2
    FROM agg
"""


def etl_date_spine(spark: SparkSession, sf: str) -> DataFrame:
    """Dense CALENDAR SPINE between the order-date bounds with date
    attributes and gap-filled daily counts — the dimension every BI
    layer joins against, generated as sequence+explode off ONE bounds
    row (span-bounded, never a global hardcoded calendar).  ISO
    weekday (Mon=1) keeps both engines aligned where their default
    dow conventions differ."""
    o = t(spark, sf, "orders").select(
        F.to_date("o_orderdate").alias("d")
    )
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    daily = o.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    j = spine.join(daily, "day", "left")
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.weekday("day") + 1).cast("long").alias("iso_dow"),
        F.month("day").cast("long").alias("month"),
        F.quarter("day").cast("long").alias("quarter"),
        (F.last_day("day") == F.col("day")).cast("int").cast("long").alias(
            "is_month_end"
        ),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )


QUERIES["etl_date_spine"] = etl_date_spine

ORACLES["etl_date_spine"] = """
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds),
    daily AS (SELECT d AS day, count(*) AS n_orders FROM o GROUP BY 1)
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           CAST(isodow(s.day) AS BIGINT) AS iso_dow,
           CAST(month(s.day) AS BIGINT) AS month,
           CAST(quarter(s.day) AS BIGINT) AS quarter,
           CAST(CASE WHEN last_day(s.day) = s.day THEN 1 ELSE 0 END AS BIGINT)
             AS is_month_end,
           CAST(coalesce(d.n_orders, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


RULES_MIN_SUPPORT = 3


def reco_association_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Association rules over order baskets (Agrawal & Srikant 1994):
    directed support/confidence/lift for every part pair passing the
    support floor — the rules semantics the cosine CF operator does
    not give (see ``operators/reco.association_rules``)."""
    from image_matadata_batchprocessing_aws_spark.operators.reco import (
        association_rules,
    )

    li = t(spark, sf, "lineitem")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_pair_support=RULES_MIN_SUPPORT
    )


QUERIES["reco_association_rules"] = reco_association_rules

ORACLES["reco_association_rules"] = f"""
    WITH pb AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    sizes AS (SELECT b, count(*) AS sz FROM pb GROUP BY b),
    ok AS (SELECT pb.b, pb.i FROM pb JOIN sizes USING (b) WHERE sz <= 50),
    sup AS (SELECT i, count(*) AS n_i FROM ok GROUP BY i),
    tot AS (SELECT count(DISTINCT b) AS nb_total FROM ok),
    co AS (
      SELECT a.i AS ia, bb.i AS ib, count(*) AS con
      FROM ok a JOIN ok bb ON a.b = bb.b AND a.i < bb.i
      GROUP BY 1, 2 HAVING count(*) >= {RULES_MIN_SUPPORT}),
    bidir AS (
      SELECT ia, ib, con FROM co
      UNION ALL SELECT ib AS ia, ia AS ib, con FROM co)
    SELECT bidir.ia AS antecedent, bidir.ib AS consequent,
           CAST(con AS BIGINT) AS pair_n,
           round(con / CAST(nb_total AS DOUBLE), 6) AS support,
           round(CAST(con AS DOUBLE) / CAST(sa.n_i AS DOUBLE), 6)
             AS confidence,
           round(CAST(con AS DOUBLE) * CAST(nb_total AS DOUBLE)
                 / (CAST(sa.n_i AS DOUBLE) * CAST(sb.n_i AS DOUBLE)), 6)
             AS lift
    FROM bidir
    JOIN sup sa ON bidir.ia = sa.i
    JOIN sup sb ON bidir.ib = sb.i
    CROSS JOIN tot
"""


def agg_kruskal_wallis(spark: SparkSession, sf: str) -> DataFrame:
    """Kruskal-Wallis rank test: does l_quantity's distribution differ
    across return flags?  The distribution-free sibling of
    ``agg_anova_oneway`` (`operators/stats.kruskal_wallis`) — heavy
    ties (50 distinct integer quantities) exercise the doubled-midrank
    + tie-correction path."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import kruskal_wallis

    li = t(spark, sf, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return kruskal_wallis(li, "l_returnflag", "qty")


QUERIES["agg_kruskal_wallis"] = agg_kruskal_wallis

from image_matadata_batchprocessing_aws_spark.operators.stats import kruskal_wallis_sql  # noqa: E402

ORACLES["agg_kruskal_wallis"] = kruskal_wallis_sql(
    "(SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem)",
    "l_returnflag",
    "qty",
)


def agg_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew diagnosis over events.user_id: the top-20 hottest
    keys with share / ratio-to-mean / heavy flag — the profile that
    decides between a plain shuffle join, AQE skew splitting, and
    `operators/skew.salted_join`."""
    from image_matadata_batchprocessing_aws_spark.operators.skew import key_skew_profile

    return key_skew_profile(t(spark, sf, "events"), "user_id")


QUERIES["agg_key_skew"] = agg_key_skew

from image_matadata_batchprocessing_aws_spark.operators.skew import key_skew_profile_sql  # noqa: E402

ORACLES["agg_key_skew"] = key_skew_profile_sql("events", "user_id")


def sketch_ams_f2(spark: SparkSession, sf: str) -> DataFrame:
    """AMS tug-of-war F2 estimate of events.user_id (self-join size /
    skew price in ONE pass, no groupBy) next to the exact F2 and the
    relative error — `operators/sketches.ams_f2`, md5-parity signs so
    every counter is engine-portable."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import ams_f2

    return ams_f2(t(spark, sf, "events"), "user_id")


QUERIES["sketch_ams_f2"] = sketch_ams_f2

from image_matadata_batchprocessing_aws_spark.operators.sketches import ams_f2_sql  # noqa: E402

ORACLES["sketch_ams_f2"] = ams_f2_sql("events", "user_id")


COMPACT_TARGET_CHARS = 4096


def etl_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction planning over the documents corpus treated
    as a file listing (doc = file, n_chars = bytes, lang = table
    partition): next-fit-decreasing bins at a 4 KiB-character target —
    `operators/maintenance.compaction_plan`, the pure-metadata half of
    `compact_parquet`."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        compaction_plan,
    )

    d = t(spark, sf, "documents").where(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    return compaction_plan(
        d, "lang", "n_chars", "doc_id", target_bytes=COMPACT_TARGET_CHARS
    )


QUERIES["etl_compaction_plan"] = etl_compaction_plan

from image_matadata_batchprocessing_aws_spark.operators.maintenance import (  # noqa: E402
    compaction_plan_sql,
)

ORACLES["etl_compaction_plan"] = compaction_plan_sql(
    "(SELECT * FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL)",
    "lang",
    "n_chars",
    "doc_id",
    target_bytes=COMPACT_TARGET_CHARS,
)


MUTUAL_K = 5
MUTUAL_N_LEFT = 10  # same query/corpus split as knn_brute_cosine


def ann_mutual_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual-nearest-neighbor pair mining with ratio-margin scoring
    (Artetxe & Schwenk 2019) between the query slice and the corpus —
    `operators/similarity.mutual_topk`: pairs in each other's cosine
    top-5, margin = 2*cos / (mean of each side's top-5)."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
        mutual_topk,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    left = e.where(F.col("vec_id") < MUTUAL_N_LEFT).select(
        F.col("vec_id").alias("left_id"), F.col("e").alias("le")
    )
    right = e.where(F.col("vec_id") >= MUTUAL_N_LEFT).select(
        F.col("vec_id").alias("right_id"), F.col("e").alias("re")
    )
    return mutual_topk(left, right, k=MUTUAL_K)


QUERIES["ann_mutual_margin"] = ann_mutual_margin

ORACLES["ann_mutual_margin"] = f"""
    WITH q AS (SELECT vec_id AS left_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {MUTUAL_N_LEFT}),
    c AS (SELECT vec_id AS right_id, CAST(embedding AS DOUBLE[]) AS ce
          FROM embeddings WHERE vec_id >= {MUTUAL_N_LEFT}),
    lr AS (SELECT left_id, right_id,
                  round(list_cosine_similarity(qe, ce), 6) AS score,
                  row_number() OVER (PARTITION BY left_id
                    ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC,
                             right_id) AS rn
           FROM q CROSS JOIN c),
    lrk AS (SELECT * FROM lr WHERE rn <= {MUTUAL_K}),
    rl AS (SELECT right_id, left_id,
                  round(list_cosine_similarity(ce, qe), 6) AS score,
                  row_number() OVER (PARTITION BY right_id
                    ORDER BY round(list_cosine_similarity(ce, qe), 6) DESC,
                             left_id) AS rn
           FROM c CROSS JOIN q),
    rlk AS (SELECT * FROM rl WHERE rn <= {MUTUAL_K}),
    lm AS (SELECT left_id,
                  CAST(sum(CAST(round(score * 1e6) AS BIGINT)) AS DOUBLE)
                    / (CAST(count(*) AS DOUBLE) * 1e6) AS mean_l
           FROM lrk GROUP BY left_id),
    rm AS (SELECT right_id,
                  CAST(sum(CAST(round(score * 1e6) AS BIGINT)) AS DOUBLE)
                    / (CAST(count(*) AS DOUBLE) * 1e6) AS mean_r
           FROM rlk GROUP BY right_id)
    SELECT lrk.left_id, lrk.right_id, lrk.score,
           CAST(lrk.rn AS BIGINT) AS rn_lr,
           CAST(rlk.rn AS BIGINT) AS rn_rl,
           round(2.0 * lrk.score / (mean_l + mean_r), 6) AS margin
    FROM lrk
    JOIN rlk ON lrk.left_id = rlk.left_id AND lrk.right_id = rlk.right_id
    JOIN lm ON lrk.left_id = lm.left_id
    JOIN rm ON lrk.right_id = rm.right_id
"""


def agg_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    """10%-trimmed mean of extended price per return flag next to the
    plain mean — `operators/stats.trimmed_mean`, the robust location
    estimate between mean and median."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import trimmed_mean

    return trimmed_mean(
        t(spark, sf, "lineitem"), "l_returnflag", "l_extendedprice"
    )


QUERIES["agg_trimmed_mean"] = agg_trimmed_mean

from image_matadata_batchprocessing_aws_spark.operators.stats import trimmed_mean_sql  # noqa: E402

ORACLES["agg_trimmed_mean"] = trimmed_mean_sql(
    "lineitem", "l_returnflag", "l_extendedprice"
)


ZONEMAP_BIN = 4096
ZONEMAP_LO = "1998-01-01"
ZONEMAP_HI = "1998-03-31"


def etl_zonemap_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map pruning audit (`operators/maintenance.zonemap_stats` +
    `zonemap_prune_report`): the same Q1-1998 ship-date predicate
    priced against TWO physical layouts of lineitem — orderkey-binned
    files (unclustered: min/max spans everything, nothing skips) vs
    month-partitioned files (time-clustered: all but ~3 files skip).
    The scan-fraction delta is the business case for re-clustering."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        zonemap_prune_report,
        zonemap_stats,
    )

    # l_shipdate reads as TIMESTAMP_NTZ: derive a tz-FREE day number
    # (wall-clock date diffed against the epoch date) so the query is
    # correct under any session timezone
    epoch0 = F.lit("1970-01-01").cast("date")
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        F.datediff(F.col("l_shipdate").cast("date"), epoch0).alias("ship_day"),
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ship_month"),
    )
    lo = F.datediff(F.lit(ZONEMAP_LO).cast("date"), epoch0)
    hi = F.datediff(F.lit(ZONEMAP_HI).cast("date"), epoch0)
    by_key = zonemap_stats(
        li, F.floor(F.col("l_orderkey") / F.lit(ZONEMAP_BIN)), "ship_day"
    )
    by_month = zonemap_stats(li, "ship_month", "ship_day")
    return zonemap_prune_report(by_key, lo, hi).withColumn(
        "layout", F.lit("orderkey_bins")
    ).unionByName(
        zonemap_prune_report(by_month, lo, hi).withColumn(
            "layout", F.lit("month_files")
        )
    )


QUERIES["etl_zonemap_prune"] = etl_zonemap_prune

ORACLES["etl_zonemap_prune"] = f"""
    WITH li AS (
      SELECT l_orderkey,
             CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS ship_day,
             year(l_shipdate) * 100 + month(l_shipdate) AS ship_month
      FROM lineitem),
    bounds AS (
      SELECT DATE '{ZONEMAP_LO}' - DATE '1970-01-01' AS lo,
             DATE '{ZONEMAP_HI}' - DATE '1970-01-01' AS hi),
    by_key AS (
      SELECT CAST(floor(l_orderkey / {ZONEMAP_BIN}) AS BIGINT) AS file_id,
             min(ship_day) AS v_min, max(ship_day) AS v_max,
             count(*) AS n_rows
      FROM li GROUP BY 1),
    by_month AS (
      SELECT ship_month AS file_id,
             min(ship_day) AS v_min, max(ship_day) AS v_max,
             count(*) AS n_rows
      FROM li GROUP BY 1),
    rep_key AS (
      SELECT CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(CASE WHEN v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
             CAST(sum(CASE WHEN NOT (v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo) THEN 1 ELSE 0 END) AS BIGINT)
               AS files_skipped,
             CAST(sum(CASE WHEN v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
             CAST(sum(n_rows) AS BIGINT) AS rows_total,
             round(CAST(sum(CASE WHEN v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo THEN n_rows ELSE 0 END) AS DOUBLE)
                   / CAST(sum(n_rows) AS DOUBLE), 6) AS scan_fraction,
             'orderkey_bins' AS layout
      FROM by_key CROSS JOIN bounds),
    rep_month AS (
      SELECT CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(CASE WHEN v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
             CAST(sum(CASE WHEN NOT (v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo) THEN 1 ELSE 0 END) AS BIGINT)
               AS files_skipped,
             CAST(sum(CASE WHEN v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
             CAST(sum(n_rows) AS BIGINT) AS rows_total,
             round(CAST(sum(CASE WHEN v_min IS NOT NULL AND v_min <= hi
                            AND v_max >= lo THEN n_rows ELSE 0 END) AS DOUBLE)
                   / CAST(sum(n_rows) AS DOUBLE), 6) AS scan_fraction,
             'month_files' AS layout
      FROM by_month CROSS JOIN bounds)
    SELECT * FROM rep_key UNION ALL SELECT * FROM rep_month
"""


KT_SAMPLE_M = 60


def agg_kendall_tau(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall's tau-b of quantity vs extended price per return flag
    (`operators/stats.kendall_tau_bounded`) — the concordance member of
    the correlation family next to `agg_corr` (Pearson) and
    `agg_spearman`, on the same bounded deterministic m-sample
    discipline as `ts_theil_sen`."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import kendall_tau_bounded

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
    )
    return kendall_tau_bounded(
        li, "l_returnflag", "l_quantity", "l_extendedprice", "rid",
        sample_m=KT_SAMPLE_M,
    )


QUERIES["agg_kendall_tau"] = agg_kendall_tau

from image_matadata_batchprocessing_aws_spark.operators.stats import kendall_tau_bounded_sql  # noqa: E402

ORACLES["agg_kendall_tau"] = kendall_tau_bounded_sql(
    "(SELECT l_returnflag, l_quantity, l_extendedprice, "
    "l_orderkey * 10 + l_linenumber AS rid FROM lineitem)",
    "l_returnflag",
    "l_quantity",
    "l_extendedprice",
    "rid",
    sample_m=KT_SAMPLE_M,
)


def agg_shannon_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy + evenness of each language's source mix
    (`operators/stats.shannon_entropy`) — the log-scale companion of
    the Gini-impurity `agg_source_diversity`, on the same grain."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import shannon_entropy

    return shannon_entropy(t(spark, sf, "documents"), "lang", "source")


QUERIES["agg_shannon_entropy"] = agg_shannon_entropy

from image_matadata_batchprocessing_aws_spark.operators.stats import shannon_entropy_sql  # noqa: E402

ORACLES["agg_shannon_entropy"] = shannon_entropy_sql("documents", "lang", "source")


PPR_SEED_MOD = 50  # seed cohort: customers with custkey % 50 == 0
PPR_ITERS = 3
PPR_TOPK = 30


def graph_ppr(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from a customer seed cohort over the
    bidirectional customer-supplier graph
    (`operators/graph.personalized_pagerank_scaled`): rank becomes
    proximity-to-cohort — the related-entity recommendation primitive —
    with the same bit-exact fixed-point rounds as `graph_pagerank`."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        personalized_pagerank_scaled,
    )

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        o.where(F.col("o_custkey") % PPR_SEED_MOD == 0)
        .select((F.col("o_custkey") * 2).alias("node"))
        .distinct()
    )
    pr = personalized_pagerank_scaled(edges, seeds, iterations=PPR_ITERS)
    return (
        pr.select(
            F.expr("node % 2").cast("long").alias("node_kind"),
            F.expr("node div 2").cast("long").alias("entity_id"),
            "rank_scaled",
        )
        .orderBy(F.col("rank_scaled").desc(), "node_kind", "entity_id")
        .limit(PPR_TOPK)
    )


QUERIES["graph_ppr"] = graph_ppr


def _ppr_oracle(iters: int = PPR_ITERS) -> str:
    """Unrolled personalized-PageRank CTE chain: the `_pagerank_oracle`
    structure with the restart mass gated to the seed set."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
    )

    scale = PR_SCALE
    restart = (
        f"CASE WHEN sm.is_seed IS NOT NULL THEN "
        f"CAST(({scale} * {PR_DAMP_DEN - PR_DAMP_NUM}) // ({PR_DAMP_DEN} * ns.ns) AS BIGINT) "
        f"ELSE 0 END"
    )
    ctes = [
        """pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        """edges AS (SELECT c AS src, s AS dst FROM pairs
                     UNION ALL SELECT s AS src, c AS dst FROM pairs)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        """nodes AS (SELECT DISTINCT node FROM
                     (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))""",
        f"""seeds AS (SELECT node FROM nodes
                      WHERE node % 2 = 0 AND (node // 2) % {PPR_SEED_MOD} = 0)""",
        "ns AS (SELECT count(*) AS ns FROM seeds)",
        """sm AS (SELECT nodes.node,
                         CASE WHEN s.node IS NOT NULL THEN 1 END AS is_seed
                  FROM nodes LEFT JOIN seeds s ON nodes.node = s.node)""",
        f"""r0 AS (SELECT sm.node,
                          CASE WHEN sm.is_seed IS NOT NULL
                               THEN CAST({scale} // ns.ns AS BIGINT)
                               ELSE 0 END AS rank_scaled
                   FROM sm CROSS JOIN ns)""",
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""i{it} AS (SELECT e.dst AS node,
                       sum((r.rank_scaled * {PR_DAMP_NUM}) // ({PR_DAMP_DEN} * d.deg)) AS inc
                FROM {prev} r JOIN deg d ON r.node = d.src
                JOIN edges e ON r.node = e.src GROUP BY e.dst)"""
        )
        ctes.append(
            f"""r{it} AS (SELECT sm.node,
                       CAST({restart} + coalesce(i.inc, 0) AS BIGINT) AS rank_scaled
                FROM sm CROSS JOIN ns LEFT JOIN i{it} i ON sm.node = i.node)"""
        )
        prev = f"r{it}"
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"""
        SELECT CAST(node % 2 AS BIGINT) AS node_kind,
               CAST(node // 2 AS BIGINT) AS entity_id,
               rank_scaled
        FROM {prev}
        ORDER BY rank_scaled DESC, node_kind, entity_id
        LIMIT {PPR_TOPK}"""
    )


ORACLES["graph_ppr"] = _ppr_oracle()


KFOLD_K = 5


def sample_group_kfold(spark: SparkSession, sf: str) -> DataFrame:
    """Group k-fold audit over documents (`operators/sampling.group_kfold`):
    every source's docs land in ONE fold (the near-dup leakage guard);
    the report shows per-fold doc/group counts — the balance check a
    fold assignment ships with."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import group_kfold

    d = group_kfold(t(spark, sf, "documents"), "source", k=KFOLD_K)
    return d.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_groups"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


QUERIES["sample_group_kfold"] = sample_group_kfold

from image_matadata_batchprocessing_aws_spark.operators.sampling import group_kfold_sql_expr  # noqa: E402

ORACLES["sample_group_kfold"] = f"""
    SELECT {group_kfold_sql_expr("source", 5)} AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents GROUP BY 1
"""


def eval_pr_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Precision-recall curve (`operators/evaluation.pr_curve`): price
    ranking urgent orders, 10 cumulative rank cutoffs — the
    threshold-sweep view of `eval_roc_auc`'s single number, on the
    same scored table."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import pr_curve

    o = t(spark, sf, "orders").withColumn(
        "__y",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0),
    )
    return pr_curve(o, "o_totalprice", "__y", "o_orderkey", n_points=10)


QUERIES["eval_pr_curve"] = eval_pr_curve

from image_matadata_batchprocessing_aws_spark.operators.evaluation import pr_curve_sql  # noqa: E402

ORACLES["eval_pr_curve"] = pr_curve_sql(
    "(SELECT o_totalprice, o_orderkey, CASE WHEN o_orderpriority IN "
    "('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS y FROM orders)",
    "o_totalprice",
    "y",
    "o_orderkey",
    n_points=10,
)


def text_llr_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Dunning log-likelihood bigram collocations over the corpus
    (`operators/text.llr_bigrams`) — the significance-weighted
    companion of `text_pmi_bigrams` (PMI over-rewards rare pairs; LLR
    is what production collocation extractors rank on)."""
    from image_matadata_batchprocessing_aws_spark.operators.text import llr_bigrams

    return llr_bigrams(t(spark, sf, "documents"), "text", min_count=5, top_k=50)


QUERIES["text_llr_collocations"] = text_llr_collocations

ORACLES["text_llr_collocations"] = r"""
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z]{2,}') AS t
      FROM documents),
    idx AS (
      SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
      FROM toks WHERE len(t) >= 2),
    bg AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
    bgc AS (SELECT w1, w2, count(*) AS k11 FROM bg GROUP BY w1, w2),
    r1 AS (SELECT w1, count(*) AS r FROM bg GROUP BY w1),
    c2 AS (SELECT w2, count(*) AS c FROM bg GROUP BY w2),
    nb AS (SELECT sum(k11) AS n FROM bgc),
    cand AS (
      SELECT bgc.w1, bgc.w2, k11, r, c, n
      FROM bgc JOIN r1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nb
      WHERE k11 >= 5),
    scored AS (
      SELECT w1, w2, CAST(k11 AS BIGINT) AS pair_count,
             round(2.0 * (
               (CASE WHEN CAST(k11 AS DOUBLE) > 0 THEN CAST(k11 AS DOUBLE)
                 * ln(CAST(k11 AS DOUBLE) * CAST(n AS DOUBLE)
                      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) ELSE 0.0 END)
             + (CASE WHEN CAST(r AS DOUBLE) - CAST(k11 AS DOUBLE) > 0
                 THEN (CAST(r AS DOUBLE) - CAST(k11 AS DOUBLE))
                 * ln((CAST(r AS DOUBLE) - CAST(k11 AS DOUBLE))
                      * CAST(n AS DOUBLE)
                      / (CAST(r AS DOUBLE)
                         * (CAST(n AS DOUBLE) - CAST(c AS DOUBLE))))
                 ELSE 0.0 END)
             + (CASE WHEN CAST(c AS DOUBLE) - CAST(k11 AS DOUBLE) > 0
                 THEN (CAST(c AS DOUBLE) - CAST(k11 AS DOUBLE))
                 * ln((CAST(c AS DOUBLE) - CAST(k11 AS DOUBLE))
                      * CAST(n AS DOUBLE)
                      / ((CAST(n AS DOUBLE) - CAST(r AS DOUBLE))
                         * CAST(c AS DOUBLE)))
                 ELSE 0.0 END)
             + (CASE WHEN CAST(n AS DOUBLE) - CAST(r AS DOUBLE)
                          - CAST(c AS DOUBLE) + CAST(k11 AS DOUBLE) > 0
                 THEN (CAST(n AS DOUBLE) - CAST(r AS DOUBLE)
                       - CAST(c AS DOUBLE) + CAST(k11 AS DOUBLE))
                 * ln((CAST(n AS DOUBLE) - CAST(r AS DOUBLE)
                       - CAST(c AS DOUBLE) + CAST(k11 AS DOUBLE))
                      * CAST(n AS DOUBLE)
                      / ((CAST(n AS DOUBLE) - CAST(r AS DOUBLE))
                         * (CAST(n AS DOUBLE) - CAST(c AS DOUBLE))))
                 ELSE 0.0 END)
             ), 6) AS llr
      FROM cand),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY llr DESC, w1, w2) AS rn
      FROM scored)
    SELECT w1, w2, pair_count, llr FROM rk WHERE rn <= 50
"""


def agg_gini_wealth(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment
    (`operators/stats.gini_coefficient`) — the full Lorenz inequality
    number next to `agg_pareto_concentration`'s top-share point."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import gini_coefficient

    o = t(spark, sf, "orders").groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend")
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return gini_coefficient(j, "c_mktsegment", "spend")


QUERIES["agg_gini_wealth"] = agg_gini_wealth

from image_matadata_batchprocessing_aws_spark.operators.stats import gini_coefficient_sql  # noqa: E402

ORACLES["agg_gini_wealth"] = gini_coefficient_sql(
    "(SELECT c_mktsegment, spend FROM "
    " (SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY 1) s"
    " JOIN customer ON o_custkey = c_custkey)",
    "c_mktsegment",
    "spend",
)


LATE_THRESHOLD_MS = 10 * 60 * 1000


def stream_lateness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark-sizing evidence (`operators/timeseries.lateness_audit`):
    per event type, how out-of-order events arrive (event_id as arrival
    order, per-user running max of event time) — the measurement that
    picks a `withWatermark` delay before the streaming jobs commit to
    one."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        lateness_audit,
    )

    e = t(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    return lateness_audit(
        e, "user_id", "ts_ms", "event_id", "event_type", LATE_THRESHOLD_MS
    )


QUERIES["stream_lateness_audit"] = stream_lateness_audit

ORACLES["stream_lateness_audit"] = f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
      FROM events),
    marked AS (
      SELECT event_type AS grp,
             coalesce(greatest(
               max(ts_ms) OVER (PARTITION BY user_id ORDER BY event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_ms,
               0), 0) AS late_ms
      FROM e)
    SELECT grp AS "group",
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_ms > {LATE_THRESHOLD_MS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           CAST(max(late_ms) AS BIGINT) AS max_late_ms,
           round(CAST(sum(late_ms) AS DOUBLE) / CAST(count(*) AS DOUBLE), 2)
             AS mean_late_ms
    FROM marked GROUP BY grp
"""


def ts_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-segmentation changepoint per user series
    (`operators/timeseries.changepoint_binseg`): WHERE the mean shifts
    (SSE-argmin split) next to `ts_cusum_shift`'s WHETHER-it-drifts
    test; integer prefix sums, deterministic (cost, t) argmin."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        changepoint_binseg,
    )

    e = t(spark, sf, "events").where(F.col("user_id") % 10 == 0)
    return changepoint_binseg(e, "user_id", "event_id", "value")


QUERIES["ts_changepoint"] = ts_changepoint

from image_matadata_batchprocessing_aws_spark.operators.timeseries import changepoint_binseg_sql  # noqa: E402

ORACLES["ts_changepoint"] = changepoint_binseg_sql(
    "(SELECT * FROM events WHERE user_id % 10 = 0)",
    "user_id",
    "event_id",
    "value",
)


FP_BUCKETS = 64


def etl_table_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Order-independent 64-bucket checksum of the events table
    (`operators/maintenance.table_fingerprint`) — the O(1)-output
    pre-audit for `etl_table_diff`: identical fingerprints iff tables
    match, and a mismatch localizes to 1/64 of the keyspace.  Columns
    pre-projected to engine-portable strings (epoch-ms for the
    timestamp, cents-quantized BIGINT for the double)."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        table_fingerprint,
    )

    e = t(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    return table_fingerprint(e, "event_id", n_buckets=FP_BUCKETS)


QUERIES["etl_table_fingerprint"] = etl_table_fingerprint

from image_matadata_batchprocessing_aws_spark.operators.maintenance import table_fingerprint_sql  # noqa: E402

ORACLES["etl_table_fingerprint"] = table_fingerprint_sql(
    "(SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,"
    " CAST(round(value * 100) AS BIGINT) AS value_c FROM events)",
    "event_id",
    ["event_id", "user_id", "event_type", "ts_ms", "value_c"],
    n_buckets=FP_BUCKETS,
)


TEMP_ALPHA = 0.5
TEMP_TARGET = 300


def sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled multilingual mixture (mC4/XLM-R style,
    `operators/sampling.temperature_rates` + `temperature_sample`):
    per-language n^0.5 target shares, ppm keep rates, and the realized
    deterministic-hash sample counts, in one report."""
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
    )

    d = t(spark, sf, "documents")
    rates = temperature_rates(d, "lang", alpha=TEMP_ALPHA, target_total=TEMP_TARGET)
    kept = temperature_sample(
        d, "doc_id", "lang", alpha=TEMP_ALPHA, target_total=TEMP_TARGET
    )
    kc = kept.groupBy(F.col("lang").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return rates.join(kc, "stratum", "left").select(
        "stratum",
        "n_rows",
        "target_share",
        "rate_ppm",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


QUERIES["sample_temperature"] = sample_temperature

from image_matadata_batchprocessing_aws_spark.operators.sampling import (  # noqa: E402
    SAMPLE_DELIM as _SD,
    TEMP_RATE_DENOM as _TRD,
)
from image_matadata_batchprocessing_aws_spark.functions import md5_int64_sql as _md5sql  # noqa: E402

_TEMP_H = _md5sql("CAST(doc_id AS VARCHAR) || chr(31) || 'temp-v1'")

ORACLES["sample_temperature"] = f"""
    WITH counts AS (
      SELECT lang AS stratum, count(*) AS n_rows FROM documents GROUP BY 1),
    withp AS (
      SELECT stratum, n_rows,
             CAST(round(pow(CAST(n_rows AS DOUBLE), {TEMP_ALPHA}) * 1000000.0)
                  AS BIGINT) AS pq
      FROM counts),
    tot AS (SELECT sum(pq) AS tpq FROM withp),
    rates AS (
      SELECT stratum, CAST(n_rows AS BIGINT) AS n_rows,
             round(CAST(pq AS DOUBLE) / CAST(tpq AS DOUBLE), 6) AS target_share,
             CAST(round(least(1.0,
               {float(TEMP_TARGET)} * (CAST(pq AS DOUBLE) / CAST(tpq AS DOUBLE))
                 / CAST(n_rows AS DOUBLE)) * {float(_TRD)}) AS BIGINT)
               AS rate_ppm
      FROM withp CROSS JOIN tot),
    kept AS (
      SELECT d.lang AS stratum, count(*) AS n_kept
      FROM documents d JOIN rates r ON d.lang = r.stratum
      WHERE ({_TEMP_H}) % {_TRD} < r.rate_ppm
      GROUP BY 1)
    SELECT rates.stratum, rates.n_rows, rates.target_share, rates.rate_ppm,
           CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates LEFT JOIN kept ON rates.stratum = kept.stratum
"""


def pipeline_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Per-stage counts of the flagship curation pipeline
    (`pipeline_pretraining_corpus`'s exact stages — quality/lang gate,
    exact dedup, decontamination, hash sample) — the FUNNEL view a
    data-curation run reports, where the flagship returns the rows."""
    from image_matadata_batchprocessing_aws_spark.operators.dedup import (
        decontamination_report,
        exact_dedup_keep_first,
    )
    from image_matadata_batchprocessing_aws_spark.operators.sampling import hash_sample
    from image_matadata_batchprocessing_aws_spark.operators.text import add_quality_score
    from image_matadata_batchprocessing_aws_spark.queries.pipeline import (
        DECONTAM_N,
        LANGS,
        QUALITY_MIN,
        SAMPLE_FRACTION,
        SAMPLE_SALT,
    )

    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        track_persist,
    )

    docs = t(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    # each funnel stage is BOTH counted and fed to the next stage, so
    # the reused frames persist (the SCALE.md-documented trade: without
    # this the five count branches rescan/retokenize the corpus per
    # stage); release is the session's query boundary
    kept = track_persist(
        add_quality_score(train).where(
            (F.col("quality") >= QUALITY_MIN) & F.col("lang").isin(*LANGS)
        )
    )
    deduped = track_persist(exact_dedup_keep_first(kept))
    contaminated = decontamination_report(
        deduped, bench, n=DECONTAM_N, min_hits=1
    ).select("doc_id")
    clean = track_persist(deduped.join(contaminated, "doc_id", "left_anti"))
    sampled = hash_sample(clean, "doc_id", SAMPLE_FRACTION, salt=SAMPLE_SALT)

    def stage(df, sid, name):
        return df.agg(
            F.lit(sid).cast("long").alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    return (
        stage(train, 0, "input")
        .unionByName(stage(kept, 1, "quality_lang"))
        .unionByName(stage(deduped, 2, "exact_dedup"))
        .unionByName(stage(clean, 3, "decontaminated"))
        .unionByName(stage(sampled, 4, "sampled"))
    )


QUERIES["pipeline_curation_funnel"] = pipeline_curation_funnel


def _funnel_oracle() -> str:
    from image_matadata_batchprocessing_aws_spark.operators.sampling import (
        sample_predicate_sql,
    )
    from image_matadata_batchprocessing_aws_spark.queries.pipeline import (
        _PIPELINE_ORACLE,
        SAMPLE_FRACTION,
        SAMPLE_SALT,
    )

    marker = "SELECT doc_id, lang, n_tokens"
    ctes = _PIPELINE_ORACLE[: _PIPELINE_ORACLE.rindex(marker)].rstrip()
    pred = sample_predicate_sql("doc_id", SAMPLE_FRACTION, SAMPLE_SALT)
    return f"""{ctes}
    , clean AS (
      SELECT doc_id FROM dd
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    sampled AS (SELECT doc_id FROM clean WHERE {pred})
    SELECT CAST(0 AS BIGINT) AS stage_id, 'input' AS stage,
           CAST((SELECT count(*) FROM train) AS BIGINT) AS n_docs
    UNION ALL SELECT 1, 'quality_lang', (SELECT count(*) FROM kept)
    UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM dd)
    UNION ALL SELECT 3, 'decontaminated', (SELECT count(*) FROM clean)
    UNION ALL SELECT 4, 'sampled', (SELECT count(*) FROM sampled)
"""


ORACLES["pipeline_curation_funnel"] = _funnel_oracle()


def ts_pacf(spark: SparkSession, sf: str) -> DataFrame:
    """ACF lags 1-4 + Durbin-Levinson PACF per user series
    (`operators/timeseries.pacf_table`) — the AR-order diagnostic
    (PACF cutoff at lag p says fit AR(p)) extending `ts_autocorr`'s
    single lag point."""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import pacf_table

    e = (
        t(spark, sf, "events")
        .where(F.col("user_id") % 10 == 0)
        .withColumn("ts_ms", F.unix_millis("ts"))
    )
    return pacf_table(e, "user_id", "ts_ms", "value", "event_id")


QUERIES["ts_pacf"] = ts_pacf

from image_matadata_batchprocessing_aws_spark.operators.timeseries import pacf_table_sql  # noqa: E402

ORACLES["ts_pacf"] = pacf_table_sql(
    "(SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms"
    " FROM events WHERE user_id % 10 = 0)",
    "user_id",
    "ts_ms",
    "value",
    "event_id",
)


CMS_JS_D = 4
CMS_JS_W = 512


def sketch_cms_joinsize(spark: SparkSession, sf: str) -> DataFrame:
    """Join-size estimation from two Count-Min sketches (the CM
    inner-product query, `operators/sketches.cms_join_size`): price
    orders ⋈ lineitem on orderkey from two scan-bound d*w counter
    tables before paying the shuffle — the two-table companion of
    `sketch_ams_f2`, with the exact histogram product as the
    verification arm."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import cms_join_size

    return cms_join_size(
        t(spark, sf, "orders"),
        t(spark, sf, "lineitem"),
        "o_orderkey",
        "l_orderkey",
        d=CMS_JS_D,
        w=CMS_JS_W,
    )


QUERIES["sketch_cms_joinsize"] = sketch_cms_joinsize

from image_matadata_batchprocessing_aws_spark.operators.sketches import cms_join_size_sql  # noqa: E402

ORACLES["sketch_cms_joinsize"] = cms_join_size_sql(
    "orders", "lineitem", "o_orderkey", "l_orderkey", d=CMS_JS_D, w=CMS_JS_W
)


KD_K = 5
KD_TOPN = 20


KD_CENT_MOD = 37  # coarse cells: corpus vectors with vec_id % 37 == 0


def embedding_knn_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """k-NN-distance outlier screen over the embedding corpus at its
    SCALE shape (`operators/similarity.knn_distance_outliers_bucketed`):
    candidates come only from each vector's IVF cell (deterministic
    mod-sampled centroids, cosine assignment), so pairs are
    sum-of-cell-size^2, never N^2 — k-dist is an upper bound, which for
    outlier screening errs in the safe direction; vectors in cells too
    small to certify k neighbors surface with NULL kdist at the top.
    The brute all-pairs form stays as the unit-tested exactness
    baseline in the operator module."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
        ivf_assign,
        knn_distance_outliers_bucketed,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    cents = e.where(F.col("vec_id") % KD_CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("cv")
    )
    assigned = ivf_assign(e, cents, "vec_id", "e", nprobe=1)
    return knn_distance_outliers_bucketed(
        assigned, "vec_id", "e", "cent_id", k=KD_K, top_n=KD_TOPN
    )


QUERIES["embedding_knn_outliers"] = embedding_knn_outliers

ORACLES["embedding_knn_outliers"] = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, e AS cv FROM v
              WHERE vec_id % {KD_CENT_MOD} = 0),
    ca AS (SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY round(list_cosine_similarity(e, cv), 6) DESC,
                             cent_id) AS rn
           FROM v CROSS JOIN cents),
    cells AS (SELECT v.vec_id, v.e, ca.cent_id
              FROM v JOIN ca ON v.vec_id = ca.vec_id AND ca.rn = 1),
    pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             round(list_distance(q.e, c.e), 6) AS score
      FROM cells q JOIN cells c
        ON q.cent_id = c.cent_id AND q.vec_id <> c.vec_id),
    ranked AS (
      SELECT qid, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score ASC, cid) AS rn
      FROM pairs),
    kth AS (SELECT qid, score AS kdist FROM ranked WHERE rn = {KD_K})
    SELECT v.vec_id, kth.kdist
    FROM v LEFT JOIN kth ON v.vec_id = kth.qid
    ORDER BY kth.kdist DESC NULLS FIRST, v.vec_id LIMIT {KD_TOPN}
"""


PSI_SPLIT_YEAR = 1998
PSI_BINS = 10


def agg_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of order value, pre-vs-post 1998
    (`operators/stats.psi_drift`) — the credit-risk drift standard
    next to `agg_ks_drift`/`etl_drift_report`: bins cut at the
    reference deciles, Laplace-smoothed, quantized bin terms."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import psi_drift

    o = t(spark, sf, "orders")
    ref = o.where(F.year("o_orderdate") < PSI_SPLIT_YEAR)
    cur = o.where(F.year("o_orderdate") >= PSI_SPLIT_YEAR)
    return psi_drift(ref, cur, "o_totalprice", n_bins=PSI_BINS)


QUERIES["agg_psi_drift"] = agg_psi_drift


def _psi_oracle() -> str:
    n_bins = PSI_BINS
    qs = [i / n_bins for i in range(1, n_bins)]
    cut_cols = ",\n             ".join(
        f"quantile_cont(o_totalprice, {q}) AS c{i}" for i, q in enumerate(qs)
    )
    bin_expr = " + ".join(
        f"CASE WHEN o_totalprice > c{i} THEN 1 ELSE 0 END" for i in range(len(qs))
    )
    return f"""
    WITH ref AS (SELECT o_totalprice FROM orders
                 WHERE year(o_orderdate) < {PSI_SPLIT_YEAR}
                   AND o_totalprice IS NOT NULL),
    cur AS (SELECT o_totalprice FROM orders
            WHERE year(o_orderdate) >= {PSI_SPLIT_YEAR}
              AND o_totalprice IS NOT NULL),
    cuts AS (SELECT {cut_cols} FROM ref),
    rb AS (SELECT ({bin_expr}) AS bin, count(*) AS nr
           FROM ref CROSS JOIN cuts GROUP BY 1),
    cb AS (SELECT ({bin_expr}) AS bin, count(*) AS nc
           FROM cur CROSS JOIN cuts GROUP BY 1),
    bins AS (
      SELECT coalesce(rb.bin, cb.bin) AS bin,
             coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
      FROM rb FULL JOIN cb ON rb.bin = cb.bin),
    tot AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM bins),
    per AS (
      SELECT bin, tr, tc,
             CAST(round(((CAST(nc + 1 AS DOUBLE) / CAST(tc + {n_bins} AS DOUBLE))
                   - (CAST(nr + 1 AS DOUBLE) / CAST(tr + {n_bins} AS DOUBLE)))
               * ln((CAST(nc + 1 AS DOUBLE) / CAST(tc + {n_bins} AS DOUBLE))
                    / (CAST(nr + 1 AS DOUBLE) / CAST(tr + {n_bins} AS DOUBLE)))
               * 1e9) AS BIGINT) AS tq
      FROM bins CROSS JOIN tot),
    agg AS (
      SELECT max(tr) AS n_ref, max(tc) AS n_cur, sum(tq) AS psi_q,
             max(struct_pack(tq := tq, bin := bin)) AS worst
      FROM per)
    SELECT CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           round(CAST(psi_q AS DOUBLE) / 1e9, 6) AS psi,
           round(CAST(worst.tq AS DOUBLE) / 1e9, 6) AS worst_bin_term,
           CAST(worst.bin AS BIGINT) AS worst_bin
    FROM agg
"""


ORACLES["agg_psi_drift"] = _psi_oracle()


PSEUDO_SALT = "pseud-v1"


def etl_pseudonymize(spark: SparkSession, sf: str) -> DataFrame:
    """GDPR-style pseudonymization audit
    (`operators/cleaning.pseudonymize_keys`): custkey tokenized with
    one salt across orders AND customer, then the report proves what
    matters — token cardinality equals raw cardinality per table
    (bijection on the data) and the cross-table join count is
    unchanged (referential integrity survives re-keying)."""
    from image_matadata_batchprocessing_aws_spark.operators.cleaning import (
        pseudonymize_keys,
    )

    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf, "customer").select("c_custkey")
    po = pseudonymize_keys(o, ["o_custkey"], PSEUDO_SALT)
    pc = pseudonymize_keys(c, ["c_custkey"], PSEUDO_SALT)
    raw_join = o.join(c, o["o_custkey"] == c["c_custkey"]).agg(
        F.count(F.lit(1)).alias("joined_raw")
    )
    tok_join = po.join(pc, po["o_custkey"] == pc["c_custkey"]).agg(
        F.count(F.lit(1)).alias("joined_token")
    )
    stats = po.agg(
        F.count(F.lit(1)).alias("orders_rows"),
        F.countDistinct("o_custkey").alias("order_tokens"),
    ).crossJoin(
        pc.agg(
            F.count(F.lit(1)).alias("customer_rows"),
            F.countDistinct("c_custkey").alias("customer_tokens"),
        )
    ).crossJoin(
        o.agg(F.countDistinct("o_custkey").alias("order_raw_keys"))
    ).crossJoin(
        c.agg(F.countDistinct("c_custkey").alias("customer_raw_keys"))
    )
    return (
        stats.crossJoin(raw_join)
        .crossJoin(tok_join)
        .select(
            F.col("orders_rows").cast("long").alias("orders_rows"),
            F.col("customer_rows").cast("long").alias("customer_rows"),
            (F.col("order_tokens") == F.col("order_raw_keys")).alias(
                "orders_bijective"
            ),
            (F.col("customer_tokens") == F.col("customer_raw_keys")).alias(
                "customer_bijective"
            ),
            F.col("joined_raw").cast("long").alias("joined_raw"),
            F.col("joined_token").cast("long").alias("joined_token"),
            (F.col("joined_raw") == F.col("joined_token")).alias("join_preserved"),
        )
    )


QUERIES["etl_pseudonymize"] = etl_pseudonymize

from image_matadata_batchprocessing_aws_spark.operators.cleaning import pseudonymize_sql_expr  # noqa: E402

_PT_O = pseudonymize_sql_expr("o_custkey", PSEUDO_SALT)
_PT_C = pseudonymize_sql_expr("c_custkey", PSEUDO_SALT)

ORACLES["etl_pseudonymize"] = f"""
    WITH po AS (SELECT o_orderkey, {_PT_O} AS tok FROM orders),
    pc AS (SELECT {_PT_C} AS tok FROM customer),
    s AS (
      SELECT (SELECT count(*) FROM po) AS orders_rows,
             (SELECT count(*) FROM pc) AS customer_rows,
             (SELECT count(DISTINCT tok) FROM po) AS order_tokens,
             (SELECT count(DISTINCT tok) FROM pc) AS customer_tokens,
             (SELECT count(DISTINCT o_custkey) FROM orders) AS order_raw,
             (SELECT count(DISTINCT c_custkey) FROM customer) AS customer_raw,
             (SELECT count(*) FROM orders JOIN customer
                ON o_custkey = c_custkey) AS joined_raw,
             (SELECT count(*) FROM po JOIN pc USING (tok)) AS joined_token)
    SELECT CAST(orders_rows AS BIGINT) AS orders_rows,
           CAST(customer_rows AS BIGINT) AS customer_rows,
           order_tokens = order_raw AS orders_bijective,
           customer_tokens = customer_raw AS customer_bijective,
           CAST(joined_raw AS BIGINT) AS joined_raw,
           CAST(joined_token AS BIGINT) AS joined_token,
           joined_raw = joined_token AS join_preserved
    FROM s
"""


MARKOV_ITERS = 3


def agg_markov_steady(spark: SparkSession, sf: str) -> DataFrame:
    """Stationary distribution of the empirical event-type Markov
    chain (`operators/graph.markov_steady_scaled`): where a long
    session spends its time — the limit view of
    `agg_event_transitions`' one-step counts, in the same bit-exact
    fixed-point arithmetic as `graph_pagerank`."""
    from image_matadata_batchprocessing_aws_spark.operators.graph import (
        markov_steady_scaled,
    )
    from pyspark.sql import Window

    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("src_state"),
        F.col("event_type").alias("dst_state"),
    ).where(F.col("src_state").isNotNull())
    tr = pairs.groupBy("src_state", "dst_state").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return markov_steady_scaled(tr, iterations=MARKOV_ITERS)


QUERIES["agg_markov_steady"] = agg_markov_steady


def _markov_oracle(iters: int = MARKOV_ITERS) -> str:
    from image_matadata_batchprocessing_aws_spark.operators.graph import PR_SCALE

    scale = PR_SCALE
    ctes = [
        """seq AS (
          SELECT event_type AS dst_state,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS src_state
          FROM events WHERE user_id IS NOT NULL)""",
        """tr0 AS (SELECT src_state, dst_state, count(*) AS cnt FROM seq
                   WHERE src_state IS NOT NULL GROUP BY 1, 2)""",
        """states AS (SELECT DISTINCT s FROM (
            SELECT src_state AS s FROM tr0
            UNION ALL SELECT dst_state FROM tr0))""",
        """marked AS (SELECT states.s AS state,
                             o.src_state IS NULL AS is_absorbing
                      FROM states LEFT JOIN
                        (SELECT DISTINCT src_state FROM tr0) o
                        ON states.s = o.src_state)""",
        """tr AS (SELECT src_state, dst_state, cnt FROM tr0
                  UNION ALL
                  SELECT state, state, CAST(1 AS BIGINT)
                  FROM marked WHERE is_absorbing)""",
        "tot AS (SELECT src_state, sum(cnt) AS tot FROM tr GROUP BY 1)",
        "nn AS (SELECT count(*) AS n FROM states)",
        f"""p0 AS (SELECT s AS state, CAST({scale} // nn.n AS BIGINT)
                     AS pi FROM states CROSS JOIN nn)""",
    ]
    prev = "p0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""p{it} AS (
              SELECT tr.dst_state AS state,
                     CAST(sum((p.pi * tr.cnt) // t.tot) AS BIGINT) AS pi
              FROM {prev} p
              JOIN tot t ON p.state = t.src_state
              JOIN tr ON p.state = tr.src_state
              GROUP BY tr.dst_state)"""
        )
        prev = f"p{it}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT m.state, CAST(coalesce(p.pi, 0) AS BIGINT) AS pi_scaled,
           m.is_absorbing
    FROM marked m LEFT JOIN {prev} p ON p.state = m.state
"""
    )


ORACLES["agg_markov_steady"] = _markov_oracle()


from image_matadata_batchprocessing_aws_spark.queries.streaming_batch import (  # noqa: E402
    stream_join_attribution_outer,
)

QUERIES["stream_join_attribution_outer"] = stream_join_attribution_outer

ORACLES["stream_join_attribution_outer"] = """
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
          FROM events WHERE event_type = 'purchase')
    SELECT p.purchase_id, p.user_id, c.click_id,
           CAST(epoch_ms(p.purchase_ts) - epoch_ms(c.click_ts) AS BIGINT) AS lag_ms,
           round(p.value, 2) AS value,
           c.click_id IS NOT NULL AS attributed
    FROM p LEFT JOIN c ON p.user_id = c.user_id
                 AND c.click_ts BETWEEN p.purchase_ts - INTERVAL '1 hour'
                                    AND p.purchase_ts
"""


def ts_holt_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-origin backtest of the Holt smoother per user
    (`operators/timeseries.holt_backtest`): model MAE vs the naive
    carry-forward MAE and the skill score — does `ts_holt` earn its
    keep on this data?"""
    from image_matadata_batchprocessing_aws_spark.operators.timeseries import (
        holt_backtest,
    )

    e = t(spark, sf, "events").where(F.col("user_id") % 10 == 0)
    return holt_backtest(
        e, "user_id", "ts", "value", "event_id",
        alpha=HOLT_ALPHA, beta=HOLT_BETA, lookback=HOLT_LOOKBACK,
    )


QUERIES["ts_holt_backtest"] = ts_holt_backtest

ORACLES["ts_holt_backtest"] = f"""
    WITH RECURSIVE b AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(round(value * 10000.0) AS BIGINT) AS xs
      FROM events WHERE value IS NOT NULL AND user_id % 10 = 0),
    frames AS (
      SELECT user_id, event_id, ts_ms, xs,
             list(xs) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                            ROWS BETWEEN {HOLT_LOOKBACK - 1} PRECEDING
                            AND CURRENT ROW) AS hist
      FROM b),
    rec AS (
      SELECT user_id, event_id, ts_ms, xs, hist, 1 AS k,
             CAST(hist[1] AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS t
      FROM frames
      UNION ALL
      SELECT user_id, event_id, ts_ms, xs, hist, k + 1,
             {_HOLT_STEP_L} AS l,
             {HOLT_BETA} * (({_HOLT_STEP_L}) - l) + (1.0 - {HOLT_BETA}) * t
               AS t
      FROM rec WHERE k < len(hist)),
    f AS (SELECT user_id, event_id, ts_ms, xs,
                 round((l + t) / 10000.0, 6) AS fc
          FROM rec WHERE k = len(hist)),
    scored AS (
      SELECT user_id,
             CAST(xs AS DOUBLE) / 10000.0 AS x, fc,
             CAST(lead(xs) OVER (PARTITION BY user_id
                                 ORDER BY ts_ms, event_id) AS DOUBLE)
               / 10000.0 AS nx
      FROM f),
    errs AS (
      SELECT user_id,
             CAST(round(abs(fc - nx) * 1e6) AS BIGINT) AS eq,
             CAST(round(abs(x - nx) * 1e6) AS BIGINT) AS nq
      FROM scored WHERE nx IS NOT NULL),
    agg AS (
      SELECT user_id, count(*) AS n, sum(eq) AS se, sum(nq) AS sn
      FROM errs GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n_forecasts,
           round(CAST(se AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
             AS mae_holt,
           round(CAST(sn AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
             AS mae_naive,
           round(CASE WHEN sn > 0 THEN
             1.0 - CAST(se AS DOUBLE) / CAST(sn AS DOUBLE) END, 6) AS skill
    FROM agg
"""


CHUNK_BUDGET_CHARS = 256


def chunk_sentence_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence-boundary chunking at a ~256-char budget
    (`operators/text.sentence_budget_chunks`) — the RAG-ingest chunker
    that never splits mid-sentence, vs `chunk_docs_overlap`'s fixed
    character windows; next-fit over one keyed cumulative sum."""
    from image_matadata_batchprocessing_aws_spark.operators.text import (
        sentence_budget_chunks,
    )

    return sentence_budget_chunks(
        t(spark, sf, "documents"), budget_chars=CHUNK_BUDGET_CHARS
    )


QUERIES["chunk_sentence_budget"] = chunk_sentence_budget

ORACLES["chunk_sentence_budget"] = rf"""
    WITH parts AS (
      SELECT doc_id, string_split_regex(text, '[.!?]+') AS arr
      FROM documents),
    pos AS (
      SELECT doc_id, arr, unnest(range(len(arr))) AS i FROM parts),
    sized AS (
      SELECT doc_id, i AS part_idx, length(trim(arr[i + 1])) AS len
      FROM pos WHERE trim(arr[i + 1]) <> ''),
    chunked AS (
      SELECT doc_id,
             CAST(floor(CAST(sum(len) OVER (PARTITION BY doc_id
                     ORDER BY part_idx ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - len AS DOUBLE) / {float(CHUNK_BUDGET_CHARS)}) AS BIGINT)
               AS chunk_id,
             len
      FROM sized)
    SELECT doc_id, chunk_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(len) AS BIGINT) AS n_chars,
           round(CAST(sum(len) AS DOUBLE) / {float(CHUNK_BUDGET_CHARS)}, 4)
             AS fill_ratio
    FROM chunked GROUP BY doc_id, chunk_id
"""


def etl_fixed_width_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width record format round-trip
    (`sources/csv_source.parse_fixed_width`): orders serialize to
    24-char fixed-width lines (10-digit key, 2-char status, 12-digit
    price cents), parse back through the map-side parser, and
    re-aggregate per status — counts and exact cent totals must
    survive the text round trip."""
    from image_matadata_batchprocessing_aws_spark.sources.csv_source import (
        parse_fixed_width,
    )

    o = t(spark, sf, "orders")
    lines = o.select(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 10, "0"),
            F.rpad(F.col("o_orderstatus"), 2, " "),
            F.lpad(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                12,
                "0",
            ),
        ).alias("line")
    )
    parsed = parse_fixed_width(
        lines,
        "line",
        [
            ("orderkey", 1, 10, "long"),
            ("status", 11, 2, "string"),
            ("price_c", 13, 12, "long"),
        ],
    )
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.countDistinct("orderkey").cast("long").alias("n_keys"),
        F.sum("price_c").cast("long").alias("total_cents"),
    )


QUERIES["etl_fixed_width_roundtrip"] = etl_fixed_width_roundtrip

ORACLES["etl_fixed_width_roundtrip"] = """
    WITH lines AS (
      SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
             || rpad(o_orderstatus, 2, ' ')
             || lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                     12, '0') AS line
      FROM orders),
    parsed AS (
      SELECT CAST(trim(substr(line, 1, 10)) AS BIGINT) AS orderkey,
             trim(substr(line, 11, 2)) AS status,
             CAST(trim(substr(line, 13, 12)) AS BIGINT) AS price_c
      FROM lines)
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT orderkey) AS BIGINT) AS n_keys,
           CAST(sum(price_c) AS BIGINT) AS total_cents
    FROM parsed GROUP BY status
"""


def eval_average_precision(spark: SparkSession, sf: str) -> DataFrame:
    """Exact average precision + best-achievable F1 and its rank cutoff
    (`operators/evaluation.average_precision`) for price ranking urgent
    orders — the full-resolution area under `eval_pr_curve`'s 10-point
    summary, on the same scored table as `eval_roc_auc`."""
    from image_matadata_batchprocessing_aws_spark.operators.evaluation import (
        average_precision,
    )

    o = t(spark, sf, "orders").withColumn(
        "__y",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0),
    )
    return average_precision(o, "o_totalprice", "__y", "o_orderkey")


QUERIES["eval_average_precision"] = eval_average_precision

from image_matadata_batchprocessing_aws_spark.operators.evaluation import average_precision_sql  # noqa: E402

ORACLES["eval_average_precision"] = average_precision_sql(
    "(SELECT o_totalprice, o_orderkey, CASE WHEN o_orderpriority IN "
    "('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS y FROM orders)",
    "o_totalprice",
    "y",
    "o_orderkey",
)


EMB_DIM = 64
EMB_DRIFT_DIGITS = 6


def embedding_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space drift between two snapshot halves of the corpus
    (`operators/similarity.embedding_drift_report`): centroid L2
    shift, mean-norm delta, worst-drifting dimension — the drift
    metric family extended into vector space."""
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
        embedding_drift_report,
    )

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e")
    )
    old = e.where(F.col("vec_id") % 2 == 0)
    new = e.where(F.col("vec_id") % 2 == 1)
    return embedding_drift_report(old, new, "e", dim=EMB_DIM)


QUERIES["embedding_drift"] = embedding_drift


def _emb_drift_oracle() -> str:
    scale = float(10**EMB_DRIFT_DIGITS)
    dim = EMB_DIM

    def side(tag, parity):
        sums = ",\n             ".join(
            f"sum(CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * {scale})"
            f" AS BIGINT)) AS s{tag}_{i}"
            for i in range(dim)
        )
        return f"""m{tag} AS (
          SELECT count(*) AS n{tag},
             {sums},
             sum(CAST(round(sqrt(list_reduce(list_transform(
                   CAST(embedding AS DOUBLE[]), x -> x * x),
                   (a, b) -> a + b)) * {scale}) AS BIGINT)) AS norm{tag}
          FROM embeddings WHERE vec_id % 2 = {parity})"""

    so = ", ".join(f"so_{i}" for i in range(dim))
    sn = ", ".join(f"sn_{i}" for i in range(dim))
    renames_o = ", ".join(f"so_{i} := s_o_{i}" for i in range(dim))
    return f"""
    WITH {side('_o', 0)},
    {side('_n', 1)},
    j AS (SELECT * FROM m_o CROSS JOIN m_n),
    lists AS (
      SELECT n_o, n_n, norm_o, norm_n,
             list_value({", ".join(f"s_o_{i}" for i in range(dim))}) AS lo,
             list_value({", ".join(f"s_n_{i}" for i in range(dim))}) AS ln
      FROM j),
    cents AS (
      SELECT n_o, n_n, norm_o, norm_n,
             list_transform(lo, x -> CAST(x AS DOUBLE)
               / (CAST(n_o AS DOUBLE) * {scale})) AS co,
             list_transform(ln, x -> CAST(x AS DOUBLE)
               / (CAST(n_n AS DOUBLE) * {scale})) AS cn
      FROM lists),
    diffs AS (
      SELECT *, list_transform(range(1, {dim + 1}),
                               i -> cn[i] - co[i]) AS diff
      FROM cents),
    worst AS (
      SELECT max(struct_pack(d := abs(d.diff[d.i]), negi := -d.i)) AS w
      FROM (SELECT diff, unnest(range(1, {dim + 1})) AS i
            FROM diffs) d)
    SELECT CAST(n_o AS BIGINT) AS n_old, CAST(n_n AS BIGINT) AS n_new,
           round(sqrt(list_reduce(list_transform(diff, x -> x * x),
                                  (a, b) -> a + b)), 6) AS centroid_shift,
           round(CAST(norm_n AS DOUBLE) / (CAST(n_n AS DOUBLE) * {scale})
                 - CAST(norm_o AS DOUBLE) / (CAST(n_o AS DOUBLE) * {scale}),
                 6) AS mean_norm_delta,
           round(w.d, 6) AS worst_dim_shift,
           CAST(-w.negi AS BIGINT) AS worst_dim
    FROM diffs CROSS JOIN worst
"""


ORACLES["embedding_drift"] = _emb_drift_oracle()


def funnel_step_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Per-step latency percentiles for the signup->click->purchase
    funnel — the time-to-convert numbers next to `funnel_conversion`'s
    survival counts (p50/p90/max per step over exact integer ms,
    quantile_cont-matched percentiles)."""
    ev = t(spark, sf, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias(
            "t_signup"
        )
    ).where(F.col("t_signup").isNotNull())
    c = (
        ev.join(s, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts_ms") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts_ms") > F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_purchase"))
    )
    lat1 = s.join(c, "user_id").select(
        F.lit(1).cast("long").alias("step"),
        F.lit("signup_to_click").alias("transition"),
        (F.col("t_click") - F.col("t_signup")).alias("__lat"),
    )
    lat2 = c.join(p, "user_id").select(
        F.lit(2).cast("long").alias("step"),
        F.lit("click_to_purchase").alias("transition"),
        (F.col("t_purchase") - F.col("t_click")).alias("__lat"),
    )

    def report(lat):
        return lat.groupBy("step", "transition").agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.percentile(F.col("__lat"), F.lit(0.5)), 2).alias("p50_ms"),
            F.round(F.percentile(F.col("__lat"), F.lit(0.9)), 2).alias("p90_ms"),
            F.max("__lat").cast("long").alias("max_ms"),
        )

    return report(lat1).unionByName(report(lat2))


QUERIES["funnel_step_latency"] = funnel_step_latency

ORACLES["funnel_step_latency"] = """
    WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    s AS (SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t_signup
          FROM ev GROUP BY user_id HAVING t_signup IS NOT NULL),
    c AS (SELECT ev.user_id, min(ts_ms) AS t_click
          FROM ev JOIN s ON ev.user_id = s.user_id
          WHERE event_type = 'click' AND ts_ms > t_signup
          GROUP BY ev.user_id),
    p AS (SELECT ev.user_id, min(ts_ms) AS t_purchase
          FROM ev JOIN c ON ev.user_id = c.user_id
          WHERE event_type = 'purchase' AND ts_ms > t_click
          GROUP BY ev.user_id),
    l1 AS (SELECT t_click - t_signup AS lat
           FROM s JOIN c ON s.user_id = c.user_id),
    l2 AS (SELECT t_purchase - t_click AS lat
           FROM c JOIN p ON c.user_id = p.user_id)
    SELECT CAST(1 AS BIGINT) AS step, 'signup_to_click' AS transition,
           CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(lat, 0.5), 2) AS p50_ms,
           round(quantile_cont(lat, 0.9), 2) AS p90_ms,
           CAST(max(lat) AS BIGINT) AS max_ms
    FROM l1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click_to_purchase',
           CAST(count(*) AS BIGINT),
           round(quantile_cont(lat, 0.5), 2),
           round(quantile_cont(lat, 0.9), 2),
           CAST(max(lat) AS BIGINT)
    FROM l2
"""


def ts_gap_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-event gap distribution per user (sampled cohort) — the
    evidence that sizes `etl_resample_gapfill`'s grid and
    `etl_interpolate`'s trust window: per series, gap count, p50/p95
    gap, longest gap."""
    from pyspark.sql import Window

    e = (
        t(spark, sf, "events")
        .where(F.col("user_id") % 10 == 0)
        .select("user_id", F.unix_millis("ts").alias("ts_ms"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = e.select(
        "user_id", (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("__gap")
    ).where(F.col("__gap").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.percentile(F.col("__gap"), F.lit(0.5)), 2).alias("p50_gap_ms"),
        F.round(F.percentile(F.col("__gap"), F.lit(0.95)), 2).alias("p95_gap_ms"),
        F.max("__gap").cast("long").alias("max_gap_ms"),
    )


QUERIES["ts_gap_stats"] = ts_gap_stats

ORACLES["ts_gap_stats"] = """
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
      FROM events WHERE user_id % 10 = 0),
    gaps AS (
      SELECT user_id,
             ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms, event_id) AS gap
      FROM e)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap, 0.5), 2) AS p50_gap_ms,
           round(quantile_cont(gap, 0.95), 2) AS p95_gap_ms,
           CAST(max(gap) AS BIGINT) AS max_gap_ms
    FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
"""


def graph_reciprocity(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocity of the event-type transition digraph: what fraction
    of distinct directed edges have their reverse — plus self-loop
    count and density — the one-row shape diagnostic before walking it
    (`agg_markov_steady`)."""
    from pyspark.sql import Window

    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .distinct()
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nonloop = edges.where(F.col("src") != F.col("dst"))
    recip = nonloop.intersect(rev)
    nodes = edges.select(F.col("src").alias("v")).union(
        edges.select(F.col("dst").alias("v"))
    ).distinct()
    return (
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(
            edges.where(F.col("src") == F.col("dst")).agg(
                F.count(F.lit(1)).alias("n_self_loops")
            )
        )
        .crossJoin(recip.agg(F.count(F.lit(1)).alias("__n_recip")))
        .crossJoin(nodes.agg(F.count(F.lit(1)).alias("__n_nodes")))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_self_loops").cast("long").alias("n_self_loops"),
            F.round(
                F.col("__n_recip").cast("double")
                / (F.col("n_edges") - F.col("n_self_loops")).cast("double"),
                6,
            ).alias("reciprocity"),
            F.round(
                F.col("n_edges").cast("double")
                / (F.col("__n_nodes") * F.col("__n_nodes")).cast("double"),
                6,
            ).alias("density"),
        )
    )


QUERIES["graph_reciprocity"] = graph_reciprocity

ORACLES["graph_reciprocity"] = """
    WITH seq AS (
      SELECT event_type AS dst,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src
      FROM events WHERE user_id IS NOT NULL),
    edges AS (SELECT DISTINCT src, dst FROM seq WHERE src IS NOT NULL),
    nonloop AS (SELECT src, dst FROM edges WHERE src <> dst),
    recip AS (
      SELECT count(*) AS n FROM nonloop a
      WHERE EXISTS (SELECT 1 FROM edges b
                    WHERE b.src = a.dst AND b.dst = a.src)),
    nodes AS (SELECT count(DISTINCT v) AS n FROM (
      SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges))
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM edges WHERE src = dst) AS BIGINT)
             AS n_self_loops,
           round(CAST((SELECT n FROM recip) AS DOUBLE)
                 / CAST((SELECT count(*) FROM edges)
                        - (SELECT count(*) FROM edges WHERE src = dst)
                        AS DOUBLE), 6) AS reciprocity,
           round(CAST((SELECT count(*) FROM edges) AS DOUBLE)
                 / CAST((SELECT n FROM nodes)
                        * (SELECT n FROM nodes) AS DOUBLE), 6) AS density
"""


WAU_WINDOW_DAYS = 7


def agg_engagement_daily(spark: SparkSession, sf: str) -> DataFrame:
    """The product-engagement panel: per day, DAU, rolling 7-day WAU,
    stickiness (DAU/WAU), and the new-vs-returning split (first-seen
    day per user).  WAU uses the scalable EXPLODE pattern — each
    (user, day) activity row contributes to the 7 window days it
    belongs to, so rolling DISTINCT becomes a keyed groupBy
    (count-distinct per window day), never a window function over an
    unbounded user set; the fan-out is exactly the window length."""
    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    ud = e.select(
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86400 * 1_000_000)).alias("day"),
    ).distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(WAU_WINDOW_DAYS - 1))
        ).alias("wday"),
    )
    wau = fan.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    splits = (
        ud.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)).alias(
                "n_returning"
            ),
        )
    )
    return (
        dau.join(wau, "day")
        .join(splits, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
            F.col("n_new").cast("long").alias("n_new"),
            F.col("n_returning").cast("long").alias("n_returning"),
        )
    )


QUERIES["agg_engagement_daily"] = agg_engagement_daily

ORACLES["agg_engagement_daily"] = f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
      FROM events WHERE user_id IS NOT NULL),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
    fan AS (
      SELECT user_id, day + d AS wday
      FROM ud, unnest(range({WAU_WINDOW_DAYS})) AS t(d)),
    wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau
            FROM fan GROUP BY wday),
    fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
    splits AS (
      SELECT ud.day,
             sum(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END) AS n_new,
             sum(CASE WHEN ud.day <> fs.first_day THEN 1 ELSE 0 END)
               AS n_returning
      FROM ud JOIN fs ON ud.user_id = fs.user_id GROUP BY ud.day)
    SELECT CAST(dau.day AS BIGINT) AS day,
           CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_returning AS BIGINT) AS n_returning
    FROM dau JOIN wau ON dau.day = wau.day
    JOIN splits ON dau.day = splits.day
"""


SEQ_MAX_LEN = 20
SEQ_MIN_SUPPORT = 5
SEQ_TOPK = 30


def reco_seq_patterns(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded PrefixSpan sequential patterns over user event journeys
    (`operators/reco.sequential_patterns`): ordered non-contiguous
    event-type subsequences of length 2-3 by user support — the
    temporal sibling of `reco_association_rules` (which ignores order)
    and `agg_event_transitions` (which only sees adjacency)."""
    from image_matadata_batchprocessing_aws_spark.operators.reco import sequential_patterns

    e = t(spark, sf, "events").where(F.col("user_id").isNotNull())
    return sequential_patterns(
        e, "user_id", ["ts", "event_id"], "event_type",
        max_seq_len=SEQ_MAX_LEN, min_support=SEQ_MIN_SUPPORT, top_k=SEQ_TOPK,
    )


QUERIES["reco_seq_patterns"] = reco_seq_patterns

ORACLES["reco_seq_patterns"] = f"""
    WITH seq AS (
      SELECT user_id AS k, event_type AS it,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events WHERE user_id IS NOT NULL
      QUALIFY pos <= {SEQ_MAX_LEN}),
    pairs AS (
      SELECT a.k, a.it AS i1, b.it AS i2, a.pos AS p1, b.pos AS p2
      FROM seq a JOIN seq b ON a.k = b.k AND a.pos < b.pos),
    l2 AS (
      SELECT i1, i2, count(*) AS support
      FROM (SELECT DISTINCT k, i1, i2 FROM pairs)
      GROUP BY i1, i2 HAVING count(*) >= {SEQ_MIN_SUPPORT}),
    fp AS (
      SELECT pairs.* FROM pairs JOIN l2 USING (i1, i2)),
    l3 AS (
      SELECT i1, i2, i3, count(*) AS support
      FROM (SELECT DISTINCT fp.k, fp.i1, fp.i2, c.it AS i3
            FROM fp JOIN seq c ON fp.k = c.k AND c.pos > fp.p2)
      GROUP BY i1, i2, i3 HAVING count(*) >= {SEQ_MIN_SUPPORT}),
    allp AS (
      SELECT i1 || '>' || i2 AS pattern, CAST(2 AS BIGINT) AS length,
             CAST(support AS BIGINT) AS support
      FROM l2
      UNION ALL
      SELECT i1 || '>' || i2 || '>' || i3, CAST(3 AS BIGINT),
             CAST(support AS BIGINT)
      FROM l3)
    SELECT pattern, length, support FROM allp
    ORDER BY support DESC, pattern LIMIT {SEQ_TOPK}
"""


RAKE_TOPK = 40
RAKE_MIN_COUNT = 2


def text_rake_keyphrases(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyphrase extraction over the corpus
    (`operators/text.rake_keyphrases`): phrase-level keywords (maximal
    stopword-free token runs scored by summed word degree/frequency) —
    the multi-word granularity `text_tfidf_keywords`/`text_pmi_bigrams`
    /`text_llr_collocations` don't cover."""
    from image_matadata_batchprocessing_aws_spark.operators.text import rake_keyphrases

    return rake_keyphrases(
        t(spark, sf, "documents"),
        min_phrase_count=RAKE_MIN_COUNT,
        top_k=RAKE_TOPK,
    )


QUERIES["text_rake_keyphrases"] = text_rake_keyphrases

from image_matadata_batchprocessing_aws_spark.operators.text import STOPWORDS as _RAKE_STOPS  # noqa: E402

_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)

ORACLES["text_rake_keyphrases"] = f"""
    WITH frags AS (
      SELECT doc_id, string_split_regex(lower(text), '[^a-z ]+') AS arr
      FROM documents),
    fpos AS (
      SELECT doc_id, unnest(range(len(arr))) AS fi, arr FROM frags),
    ftok AS (
      SELECT doc_id, fi,
             string_split_regex(trim(arr[fi + 1]), ' +') AS tarr
      FROM fpos),
    tpos AS (
      SELECT doc_id, fi, unnest(range(len(tarr))) AS pos, tarr FROM ftok),
    toks AS (
      SELECT doc_id, fi, pos, tarr[pos + 1] AS w FROM tpos
      WHERE tarr[pos + 1] <> ''),
    marked AS (
      SELECT doc_id, fi, pos, w,
             CASE WHEN w IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END AS is_stop,
             sum(CASE WHEN w IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id, fi ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
      FROM toks),
    phrases AS (
      SELECT doc_id, fi, pid,
             string_agg(w, ' ' ORDER BY pos) AS phrase
      FROM marked WHERE is_stop = 0 GROUP BY doc_id, fi, pid),
    members AS (
      SELECT phrase, unnest(range(len(string_split(phrase, ' ')))) AS i,
             string_split(phrase, ' ') AS parr
      FROM phrases),
    mrows AS (SELECT phrase, i, parr[i + 1] AS w,
                     len(parr) AS plen FROM members),
    word_stats AS (
      SELECT w, count(*) AS freq, sum(plen) AS deg
      FROM mrows GROUP BY w),
    slot AS (
      SELECT DISTINCT mrows.phrase, mrows.i,
             CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) * 1e6)
                  AS BIGINT) AS ws_q
      FROM mrows JOIN word_stats USING (w)),
    scored AS (
      SELECT phrase, sum(ws_q) AS score_q FROM slot GROUP BY phrase),
    counts AS (
      SELECT phrase, count(*) AS n_occurrences FROM phrases GROUP BY phrase)
    SELECT scored.phrase,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           round(CAST(score_q AS DOUBLE) / 1e6, 4) AS rake_score
    FROM scored JOIN counts USING (phrase)
    WHERE n_occurrences >= {RAKE_MIN_COUNT}
    ORDER BY rake_score DESC, phrase LIMIT {RAKE_TOPK}
"""


CC_MIN_DEG = 3
CC_TOPK = 20


def graph_clustering_coeff(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node local clustering coefficient on the part co-purchase
    graph: 2*tri(v) / (deg(v)*(deg(v)-1)) — how clique-like each
    node's neighborhood is, the local view of `graph_triangles`'
    global count.  Same canonical a<b<c enumeration; each triangle
    credits its three corners via one explode; top-20 by coefficient
    among nodes with degree >= 3."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    li = li.where(F.col("l_orderkey") % 4 == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    edges = a.join(b, "o").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tris = (
        edges.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.join(per_node, "v", "left")
        .where(F.col("deg") >= CC_MIN_DEG)
        .select(
            F.col("v").cast("long").alias("part"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.lit(2.0) * F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy(F.col("clustering_coeff").desc(), "part")
        .limit(CC_TOPK)
    )


QUERIES["graph_clustering_coeff"] = graph_clustering_coeff

ORACLES["graph_clustering_coeff"] = f"""
    WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
                WHERE l_orderkey % 4 = 0),
    edges AS (SELECT DISTINCT x.p AS a, y.p AS b
              FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
    tris AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b),
    corners AS (
      SELECT a AS v FROM tris UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris),
    per_node AS (SELECT v, count(*) AS n_tri FROM corners GROUP BY v),
    deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY v)
    SELECT CAST(deg.v AS BIGINT) AS part,
           CAST(deg AS BIGINT) AS degree,
           CAST(coalesce(n_tri, 0) AS BIGINT) AS n_triangles,
           round(2.0 * CAST(coalesce(n_tri, 0) AS DOUBLE)
                 / CAST(deg * (deg - 1) AS DOUBLE), 6) AS clustering_coeff
    FROM deg LEFT JOIN per_node ON deg.v = per_node.v
    WHERE deg >= {CC_MIN_DEG}
    ORDER BY clustering_coeff DESC, part LIMIT {CC_TOPK}
"""


HN_K = 5
HN_N_QUERIES = 10


def embedding_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """HARD-negative mining for contrastive/retrieval training: per
    query vector, the top-k most similar corpus vectors with a
    DIFFERENT label — the negatives that actually move a loss, vs
    `embedding_negative_sample`'s random ones (Karpukhin et al. 2020,
    DPR).  Same broadcast top-k kernel as `knn_brute_cosine` with a
    label anti-filter in the pair predicate; at corpus scale the
    candidates come from the IVF path unchanged."""
    from image_matadata_batchprocessing_aws_spark.functions import dot, l2_norm
    from image_matadata_batchprocessing_aws_spark.operators.similarity import (
        as_double_array,
    )
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("e"), "label"
    )
    q = e.where(F.col("vec_id") < HN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("label").alias("qlabel"),
        l2_norm(F.col("e")).alias("__nq"),
    )
    c = e.where(F.col("vec_id") >= HN_N_QUERIES).select(
        F.col("vec_id").alias("neg_id"),
        F.col("e").alias("ce"),
        F.col("label").alias("clabel"),
        l2_norm(F.col("e")).alias("__nc"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("clabel") != F.col("qlabel"))
    score = F.round(
        dot(F.col("qe"), F.col("ce")) / (F.col("__nq") * F.col("__nc")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neg_id"))
    return (
        pairs.select("query_id", "qlabel", "neg_id", "clabel", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= HN_K)
        .select(
            "query_id",
            F.col("qlabel").cast("long").alias("query_label"),
            "neg_id",
            F.col("clabel").cast("long").alias("neg_label"),
            "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )


QUERIES["embedding_hard_negatives"] = embedding_hard_negatives

ORACLES["embedding_hard_negatives"] = f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
                      label AS qlabel
               FROM embeddings WHERE vec_id < {HN_N_QUERIES}),
    c AS (SELECT vec_id AS neg_id, CAST(embedding AS DOUBLE[]) AS ce,
                 label AS clabel
          FROM embeddings WHERE vec_id >= {HN_N_QUERIES}),
    s AS (SELECT query_id, qlabel, neg_id, clabel,
                 round(list_cosine_similarity(qe, ce), 6) AS score
          FROM q CROSS JOIN c WHERE clabel <> qlabel),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neg_id) AS rn
          FROM s)
    SELECT query_id, CAST(qlabel AS BIGINT) AS query_label,
           neg_id, CAST(clabel AS BIGINT) AS neg_label,
           score, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= {HN_K}
"""


def etl_scd2_audit(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 invariant audit (`operators/maintenance.scd2_validity_audit`)
    over the `etl_scd2_history` build: overlaps, contiguity gaps,
    bad-current keys, NULL valid_from — all zero on a healthy build,
    and the ORACLE proves both engines agree the build is healthy (the
    unit test plants corruption to prove the detectors fire)."""
    from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
        scd2_validity_audit,
    )
    from image_matadata_batchprocessing_aws_spark.queries.etl import etl_scd2_history

    hist = etl_scd2_history(spark, sf)
    return scd2_validity_audit(
        hist, "user_id", "valid_from_ms", "valid_to_ms", "is_current"
    )


QUERIES["etl_scd2_audit"] = etl_scd2_audit

ORACLES["etl_scd2_audit"] = """
    WITH ev AS (SELECT * FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    ch AS (SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
           FROM ev),
    vers AS (SELECT user_id, ts, event_id
             FROM ch WHERE prev_type IS NULL OR prev_type <> event_type),
    hist AS (
      SELECT user_id,
             epoch_ms(ts) AS f,
             lead(epoch_ms(ts)) OVER w AS t,
             CASE WHEN lead(epoch_ms(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS cur
      FROM vers WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    marked AS (
      SELECT user_id, f, t, cur,
             lag(t) OVER (PARTITION BY user_id ORDER BY f ASC) AS prev_to
      FROM hist),
    per_key AS (
      SELECT user_id, count(*) AS n, sum(cur) AS n_cur,
             sum(CASE WHEN prev_to IS NOT NULL AND f < prev_to
                      THEN 1 ELSE 0 END) AS n_overlap,
             sum(CASE WHEN prev_to IS NOT NULL AND f > prev_to
                      THEN 1 ELSE 0 END) AS n_gap,
             sum(CASE WHEN f IS NULL THEN 1 ELSE 0 END) AS n_null_from
      FROM marked GROUP BY user_id)
    SELECT CAST(sum(n) AS BIGINT) AS n_versions,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n_overlap) AS BIGINT) AS n_overlaps,
           CAST(sum(n_gap) AS BIGINT) AS n_gaps,
           CAST(sum(CASE WHEN n_cur <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keys_bad_current,
           CAST(sum(n_null_from) AS BIGINT) AS n_null_from
    FROM per_key
"""
