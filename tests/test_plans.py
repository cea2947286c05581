"""Plan-level scale guarantees (SURVEY section 4): pushdown reaches the
parquet scan, dimension joins broadcast, the hot path stays JVM-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from image_matadata_batchprocessing_aws_spark.plans import (
    assert_no_python_udf,
    formatted_plan,
    plan_report,
)
from image_matadata_batchprocessing_aws_spark.queries.etl import etl_zscore
from image_matadata_batchprocessing_aws_spark.queries.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_region_revenue,
)
from tests.conftest import SF_CORRECT


def test_q1_filter_pushdown_and_partial_agg(spark):
    rep = plan_report(q1_pricing_summary(spark, SF_CORRECT))
    assert rep["has_pushed_filters"]  # shipdate predicate reaches the scan
    assert rep["has_partial_agg"]  # map-side combine before the shuffle
    assert not rep["python_in_plan"]


def test_q3_q5_broadcast_dimensions(spark):
    assert plan_report(q3_shipping_priority(spark, SF_CORRECT))["has_broadcast_join"]
    assert plan_report(q5_region_revenue(spark, SF_CORRECT))["has_broadcast_join"]


def test_ann_ivf_broadcasts_centroids(spark):
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.queries.similarity import ann_ivf

    df = ann_ivf(spark, SF_CORRECT)
    plan = formatted_plan(df)
    # centroid assignment: broadcast cartesian (no equi key => nested-loop
    # is the right physical op, with the tiny centroid side broadcast)
    assert "BroadcastNestedLoopJoin" in plan
    assert not plan_report(df)["python_in_plan"]


def test_no_python_udf_in_relational_plans(spark):
    for q in (q1_pricing_summary, q3_shipping_priority, q5_region_revenue, etl_zscore):
        assert_no_python_udf(q(spark, SF_CORRECT))


def test_whole_inventory_stays_jvm_side(spark):
    """Every declared query plans without row-at-a-time Python.  The only
    Python allowed anywhere is Arrow mapInPandas in the multimodal
    pipeline (shows as (Flat)MapInPandas/ArrowEvalPython-free plans
    otherwise)."""
    from image_matadata_batchprocessing_aws_spark.queries import all_queries

    for name, fn in all_queries().items():
        assert_no_python_udf(fn(spark, SF_CORRECT)), name


def test_staged_queue_stays_jvm_side(spark):
    """Every staging queue is held to the inventory plan bar BEFORE it
    registers — no row-at-a-time Python sneaks in via a queue.  (The
    r07 queue registered in r09 and is covered by the registry-wide
    sweep above; the live staging surface is r08 + r09.)"""
    from image_matadata_batchprocessing_aws_spark.queries import r08_queue, r09_queue

    for mod in (r08_queue, r09_queue):
        for name, fn in mod.QUERIES.items():
            assert_no_python_udf(fn(spark, SF_CORRECT)), name


def test_q14_broadcasts_part_and_pushes_dates(spark):
    from image_matadata_batchprocessing_aws_spark.queries.relational import q14_promo_share

    rep = plan_report(q14_promo_share(spark, SF_CORRECT))
    assert rep["has_broadcast_join"]
    assert rep["has_pushed_filters"]  # shipdate range reaches the scan


def test_q4_exists_plans_as_semi_join(spark):
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.queries.relational import q4_order_priority

    assert "LeftSemi" in formatted_plan(q4_order_priority(spark, SF_CORRECT))


def test_q19_broadcasts_part_under_disjunction(spark):
    from image_matadata_batchprocessing_aws_spark.queries.relational import q19_disjunctive_revenue

    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan

    df = q19_disjunctive_revenue(spark, SF_CORRECT)
    rep = plan_report(df)
    # the shared equi-key keeps this a hash join despite the OR-of-ANDs
    assert rep["has_broadcast_join"]
    assert "NestedLoop" not in formatted_plan(df)
    assert not rep["python_in_plan"]


def test_q22_not_exists_plans_as_anti_join(spark):
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.queries.relational import (
        q22_global_sales_opportunity,
    )

    plan = formatted_plan(q22_global_sales_opportunity(spark, SF_CORRECT))
    assert "LeftAnti" in plan


def test_two_pass_numbering_broadcasts_offsets(spark):
    """The keyless numbering ops join per-partition offsets back with an
    explicit broadcast — never a shuffled join of the big side."""
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.queries.etl import etl_batch_id
    from image_matadata_batchprocessing_aws_spark.queries.sampling import sample_shuffle_docs

    for q in (etl_batch_id, sample_shuffle_docs):
        plan = formatted_plan(q(spark, SF_CORRECT))
        assert "BroadcastHashJoin" in plan
        assert not plan_report(q(spark, SF_CORRECT))["python_in_plan"]


def test_no_expression_construction_inlined_into_scan_filters(spark):
    """Regression guard for the inferred-filter pushdown trap: filters on
    (or inferred from) exploded token/shingle/trigram arrays must NOT be
    pushed into the parquet scan with the construction chain inlined —
    that re-runs tokenization (worst case quadratically, measured 70x on
    the char-trigram path) once per row as a scan predicate.

    Only the INFERRED filters are flagged (size/isnotnull over a
    transform/zip_with construction — pure recomputation, zero
    selectivity benefit).  Genuine user predicates that happen to be
    expensive (e.g. the pipeline's quality >= 0.5 gate) are allowed to
    push: they cut rows before the downstream shuffles, which at scale
    outweighs evaluating the expression at the scan."""
    import re

    from image_matadata_batchprocessing_aws_spark.queries import all_queries

    heavy = (
        "size(CASE WHEN",
        "size(transform(",
        "size(array_distinct(zip_with",
        "isnotnull(transform(",
        "isnotnull(zip_with(",
        "isnotnull(array_distinct(zip_with",
        # inferred-explode / constraint-propagation shapes over a raw
        # tokenization (a bare size(split( also appears legitimately
        # inside the pipeline's quality predicate, so match the
        # null-check forms that only the optimizer generates)
        "isnotnull(split(",
        "isnotnull(size(split(",
        "isnotnull(regexp_extract_all",
    )
    qs = all_queries()
    for name in (
        "chunk_docs_overlap",
        "search_bm25",
        "text_charlm_score",
        "text_tfidf_keywords",
        "dedup_decontaminate",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "pipeline_pretraining_corpus",
    ):
        plan = qs[name](spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
        # scan-adjacent filter lines: the FileScan's DataFilters plus any
        # Filter node whose next line is a FileScan
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            is_scan_filter = "DataFilters: [" in line or (
                re.search(r"\bFilter\b", line)
                and i + 1 < len(lines)
                and "FileScan" in lines[i + 1]
            )
            if not is_scan_filter:
                continue
            for marker in heavy:
                assert marker not in line, (
                    f"{name}: expression construction pushed into scan filter: "
                    f"{line.strip()[:200]}"
                )


def test_skew_and_merge_plan_shapes(spark):
    """join_salted_skew stays a hash join on (key, salt) — never a
    NestedLoop; etl_merge_upsert's upsert plans as a broadcast LEFT ANTI
    on the update keys, so the big side never shuffles."""
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.queries.etl import etl_merge_upsert
    from image_matadata_batchprocessing_aws_spark.queries.timejoins import join_salted_skew

    salted = formatted_plan(join_salted_skew(spark, SF_CORRECT))
    assert "NestedLoop" not in salted

    merged = formatted_plan(etl_merge_upsert(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in merged and "LeftAnti" in merged
    assert "SortMergeJoin" not in merged


def test_substr_spans_broadcast_dup_set_and_keyed_window(spark):
    """Exact-substring dedup plan shape: the duplicated-fingerprint set
    comes back as a broadcast LeftSemi (contamination-sized side), the
    run-merge window is keyed by doc (no keyless WindowExec), and
    nothing Python touches the path."""
    from image_matadata_batchprocessing_aws_spark.operators.substrings import duplicated_spans
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    df = duplicated_spans(
        load_table(spark, SF_CORRECT, "documents"), materialize=False
    )
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert not plan_report(df)["python_in_plan"]


def test_asof_nearest_single_exchange_two_sorts(spark):
    """Nearest as-of: both carry directions must share ONE exchange on
    the key (the windows differ only in sort order) — two exchanges
    would mean the plan re-shuffles per direction."""
    from image_matadata_batchprocessing_aws_spark.operators.joins import asof_join_nearest
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    ev = load_table(spark, SF_CORRECT, "events")
    left = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    df = asof_join_nearest(left, right, "user_id", "ts", "ts")
    import re

    plan = formatted_plan(df)
    # one exchange on __k; both carry windows (two sorts) sit above it
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan


def test_corr_matrix_single_aggregate_no_shuffle_of_pairs(spark):
    """The all-pairs correlation is ONE 1-row aggregate: no joins, no
    window, a single exchange (the global agg's singlePartition)."""
    from image_matadata_batchprocessing_aws_spark.operators.stats import correlation_matrix
    from image_matadata_batchprocessing_aws_spark.plans import formatted_plan
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    df = correlation_matrix(
        load_table(spark, SF_CORRECT, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    plan = formatted_plan(df)
    assert "Join" not in plan and "Window" not in plan
    assert plan_report(df)["has_partial_agg"]


def test_hll_registers_partial_aggregation(spark):
    """Register build must combine map-side (max is associative): the
    shuffle carries <= m rows per group per task, not the key stream."""
    from image_matadata_batchprocessing_aws_spark.operators.sketches import hll_registers
    from image_matadata_batchprocessing_aws_spark.sources.tables import load_table

    df = hll_registers(load_table(spark, SF_CORRECT, "events"), "user_id", [], p=9)
    rep = plan_report(df)
    assert rep["has_partial_agg"] and not rep["python_in_plan"]


def test_r05_queue_single_exchange_windows(spark):
    """The queued window queries (EWMA, interpolation, rolling median)
    stack every windowed expression on ONE keyed (exchange, sort) — a
    second hashpartitioning exchange would mean the window specs
    drifted apart."""
    import re

    from image_matadata_batchprocessing_aws_spark.queries import r05_queue

    for name in ("ts_ewma", "etl_interpolate", "ts_rolling_median"):
        df = r05_queue.QUERIES[name](spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges == 1, (name, n_exchanges)
        assert_no_python_udf(df)


def test_eval_family_plan_shapes(spark):
    """The r04-queue eval/graph additions keep their promised shapes:
    MRR never plans a Window (its whole point); ROC AUC's one Window
    rides the per-score AGGREGATED table (so a partial agg precedes
    it); k-core's vertex filters plan as semi joins; the confusion
    matrix is pure aggregation — no sort, no window."""
    from image_matadata_batchprocessing_aws_spark.queries import r05_queue

    mrr = r05_queue.QUERIES["eval_mrr"](spark, SF_CORRECT)
    plan = mrr._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "MRR must not rank via window"
    assert_no_python_udf(mrr)

    auc = r05_queue.QUERIES["eval_roc_auc"](spark, SF_CORRECT)
    plan = auc._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "partial_" in formatted_plan(auc), "per-score partial agg missing"

    kcore = r05_queue.QUERIES["graph_kcore"](spark, SF_CORRECT)
    plan = kcore._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "k-core alive-set filters must be semi joins"

    conf = r05_queue.QUERIES["eval_confusion"](spark, SF_CORRECT)
    plan = conf._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_" in formatted_plan(conf)


def test_rouge_overlap_join_no_cartesian(spark):
    """The ROUGE overlap join must route pairs through (id, gram) hash
    joins — a cartesian/nested-loop product would mean the pair
    bounding broke."""
    from image_matadata_batchprocessing_aws_spark.queries import r05_queue

    df = r05_queue.QUERIES["eval_rouge_pairs"](spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_ivm_dp_reco_plan_shapes(spark):
    """The r04-queue data-engineering additions keep their promised
    shapes: apply_cdc anti-joins the base against a BROADCAST key set
    and reduces the feed on exactly one window; incremental_join plans
    exactly 4 equi-joins (stored + 3 delta terms) and never a cartesian
    product; dp_noisy is one partial aggregation with no window; the
    reco self-join is keyed (no cartesian) with broadcast support
    joins and one rank window."""
    import re

    from image_matadata_batchprocessing_aws_spark.queries import r05_queue

    cdc = r05_queue.QUERIES["etl_apply_cdc"](spark, SF_CORRECT)
    plan = cdc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert len(re.findall(r"\bWindow\b", plan)) == 1, "feed reduces on ONE window"
    assert_no_python_udf(cdc)

    ivm = r05_queue.QUERIES["etl_incremental_join"](spark, SF_CORRECT)
    plan = ivm._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    n_joins = len(re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan))
    assert n_joins == 4, f"expected stored + 3 delta joins, got {n_joins}"

    dp = r05_queue.QUERIES["agg_dp_noisy"](spark, SF_CORRECT)
    plan = dp._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_" in formatted_plan(dp)

    reco = r05_queue.QUERIES["reco_item_cooccurrence"](spark, SF_CORRECT)
    plan = reco._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert len(re.findall(r"\bWindow\b", plan)) == 1
    assert_no_python_udf(reco)


def test_r04_continuation_plan_shapes(spark):
    """The r04-continuation batch keeps its promised shapes:

    - CUSUM and ACF stack their windows on ONE keyed exchange (the
      prefix identity / lead pairing are same-spec windows);
    - the KS grid joins broadcast the class-totals and 1-row total;
    - Welch/ANOVA/chi2 are pure aggregates: partial aggregation
      present, no window, no join beyond broadcasts;
    - containment and tile overlap never plan a cartesian product.
    """
    import re

    from image_matadata_batchprocessing_aws_spark.queries import r05_queue

    for name in ("ts_cusum_shift", "ts_autocorr"):
        df = r05_queue.QUERIES[name](spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_exchanges == 1, (name, n_exchanges)
        assert_no_python_udf(df)

    ks = r05_queue.QUERIES["agg_ks_drift"](spark, SF_CORRECT)
    ks_plan = ks._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in ks_plan or "BroadcastNestedLoopJoin" in ks_plan
    assert "CartesianProduct" not in ks_plan

    for name in ("agg_welch_ttest", "agg_anova_oneway"):
        df = r05_queue.QUERIES[name](spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan, name
        assert "Window" not in plan, name
        assert "SortMergeJoin" not in plan, name

    for name in ("dedup_containment", "multimodal_tile_overlap"):
        df = r05_queue.QUERIES[name](spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_r08_pair_grids_plan_as_hash_joins(spark):
    """The r08 mod-sampled pair grids express (a + b) % m == 0 as an
    EQUI key (b % m == (m - a % m) % m), so Catalyst plans a hash join
    on the residue class — a NestedLoopJoin over the full cross space
    would be the 100 TB killer this test pins out."""
    import re

    from image_matadata_batchprocessing_aws_spark.queries import r08_queue
    from tests.conftest import SF_CORRECT

    for name in ("dedup_bbit_minhash", "embedding_pair_cosine_hist"):
        df = r08_queue.QUERIES[name](spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the pair join itself must be a hash join on the residue class
        assert re.search(r"HashJoin.*% 97|HashJoin.*% 23", plan), name
        assert "CartesianProduct" not in plan, name
        # the only permitted NestedLoop is the 1-row stats crossJoin
        for line in plan.splitlines():
            if "NestedLoopJoin" in line:
                assert "Cross" in line, (name, line.strip())
