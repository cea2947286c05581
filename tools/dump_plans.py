"""Regenerate PLANS.md: formatted physical plans for the flagship
scale-path queries — the evidence trail for SCALE.md's claims (broadcast
dims, pushed filters, no single-partition windows, slim shuffles).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark import get_spark  # noqa: E402
from image_matadata_batchprocessing_aws_spark.queries import all_queries  # noqa: E402

SHOWCASE = [
    ("q5_region_revenue", "dims broadcast; fact joins shuffle on keys; AQE skew-split"),
    ("q6_forecast_revenue", "every predicate reaches the parquet scan (PushedFilters)"),
    ("etl_zscore", "two-pass exact scaled-long fit; 1-row stats broadcast; map-side transform"),
    ("etl_batch_id", "two-pass keyless numbering: range shuffle + broadcast offsets (no keyless WindowExec)"),
    ("etl_ffill_global", "range-partition fill + boundary broadcast (no single-partition window)"),
    ("dedup_minhash_lsh", "map-side signatures; banding equi-join; per-pair array_intersect verification"),
    ("ann_ivf", "broadcast centroids; slim (id, cent, sim) argmax shuffle — vectors never shuffle"),
    ("join_asof_click_purchase", "union-and-carry: one shuffle on the key, no inequality nested-loop"),
    ("sample_shuffle_docs", "md5 permutation + two-pass numbering, broadcast offsets"),
    ("chunk_docs_overlap", "pure map-side: tokenize, sequence, explode, slice — zero shuffles"),
    ("text_charlm_score", "charset^3-bounded model broadcast; probe aggregates map-side — ~1 shuffled row per doc; no construction in scan filters"),
    ("text_tfidf_keywords", "two hash aggs; vocab join; top-k window partitioned BY DOC — no global sort"),
    ("sample_weighted", "A-Res rank key map-side; global top-n = TakeOrderedAndProject (partial per-partition top-n, no global sort)"),
    ("join_salted_skew", "salted equi-join: hash join on (key, salt), small side replicated — no NestedLoop"),
    ("etl_merge_upsert", "upsert = broadcast anti-join on update keys + union; big side never shuffles"),
    ("semdedup_fixed_centroids", "literal-centroid assignment map-side; pair join equi on cluster_id; iterative CC with lineage truncation"),
    ("join_bloom_prefilter", "runtime-filter join: binary-literal bloom probe filters the fact scan BELOW the join; FPs re-verified by the join"),
    ("sketch_bloom_decontaminate", "explode + codegen bit-test probe; only HIT shingle rows shuffle; exact audit over candidates only"),
    ("graph_pagerank", "per-round joins all keyed on the node id; edge list checkpointed once; integer rank sums combine map-side"),
    ("ann_pq_adc", "broadcast codebook + broadcast query-distance table; scaled-long ADC sums; candidates never carry float vectors"),
    ("funnel_conversion", "three conditional-min aggs joined on the same user_id key — co-partitioned, no window over event sequences"),
    ("agg_histogram", "two-pass fit-then-apply: 1-row min/max broadcast; bucket expression map-side; 20-group count"),
    ("dedup_substr_spans", "narrow (id,pos,fp) rows — text never shuffles; dup-fp set broadcast semi-join; doc-keyed run-merge window"),
    ("sketch_hll_distinct", "register table = (group,bucket) max partials; '__all__' row merges registers, never rescans the corpus"),
    ("join_asof_nearest", "both carry directions over ONE exchange (two in-partition sorts); tolerance nulls map-side"),
    ("ts_anomaly_events", "scaled-long trailing sums in a keyed ROWS window — association-free, parallel across keys"),
    ("agg_corr_matrix", "d-column pairwise stats in ONE 1-row integer aggregate; pair rows unfold from literal structs"),
    ("etl_drift_report", "ref-anchored decile bounds broadcast; one conditional-count groupBy per feature; TV folds on n_bins rows"),
    ("pipeline_embedding_corpus", "norm gate broadcast; cluster-bounded pair join; CC on contamination; int8 quantize map-side — one lazy composition"),
    ("graph_label_prop", "two synchronous LPA rounds: neighbor-label join + argmax struct per round, no windows over data"),
    # r05: the six flagship compositions newly priced in BENCH_FULL
    ("pipeline_entity_resolution", "blocked fuzzy join (quadratic verify per block only); alternating-star CC; survivorship = entity-keyed agg joins"),
    ("pipeline_multimodal_curation", "map-side Arrow decode with per-row isolation; pixel-hash dedup shuffles hashes, never images"),
    ("pipeline_audio_corpus", "decode/stats/framing map-side; cheap gates drop silent/clipped files BEFORE framing; per-file-bounded fingerprint agg"),
    ("pipeline_web_corpus", "URL canonicalize + HTML extract + quality rules map-side; dedup joins keyed on hashes only"),
    ("pipeline_image_curation", "decode once, gate early; pHash bands shuffle 6 tiny rows per image, never pixels"),
    ("pipeline_curation_funnel", "five count branches over shared subtrees in one lazy plan; nothing data-sized collects"),
    ("pipeline_contrastive_triplets", "anchor/positive/negative assembly by keyed joins over the kNN kernel; vectors shuffle once"),
    # r06: staged r07-queue scale paths (resolved from the staging
    # queue until registration)
    ("embedding_hubness", "broadcast-query brute-kNN kernel; per-query top-k window bounded by corpus id; k-occurrence = one keyed count"),
    ("agg_tukey_hsd", "ONE data-sized keyed aggregate (split-BIGINT squares); MSE + pairwise q ride the k-row group table"),
    ("etl_consistent_hashing", "144-vnode ring broadcast twice; assignment = map-side min-struct per doc; only (doc, shard) pairs shuffle"),
    ("eval_chrf_pairs", "per-order char-gram explode partial-aggregates map-side; overlap joins keyed on (pair, gram) — bounded by candidate grams"),
    ("multimodal_otsu", "Arrow stage emits 256-bin histograms only; the argmax is relational over doc x threshold rows, integer-exact"),
    # r07: staged r08-queue scale paths (resolved from the staging
    # queue until registration)
    ("dedup_bbit_minhash", "mod pair grid as an EQUI-key hash join on the residue class — no NestedLoop over the cross space; signatures map-side"),
    ("chunk_semantic_split", "token explode -> <=16-rows-per-segment partial agg; adjacency join on the SEGMENT grain; sparse dim-keyed dot, never densified"),
    ("agg_best_split", "cumulative class counts over the $10k BUCKET table (bounded by value range); argmin on the rounded impurity"),
    ("text_ngram_novelty", "5-gram lead() windows partitioned per doc; ONE shuffle of distinct (gram, doc); first-occurrence = keyed min"),
    ("agg_ratio_jackknife", "one keyed integer aggregate; every LOO replicate closed-form from the group table — no resampling pass"),
    ("stream_cuped_readout", "pre-period fit = one hi/lo-split aggregate, broadcast; readout = one 2-group aggregate over the same join"),
    # r08: staged r09-queue scale paths (resolved from the staging
    # queue until registration)
    ("join_band_balance", "band join via the 3-bucket explode: HASH join on the bucket key, exact band filter above it — no NestedLoop over the inequality"),
    ("dedup_sorted_neighborhood", "window-LEAD blocking: candidates are the w-1 sort neighbors — one range-partitioned sort, zero self-joins"),
    ("agg_permutation_test", "B=64 resamples as ONE map-side explode into a 64-group partial agg — no loop, no RNG state, rerun-stable"),
    ("graph_wedge_sampling", "wedge sample = deterministic md5 predicate; the closure join (the expensive step) touches sampled wedges only"),
    ("ts_m4_downsample", "per-bucket first/last/min/max ranks in one window pass over the per-day table; output constant (32 px) at ANY input scale"),
    ("sample_capped_allocation", "closed-form waterfilling: one sorted window pass finds the water level — no iteration, 20-row closing stage"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-dump", cpus=8)
    qs = dict(all_queries())
    from image_matadata_batchprocessing_aws_spark.queries import (
        r07_queue,
        r08_queue,
        r09_queue,
    )

    for mod in (r07_queue, r08_queue, r09_queue):  # staged: plans auditable pre-registration
        for name, fn in mod.QUERIES.items():
            qs.setdefault(name, fn)
    out = [
        "# PLANS — formatted physical plans of the flagship scale paths",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` — regenerate after",
        "plan-affecting changes.  Each plan is the evidence for the matching",
        "SCALE.md claim (annotated per query).",
        "",
    ]
    for name, claim in SHOWCASE:
        if name == "dedup_minhash_lsh":
            # the query's default path eagerly checkpoints (cache
            # lifecycle), which would print an opaque ExistingRDD scan;
            # build the lazy form so the full DAG is visible
            from image_matadata_batchprocessing_aws_spark.operators.dedup import (
                minhash_lsh_pairs,
            )
            from image_matadata_batchprocessing_aws_spark.queries.util import t

            df = minhash_lsh_pairs(
                t(spark, sf_dir, "documents"), threshold=0.5, materialize=False
            )
        else:
            df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # embedded sketch/model literals (binary blooms, codebooks) blow
        # individual lines to 100s of KB — elide mid-line, keep structure
        plan = "\n".join(
            ln if len(ln) <= 400 else ln[:200] + f" …<{len(ln) - 380} chars elided>… " + ln[-180:]
            for ln in plan.splitlines()
        )
        out += [f"## {name}", "", f"_Claim: {claim}_", "", "```", plan.rstrip(), "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
