"""The oracle-checked query inventory (driver contract).

Each submodule exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL twins).  Names map to
SURVEY.md section 2 operator ids — see PARITY.md for the line-by-line map.

Cross-engine determinism rules (every query follows them):

- computed integers are cast to BIGINT on both sides;
- float aggregates are ``round()``ed identically on both sides (raw
  parquet doubles pass through exactly);
- timestamps leave results as epoch-ms BIGINT (``unix_millis`` /
  ``epoch_ms``) — no tz ambiguity;
- any top-k orders by the rounded measure plus a unique key, so ties
  break identically in both engines.
"""

from __future__ import annotations

from image_matadata_batchprocessing_aws_spark.queries import analytics as _analytics
from image_matadata_batchprocessing_aws_spark.queries import chunking as _chunking
from image_matadata_batchprocessing_aws_spark.queries import dedup as _dedup
from image_matadata_batchprocessing_aws_spark.queries import etl as _etl
from image_matadata_batchprocessing_aws_spark.queries import graphq as _graphq
from image_matadata_batchprocessing_aws_spark.queries import multimodal as _multimodal
from image_matadata_batchprocessing_aws_spark.queries import pipeline as _pipeline
from image_matadata_batchprocessing_aws_spark.queries import relational as _relational
from image_matadata_batchprocessing_aws_spark.queries import sampling as _sampling
from image_matadata_batchprocessing_aws_spark.queries import search as _search
from image_matadata_batchprocessing_aws_spark.queries import similarity as _similarity
from image_matadata_batchprocessing_aws_spark.queries import sketches as _sketches
from image_matadata_batchprocessing_aws_spark.queries import streaming_batch as _streaming
from image_matadata_batchprocessing_aws_spark.queries import text as _text
from image_matadata_batchprocessing_aws_spark.queries import timejoins as _timejoins

_MODULES = [
    _etl,
    _dedup,
    _similarity,
    _text,
    _timejoins,
    _sampling,
    _multimodal,
    _pipeline,
    _streaming,
    _relational,
    _chunking,
    _search,
    _sketches,
    _graphq,
    _analytics,
]

#: Registry order IS the driver's correctness-check order: the first 50
#: entries get oracle rows each round.  Round-3 composition: the 15
#: oracled queries with no r01/r02 row go first (closing the
#: every-oracled-query-has-a-driver-row gap), then every NEW r03 query
#: (sketches, graph, PQ, SCD2/CDC, funnel, curriculum, splits,
#: normalization, sniffers, ...), then etl_zscore as the standing
#: re-confirmation (r01's one red row).  Displaced entries are ALL
#: r01/r02 driver-green; of the new oracled queries only ``agg_mode``,
#: ``join_nullsafe``, ``ann_ivfpq``, ``sample_weighted_lang``,
#: ``window_cume_dist``, ``agg_corr``, ``eval_ann_recall``, and
#: ``etl_star_flatten`` sit below the fold (window
#: capacity — all locally oracle-exact at sf0.01 and sf0.001,
#: first in line for the r04 rotation).  The r03 late additions join
#: that queue: ``agg_regression``, ``etl_winsorize``,
#: ``etl_resample_gapfill``, ``agg_rollup_cascade``,
#: ``text_vocab_build``, ``ann_matryoshka_rerank``,
#: ``embedding_centroid_label``, ``ts_anomaly_events``,
#: ``dedup_substr_spans``, ``dedup_substr_fraction``,
#: ``dedup_keep_best``, ``sketch_hll_distinct``, ``join_asof_forward``,
#: ``join_asof_nearest``, ``etl_quantile_bin``, ``etl_one_hot``,
#: ``eval_ann_ndcg`` — and every later r03 batch (drift report, corr
#: matrix, incremental agg, SCD2 as-of, substring mask, embedding
#: pipeline, png decode, SQL-API parity, ... — see PARITY.md batches
#: 4-10).  Every queued query is locally oracle-exact at BOTH sf dirs
#: (tools/check_oracle.py full runs, 0 failures).
_WINDOW = [
    # -- never driver-checked (locally oracle-exact, VERDICT r2 item 1) --
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q18_large_orders",
    "q20_dominant_part_suppliers",
    "q21_waiting_orders",
    "chunk_docs_overlap",
    "search_bm25",
    "sample_source_mixture",
    # -- new r03: oracled invariant/fixed-centroid twins of the rows-only
    #    kmeans/semdedup pair (VERDICT r2 item 7) --
    "kmeans_round_update",
    "kmeans_invariants",
    "semdedup_fixed_centroids",
    "multimodal_sniff_roundtrip",
    "sample_weighted",
    "join_salted_skew",
    "etl_merge_upsert",
    "etl_zorder_key",
    "stream_anti_corpus",
    "agg_skewsafe_distinct",
    "agg_approx_bound",
    # -- new r03 batch 2: sketches, graph, SCD2, hybrid search, quantile
    #    bound — first driver rows for each --
    "sketch_bloom_decontaminate",
    "sketch_countmin_heavy",
    "graph_pagerank",
    "etl_scd2_history",
    "search_hybrid_rrf",
    "agg_quantile_bound",
    "sample_curriculum",
    "join_bloom_prefilter",
    "ann_pq_adc",
    "etl_unpivot",
    "funnel_conversion",
    "sample_curriculum_global",
    "stream_cms_counters",
    "graph_triangles",
    "etl_profile_table",
    "etl_cdc_compact",
    "agg_histogram",
    "dedup_levenshtein",
    "sample_split_assign",
    "etl_dates_dim",
    "text_normalize",
    "multimodal_audio_sniff",
    "text_ngram_topk",
    # -- r02-green re-confirmation on regenerated testdata --
    "etl_zscore",  # r01's one red row; keep a row every round
]

#: Rows-only or redundant driver signal; pinned to the very end so they
#: never displace an oracled query from the window.
_DEMOTED = [
    "etl_limit_offset",
    "etl_distinct_values",
    "etl_row_bytes",
    "etl_path_ops",
    "etl_union_chunks",
    "etl_project_cast",
    "eval_euclidean_scalar",
    # rows-only (binary fixture input / iterative k-means) — least
    # driver signal, so they yield their in-window slots to
    # fully-oracled queries
    "multimodal_image_sniff",
    "multimodal_image_pipeline",
    "embedding_semdedup",
    "embedding_kmeans",
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    if len(_WINDOW) != 50 or len(set(_WINDOW)) != 50:
        raise ValueError(f"_WINDOW must be 50 unique names, got {len(_WINDOW)}")
    bad = (set(_WINDOW) | set(_DEMOTED)) - set(out)
    if bad:
        raise ValueError(f"unknown names in _WINDOW/_DEMOTED: {bad}")
    if set(_WINDOW) & set(_DEMOTED):
        raise ValueError("overlap between _WINDOW and _DEMOTED")
    ordered = {name: out.pop(name) for name in _WINDOW}
    for name in _DEMOTED:
        out[name] = out.pop(name)  # re-insert at the end of the remainder
    ordered.update(out)
    return ordered


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
