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
from image_matadata_batchprocessing_aws_spark.queries import r05_queue as _r05_queue
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
    # r05: the registration queue lands (141 oracled pairs staged and
    # exact-verified throughout r04 — VERDICT r4 item 1).  Registry
    # 210 -> 351.
    _r05_queue,
]

#: Registry order IS the driver's correctness-check order: the first 50
#: entries get oracle rows each round.  Round-5 composition (VERDICT r4
#: item 1): the registry grew 210 -> 351 by registering the r05 queue;
#: the window takes (a) ALL 20 oracled registered queries that have
#: never earned a driver row — the 15-query ``agg_*``/``ts_*``/
#: ``etl_drift_report``/``embedding_centroid_label`` backlog plus
#: ``multimodal_jpeg_decode``, ``pagerank_converged``, and the three
#: r04 oracle upgrades ``multimodal_image_pipeline`` /
#: ``multimodal_image_sniff`` / ``embedding_kmeans`` (the first two
#: carry stale ``err: no_oracle`` rows from r01/r02 that a green row
#: here converts) — then (b) 30 queue entries: the seven flagship
#: compositions and four real-decode queries first, the rest in
#: registration order from the queue head.  Every window entry is
#: locally oracle-exact at sf0.001 AND sf0.01 (tools/check_oracle.py,
#: 0 failures).  Driver-green union after r04 = 188/210; this window
#: takes the union to 238/351 if all 50 land green.
#:
#: DRAIN PLAN (keep registry growth <= window drain rate — the r03
#: lesson): after r05, 111 queue entries remain never-driver-checked;
#: r06 takes the next 50 in registration order, r07 the next 50, r08
#: the final 11 + frozen re-verification spot-checks.  New r05 work
#: stages in ``queries/r06_queue.py`` (oracled + two-scale-verified via
#: ``tools/check_oracle.py --staged``; 50 pairs staged by end of r05,
#: sf0.1-priced in SCALE.md); registering it appends to the registry
#: END, so it drains after the r05 queue without displacing window
#: slots — r08/r09 absorb it at the same 50/round rate.  The window
#: arithmetic here is LOCKED by
#: ``tests/test_entry_contract.py::test_window_plan_comment_matches_code``.
_WINDOW = [
    # (a) the 20 oracled never-driver-checked registered queries
    "embedding_kmeans",
    "multimodal_image_sniff",
    "multimodal_image_pipeline",
    "multimodal_jpeg_decode",
    "pagerank_converged",
    "embedding_centroid_label",
    "ts_anomaly_events",
    "etl_drift_report",
    "agg_corr_matrix",
    "agg_source_diversity",
    "etl_incremental_agg",
    "ts_time_weighted",
    "agg_retention_cohorts",
    "agg_event_transitions",
    "agg_frequent_pairs",
    "agg_decimal_exact",
    "agg_pareto_concentration",
    "agg_seasonality",
    "agg_spearman",
    "agg_rfm_segments",
    # (b) 30 queue entries — flagship compositions and real decodes
    # first, then registration order from the queue head
    "pipeline_multimodal_curation",
    "pipeline_audio_corpus",
    "pipeline_web_corpus",
    "pipeline_image_curation",
    "pipeline_entity_resolution",
    "pipeline_curation_funnel",
    "pipeline_contrastive_triplets",
    "multimodal_gif_decode",
    "multimodal_tiff_decode",
    "multimodal_webp_decode",
    "multimodal_jpeg_progressive",
    "ts_ewma",
    "etl_interpolate",
    "ts_rolling_median",
    "etl_zorder_auto",
    "semdedup_bounded_checks",
    "text_bpe_first_merge",
    "embedding_negative_sample",
    "sample_dsir",
    "sample_split_dedup_aware",
    "join_fuzzy_linkage",
    "graph_hits",
    "agg_survival_churn",
    "etl_target_encode",
    "eval_roc_auc",
    "eval_calibration",
    "text_pmi_bigrams",
    "text_chi2_tokens",
    "agg_js_mixture",
    "eval_confusion",
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
    # rows-only (iterative-inside composition) — least driver signal, so
    # it yields its in-window slot to fully-oracled queries.
    # (multimodal_image_sniff and embedding_kmeans left this list in
    # r04 — invariant/manifest oracles, VERDICT r3 item 7 — and
    # multimodal_image_pipeline followed with a recomputed-manifest
    # full oracle.)
    "embedding_semdedup",
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
