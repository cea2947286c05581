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
from image_matadata_batchprocessing_aws_spark.queries import r06_queue as _r06_queue
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
    # r06: the r05-staged queue lands (50 oracled pairs, sf0.1-priced
    # in SCALE.md — VERDICT r5 item 2).  Registry 351 -> 401.  It
    # appends at the END so it drains AFTER the r05 queue without
    # displacing window slots.
    _r06_queue,
]

#: Registry order IS the driver's correctness-check order: the first 50
#: entries get oracle rows each round.  Round-6 composition (VERDICT r5
#: items 1-3): the registry grew 351 -> 401 by registering the r06
#: queue; the window takes (a) ``agg_decimal_exact`` — the one
#: ever-checked-never-green oracled query (its r05 red row was the
#: driver's DECIMAL value-hash canonicalization, not the values, which
#: agree bitwise; it now emits scaled BIGINTs per the house cents
#: idiom) — then (b) the next 49 r05-queue entries in registration
#: order (``eval_kappa`` .. ``ts_cusum_shift``).  Every window entry is
#: locally oracle-exact at sf0.001 AND sf0.01 (tools/check_oracle.py,
#: 0 failures).  Driver-green union after r05 = 237/401; this window
#: takes the union to 287/401 if all 50 land green.
#:
#: DRAIN PLAN (keep registry growth <= window drain rate — the r03
#: lesson): after r06, 62 r05-queue entries plus the 50 r06-queue
#: entries remain never-driver-checked; r07 takes the next 50 in
#: registration order, r08 the next 50, r09 the final 12 + frozen
#: re-verification spot-checks.  New r06 work stages in
#: ``queries/r07_queue.py`` (oracled + two-scale-verified via
#: ``tools/check_oracle.py --staged``), capped at <= 50 pairs so
#: growth stays at the drain rate; the r06 session filled the cap
#: exactly (50 pairs), every one oracle-exact at sf0.001, sf0.01
#: AND sf0.1.  The window arithmetic here is
#: LOCKED by
#: ``tests/test_entry_contract.py::test_window_plan_comment_matches_code``.
_WINDOW = [
    # (a) the one ever-checked-never-green oracled query, re-landed
    # with scaled-BIGINT output columns (VERDICT r5 item 1)
    "agg_decimal_exact",
    # (b) the next 49 r05-queue entries in registration order
    "eval_kappa",
    "graph_kcore",
    "embedding_pca_top",
    "embedding_whiten_top",
    "search_mmr_diverse",
    "eval_mrr",
    "eval_rouge_pairs",
    "etl_corpus_card",
    "decontaminate_semantic",
    "etl_k_anonymity",
    "agg_benford",
    "text_hash_embed",
    "search_hash_embed_knn",
    "stream_confusion_windows",
    "dedup_jaccard_prefix",
    "sketch_kmv_distinct",
    "sketch_kmv_intersect",
    "multimodal_wav_stats",
    "multimodal_video_frames",
    "etl_apply_cdc",
    "etl_incremental_join",
    "agg_dp_noisy",
    "reco_item_cooccurrence",
    "etl_scd2_build",
    "graph_bfs_levels",
    "agg_attribution",
    "agg_top_paths",
    "etl_expectations",
    "multimodal_exif",
    "multimodal_phash_groups",
    "text_gopher_rules",
    "etl_url_normalize",
    "text_html_extract",
    "multimodal_video_scenes",
    "text_line_repetition",
    "multimodal_audio_silence",
    "agg_mann_whitney",
    "eval_lsh_recall",
    "text_redact_pii",
    "multimodal_scene_keyframes",
    "multimodal_image_stats",
    "multimodal_jpeg12_decode",
    "sketch_bottomk_quantiles",
    "text_encoding_flags",
    "multimodal_jpeg_arith_decode",
    "multimodal_webp_lossy_decode",
    "join_geo_radius",
    "ts_holt",
    "ts_cusum_shift",
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
