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
from image_matadata_batchprocessing_aws_spark.queries import r07_queue as _r07_queue
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
    # r09: the r07-staged queue lands per the locked drain plan
    # (VERDICT r8 item 10).  Registry 401 -> 451.
    _r07_queue,
]

#: Registry order IS the driver's correctness-check order: the first 50
#: entries get oracle rows each round.  Round-9 composition (VERDICT r8
#: item 10): the registry grows to 451 this round (``r07_queue.py``
#: registers; ``r08_queue.py`` / ``r09_queue.py`` stay staged per the
#: drain plan); the window is exactly what ``tools/compose_window.py``
#: emits — the 12 remaining never-driver-checked r06-queue entries
#: (``multimodal_audio_resample`` .. ``graph_conductance``) followed
#: by the first 38 never-checked r07-queue entries in registration
#: order (``stream_engagement_panel`` .. ``etl_consistent_hashing``).  Every
#: window entry is locally oracle-exact at sf0.001 AND sf0.01
#: (tools/check_oracle.py, 0 failures).  Strict driver-green union
#: after r08 = 387/451; this window takes the union to 437/451 if all
#: 50 land green.
#:
#: DRAIN PLAN (keep registry growth <= window drain rate — the r03
#: lesson): after r09, 0 r06-queue entries plus the 12 r07-queue
#: entries remain never-driver-checked; r10 registers ``r08_queue.py``
#: (451 -> 501) and takes those final 12 r07-queue + the first 38
#: r08-queue entries; r11 registers ``r09_queue.py`` (501 -> 551) and
#: takes the final 12 r08-queue + the first 38 r09-queue entries.
#: STEADY STATE from here: each round N stages <= 50 new oracled pairs
#: in ``queries/r{N+1}_queue.py`` (three-scale-verified via
#: ``tools/check_oracle.py --staged``), and round N+2 registers that
#: queue and starts draining it — so every staged queue has a
#: scheduled registration round and the never-checked backlog is
#: pinned at 12 + 50 = 62 entering each round.  Rounds with no new
#: staging instead pad their window with 38 re-confirmation
#: spot-checks (oldest driver row first, per tools/compose_window.py).
#: The window arithmetic here is LOCKED by
#: ``tests/test_entry_contract.py::test_window_plan_comment_matches_code``.
_WINDOW = [
    "multimodal_audio_resample",
    "sql_api_udf",
    "agg_power_analysis",
    "embedding_smote_synth",
    "text_good_turing",
    "graph_katz",
    "eval_fleiss_kappa",
    "embedding_energy_distance",
    "agg_new_repeat_revenue",
    "graph_modularity",
    "agg_lorenz_deciles",
    "graph_conductance",
    "stream_engagement_panel",
    "multimodal_gif_animation",
    "multimodal_webp_anim",
    "eval_brier_decomp",
    "eval_log_loss",
    "eval_matthews_corr",
    "eval_krippendorff",
    "eval_fdr_bh",
    "agg_tukey_hsd",
    "agg_cuped",
    "agg_diff_in_diff",
    "agg_mutual_info",
    "agg_partial_corr",
    "agg_sprt",
    "graph_adamic_adar",
    "embedding_isotropy",
    "embedding_hubness",
    "agg_pareto_frontier",
    "agg_capture_recapture",
    "agg_cohort_ltv",
    "ts_bollinger",
    "ts_sax_symbols",
    "ts_mase",
    "ts_ljung_box",
    "eval_chrf_pairs",
    "text_burstiness",
    "sample_kcenter_coreset",
    "agg_mmd_drift",
    "multimodal_blur_laplacian",
    "ts_periodogram",
    "ts_streaks",
    "text_zipf_fit",
    "text_hapax_legomena",
    "graph_rich_club",
    "agg_weighted_median",
    "agg_ipw_estimate",
    "multimodal_otsu",
    "etl_consistent_hashing",
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
