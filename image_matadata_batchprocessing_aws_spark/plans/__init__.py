"""Physical-plan introspection helpers (SURVEY section 4).

The reference hand-implements every "optimization" (manual pruning,
chunking, GC); here Catalyst does the work, and these helpers make the
resulting plans checkable: tests assert that filters push into parquet
scans, that dimension joins broadcast, and that Python never enters the
hot path — the plan-level guarantees that matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict[str, bool | int]:
    """Plan health signals for scale review."""
    plan = formatted_plan(df)
    return {
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "python_in_plan": ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan),
        "n_exchanges": plan.count("Exchange"),
        # map-side combine: partial aggregation before the shuffle is the
        # signal that grouped aggs won't move raw rows at 100 TB
        "has_partial_agg": "partial_" in plan,
    }


def assert_no_python_udf(df: DataFrame) -> None:
    """Guard: the hot path must stay JVM-side (SURVEY 'UDFs are the slow
    path'). mapInPandas stages (multimodal decode) are intentionally
    exempt — they appear as MapInPandas, not BatchEvalPython."""
    plan = formatted_plan(df)
    if "BatchEvalPython" in plan:
        raise AssertionError("row-at-a-time Python UDF found in plan:\n" + plan)
