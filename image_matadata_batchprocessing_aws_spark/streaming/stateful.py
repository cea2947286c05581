"""Custom stateful streaming operator via ``applyInPandasWithState``.

Window/session aggregations (streaming/events.py) cover the declarative
state shapes; this is the escape hatch for state Spark's built-ins can't
express — here, a per-user running (count, total) emitted on every
update, the streaming analogue of the reference's mutable accumulators
(``global_batch_count``, ``total_loss`` — SURVEY A4/W2) with state that
actually survives retries because it lives in the state store.

Scale notes: state is keyed by the group column and partitioned across
executors by the same shuffle as any groupBy — no driver state.  Arrow
batches move rows into Python per group; keep per-key state small (two
scalars here).  For unbounded key spaces, pass a timeout so idle state
expires (GroupStateTimeout.ProcessingTimeTimeout + ``state.setTimeout...``).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count and value total, one updated row per
    user per micro-batch that touches the user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
