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

import numpy as np
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


CUSUM_OUT_SCHEMA = (
    "user_id long, event_id long, cusum_hi double, cusum_lo double, alarm long"
)
_CUSUM_STATE_SCHEMA = "p_hi long, m_hi long, p_lo long, m_lo long"


def cusum_stream(
    events: DataFrame,
    target: float,
    slack_k: float,
    threshold_h: float,
    value_digits: int = 4,
) -> DataFrame:
    """STREAMING two-sided CUSUM drift monitor — the live twin of
    ``operators/timeseries.cusum_two_sided`` with a pre-fit ``target``
    (a stream cannot see the global mean; fit it offline and redeploy,
    the standard control-chart practice).

    Per-key state is four BIGINTs: the prefix sums P± and their
    running minima M± (clamped at 0), carried exactly — the same
    integer prefix identity as the batch operator, so a stream fed the
    same rows in order emits BIT-IDENTICAL cusum/alarm values
    (stream == batch equivalence is tested).  Rows within a
    micro-batch sort by (ts, event_id) per key before folding; state
    survives retries in the state store.  State is O(1) per key and
    the shuffle is the same keyed exchange as any groupBy.
    """
    scale = 10**value_digits
    t_s = int(round(target * scale))
    k_s = int(round(slack_k * scale))
    h_s = int(round(threshold_h * scale))

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        p_hi, m_hi, p_lo, m_lo = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        eids, chs, cls, als = [], [], [], []
        for eid, v in zip(batch["event_id"], batch["value"]):
            if pd.isna(v):
                continue
            xs = int(round(float(v) * scale))
            p_hi += xs - (t_s + k_s)
            m_hi = min(m_hi, p_hi)
            p_lo += (t_s - k_s) - xs
            m_lo = min(m_lo, p_lo)
            s_hi = p_hi - min(m_hi, 0)
            s_lo = p_lo - min(m_lo, 0)
            eids.append(int(eid))
            chs.append(round(s_hi / scale, 6))
            cls.append(round(s_lo / scale, 6))
            als.append(1 if (s_hi > h_s or s_lo > h_s) else 0)
        state.update((p_hi, m_hi, p_lo, m_lo))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(eids),
                "event_id": eids,
                "cusum_hi": chs,
                "cusum_lo": cls,
                "alarm": als,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUPED_OUT_SCHEMA = (
    "variant long, n long, y_mean double, cuped_mean double"
)
_CUPED_STATE_SCHEMA = "n long, sy long, sx long"


def cuped_stream(
    assignments: DataFrame,
    theta: float,
    xbar: float,
    value_digits: int = 2,
) -> DataFrame:
    """STREAMING CUPED readout — the live twin of the staged
    ``stream_cuped_readout`` batch query (``operators/stats.cuped_adjust``
    family).  CUPED's fit is a PRE-PERIOD statistic: ``theta`` and the
    pre-period covariate mean ``xbar`` are fit offline and deployed as
    constants (exactly ``cusum_stream``'s pre-fit-target discipline —
    a stream cannot see the global covariate moments), so the live side
    is a map-side adjustment plus one keyed running aggregate.

    Per-key state is three BIGINTs: trials ``n`` and the EXACT scaled
    sums of metric and covariate (cents at ``value_digits=2``).  The
    emitted row recomputes ``mean(y) - theta * (mean(x) - xbar)`` from
    those integers, so a stream fed the same rows in any micro-batch
    split emits a final row BIT-IDENTICAL to the batch aggregate over
    the same input (sums are associative/commutative; the float math
    runs once per emission over exact integers — stream == batch is
    tested).  State is O(1) per variant and the shuffle is the same
    keyed exchange as any groupBy.

    Expects columns ``variant`` (long), ``y`` (metric), ``x``
    (pre-period covariate).
    """
    scale = 10**value_digits

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sy, sx = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            ok = pdf[pdf["y"].notna() & pdf["x"].notna()]
            n += len(ok)
            if len(ok):
                # per-ROW scaling to exact ints, then exact integer sums
                # (the house cents idiom) — never round a float sum.
                # Sign-aware HALF_UP (away from zero), matching Spark
                # F.round on the batch twin: pandas .round() is
                # half-EVEN, which silently breaks the bit-identical
                # stream==batch contract for inputs whose scaled value
                # lands exactly on .5 (ADVICE r7).
                def _half_up(s: pd.Series) -> int:
                    v = s.astype(float).to_numpy()
                    return int(
                        (np.sign(v) * np.floor(np.abs(v) * scale + 0.5))
                        .astype("int64")
                        .sum()
                    )

                sy += _half_up(ok["y"])
                sx += _half_up(ok["x"])
        state.update((n, sy, sx))
        if n:
            y_mean = sy / scale / n
            x_mean = sx / scale / n
            yield pd.DataFrame(
                {
                    "variant": [key[0]],
                    "n": [n],
                    "y_mean": [round(y_mean, 6)],
                    "cuped_mean": [round(y_mean - theta * (x_mean - xbar), 6)],
                }
            )

    return assignments.groupBy("variant").applyInPandasWithState(
        update,
        outputStructType=CUPED_OUT_SCHEMA,
        stateStructType=_CUPED_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPRT_OUT_SCHEMA = (
    "event_type string, n_at_decision long, k_at_decision long, "
    "llr double, decision string"
)
_SPRT_STATE_SCHEMA = "k long, n long, decided long"


def sprt_stream(
    events: DataFrame,
    p0: float,
    p1: float,
    value_threshold: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """STREAMING Wald SPRT — the live twin of
    ``operators/stats.sprt_boundary`` (a sequential test is the
    canonical streaming decision procedure: it exists to stop a
    monitor the moment the evidence suffices).

    Per-key state is three BIGINTs: cumulative successes k, trials n,
    and the decided flag.  Rows within a micro-batch sort by
    (ts, event_id) per key before folding, so a stream fed the same
    rows in order emits the IDENTICAL first-crossing row as the batch
    operator (stream == batch is tested); once a key decides, later
    batches fold nothing and emit nothing.  The LLR is recomputed from
    the exact integers as ``k*c1 + (n-k)*c2`` — no floating state is
    carried, the same determinism contract as the batch side."""
    import math

    c1 = math.log(p1 / p0)
    c2 = math.log((1 - p1) / (1 - p0))
    a_bound = math.log((1 - beta) / alpha)
    b_bound = math.log(beta / (1 - alpha))

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k, n, decided = state.get if state.exists else (0, 0, 0)
        out = None
        if not decided:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            for v in batch["value"]:
                if pd.isna(v):
                    continue
                n += 1
                k += int(float(v) > value_threshold)
                llr = k * c1 + (n - k) * c2
                if llr >= a_bound or llr <= b_bound:
                    decided = 1
                    out = pd.DataFrame(
                        {
                            "event_type": [key[0]],
                            "n_at_decision": [n],
                            "k_at_decision": [k],
                            "llr": [round(llr, 6)],
                            "decision": [
                                "accept_h1" if llr >= a_bound else "accept_h0"
                            ],
                        }
                    )
                    break
        state.update((k, n, decided))
        if out is not None:
            yield out

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=SPRT_OUT_SCHEMA,
        stateStructType=_SPRT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
