"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8 extension; the reference has no event-time state at all).

``stateful_sessionize``: per-user gap-based sessionization with explicit
state — the streaming twin of the batch lag+cumsum sessionizer in
suite/events.py. Built-in ``session_window`` covers plain gap sessions;
this operator exists for the semantics session_window can't express
(custom per-session aggregates, max-length caps, emit-on-close side
outputs) and as the template for arbitrary keyed-state operators.

State per user: (session_start_us, last_ts_us, n_events, total_value)
as epoch microseconds. Sessions close either inside a batch (a gap
larger than ``gap`` between consecutive events) or via event-time
timeout once the watermark passes last_ts + gap.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint, total double"

_US = 1_000_000


def _sessionize_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
):
    (user_id,) = key
    closed: list[tuple[int, int, int, float]] = []

    if state.hasTimedOut:
        start, last, n, total = state.get
        closed.append((start, last, n, total))
        state.remove()
    else:
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, None, 0, 0.0
        events: list[tuple[int, float]] = []
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            for t, v in zip(ts_us, pdf["value"].fillna(0.0)):
                events.append((int(t), float(v)))
        events.sort()
        for t_us, v in events:
            if start is None:
                start, last, n, total = t_us, t_us, 1, v
            elif t_us - last > gap_us:
                closed.append((start, last, n, total))
                start, last, n, total = t_us, t_us, 1, v
            else:
                # cross-batch out-of-order arrivals (late but above the
                # watermark) may precede `last`; merge them without
                # moving the session backward or forward incorrectly
                start = min(start, t_us)
                last, n, total = max(last, t_us), n + 1, total + v
        if start is not None:
            state.update((start, last, n, total))
            state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)  # ms

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                "n_events": [n for _, _, n, _ in closed],
                "total_value": [round(t, 6) for _, _, _, t in closed],
            }
        )


def stateful_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Gap-based sessions per user with explicit keyed state. ``events``
    must be a streaming frame with (user_id, ts, value)."""
    parts = gap.split()
    units = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
             "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    if len(parts) != 2 or parts[1] not in units or not parts[0].isdigit():
        raise ValueError(
            f"gap must be '<n> <unit>' with unit in {sorted(units)}: got {gap!r}"
        )
    gap_us = int(parts[0]) * units[parts[1]] * _US

    def fn(key, pdfs, state):
        yield from _sessionize_user(key, pdfs, state, gap_us)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
