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
        import numpy as np

        chunks_t, chunks_v = [], []
        for pdf in pdfs:
            chunks_t.append(pdf["ts"].astype("int64").to_numpy() // 1000)
            chunks_v.append(pdf["value"].fillna(0.0).to_numpy(dtype="float64"))
        if chunks_t:
            t = np.concatenate(chunks_t)
            v = np.concatenate(chunks_v)
            order = np.argsort(t, kind="stable")
            t, v = t[order], v[order]
            # Vectorized equivalent of the per-event loop: after the
            # sort, a session closes exactly where the gap between
            # consecutive events exceeds gap_us. Two subtleties keep
            # parity with carried state:
            # (1) an event at or before state's `last` ALWAYS merges
            #     (t - last <= 0 <= gap), so fold those in wholesale;
            # (2) events after `last` segment by diff-over-gap with
            #     `last` itself as the seed boundary.
            if start is not None:
                le = t <= last
                if le.any():
                    start = min(start, int(t[0]))
                    n += int(le.sum())
                    total += float(v[le].sum())
                    t, v = t[~le], v[~le]
                seed = np.concatenate(([last], t))
            else:
                seed = t
            if len(t):
                brk = np.nonzero(np.diff(seed) > gap_us)[0]
                if start is not None:
                    # brk indexes gaps in [last, t...]; gap positions
                    # translate to segment starts within t directly
                    seg_starts = brk
                else:
                    seg_starts = brk + 1
                    seg_starts = np.concatenate(([0], seg_starts))
                if start is not None:
                    if len(brk) == 0 or brk[0] != 0:
                        # first events continue the carried session
                        first_end = seg_starts[0] if len(brk) else len(t)
                        start = min(start, int(t[0]))
                        last = max(last, int(t[first_end - 1]))
                        n += int(first_end)
                        total += float(v[:first_end].sum())
                        if len(brk) == 0:
                            seg_starts = np.array([], dtype="int64")
                    if len(seg_starts):
                        closed.append((start, last, n, total))
                        start = None
                if len(seg_starts):
                    bounds = np.concatenate((seg_starts, [len(t)]))
                    # per-segment sums accumulate from zero (reduceat),
                    # not as prefix-sum differences — csum[e]-csum[s]
                    # carries cancellation error proportional to the
                    # prefix magnitude, which can flip round(total, 6)
                    seg_sums = np.add.reduceat(v, seg_starts.astype(np.intp))
                    for i in range(len(seg_starts)):
                        s, e = int(bounds[i]), int(bounds[i + 1])
                        seg = (
                            int(t[s]), int(t[e - 1]), e - s,
                            float(seg_sums[i]),
                        )
                        if i < len(seg_starts) - 1:
                            closed.append(seg)
                        else:
                            start, last, n, total = seg
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
