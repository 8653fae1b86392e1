"""Custom stateful streaming operator: user sessionization with
``applyInPandasWithState`` (the §2.8 extension point for operators Spark's
built-ins can't express — the batch twin is the ``a8_sessionization``
gaps-and-islands query, oracle-verified).

State per user: (session_start, last_ts, n_events). An event more than
``gap`` after the last one closes the open session (emitted) and starts a
new one; a processing-time timeout closes idle sessions. State size is
O(active users), bounded by the timeout — the streaming-scale analog of
the reference's unbounded in-memory bookkeeping.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),  # epoch seconds
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: float = 1800.0,
    use_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed = []

    if use_timeout and state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
    else:
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        stragglers: list[float] = []
        for ts in rows["ts"]:
            t = ts.timestamp()
            if start is not None and t < start - gap_seconds:
                # CROSS-BATCH late arrival predating the open session by
                # more than the gap: buffer it; the in-batch islands
                # pass below merges straggler clusters before emitting
                # (ADVICE r8 — emitting each as its own session diverged
                # from the batch gaps-and-islands twin whenever several
                # stragglers fell within gap_seconds of each other)
                stragglers.append(t)
                continue
            if last is not None and t - last > gap_seconds:
                closed.append((user_id, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            # a late event inside the open session must not REGRESS the
            # session bounds: end stays the max ts, start extends to the
            # min — matching the batch gaps-and-islands twin
            start = min(start, t)
            last = t if last is None else max(last, t)
            n += 1
        # gaps-and-islands over THIS batch's stragglers (already sorted —
        # rows were processed in ts order): consecutive stragglers within
        # the gap merge into one closed session, matching the batch twin
        # for any straggler cluster delivered in one micro-batch. Every
        # straggler predates the (possibly extended) open-session start
        # by more than the gap, so no island can touch the open state;
        # clusters SPLIT ACROSS batches still emit one session per batch
        # (the documented bounded-state approximation — state holds only
        # the open session, never a straggler buffer).
        i_start = i_last = None
        i_n = 0
        for t in stragglers:
            if i_last is not None and t - i_last > gap_seconds:
                closed.append((user_id, i_start, i_last, i_n))
                i_start, i_n = None, 0
            if i_start is None:
                i_start = t
            i_last = t
            i_n += 1
        if i_last is not None:
            closed.append((user_id, i_start, i_last, i_n))
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(int(gap_seconds * 1000))

    out = pd.DataFrame(
        closed, columns=["user_id", "session_start", "session_end", "n_events"]
    )
    if not out.empty:
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
    yield out


def sessionize_stream(
    events: DataFrame, gap_seconds: float = 1800.0, idle_timeout: bool = False
) -> DataFrame:
    """events(user_id, ts, ...) stream → closed-session rows.

    ``idle_timeout=True`` additionally closes sessions after
    processing-time inactivity (production mode). It keeps the trigger
    perpetually active ("no new data but cleaning up state" loops), which
    makes ``processAllAvailable()`` unusable — leave it off for
    availableNow/drain-style runs and tests; without it a session closes
    when the first post-gap event for that user arrives."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds, idle_timeout)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
