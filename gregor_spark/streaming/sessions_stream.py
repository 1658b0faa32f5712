"""Custom stateful streaming operator — gap-based sessionization via
``applyInPandasWithState`` (the task-brief pattern for operators the
built-in windowed aggregations can't express: session boundaries depend
on the DATA, not on fixed windows).

Semantics match the batch sessionizer (entry_queries.q_events_sessions):
events of one user belong to one session while consecutive timestamps are
within ``gap`` seconds.  The stream emits one row per CLOSED session —
a session closes when the event-time watermark passes its last event +
gap (no more in-order events can extend it), or when the state times out.

State per user: (session_start_ts, last_ts, n_events, sum_value) — O(1)
per active user regardless of stream length; the watermark bounds how
long an idle user's state lives (event-time timeout), so state size is
O(active users), the property that keeps this viable on an unbounded
10^12-event stream.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.LongType()),   # epoch micros
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events(user_id long, ts timestamp, value double) stream →
    closed-session stream via per-user state."""

    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed = []

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, sv = state.get
                closed.append((user_id, s0, s1, n, sv))
                state.remove()
            yield _sessions_pdf(closed)
            return

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()  # ns -> micros
        vals = rows["value"].to_numpy()

        if state.exists:
            s0, s1, n, sv = state.get
        else:
            s0, s1, n, sv = None, None, 0, 0.0

        for t, v in zip(ts_us, vals):
            if s0 is None:
                s0, s1, n, sv = int(t), int(t), 1, float(v)
            elif t - s1 > gap_us:
                closed.append((user_id, s0, s1, n, sv))
                s0, s1, n, sv = int(t), int(t), 1, float(v)
            else:
                s1, n, sv = int(t), n + 1, sv + float(v)

        state.update((s0, s1, n, sv))
        # the open session closes when event time passes last_ts + gap
        state.setTimeoutTimestamp(s1 // 1000 + gap_seconds * 1000)
        yield _sessions_pdf(closed)

    def _sessions_pdf(closed):
        if not closed:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "session_start": pd.Series(dtype="datetime64[us]"),
                    "session_end": pd.Series(dtype="datetime64[us]"),
                    "n_events": pd.Series(dtype="int64"),
                    "sum_value": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] for c in closed],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
