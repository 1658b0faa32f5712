"""Custom stateful streaming operator — gap-based sessionization via
``applyInPandasWithState`` (the task-brief pattern for operators the
built-in windowed aggregations can't express: session boundaries depend
on the DATA, not on fixed windows).

Semantics match the batch sessionizer (entry_queries.q_events_sessions):
events of one user belong to one session while consecutive timestamps are
within ``gap`` seconds (compared on WHOLE SECONDS, exactly like the batch
``unix_timestamp`` diff — sub-second differences never split a session).

Correct under out-of-order arrival: the state holds a LIST of tentative
sessions (merged interval-style as events arrive in any order), and a
session is emitted only when the EVENT-TIME WATERMARK has passed its last
event + gap — i.e. when no admissible future event could extend or bridge
it.  Nothing is ever emitted from in-batch gap detection alone, so a late
(but within-watermark) event can still merge two tentative sessions.

State per user: O(open sessions) — bounded by the watermark delay / gap,
independent of stream length; idle users drain via event-time timeout.
That is the property that keeps this viable on an unbounded 10^12-event
stream.
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

# tentative sessions as parallel arrays (timestamps in epoch micros)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
    ]
)


def _merge(sessions: list, t: int, v: float, gap_us: int) -> list:
    """Insert event (t, v) into the tentative-session list, merging every
    session the event joins or bridges.  Gap comparison on WHOLE SECONDS,
    mirroring the batch sessionizer's unix_timestamp diff (strict > gap
    splits, <= gap merges).  The list invariant (pairwise non-mergeable,
    sorted by start) is preserved: scanning in start order against the
    growing window handles transitive bridging through the new event."""
    gap_s = gap_us // 1_000_000

    def mergeable(a0: int, a1: int, b0: int, b1: int) -> bool:
        if b0 > a1:
            return (b0 // 1_000_000) - (a1 // 1_000_000) <= gap_s
        if a0 > b1:
            return (a0 // 1_000_000) - (b1 // 1_000_000) <= gap_s
        return True  # overlapping windows

    s0, s1, n, sv = t, t, 1, v
    out = []
    for cs0, cs1, cn, csv in sorted(sessions, key=lambda s: s[0]):
        if mergeable(s0, s1, cs0, cs1):
            s0, s1 = min(s0, cs0), max(s1, cs1)
            n += cn
            sv += csv
        else:
            out.append((cs0, cs1, cn, csv))
    out.append((s0, s1, n, sv))
    out.sort(key=lambda s: s[0])
    return out


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events(user_id long, ts timestamp, value double) stream →
    closed-session stream via per-user tentative-session state."""

    gap_us = gap_seconds * 1_000_000
    gap_s = gap_seconds

    def _emit(closed):
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

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        sessions: list = []
        if state.exists:
            starts, ends, counts, sums = state.get
            sessions = list(zip(starts, ends, counts, sums))

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
                vals = pdf["value"].to_numpy()
                for t, v in zip(ts_us, vals):
                    sessions = _merge(sessions, int(t), float(v), gap_us)

        # emit every tentative session the watermark has sealed: no event
        # with ts >= watermark can extend or bridge it any more.  The seal
        # test MUST use the same floor-seconds gap rule as _merge — an
        # admissible future event t >= wm merges iff
        # floor(t) - floor(s1) <= gap, and floor is monotone in t, so the
        # session is safe exactly when floor(wm) - floor(s1) > gap.
        # (A microsecond-precision seal `s1 + gap_us < wm_us` is WRONG for
        # sub-second timestamps: s1=1.9s, gap=1s, wm=2.95s would seal even
        # though an event at 2.99s still merges under the whole-second rule.)
        wm_us = state.getCurrentWatermarkMs() * 1000
        wm_s = wm_us // 1_000_000

        def sealed(s1: int) -> bool:
            return wm_s - (s1 // 1_000_000) > gap_s

        closed = [
            (user_id, s0, s1, n, sv)
            for s0, s1, n, sv in sessions
            if sealed(s1)
        ]
        open_ = [s for s in sessions if not sealed(s[1])]
        if open_:
            state.update(
                (
                    [s[0] for s in open_],
                    [s[1] for s in open_],
                    [s[2] for s in open_],
                    [s[3] for s in open_],
                )
            )
            # wake when the earliest open session becomes sealable under
            # the same floor-seconds rule: first wm with
            # floor(wm) > floor(s1) + gap is (floor(s1) + gap + 1) seconds
            state.setTimeoutTimestamp(
                (min(s[1] for s in open_) // 1_000_000 + gap_seconds + 1) * 1000
            )
        elif state.exists:
            state.remove()
        yield _emit(closed)

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
