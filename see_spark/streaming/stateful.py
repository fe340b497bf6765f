"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming surface (SURVEY §2.2); this demonstrates the
engine's custom-stateful path: a per-user running aggregate (event count +
value sum + last-seen timestamp) maintained across micro-batches with
GroupState, the Structured-Streaming building block for operators the
built-in windowed aggregations can't express (per-key crawl budgets,
session models with custom eviction, online counters).

State is one small tuple per key — at 10^9 users this is sharded by the
groupBy hash across executors, and the watermark-driven timeout
(``GroupStateTimeout.NoTimeout`` here; switch to EventTimeTimeout in
production) bounds it.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_running(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last = state.get
    else:
        n, s, last = 0, 0.0, -1
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            # pyspark's pandas serializer delivers ts as datetime64[ns];
            # convert to [us] BEFORE the int cast or last_ts_us is 1000x off
            last = max(
                last, int(pdf["ts"].astype("datetime64[us]").astype("int64").max())
            )
    state.update((n, s, last))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s], "last_ts_us": [last]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful running-total operator (STREAMING ONLY:
    applyInPandasWithState raises UnsupportedOperationException on a batch
    DF). The stream==batch equivalence test compares the final micro-batch
    output of this operator against a plain batch groupBy aggregate."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _session_updater(gap_us: int):
    def _update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            st, last, n, s = state.get
            closed.append((user_id, st, last, n, s, "timeout"))
            state.remove()
        else:
            if state.exists:
                st, last, n, s = state.get
            else:
                st = None
                last = n = 0
                s = 0.0
            events = []
            for pdf in pdfs:
                if len(pdf):
                    ts_us = (
                        pdf["ts"].astype("datetime64[us]").astype("int64")
                    )
                    events.extend(zip(ts_us.tolist(), pdf["value"].tolist()))
            events.sort(key=lambda e: e[0])
            for ts, v in events:
                if st is None:
                    st, last, n, s = ts, ts, 1, float(v)
                elif ts - last > gap_us:
                    closed.append((user_id, st, last, n, s, "gap"))
                    st, last, n, s = ts, ts, 1, float(v)
                else:
                    # watermark-bounded disorder: an event older than the
                    # open session's start still belongs to it
                    st = min(st, ts)
                    last = max(last, ts)
                    n += 1
                    s += float(v)
            if st is not None:
                state.update((st, last, n, s))
                # event-time timeout: fires once the watermark passes the
                # session's gap horizon (ms epoch, the GroupState unit)
                state.setTimeoutTimestamp(last // 1000 + (gap_us // 1000))
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_start_us", "session_end_us",
                "n_events", "sum_value", "closed_by",
            ],
        )

    return _update


def stream_sessionize(
    events: DataFrame, gap_s: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization with custom state — the
    operator Structured Streaming's built-in session_window cannot fully
    express once you need custom eviction/emission rules: per user, an
    event extends the open session unless the event-time gap exceeds
    ``gap_s``, in which case the finished session EMITS (closed_by =
    'gap') and a new one opens; an open session with no successor emits
    via EventTimeTimeout once the watermark passes last_event + gap
    (closed_by = 'timeout'). Append mode: exactly one row per closed
    session, never partial updates.

    Semantics match the batch `streaming/windows.sessionize` windows —
    the stream==batch pytest pins it, including sessions SPANNING
    micro-batch boundaries (state carries start/last/count/sum, so a
    boundary never splits a session).

    State is one 4-field tuple per ACTIVE user (bounded by the timeout
    eviction), sharded by the groupBy hash; at 10^9 users the active
    set, not the user universe, is what executors hold.
    """
    gap_us = int(gap_s) * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_updater(gap_us),
            SESSION_SCHEMA,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
