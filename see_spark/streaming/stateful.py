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
