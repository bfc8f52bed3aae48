"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.12: the escape hatch when built-in windows can't express
the semantics).

``running_user_stats`` keeps per-user state across micro-batches:
event count, value sum, and an exponentially-decayed activity score
(decay per event — the streaming analogue of the reference's batch EWMA,
weather.py:228-244). Emits one updated row per user per batch.

State is a single fixed-width tuple per user — the state store stays
O(|users|) regardless of stream length, and the watermark-less design is
deliberate: the state never expires (use GroupStateTimeout.* in callers
that need TTL).

Spark 4's successor API (transformWithStateInPandas: named value/list/
map state, timers, TTL) is the forward path but its Python runner
requires protobuf, which this container lacks — verified to crash at
query start (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE), so
applyInPandasWithState is the shipped implementation.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events LONG, value_sum DOUBLE, activity DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("activity", T.DoubleType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, vsum, activity = state.get
    else:
        n, vsum, activity = 0, 0.0, 0.0
    decay = math.exp(-0.5)
    for pdf in pdfs:
        # order within the batch by event time for a deterministic decay chain
        pdf = pdf.sort_values(["ts", "event_id"])
        for value in pdf["value"]:
            n += 1
            vsum += float(value)
            activity = activity * decay + 1.0
    state.update((n, vsum, activity))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [vsum],
            "activity": [activity],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running stats with custom state.

    Output mode must be ``update``. Deterministic given a deterministic
    batch split (availableNow over a static fixture).
    """
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
