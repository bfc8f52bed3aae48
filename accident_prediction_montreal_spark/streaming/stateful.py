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


# --- sharded streaming heavy-hitter candidates -----------------------------------

HH_STATE_SCHEMA = "ks ARRAY<LONG>, cs ARRAY<LONG>"
HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("hh_key", T.LongType()),
    ]
)


def sharded_heavy_hitter_candidates(
    keyed: DataFrame, capacity: int = 41
) -> DataFrame:
    """Streaming Misra-Gries candidate maintenance, SHARDED for scale
    (the streaming face of operators/heavyhitters.py): input rows carry
    (shard, hh_key); each shard's summary lives in the state store as
    two parallel arrays and absorbs every micro-batch with a vectorized
    value_counts merge + decrement-by-min eviction.

    Sharding is what makes this distributed: a single global summary
    would funnel the stream through one state key, while hash shards
    spread state across the cluster and the per-shard pigeonhole bound
    still holds (a key's whole stream lands in ONE shard, and
    n_shard <= n, so capacity >= 1/threshold_frac suffices). Update-mode
    emissions are per-batch candidate snapshots; the union over batches
    remains a SUPERSET of every key above the global threshold — callers
    recount candidates exactly batch-side (same second pass as the batch
    operator).
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ks, cs = state.get
            counters = dict(zip(ks, cs))
        else:
            counters = {}
        for pdf in pdfs:
            for v, c in pdf["hh_key"].value_counts().items():
                counters[int(v)] = counters.get(int(v), 0) + int(c)
            if len(counters) > capacity:
                floor = sorted(counters.values())[len(counters) - capacity - 1]
                counters = {v: c - floor for v, c in counters.items() if c > floor}
        state.update((list(counters.keys()), list(counters.values())))
        yield pd.DataFrame(
            {"shard": key[0], "hh_key": list(counters.keys())}
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
