"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed aggregations can't express — running
per-key accumulators that must survive across micro-batches and emit on
every update — Structured Streaming's arbitrary-state API is the tool:
state lives in the state store (checkpointed, partitioned by key), the
user function sees Arrow batches per key, and watermark-based timeouts
garbage-collect idle keys so state stays bounded.

Here: a per-user running profile (event count, value sum, exponential
moving average of value) — the "feature-store maintenance" shape of a
training-data pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("ema_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

_EMA_ALPHA = 0.125


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, ema = state.get
    else:
        n, total, ema = 0, 0.0, None
    # deterministic fold: events within the micro-batch are processed in
    # event-time order so the EMA does not depend on batch slicing
    rows = pd.concat(list(batches)).sort_values("ts")
    for v in rows["value"]:
        n += 1
        total += float(v)
        ema = float(v) if ema is None else (_EMA_ALPHA * float(v) + (1 - _EMA_ALPHA) * ema)
    state.update((n, total, ema))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "ema_value": [ema],
        }
    )


def user_profiles_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running profile, one output row per user
    per micro-batch touching that user."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
