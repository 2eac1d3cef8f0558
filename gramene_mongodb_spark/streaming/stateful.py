"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows (streaming/windows.py) cover the reference-adjacent
shapes; this module is the escape hatch for semantics they can't
express — here, a per-user RUNNING profile (event count, value sum,
last-seen) that emits an updated row per micro-batch and expires idle
users via processing-time timeout. The state is an explicit tuple the
engine snapshots per trigger, so the operator scales with (keys ×
state size), not history length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)


def _make_update_profile(expire_ms: int | None):
    def update_profile(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last = state.get() if state.exists else (0, 0.0, None)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = pdf["event_type"].iloc[-1]
        state.update((n, total, last))
        if expire_ms is not None:
            state.setTimeoutDuration(expire_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_event_type": [last],
            }
        )

    return update_profile


def running_user_profiles(
    events: DataFrame, expire_idle_ms: int | None = 60 * 60 * 1000
) -> DataFrame:
    """Per-user running profile, updated every micro-batch.

    Input: the streaming events shape (event_id, ts, user_id,
    event_type, value, …). Output mode must be ``update``.
    ``expire_idle_ms`` drops state for users idle that long
    (processing-time timeout); pass None for no expiry — required for
    run-to-completion (availableNow) jobs, where a pending timeout keeps
    the query scheduling batches.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_idle_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(expire_idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
