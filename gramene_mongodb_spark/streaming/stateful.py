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
        # a key's batch input may span multiple Arrow chunks in no
        # particular order — track the max-(ts, event_id) row ACROSS
        # chunks; taking the final chunk's tail would corrupt
        # last_event_type whenever the latest event isn't in it
        best = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            top = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            cand = (top["ts"], top["event_id"], top["event_type"])
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if best is not None:
            last = best[2]
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


# ---------------------------------------------------------------------------
# the same operator on the Spark 4 successor API: transformWithState
# ---------------------------------------------------------------------------
#
# transformWithStateInPandas is the forward path for custom stateful
# operators (typed state handles — ValueState/ListState/MapState — with
# per-state TTL, timers, and the RocksDB state store underneath).
# Shipping the SAME running-profile semantics on both APIs pins the
# migration: the equality test replays one stream through each and
# diffs the final rows.

try:  # pragma: no cover - import guard exercised by tests
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # older Spark: applyInPandasWithState only
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class ProfileProcessor(StatefulProcessor):
    """Per-user running profile as a transformWithState processor.

    State: one ValueState tuple (n_events, total_value,
    last_event_type) — identical to the applyInPandasWithState twin's
    state, snapshotted by the RocksDB store per trigger. ``ttl_ms``
    maps the twin's processing-time idle expiry onto the new API's
    per-state TTL (None = no expiry, for availableNow runs).
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState(
            "profile", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        got = self._state.get() if self._state.exists() else None
        n, total, last = got if got is not None else (0, 0.0, None)
        # same cross-chunk max tracking as the applyInPandasWithState
        # twin — chunk boundaries differ between the APIs, so relying
        # on chunk order would also let the equality test flake
        best = None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            top = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            cand = (top["ts"], top["event_id"], top["event_type"])
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if best is not None:
            last = best[2]
        self._state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_event_type": [last],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles_tws(
    events: DataFrame, expire_idle_ms: int | None = None
) -> DataFrame:
    """`running_user_profiles` on the Spark-4 transformWithState API.

    Same input/output contract as the applyInPandasWithState form
    (update mode, one row per touched user per micro-batch). Requires
    the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` on the writeStream's session
    (local builds bundle rocksdbjni; the equality test does this).
    """
    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    # state TTL is only legal under ProcessingTime time mode — with
    # timeMode="None" a TTL'd getValueState throws at query start
    time_mode = "ProcessingTime" if expire_idle_ms is not None else "None"
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(ttl_ms=expire_idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode=time_mode,
    )
