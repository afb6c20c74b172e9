"""transformWithStateInPandas operators (Spark 4 arbitrary-state API v2).

Where `stateful.py` uses the v1 `applyInPandasWithState` surface, this
module exercises the v2 `StatefulProcessor` API — typed per-key state
(ValueState here), state TTL, and event-time timers — which is the
Spark-4-native way to express custom stateful operators at scale:

- state lives in the (RocksDB) state store, one entry per key — O(keys),
  not O(events);
- TTL bounds state for abandoned keys without hand-rolled timers;
- timers let an operator EMIT on time passing (e.g. flush an idle
  session), which v1 could only approximate with GroupStateTimeout.

Both operators are micro-batch deterministic, so tests compare them
against exact batch aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap (matches stateful.py)

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_RUN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


class RunningUserStats(StatefulProcessor):
    """Per-user running (count, sum(value)) with TTL'd ValueState.

    Emits one row per user per micro-batch carrying the cumulative totals,
    so the LAST emitted row per user equals the batch aggregate — the
    deterministic invariant the test checks. ``ttl_ms`` evicts users idle
    (in processing time) longer than the horizon: bounded state under
    key churn, the thing a 100 TB stream needs.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("running", _RUN_STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = (self._state.get() or (0, 0.0)) if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})

    def close(self) -> None:
        pass


def running_user_stats(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming cumulative per-user stats via transformWithStateInPandas."""
    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStats(ttl_ms),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("flushed_by_timer", T.BooleanType()),
    ]
)

_SESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


class TimerSessionizer(StatefulProcessor):
    """Sessionizer v2: gap-split like stateful._sessionize, PLUS an
    event-time timer that flushes a session once the watermark passes its
    idle deadline — the open-session row v1 could never emit (it kept the
    trailing session in state forever on a quiet key).

    Emitted rows carry ``flushed_by_timer`` so tests can split the
    deterministic closed-by-gap sessions from the watermark-timed ones.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("sess", _SESS_STATE_SCHEMA)

    def _emit(self, user_id, start_us, last_us, n, by_timer: bool) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "flushed_by_timer": [by_timer],
            }
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start_us, last_us, n = (
            self._state.get() if self._state.exists() else (-1, -1, 0)
        ) or (-1, -1, 0)
        batch = [pdf for pdf in rows if len(pdf)]
        if batch:
            # global sort across Arrow chunks (chunk-local order is NOT
            # group order — same invariant stateful._sessionize documents)
            pdf = pd.concat(batch, ignore_index=True) if len(batch) > 1 else batch[0]
            pdf = pdf.sort_values("ts")
            for ts in pdf["ts"]:
                ts_us = int(ts.value // 1_000)
                if start_us < 0:
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us - last_us >= _GAP_US:
                    yield self._emit(user_id, start_us, last_us, n, False)
                    start_us, last_us, n = ts_us, ts_us, 1
                else:
                    last_us, n = ts_us, n + 1
        self._state.update((start_us, last_us, n))
        # (re)arm the idle-flush timer: fires when the event-time watermark
        # passes last_us + gap
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_us // 1000 + _GAP_US // 1000)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            got = self._state.get()
            if got is not None:
                start_us, last_us, n = got
                if start_us >= 0:
                    yield self._emit(user_id, start_us, last_us, n, True)
        self._state.clear()

    def close(self) -> None:
        pass


def sessionize_with_timers(events: DataFrame) -> DataFrame:
    """Timer-flushed streaming sessionizer (event-time timeMode; the input
    must carry a watermark on ``ts``)."""
    return events.select("user_id", "ts").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TimerSessionizer(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
