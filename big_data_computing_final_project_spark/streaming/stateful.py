"""Custom stateful streaming operators (SURVEY.md §2.10:
`applyInPandasWithState` for custom stateful logic,
`dropDuplicatesWithinWatermark` for stateful dedup).

The sessionizer is the canonical custom operator the built-ins can't
express when per-session logic goes beyond count/min/max (e.g. emitting a
value trajectory). State is per-user (grouped), Arrow-batched, and bounded:
one open session per user — O(users) state, independent of event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user sessionizer: closes a session when the next event arrives
    >= gap after the previous one; the trailing open session stays in state
    (a timeout would flush it in production)."""
    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events, total_value = state.get
    else:
        start_us = last_us = -1
        n_events = 0
        total_value = 0.0

    closed: list[tuple[int, int, int, int, float]] = []
    # Materialize the whole group before sorting: Arrow hands the group over
    # in ~10k-row chunks, and per-chunk sorts do NOT give a global order when
    # one user's events span chunks — sessions would be mis-split. A single
    # user's micro-batch slice is bounded, so the concat is safe.
    batch = [pdf for pdf in pdfs if len(pdf)]
    if batch:
        pdf = pd.concat(batch, ignore_index=True) if len(batch) > 1 else batch[0]
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts.value // 1_000)  # pandas ns -> µs
            if start_us < 0:
                start_us, last_us, n_events, total_value = ts_us, ts_us, 1, float(value)
            elif ts_us - last_us >= _GAP_US:
                closed.append((user_id, start_us, last_us, n_events, total_value))
                start_us, last_us, n_events, total_value = ts_us, ts_us, 1, float(value)
            else:
                last_us = ts_us
                n_events += 1
                total_value += float(value)
    state.update((start_us, last_us, n_events, total_value))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "total_value": [c[4] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful sessionization over a (streaming) events frame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, key: str = "event_id") -> DataFrame:
    """Stateful streaming dedup: drops repeated keys while their event time
    is within the watermark (state expires with the watermark — bounded)."""
    return events.dropDuplicatesWithinWatermark([key])
