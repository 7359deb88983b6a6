"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The reference has no stateful streaming (its only incremental compute
is the windowed rollup, see rollup_stream.py), but a training-data
pipeline ingesting event streams needs session assembly with
out-of-order data and bounded state. Tumbling ``window()`` can't
express "extends while events keep coming, closes after 30 quiet
minutes" — this is exactly the ``applyInPandasWithState`` case:

- state per user = the one open session (start/last/count, integer
  microseconds),
- a micro-batch folds its (sorted) events into that state, emitting
  every session it closes along the way,
- an **event-time timeout** at ``last + gap`` closes the final session
  once the watermark passes it — so emission is driven by stream
  progress, not wall clock, and replays deterministically.

State size is O(active users), not O(events): late data beyond the
watermark is dropped by the same contract as the rollup (T1's
start_offset analog).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def _emit(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        }
    )


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n)
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
        if not ts_us:
            return
        ts_us.sort()

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = ts_us[0]
            n = 0
        for t in ts_us:
            if t - last_us > gap_us:
                yield _emit(user_id, start_us, last_us, n)
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        # close the open session once the WATERMARK (not the clock)
        # passes its quiet period
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    lateness: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Event stream -> closed sessions (one row per session, emitted when
    the watermark passes session_end + gap)."""
    return (
        stream.withWatermark(time_col, lateness)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def write_sessions(
    sessions: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    w = (
        sessions.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    return w.trigger(availableNow=True) if available_now else w
