"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState (SURVEY §2.2i extension — the 'custom stateful
operator' pattern DuckDB has no analog for).

State per user: (current session start, last event ts, event count).
An event more than GAP seconds after the last one closes the session and
emits it; the watermark-driven timeout flushes idle sessions. The same
module works under trigger(availableNow) for backfills — tested in
tests/test_streaming_stateful.py.

Scale: state is per-key (user) and O(1) per key; the shuffle is the
groupBy(user_id) any sessionization needs. Arrow batches amortize the
Python crossing exactly like mapInPandas.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SECONDS = 1800

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _sessionize(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = []

    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        rows.append((user_id, start_us, last_us, n, total))
        state.remove()
    else:
        events = pd.concat(list(pdfs)).sort_values("ts")
        us = (events["ts"].astype("int64") // 1000).to_list()  # ns → µs
        vals = events["value"].to_list()
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = us[0]
            n, total = 0, 0.0
        for t_us, v in zip(us, vals):
            if t_us - last_us > GAP_SECONDS * 1_000_000:
                rows.append((user_id, start_us, last_us, n, total))
                start_us, n, total = t_us, 0, 0.0
            last_us = t_us
            n += 1
            total += float(v)
        state.update((start_us, last_us, n, total))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + GAP_SECONDS * 1000)

    if rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "sess_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                "sess_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                "n_events": [r[3] for r in rows],
                "total_value": [r[4] for r in rows],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts watermark) → closed sessions stream."""
    src = events.withWatermark("ts", "2 hours")
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
