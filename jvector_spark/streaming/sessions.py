"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState.

The batch twin is operators/events.sessionize (identical boundary rule);
this version maintains per-user state across micro-batches — the kind of
operator Structured Streaming can't express with built-in windowed aggs
(sessions have data-driven, not clock-driven, boundaries).

State per user: (session_idx, last_sec, n_events, sum_value, start_sec).
A session EMITS when a later event closes it (gap exceeded); the final
open session per user stays in state (it would emit on timeout in a live
stream — GroupStateTimeout is wired but trivially testable only with a
live clock, so tests assert closed == batch-minus-open).

Scale shape: state is O(active users), partitioned by user_id; each
micro-batch group processes as one pandas frame (Arrow transport).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType)

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_idx", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("start_sec", LongType()),
    StructField("end_sec", LongType()),
])

SESSION_STATE = StructType([
    StructField("session_idx", LongType()),
    StructField("last_sec", DoubleType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("start_sec", DoubleType()),
])


def _session_fn_factory(gap_sec: float):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.exists:
            s_idx, last, n, val, start = state.get
        else:
            s_idx, last, n, val, start = 1, None, 0, 0.0, None  # 1-based
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for sec, v in zip(
                pdf["ts"].map(pd.Timestamp.timestamp), pdf["value"]
            ):
                if last is not None and (sec - last) > gap_sec:
                    out.append((user_id, s_idx, n, round(val, 4),
                                int(start), int(last)))
                    s_idx, n, val, start = s_idx + 1, 0, 0.0, None
                if start is None:
                    start = sec
                n += 1
                val += float(v)
                last = sec
        state.update((s_idx, last, n, val, start))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in SESSION_OUTPUT.fields]
            )

    return fn


def streaming_sessionize(stream_events: DataFrame,
                         gap_minutes: int = 30) -> DataFrame:
    """readStream events -> closed sessions (append mode).

    Session indexes are 1-based per user to match the batch operator's
    running-sum numbering.
    """
    return stream_events.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_minutes * 60.0),
        SESSION_OUTPUT,
        SESSION_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
