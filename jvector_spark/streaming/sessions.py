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
        """Within-batch gap detection is fully VECTORIZED (diff > gap on
        the sorted frame -> np.add.reduceat per session group); scalar
        code touches only the state carry across batches — the open
        session either absorbs the batch's first group (gap <= gap_sec)
        or closes and emits."""
        import numpy as np

        user_id = int(key[0])
        if state.exists:
            s_idx, last, n0, val0, start0 = state.get
        else:
            s_idx, last, n0, val0, start0 = 1, None, 0, 0.0, None  # 1-based
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((s_idx, last, n0, val0, start0))
            return
        pdf = (
            pd.concat(frames, ignore_index=True)
            .sort_values(["ts", "event_id"], kind="mergesort")
        )
        secs = pdf["ts"].map(pd.Timestamp.timestamp).to_numpy(np.float64)
        vals = pdf["value"].to_numpy(np.float64)
        # session-start flags: first event always starts a group
        newf = np.empty(len(secs), dtype=bool)
        newf[0] = True
        newf[1:] = (secs[1:] - secs[:-1]) > gap_sec
        starts = np.flatnonzero(newf)
        ends = np.append(starts[1:], len(secs))
        g_n = (ends - starts).astype(np.int64)
        g_sum = np.add.reduceat(vals, starts)
        g_start = secs[starts].copy()
        g_end = secs[ends - 1]

        out = None
        if last is not None and secs[0] - last <= gap_sec:
            # open state session absorbs the batch's first group; the
            # carry accumulates FIRST (val0 precedes the batch's events,
            # matching the incremental accumulation order — appending it
            # after the group sum would reassociate the float total)
            g_n[0] += n0
            g_sum[0] = float(np.add.reduce(
                np.concatenate(([val0], vals[: ends[0]]))))
            if start0 is not None:
                g_start[0] = start0
        elif last is not None:
            # gap before the batch: the open session closes now
            out = [(user_id, s_idx, n0, round(val0, 4),
                    int(start0), int(last))]
            s_idx += 1
        # every group but the last closes within this batch
        closed = len(starts) - 1
        if closed:
            emit = pd.DataFrame({
                "user_id": user_id,
                "session_idx": s_idx + np.arange(closed, dtype=np.int64),
                "n_events": g_n[:closed],
                "sum_value": np.round(g_sum[:closed], 4),
                "start_sec": g_start[:closed].astype(np.int64),
                "end_sec": g_end[:closed].astype(np.int64),
            })
            if out:
                emit = pd.concat([
                    pd.DataFrame(out, columns=[f.name for f in
                                               SESSION_OUTPUT.fields]),
                    emit,
                ], ignore_index=True)
            out_df = emit
        elif out:
            out_df = pd.DataFrame(
                out, columns=[f.name for f in SESSION_OUTPUT.fields])
        else:
            out_df = None
        state.update((
            int(s_idx + closed), float(g_end[-1]), int(g_n[-1]),
            float(g_sum[-1]), float(g_start[-1]),
        ))
        if out_df is not None:
            yield out_df

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
