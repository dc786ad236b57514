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

Late data: events arriving in a later micro-batch but timestamped before
the open session's last-seen event are handled by splicing a zero-weight
virtual event at the stored max into the sorted stream — boundaries and
counts then match the batch twin for any lateness within the gap window
(the stored max never regresses, and gaps are measured against it).
Events older than that (beyond the gap window before the stored max)
emit as their own late sessions — the batch twin would have merged them
into an already-emitted session, which no streaming operator can retract;
bound that window with the stream's watermark. sum_value float
association assumes in-order arrival (a late event's value accumulates
when it arrives, not at its timestamp's position).
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


def _round4(x):
    """HALF_UP at 4 decimals (sign-aware floor(|x|*1e4 + 0.5)): the batch
    twin rounds with Spark F.round, whose HALF_UP disagrees with
    np.round/round's half-to-even exactly at representable .5 ties —
    the parity contract must not hinge on the rounding mode."""
    import numpy as np

    a = np.asarray(x, dtype=np.float64)
    r = np.sign(a) * np.floor(np.abs(a) * 1e4 + 0.5) / 1e4
    return float(r) if np.isscalar(x) or a.ndim == 0 else r


def _session_fn_factory(gap_sec: float):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        """Within-batch gap detection is fully VECTORIZED (diff > gap on
        the sorted frame -> np.add.reduceat per session group); scalar
        code touches only the state carry across batches — the open
        session either absorbs the batch's first group (gap <= gap_sec)
        or closes and emits."""
        import math

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
        absorbed = last is not None and secs[0] - last <= gap_sec
        pos = 0
        if absorbed and last > secs[0]:
            # late arrivals (events older than the open session's last
            # seen timestamp): splice a zero-weight VIRTUAL event at
            # `last` into the sorted stream, so gap detection below
            # compares against the session's true max — without it a
            # late batch silently regressed the open session's end and
            # shifted every later boundary (an in-batch gap measured
            # from the late event, not the stored max)
            pos = int(np.searchsorted(secs, last, side="right"))
            secs = np.insert(secs, pos, last)
            vals = np.insert(vals, pos, 0.0)
            real = np.ones(len(secs), dtype=np.int64)
            real[pos] = 0
        else:
            real = np.ones(len(secs), dtype=np.int64)
        # session-start flags: first event always starts a group
        newf = np.empty(len(secs), dtype=bool)
        newf[0] = True
        newf[1:] = (secs[1:] - secs[:-1]) > gap_sec
        starts = np.flatnonzero(newf)
        ends = np.append(starts[1:], len(secs))
        g_n = np.add.reduceat(real, starts).astype(np.int64)
        g_sum = np.add.reduceat(vals, starts)
        g_start = secs[starts].copy()
        g_end = secs[ends - 1]

        out = None
        if absorbed:
            # the open state session absorbs the group CONTAINING its
            # virtual max-timestamp event (group 0 in the ordinary
            # in-order case; later when events older than the gap window
            # precede it — those form their own late-orphan sessions).
            # The carry accumulates FIRST (val0 precedes the batch's
            # events, matching the incremental accumulation order —
            # appending it after the group sum would reassociate the
            # float total)
            vg = int(np.searchsorted(starts, pos, side="right") - 1)
            g_n[vg] += n0
            g_sum[vg] = float(np.add.reduce(
                np.concatenate(([val0], vals[starts[vg]: ends[vg]]))))
            if start0 is not None:
                g_start[vg] = min(float(start0), float(g_start[vg]))
        elif last is not None:
            # gap before the batch: the open session closes now.
            # math.floor, not int(): the batch twin emits
            # F.floor(min/max(_sec)) and int() truncates TOWARD ZERO —
            # they disagree by 1s for negative (pre-1970) fractional
            # timestamps, breaking the closed==batch parity contract
            out = [(user_id, s_idx, n0, _round4(val0),
                    int(math.floor(start0)), int(math.floor(last)))]
            s_idx += 1
        # every group but the last closes within this batch
        closed = len(starts) - 1
        if closed:
            emit = pd.DataFrame({
                "user_id": user_id,
                "session_idx": s_idx + np.arange(closed, dtype=np.int64),
                "n_events": g_n[:closed],
                "sum_value": _round4(g_sum[:closed]),
                # floor, not truncate — the batch twin's F.floor contract
                "start_sec": np.floor(g_start[:closed]).astype(np.int64),
                "end_sec": np.floor(g_end[:closed]).astype(np.int64),
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
