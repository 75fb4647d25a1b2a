"""Custom stateful streaming operator: gap-based sessionization per key.

The canonical ``applyInPandasWithState`` pattern (the brief's designated
route for operators Structured Streaming lacks): group a pages/events stream
by key and close a session when no event arrives within ``gap`` of the last
one. State per key is three scalars (session_start, last_ts, count) — O(keys)
memory, expired by event-time timeout against the watermark, so state never
grows unboundedly.

Semantics:
- events within ``gap`` of the previous event extend the session;
- a batch that contains a longer gap closes the earlier session *immediately*
  (emitted in that batch) and starts a new one;
- a session with no successor event is closed by the event-time TIMEOUT once
  the watermark passes last_ts + gap (append-mode friendly: each session is
  emitted exactly once).

Batch-side work is vectorized: the per-key per-batch frame is sorted and
split on gaps with numpy diff — no per-row Python beyond session boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "session_start long, last_ts long, n_events long"  # µs epochs


def sessionize(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization; returns an append-mode streaming DataFrame
    with SESSION_SCHEMA. Input must be a streaming DataFrame."""
    gap_us = gap_seconds * 1_000_000

    def close(key: str, start_us: int, last_us: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": [key],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )

    def fn(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield close(k, start_us, last_us, n)
            return

        ts_list = []
        for pdf in pdf_iter:
            if len(pdf):
                ts_list.append(pdf[time_col].astype("datetime64[us]").astype(np.int64).to_numpy())
        if not ts_list:
            return
        ts = np.sort(np.concatenate(ts_list), kind="mergesort")

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(ts[0]), int(ts[0]) - 1, 0  # sentinel: no events yet

        out = []
        # split incoming timestamps on gaps relative to the running session.
        # Late (within-watermark) segments may sort BEFORE the session state:
        # a merge must extend both bounds monotonically (min start / max end
        # — overwriting last_us with an earlier seg_end regressed the state,
        # emitted session_end < session_start, and fired the timeout early),
        # and a segment ending more than gap BEFORE the session start is a
        # disjoint earlier session, emitted immediately rather than glued on.
        for t in _segments(ts, gap_us):
            seg_start, seg_end, seg_n = int(t[0]), int(t[-1]), len(t)
            if n > 0 and seg_start - last_us > gap_us:
                out.append(close(k, start_us, last_us, n))
                start_us, last_us, n = seg_start, seg_end, seg_n
            elif n > 0 and start_us - seg_end > gap_us:
                out.append(close(k, seg_start, seg_end, seg_n))
            else:
                if n == 0:
                    start_us, last_us = seg_start, seg_end
                else:
                    start_us = min(start_us, seg_start)
                    last_us = max(last_us, seg_end)
                n += seg_n
        state.update((start_us, last_us, n))
        # close via timeout when the watermark passes last_ts + gap
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        for frame in out:
            yield frame

    def _segments(ts: np.ndarray, gap: int):
        """Split a sorted µs array into runs with intra-run gaps <= gap."""
        if len(ts) == 0:
            return []
        cuts = np.nonzero(np.diff(ts) > gap)[0] + 1
        return np.split(ts, cuts)

    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_native(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """JVM-native sessionization via ``F.session_window`` — same output
    schema and semantics as :func:`sessionize` (``session_end`` = last event
    time, via an explicit ``max``; the raw window end is last + gap), with
    session merging / watermark expiry handled by Spark's session-window
    operator and zero Python in the loop. Prefer this whenever the
    per-session result is expressible as aggregates; ``sessionize`` remains
    the template for custom per-session state. Works on batch DataFrames
    too (the watermark is a streaming-only concern)."""
    from pyspark.sql import functions as F

    src = stream.withWatermark(time_col, watermark) if stream.isStreaming else stream
    return (
        src.groupBy(
            F.session_window(F.col(time_col), f"{gap_seconds} seconds"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("key", "session_start", "session_end", "n_events")
    )
