"""Watermarked stream-stream event-time join (the attribution pattern).

The streaming layer so far covers rollups (stream_rollup.py), dedup
(stream_dedup.py) and sessionization (sessions.py); what it lacked was the
fourth canonical stateful shape: joining TWO live streams on a key within
an event-time bound — "which click follows which impression by the same
user within N minutes". The reference has no streaming at all (SURVEY.md
§2, last row); this is part of the web-scale graft.

Design notes:
- **Both sides carry a watermark and the join condition carries an explicit
  event-time range** (``conv_ts BETWEEN imp_ts AND imp_ts + delay``). That
  pair is what lets Spark derive a state-eviction bound: buffered left rows
  expire once the right watermark passes ``imp_ts + delay``, so state is
  O(rows inside the delay+watermark horizon), never the whole stream.
- **Batch twin built in**: on non-streaming inputs the same function skips
  the watermarks and returns the identical equi+range join, so tests (and
  oracles) compare streaming output against the same code path run as a
  batch plan — one semantics, two execution modes.
- **Outer joins**: ``how="leftOuter"`` emits unmatched impressions (NULL
  conversion columns) only after the watermark passes the end of their
  match window — the standard Structured Streaming contract. An
  ``availableNow`` drain emits outer results only as far as the final
  watermark; tests append a watermark-advancing tail batch.

Scale notes (100 TB/day of events): the join shuffles both streams on the
key — hot keys (one user producing millions of impressions inside the
delay window) are the same documented skew bound as the batch interval
join (operators/rangejoin.py); salt upstream if a single key outgrows a
task. The range condition keeps per-key state bounded by the delay
horizon, so total state ~ input_rate x (delay + watermark), independent of
stream lifetime.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _delay_seconds(spec: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s+(\w+)\s*", spec)
    if not m or m.group(2).lower() not in _UNIT_SECONDS:
        raise ValueError(
            f"max_delay must look like '10 minutes' / '2 hours', got {spec!r}"
        )
    return int(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()]


def _prefixed(df: DataFrame, key_col: str, time_col: str, prefix: str) -> DataFrame:
    if key_col not in df.columns or time_col not in df.columns:
        raise ValueError(f"input is missing {key_col!r} or {time_col!r}")
    return df.select(
        F.col(key_col),
        *[F.col(c).alias(prefix + c) for c in df.columns if c != key_col],
    )


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    left_prefix: str = "imp_",
    right_prefix: str = "conv_",
) -> DataFrame:
    """Join two event streams on ``key_col`` where the right event lands in
    ``[left.ts, left.ts + max_delay]``.

    Every non-key column is prefixed (``imp_``/``conv_`` by default) so the
    two sides never collide; the result carries ``key_col`` once plus both
    prefixed column sets. Works identically on batch DataFrames (no
    watermarks applied) — that IS the oracle path for the streaming tests.

    ``how``: ``inner`` or ``leftOuter`` (unmatched impressions with NULL
    conversion columns; streaming emits them once the watermark passes the
    match window).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    if left_prefix == right_prefix:
        raise ValueError("left_prefix and right_prefix must differ")
    secs = _delay_seconds(max_delay)

    l = _prefixed(left, key_col, time_col, left_prefix)
    r = _prefixed(right, key_col, time_col, right_prefix)
    if left.isStreaming:
        l = l.withWatermark(left_prefix + time_col, watermark)
    if right.isStreaming:
        r = r.withWatermark(right_prefix + time_col, watermark)

    lt, rt = left_prefix + time_col, right_prefix + time_col
    # the right key is renamed (not referenced through an alias) so the
    # join condition is unambiguous and the output keeps one key column
    r = r.withColumnRenamed(key_col, "_rkey")
    cond = (
        (F.col(key_col) == F.col("_rkey"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {secs} SECOND"))
    )
    return l.join(r, cond, how).drop("_rkey")
