"""Batch sessionization: gap-based sessions as one window pass.

The batch twin of ``streaming/sessions.py`` (which uses
``applyInPandasWithState`` for the unbounded case): events belonging to the
same key form a session while consecutive gaps stay under the threshold.

Spark-first construction — one shuffle, zero Python:

1. per key, order by (time, tiebreak); a row STARTS a session iff its gap
   to the predecessor exceeds the threshold (or it is first);
2. session id = running count of session starts (window cumsum) — the
   classic gaps-and-islands translation;
3. aggregate per (key, session) for bounds/counts.

Gaps are measured on wall-clock field-extracted epochs
(functions/timeparts.ntz_epoch_micros) so NTZ inputs are session-TZ-safe.

Scale notes: one shuffle on the key; per-key work is a linear scan (window
functions), so a pathologically hot key bounds a task — the same constraint
(and mitigation: pre-split by coarse time range, then merge adjacent
sessions at the boundary) as the as-of join documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rows with an appended deterministic ``session_id`` (1-based per key)."""
    gap_us = _gap_micros(gap)
    order = [F.col(time_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    t_type = dict(df.dtypes).get(time_col)
    epoch = (
        ntz_epoch_micros(time_col)
        if t_type == "timestamp_ntz"
        else F.unix_micros(F.col(time_col))
    )
    prev = F.lag(epoch).over(w)
    starts = F.when(prev.isNull() | ((epoch - prev) > F.lit(gap_us)), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(starts).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, session_id, session_start, session_end, n_events, duration_ms)."""
    s = sessionize(df, key, time_col, gap, tiebreak_col)
    t_type = dict(df.dtypes).get(time_col)
    epoch = (
        ntz_epoch_micros(time_col)
        if t_type == "timestamp_ntz"
        else F.unix_micros(F.col(time_col))
    )
    return (
        s.groupBy(key, "session_id")
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            ((F.max(epoch) - F.min(epoch)) / 1000).cast("long").alias("duration_ms"),
        )
    )


def _gap_micros(gap: str) -> int:
    qty, unit = gap.split()
    per = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }
    if unit not in per:
        raise ValueError(f"unknown gap unit {unit!r}")
    return int(qty) * per[unit]
