"""Arbitrary-interval resampling and hopping (sliding) window aggregates.

The fixed 1m/1h/1d tiers (operators/metric_rollup.py) cover the retention
cascade; dashboards and feature pipelines also need ad-hoc grids ("15 min
buckets", "1 h window sliding every 15 min"). Both operators are pure
Catalyst expressions over wall-clock epoch arithmetic:

- epochs come from field extraction (``ntz_epoch_micros``) for TIMESTAMP_NTZ
  inputs — Spark 4 casts/timestampdiff route NTZ through the session zone
  (CLAUDE.md hard constraint), and ``F.window`` is session-zone-dependent
  too, which is why it is NOT used here;
- a hopping window with width = k * slide explodes each event into exactly
  its k covering windows (a LITERAL k-element offset array — nothing
  data-dependent), then aggregates: the standard Spark shape, one shuffle;
- sums are exact integer cents, so results are bit-identical at any
  parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros, ntz_from_epoch_micros


def _epoch_us(df: DataFrame, time_col: str):
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        return ntz_epoch_micros(time_col), True
    return F.unix_micros(F.col(time_col)), False


def _to_ts(col, is_ntz: bool):
    return ntz_from_epoch_micros(col) if is_ntz else F.timestamp_micros(col)


def resample(
    df: DataFrame,
    every_seconds: int,
    key: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling buckets of arbitrary width: (key, window_start, event_count,
    value_sum) with window_start = epoch-floor(time, every_seconds)."""
    if every_seconds <= 0:
        raise ValueError(f"every_seconds must be positive, got {every_seconds}")
    step = int(every_seconds) * 1_000_000
    t, is_ntz = _epoch_us(df, time_col)
    # pmod: sign-safe floor — `t - (t % step)` rounds toward zero for
    # negative epochs (pre-1970), assigning the window start AFTER the event
    ws = _to_ts(t - F.pmod(t, F.lit(step)), is_ntz)
    return (
        df.groupBy(F.col(key), ws.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("_cents"),
        )
        .select(
            key,
            "window_start",
            "event_count",
            (F.col("_cents") / 100.0).alias("value_sum"),
        )
    )


def sliding_agg(
    df: DataFrame,
    width_seconds: int,
    slide_seconds: int,
    key: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hopping windows: width w sliding every s (w must be a multiple of s).

    Each event lands in exactly w/s windows; the per-event window starts are
    a literal offset array exploded JVM-side. Output rows are one per
    (key, window_start) with the window covering [start, start + w)."""
    if width_seconds % slide_seconds != 0:
        raise ValueError(
            f"width ({width_seconds}s) must be a multiple of slide ({slide_seconds}s)"
        )
    k = width_seconds // slide_seconds
    s = int(slide_seconds) * 1_000_000
    t, is_ntz = _epoch_us(df, time_col)
    anchor = t - F.pmod(t, F.lit(s))  # latest window start at-or-before the event (sign-safe floor)
    starts = F.array(*[anchor - j * s for j in range(k)])
    base = df.select(
        F.col(key),
        F.col(value_col),
        F.explode(starts).alias("_ws"),
    )
    return (
        base.groupBy(F.col(key), _to_ts(F.col("_ws"), is_ntz).alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("_cents"),
        )
        .select(
            key,
            "window_start",
            "event_count",
            (F.col("_cents") / 100.0).alias("value_sum"),
        )
    )
