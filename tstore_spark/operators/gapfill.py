"""Gap-fill for rollup tiers — synthesize empty windows, interpolate values.

No Spark built-in does this (SURVEY §2b); the reference has nothing either.
Spark-first construction, all JVM-side:

1. Per key, build the expected time grid with ``sequence(min_ws, max_ws,
   interval)`` + ``explode`` (or an explicit [start, end) range).
2. Left-join the tier rows onto the grid — both sides hash-partition on
   (domain, window_start), so this is a co-partitioned join after the
   per-domain grid explode.
3. Counts/bytes/distinct default to 0 on synthesized rows; percentile columns
   are linearly interpolated between the nearest real neighbors using window
   functions (``last(..., ignoreNulls)`` forward + ``first(..., ignoreNulls)``
   backward) — no Python, deterministic.

Scale note: grids are per-domain and bounded by the tier's window count
(e.g. 1440/day for 1m) — the explode is tiny next to the fact table. The
window functions partition by domain; skew is bounded because every domain
has the same grid length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# DayTimeIntervalType steps (make_dt_interval(days, hours, mins, secs)) —
# valid `sequence` steps for both TIMESTAMP and TIMESTAMP_NTZ inputs
TIER_INTERVAL = {
    "1m": (0, 0, 1, 0),
    "1h": (0, 1, 0, 0),
    "1d": (1, 0, 0, 0),
}

_ZERO_FILL = ["doc_count", "bytes_total", "lang_distinct"]
_INTERP = ["text_len_p50", "text_len_p90", "text_len_p99"]
_ARRAY_FILL = {
    "lang_set": "array<string>",
    "hist_lens": "array<int>",
    "hist_cnts": "array<bigint>",
}


def gap_fill(
    tier_df: DataFrame,
    tier: str,
    start=None,
    end=None,
    interpolate: bool = True,
    key: str = "domain",
    time_col: str = "window_start",
    zero_fill: list[str] | None = None,
    interp_cols: list[str] | None = None,
    array_fill: dict[str, str] | None = None,
    presence_col: str = "doc_count",
) -> DataFrame:
    """Return the tier with missing windows synthesized (``gap_filled=true``).

    start/end (optional timestamps) bound the grid; default: each key's own
    [min, max] observed window range.

    Column roles default to the pages-rollup schema (doc_count/bytes_total/…)
    but are fully parameterizable: ``zero_fill`` (0 on synthesized rows),
    ``interp_cols`` (linear interpolation between real neighbors),
    ``array_fill`` (name -> Spark type, empty array on synthesized rows),
    ``presence_col`` (null-ness marks a synthesized row).
    """
    zero_fill = _ZERO_FILL if zero_fill is None else zero_fill
    interp_cols = _INTERP if interp_cols is None else interp_cols
    array_fill = _ARRAY_FILL if array_fill is None else array_fill
    # only touch columns the tier actually carries
    zero_fill = [c for c in zero_fill if c in tier_df.columns]
    interp_cols = [c for c in interp_cols if c in tier_df.columns]
    array_fill = {c: t for c, t in array_fill.items() if c in tier_df.columns}

    d, h, m, s = TIER_INTERVAL[tier]
    interval = F.make_dt_interval(F.lit(d), F.lit(h), F.lit(m), F.lit(s))
    # the grid stays in the tier's own timestamp family: casting an NTZ tier
    # through session-zoned TIMESTAMP would shift wall-clock under non-UTC
    # sessions (and break the grid<->tier equi-join)
    t_type = dict(tier_df.dtypes).get(time_col, "timestamp")

    if start is not None and end is not None:
        # NTZ grids parse their bounds with to_timestamp_ntz: parsing via
        # session-zoned to_timestamp and casting back is identity EXCEPT on
        # a DST spring-forward wall hour, which collapses onto the next
        # (the filters.py ntz= rule; CLAUDE.md hard constraint)
        if t_type == "timestamp_ntz":
            lo, hi = (F.to_timestamp_ntz(F.lit(str(b))) for b in (start, end))
        else:
            lo = F.to_timestamp(F.lit(str(start))).cast(t_type)
            hi = F.to_timestamp(F.lit(str(end))).cast(t_type)
        keys = tier_df.select(key).distinct()
        grid = keys.select(
            key,
            F.explode(F.sequence(lo, hi, interval)).alias(time_col),
        )
    else:
        bounds = tier_df.groupBy(key).agg(
            F.min(time_col).cast(t_type).alias("_lo"),
            F.max(time_col).cast(t_type).alias("_hi"),
        )
        grid = bounds.select(
            key, F.explode(F.sequence("_lo", "_hi", interval)).alias(time_col)
        )
    grid = grid.withColumn(time_col, F.col(time_col).cast(t_type))

    joined = grid.join(tier_df, [key, time_col], "left")
    out = joined.withColumn("gap_filled", F.col(presence_col).isNull())
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    for c, typ in array_fill.items():
        out = out.withColumn(c, F.coalesce(c, F.array().cast(typ)))

    if interpolate:
        w_back = Window.partitionBy(key).orderBy(time_col).rowsBetween(Window.unboundedPreceding, 0)
        w_fwd = Window.partitionBy(key).orderBy(time_col).rowsBetween(0, Window.unboundedFollowing)
        # epoch seconds for the interpolation ratio. NTZ must NOT route
        # through the session zone: casts AND timestampdiff both convert NTZ
        # via the session TZ in Spark 4, so on a DST spring-forward night the
        # nonexistent wall hour collapses onto the next one (measured —
        # see tests/test_gapfill.py). Field-based extraction is the only
        # TZ-free epoch for NTZ.
        if t_type == "timestamp_ntz":
            from tstore_spark.functions.timeparts import ntz_epoch_seconds

            ts_long = ntz_epoch_seconds(time_col)
        else:
            ts_long = F.col(time_col).cast("long")
        prev_t = F.last(F.when(~F.col("gap_filled"), ts_long), ignorenulls=True).over(w_back)
        next_t = F.first(F.when(~F.col("gap_filled"), ts_long), ignorenulls=True).over(w_fwd)
        for c in interp_cols:
            prev_v = F.last(F.when(~F.col("gap_filled"), F.col(c)), ignorenulls=True).over(w_back)
            next_v = F.first(F.when(~F.col("gap_filled"), F.col(c)), ignorenulls=True).over(w_fwd)
            interp = F.when(
                ~F.col("gap_filled"), F.col(c)
            ).when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v + (next_v - prev_v) * (ts_long - prev_t) / (next_t - prev_t),
            ).otherwise(F.coalesce(prev_v, next_v))
            out = out.withColumn(c, interp)

    return out
