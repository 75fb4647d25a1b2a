"""Seasonal baselines — "is this value normal for Tuesday 3pm?".

Time-series monitoring compares a point against its SEASONAL cohort (same
hour-of-day / hour-of-week across history), not against a global mean —
a nightly batch job is only an anomaly if it is unusual *for that hour*.
Two pieces, both exact-integer:

* ``seasonal_baseline``  — per (key, season-bucket) sufficient statistics
  (n, Σcents, Σcents²) from ONE groupBy, with mean/std derived by a fixed
  expression (population std; same-ops-same-bits oracle discipline, as in
  operators/seriescorr.py). Buckets: ``hour_of_day`` (0-23) or
  ``hour_of_week`` (0-167, Monday 00:00 = 0) — wall-clock field
  extraction, TZ-safe on NTZ inputs.
* ``seasonal_score``     — broadcast-join the baseline back onto the
  series and emit the deviation in baseline sigmas. The baseline table is
  at most keys x 168 rows — always broadcastable; scoring never shuffles
  the series.

Scale: the baseline is a single map-side-combined aggregate over the
(rolled-up) series; scoring is shuffle-free. Both are incremental-friendly
(the integer sums merge across training windows by addition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = {"hour_of_day": 24, "hour_of_week": 168}


def season_bucket(time_col: str, period: str = "hour_of_week"):
    """The season-bucket expression: wall-clock field extraction (TZ-safe
    on NTZ). ``hour_of_week``: Monday 00:00 -> 0 ... Sunday 23:00 -> 167."""
    if period not in _BUCKETS:
        raise ValueError(f"period must be one of {sorted(_BUCKETS)}, got {period!r}")
    hour = F.hour(time_col)
    if period == "hour_of_day":
        return hour.cast("int")
    # weekday(): Monday=0..Sunday=6 — wall-clock field, no session-zone math
    return (F.weekday(time_col) * 24 + hour).cast("int")


def seasonal_baseline(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    period: str = "hour_of_week",
    cents: bool = True,
) -> DataFrame:
    """Per (key, bucket) exact statistics and derived mean/std:
    ``(key, bucket, n, sum_cents, sumsq_cents, mean, std)``. std is the
    population form ``sqrt(n*Σx² − (Σx)²) / n`` computed by one fixed
    expression over the integers (value units, i.e. cents / 100)."""
    v = F.col(value_col)
    x = F.round(v * 100).cast("long") if cents else v.cast("long")
    stats = (
        df.select(
            F.col(key_col).alias("key"),
            season_bucket(time_col, period).alias("bucket"),
            x.alias("_x"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_x").alias("sum_cents"),
            F.sum(F.col("_x") * F.col("_x")).alias("sumsq_cents"),
        )
    )
    scale = 100.0 if cents else 1.0
    mean = F.col("sum_cents").cast("double") / F.col("n") / scale
    var_num = (
        F.col("n") * F.col("sumsq_cents") - F.col("sum_cents") * F.col("sum_cents")
    ).cast("double")
    std = F.sqrt(F.greatest(var_num, F.lit(0.0))) / F.col("n") / scale
    return stats.select("key", "bucket", "n", "sum_cents", "sumsq_cents",
                        mean.alias("mean"), std.alias("std"))


def seasonal_score(
    df: DataFrame,
    baseline: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    period: str = "hour_of_week",
    min_n: int = 3,
) -> DataFrame:
    """Each point's deviation from ITS seasonal cohort, in cohort sigmas
    (NULL where the cohort is too small or flat — never a division error).
    The baseline broadcast-joins on (key, bucket); the series itself is
    never shuffled."""
    b = F.broadcast(
        baseline.where(F.col("n") >= min_n).select(
            F.col("key").alias("_bk"),
            F.col("bucket").alias("_bb"),
            "mean",
            "std",
        )
    )
    with_bucket = df.withColumn("_bucket", season_bucket(time_col, period))
    scored = with_bucket.join(
        b,
        (F.col(key_col) == F.col("_bk")) & (F.col("_bucket") == F.col("_bb")),
        "left",
    )
    sigma = F.when(
        F.col("std") > 0, (F.col(value_col) - F.col("mean")) / F.col("std")
    ).otherwise(F.lit(None).cast("double"))
    return scored.select(
        key_col,
        time_col,
        value_col,
        F.col("_bucket").alias("bucket"),
        "mean",
        "std",
        sigma.alias("sigmas"),
    )
