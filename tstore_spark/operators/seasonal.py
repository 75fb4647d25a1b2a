"""Seasonal profile + deseasonalization — "what does a normal Tuesday 3pm
look like for this key" (the ratio-to-mean / mean-offset seasonal
decomposition every traffic anomaly detector and capacity forecast starts
from; classical decomposition's seasonal term at fixed calendar phases).

``seasonal_profile`` computes, per (key, phase):

* ``phase``      — calendar position: ``hour`` (hour-of-day 0..23) or
  ``dow`` (Monday=0..Sunday=6); field EXTRACTION on the NTZ timestamps,
  never a zone cast (CLAUDE.md timezone rule).
* exact integer state: ``n_p``/``s_p`` (phase count / cent sum) and the
  key totals ``n``/``s`` — order-independent sums, bit-identical at any
  parallelism, engine-reproducible.
* derived doubles, ONE fixed expression each (the trend_fit discipline):
  ``mean_phase = s_p/n_p``, ``mean_total = s/n``,
  ``offset = s_p/n_p − s/n``   (the additive seasonal term) and
  ``ratio = (s_p/n_p)/(s/n)``  (the multiplicative index; NULL when the
  key mean is 0 — ANSI-safe, no divide-by-zero).

``deseasonalize`` joins the profile back by (key, phase) — a broadcast
join; the profile is |keys| × period rows, metadata-sized — and emits
``value_adj = value − offset``: the residual an anomaly rule thresholds.

Plan shape: profile = ONE map-side-combined groupBy on (key, phase) plus
a per-key window to spread totals (no join, no second scan);
deseasonalize = one broadcast hash join, no shuffle of the fact side. At
100 TB feed a rolled-up TIER (operators/metric_rollup.py), not raw
events — same headroom note as trend_fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: the ONE phase/period grammar of this module: name -> (expr builder,
#: period length). All calendar positions are wall-clock FIELD extraction
#: (TZ-safe on NTZ); weekday() is Monday=0..Sunday=6.
_PHASES = {
    "hour": (lambda t: F.hour(t).cast("int"), 24),
    "dow": (lambda t: F.weekday(t).cast("int"), 7),
    "hour_of_day": (lambda t: F.hour(t).cast("int"), 24),
    "hour_of_week": (lambda t: (F.weekday(t) * 24 + F.hour(t)).cast("int"), 168),
}


def _phase_expr(phase: str, time_col: str, allowed=None) -> Column:
    names = sorted(allowed) if allowed else sorted(_PHASES)
    if phase not in (allowed or _PHASES):
        raise ValueError(f"phase/period must be one of {names}, got {phase!r}")
    return _PHASES[phase][0](F.col(time_col))


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    phase: str = "hour",
    cents: bool = True,
) -> DataFrame:
    """Per-(key, phase) seasonal statistics; see module docstring. Returns
    ``(key, phase int, n_p, s_p, n, s — exact longs —, mean_phase,
    mean_total, offset, ratio doubles)``. NULL values are skipped."""
    v = F.col(value_col)
    v = F.round(v * 100).cast("long") if cents else v.cast("long")
    pts = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        _phase_expr(phase, time_col).alias("phase"),
        v.alias("_c"),
    )
    agged = pts.groupBy("key", "phase").agg(
        F.count(F.lit(1)).alias("n_p"), F.sum("_c").alias("s_p")
    )
    kw = Window.partitionBy("key")
    totals = agged.select(
        "*",
        F.sum("n_p").over(kw).alias("n"),
        F.sum("s_p").over(kw).alias("s"),
    )
    scale = 100.0 if cents else 1.0
    n_p = F.col("n_p").cast("double")
    s_p = F.col("s_p").cast("double")
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    mean_phase = (s_p / n_p) / F.lit(scale)
    mean_total = (s / n) / F.lit(scale)
    return totals.select(
        "key",
        "phase",
        "n_p",
        "s_p",
        "n",
        "s",
        mean_phase.alias("mean_phase"),
        mean_total.alias("mean_total"),
        (mean_phase - mean_total).alias("offset"),
        F.when(s != 0, (s_p / n_p) / (s / n))
        .otherwise(F.lit(None).cast("double"))
        .alias("ratio"),
    )


def deseasonalize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    phase: str = "hour",
    profile: DataFrame | None = None,
    cents: bool = True,
    out_col: str = "value_adj",
) -> DataFrame:
    """Subtract each row's (key, phase) seasonal ``offset``:
    ``out_col = value − offset`` — the residual left after removing the
    key's calendar shape. Pass a persisted ``profile`` (train window) to
    score a different period than the one profiled — the standard
    train-on-last-month, score-today split; default profiles ``df``
    itself. Rows with no profile entry (unseen phase) keep NULL
    ``out_col`` rather than silently passing the raw value through."""
    if profile is None:
        profile = seasonal_profile(df, key_col, time_col, value_col, phase, cents)
    prof = F.broadcast(
        profile.select(
            F.col("key").alias(key_col),
            "phase",
            F.col("offset").alias("_offset"),
        )
    )
    keyed = df.withColumn("phase", _phase_expr(phase, time_col))
    return (
        keyed.join(prof, [key_col, "phase"], "left")
        .withColumn(out_col, F.col(value_col) - F.col("_offset"))
        .drop("_offset")
    )


#: baseline/score period vocabulary (a subset of the shared _PHASES table)
_BUCKET_PERIODS = ("hour_of_day", "hour_of_week")


def season_bucket(time_col: str, period: str = "hour_of_week"):
    """The season-bucket expression (the shared :data:`_PHASES` grammar).
    ``hour_of_week``: Monday 00:00 -> 0 ... Sunday 23:00 -> 167."""
    return _phase_expr(period, time_col, allowed=_BUCKET_PERIODS)


def seasonal_baseline(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    period: str = "hour_of_week",
    cents: bool = True,
) -> DataFrame:
    """Per (key, bucket) exact statistics and derived mean/std:
    ``(key, bucket, n, sum_cents, sumsq_cents, mean, std, period)``. std
    is the population form ``sqrt(n*Σx² − (Σx)²) / n`` computed by one
    fixed expression over the integers (value units, i.e. cents / 100).
    NULL values are skipped (a NULL carries no observation — counting it
    in ``n`` while the sums skip it would corrupt every cohort moment).
    The ``period`` literal rides the output so :func:`seasonal_score` can
    refuse a baseline built on a different calendar grammar."""
    v = F.col(value_col)
    x = F.round(v * 100).cast("long") if cents else v.cast("long")
    stats = (
        df.where(F.col(value_col).isNotNull())
        .select(
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
                        mean.alias("mean"), std.alias("std"),
                        F.lit(period).alias("period"))


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
    never shuffled.

    Streaming: stateless + a stream-static broadcast join, so the SAME
    function scores a ``readStream`` frame against a static (periodically
    recomputed) baseline with identical semantics — proven
    streamed == batch in tests/test_streaming.py (the attribution_join
    one-semantics-two-modes contract).

    The baseline must carry :func:`seasonal_baseline`'s ``period`` column:
    a missing column raises at build time, a mismatched period raises
    in-plan at action time — scoring hour-of-day cohorts onto hour-of-week
    buckets (both numeric 0..23 on Mondays) would otherwise be silently,
    confidently wrong."""
    if "period" not in baseline.columns:
        raise ValueError(
            "seasonal_score: baseline lacks the 'period' column — build it "
            "with seasonal_baseline (or attach F.lit(<period>) to a custom one)"
        )
    checked_mean = F.when(
        F.col("period") == F.lit(period), F.col("mean")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "seasonal_score: baseline was built with period=%s but "
                f"scoring requested period={period}",
                F.col("period"),
            )
        )
    )
    b = F.broadcast(
        baseline.where(F.col("n") >= min_n).select(
            F.col("key").alias("_bk"),
            F.col("bucket").alias("_bb"),
            checked_mean.alias("mean"),
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
