"""Per-key linear trend fit — the TSDB "is this metric drifting, and how
fast" primitive (PromQL ``deriv``/``predict_linear``, TimescaleDB
``stats_agg -> slope/intercept``).

Ordinary least squares of value against time, one fit per key, built on the
repo's exactness discipline (CLAUDE.md, seriescorr.py):

* time enters as exact integer MINUTES since a single anchor (the data's
  own min unless given), values as integer cents — every sufficient
  statistic (n, Σt, Σv, Σtv, Σt², Σv²) is an exact integer sum:
  order-independent, bit-identical at any parallelism, engine-reproducible.
* slope/intercept/r² are derived from those integers with ONE fixed
  expression each, casting each statistic to double FIRST (the cross terms
  n·Σt² overflow int64 long before the sums themselves do); two engines
  evaluating the same expression over the same exact integers produce
  identical doubles.

Plan shape: one map-side-combined groupBy over a pure-Catalyst projection —
the same plan as the rollup tiers; no window, no join, no Python. One tiny
``agg(min)`` action resolves the default anchor (same pattern as
m4_downsample's domain bounds).

Scale: at 100 TB the input is a rolled-up TIER (operators/metric_rollup.py),
not raw events, so per-key row counts are minutes/hours-grain. Integer
headroom: |t| ≤ r minutes of span and |v| ≤ c cents give Σt² ≤ n·r² — at
r = 10 years ≈ 5.3e6 minutes and n = 10⁵ tier rows that is ~2.8e18, inside
int64; raw-event inputs beyond ~10⁶ rows/key at decade spans should
pre-aggregate first (documented headroom, not a silent wrong answer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros

#: micros per minute — the trend time unit
_US_PER_MIN = 60_000_000


def trend_fit(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    cents: bool = True,
    anchor=None,
) -> DataFrame:
    """OLS fit of ``value`` on time, per key. Returns one row per key:
    ``(key, n, st, sv, stv, stt, svv, slope, intercept, r2)`` where the
    middle six are the exact integer sufficient statistics (t in whole
    minutes since ``anchor``, v in cents when ``cents=True``), ``slope``
    is in value-units per minute, ``intercept`` the fitted value AT the
    anchor, and ``r2`` the coefficient of determination (NULL for
    degenerate fits: a single point, a vertical stack, or a constant
    series). NULL values are skipped.

    ``anchor``: anything ``pandas.Timestamp`` accepts; default = the data's
    own minimum timestamp (one tiny agg action). The fit is
    anchor-invariant (slope and r² exactly; intercept is BY DEFINITION the
    fitted value at the anchor) — the anchor exists to keep t small enough
    that Σt² stays exact int64. The minute floor uses ``floor`` over an
    exact double division — exact while the anchor-to-point span is under
    2⁵³ µs ≈ 285 years, and floor (not truncation) so pre-anchor points
    bucket consistently with DuckDB's ``//``.
    """
    e = ntz_epoch_micros(time_col)
    pts = df.where(F.col(value_col).isNotNull())
    if anchor is None:
        row = pts.agg(F.min(e)).head()
        anchor_us = 0 if row[0] is None else int(row[0])
    else:
        import pandas as pd

        anchor_us = int(pd.Timestamp(anchor).value // 1000)
    t = F.floor((e - F.lit(anchor_us)) / F.lit(_US_PER_MIN)).cast("long")
    v = F.col(value_col)
    v = F.round(v * 100).cast("long") if cents else v.cast("long")
    s = pts.select(F.col(key_col).alias("key"), t.alias("_t"), v.alias("_v"))
    stats = s.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_t").alias("st"),
        F.sum("_v").alias("sv"),
        F.sum(F.col("_t") * F.col("_v")).alias("stv"),
        F.sum(F.col("_t") * F.col("_t")).alias("stt"),
        F.sum(F.col("_v") * F.col("_v")).alias("svv"),
    )
    return stats.select("*", *_derive(cents))


def _derive(cents: bool) -> list[Column]:
    """slope / intercept / r² from the integer sufficient statistics —
    each statistic cast to double BEFORE any cross multiplication (n·Σt²
    would overflow int64), one fixed expression per output so any engine
    reproduces the exact bits from the same integers."""
    n = F.col("n").cast("double")
    st = F.col("st").cast("double")
    sv = F.col("sv").cast("double")
    stv = F.col("stv").cast("double")
    stt = F.col("stt").cast("double")
    svv = F.col("svv").cast("double")
    den = n * stt - st * st
    num = n * stv - st * sv
    scale = F.lit(100.0) if cents else F.lit(1.0)
    vden = n * svv - sv * sv
    return [
        F.when(den > 0, (num / den) / scale)
        .otherwise(F.lit(None).cast("double"))
        .alias("slope"),
        F.when(den > 0, ((sv - (num / den) * st) / n) / scale)
        .otherwise(F.lit(None).cast("double"))
        .alias("intercept"),
        F.when((den > 0) & (vden > 0), (num * num) / (den * vden))
        .otherwise(F.lit(None).cast("double"))
        .alias("r2"),
    ]


def predict_linear(fit: DataFrame, at_minutes: int) -> DataFrame:
    """PromQL ``predict_linear``: extrapolate each key's fit to
    ``at_minutes`` past the anchor. Derived column over the fit table
    (no re-scan): ``predicted = intercept + slope * at_minutes``."""
    return fit.withColumn(
        "predicted",
        F.col("intercept") + F.col("slope") * F.lit(float(at_minutes)),
    )
