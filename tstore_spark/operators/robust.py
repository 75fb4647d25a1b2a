"""Robust per-key statistics: median/MAD outlier scoring and winsorization.

Mean/stddev z-scores (operators/rolling.py ``rolling_zscore``) break down on
web-scale metrics with heavy tails — one bot spike inflates the stddev and
masks every other anomaly. The robust pair (median, MAD = median absolute
deviation) has a 50% breakdown point: ``|x - median| > k * MAD`` keeps
flagging points no matter how polluted the tail is.

Exactness discipline (the repo's standing oracle rules):

* medians are Spark's exact ``percentile`` (linear interpolation — the same
  semantics as DuckDB ``quantile_cont``), ROUNDED to 4dp so the two engines'
  interpolation bit-order cannot differ;
* every derived comparison uses those rounded constants, so flags and
  counts are engine-identical;
* winsorized sums are integer cents.

Scale shape: exact MAD is inherently two passes (median first, then the
median of deviations) — two groupBy shuffles on the key plus one join per
pass. The per-key median state is the sorted value multiset, the same
task-must-hold-a-key's-group bound as every exact-percentile operator here
(operators/rollup.py histogram percentiles are the streaming-friendly
alternative when keys are huge). Key tables are key-cardinality-sized;
joins back to the fact rows are plain hash joins that AQE will broadcast
when the key side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_scores(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    round_dp: int = 4,
) -> DataFrame:
    """Every input row with its per-key robust center/spread and flag:
    ``med`` (per-key median), ``mad`` (median of |x - med|), ``abs_dev``
    and ``is_outlier`` = |x - med| > k * mad.

    A key whose values are more than 50% constant has mad = 0: every
    deviating point is then an outlier — the documented (and desired)
    degenerate behavior of the MAD rule.
    """
    med = df.groupBy(key_col).agg(
        F.round(F.percentile(value_col, F.lit(0.5)), round_dp).alias("med")
    )
    dev = df.join(med, key_col).withColumn(
        "abs_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(key_col).agg(
        F.round(F.percentile("abs_dev", F.lit(0.5)), round_dp).alias("mad")
    )
    return dev.join(mad, key_col).withColumn(
        "is_outlier", F.col("abs_dev") > F.lit(float(k)) * F.col("mad")
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    round_dp: int = 4,
    out_col: str = "winsorized",
) -> DataFrame:
    """Clip each row's value to its key's [lower, upper] exact quantiles
    (interpolated, rounded 4dp) — the standard tail-taming transform before
    averaging heavy-tailed web metrics. Adds ``lo``/``hi``/``out_col``.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1, got [{lower}, {upper}]")
    bounds = df.groupBy(key_col).agg(
        F.round(F.percentile(value_col, F.lit(float(lower))), round_dp).alias("lo"),
        F.round(F.percentile(value_col, F.lit(float(upper))), round_dp).alias("hi"),
    )
    return df.join(bounds, key_col).withColumn(
        out_col, F.least(F.greatest(F.col(value_col), F.col("lo")), F.col("hi"))
    )


#: micros per minute — Theil-Sen shares trend_fit's time discretization
_US_PER_MIN = 60_000_000


def theil_sen(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    cents: bool = True,
    anchor=None,
    max_points_per_key: int = 2_000,
) -> DataFrame:
    """Theil-Sen robust trend per key: slope = the MEDIAN of all pairwise
    slopes, intercept = the median residual at that slope — the 29.3%-
    breakdown-point complement to :func:`trend.trend_fit`'s OLS (one bot
    spike tilts a least-squares line; it is one slope among n·(n−1)/2
    here). Kendall's estimator, the robust-regression textbook default.

    Returns ``(key, n_points, n_pairs, slope, intercept)``: slope in
    value-units per minute over trend_fit's exact discretization (integer
    minutes since ``anchor``, integer cents), each pairwise slope ONE
    fixed expression over those integers, the medians exact interpolated
    percentiles rounded 4dp (the module discipline — engine-identical
    decisions). Pairs need strictly increasing time; a key whose points
    all share one minute yields NULL slope. NULL values are skipped.

    Scale shape: the pair generation is a per-key equi-join — inherently
    quadratic in per-key row count, which is exactly why the input must be
    a rollup TIER (hours/minutes grain); ``max_points_per_key`` refuses
    raw-grain inputs loudly (the token_jaccard_pairs valve: guard cost is
    one narrow count-by-key). The intercept pass broadcast-joins the tiny
    per-key slope table back to the points.
    """
    from tstore_spark.functions.timeparts import ntz_epoch_micros

    if max_points_per_key is not None:
        hot = (
            df.where(F.col(value_col).isNotNull())
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_points_per_key)
            .limit(5)
            .collect()
        )
        if hot:
            keys = [r[key_col] for r in hot]
            raise ValueError(
                f"theil_sen: key(s) {keys} exceed max_points_per_key="
                f"{max_points_per_key} (pairwise slopes are quadratic); "
                "pre-aggregate to a coarser tier first"
            )
    e = ntz_epoch_micros(time_col)
    pts = df.where(F.col(value_col).isNotNull())
    if anchor is None:
        row = pts.agg(F.min(e)).head()
        anchor_us = 0 if row[0] is None else int(row[0])
    else:
        import pandas as pd

        anchor_us = int(pd.Timestamp(anchor).value // 1000)
    x = F.floor((e - F.lit(anchor_us)) / F.lit(_US_PER_MIN)).cast("long")
    v = F.col(value_col)
    v = F.round(v * 100).cast("long") if cents else v.cast("long")
    scale = "100" if cents else "1"
    s = pts.select(F.col(key_col).alias("key"), x.alias("_x"), v.alias("_c"))
    a, b = s.alias("a"), s.alias("b")
    pair_slope = (
        F.col("b._c") - F.col("a._c")
    ).cast("double") / (F.col("b._x") - F.col("a._x")).cast("double") / F.lit(
        float(scale)
    )
    slopes = (
        a.join(b, (F.col("a.key") == F.col("b.key")) & (F.col("a._x") < F.col("b._x")))
        .select(F.col("a.key").alias("key"), pair_slope.alias("_sl"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            # + 0.0 folds IEEE −0.0 (a tiny negative median rounded to
            # zero) onto +0.0 — engines disagree on the sign bit's string
            (F.round(F.percentile("_sl", F.lit(0.5)), 4) + F.lit(0.0)).alias("slope"),
        )
    )
    n = s.groupBy("key").agg(F.count(F.lit(1)).alias("n_points"))
    resid = F.col("_c").cast("double") / F.lit(float(scale)) - F.col(
        "slope"
    ) * F.col("_x").cast("double")
    intercepts = (
        s.join(F.broadcast(slopes), "key")
        .select("key", resid.alias("_r"))
        .groupBy("key")
        .agg((F.round(F.percentile("_r", F.lit(0.5)), 4) + F.lit(0.0)).alias("intercept"))
    )
    return (
        n.join(slopes, "key", "left")
        .join(intercepts, "key", "left")
        .select("key", "n_points",
                F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                "slope", "intercept")
    )
