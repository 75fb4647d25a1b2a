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
