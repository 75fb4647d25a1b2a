"""Cross-series correlation — which metrics move together.

Classic TSDB analytics (e.g. "find signals correlated with errors"):
Pearson correlation between every pair of per-key time series, aligned on
their window grid. Built for exactness under parallelism, the same
discipline as the rollups:

* values enter as INTEGER cents; every sufficient statistic
  (n, Σx, Σy, Σxy, Σx², Σy²) is an exact integer sum — order-independent,
  bit-identical at any parallelism, and reproducible by any engine.
* r is derived from those integers with one fixed expression
  ``(nΣxy − ΣxΣy) / sqrt((nΣx² − Σx²ᵗᵒᵗ)(nΣy² − Σy²ᵗᵒᵗ))`` — two engines
  computing the same formula over the same integers produce identical
  doubles (the repo's float-oracle discipline).

Plan shape: one self-join of the aligned series table on the time column
(each timestamp carries k key-rows, so the join emits k² pairs per
timestamp — pair-count-bounded, not data-bounded) followed by one groupBy
per (key_a, key_b) with map-side combine. ``key_a < key_b`` keeps each
unordered pair once. Constant series yield a zero denominator -> NULL r
(undefined correlation), never a division error.

Scale: for k series over T timestamps the shuffle carries O(k²·T) rows of
six integers — at 100 TB the input to this operator is a rolled-up TIER
(operators/metric_rollup.py), not raw events, so T is minutes/hours, and
k² pairs of integer sums is trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_correlation(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    cents: bool = True,
) -> DataFrame:
    """Pearson r for every unordered key pair over their COMMON timestamps
    (inner alignment — a timestamp counts only where both series have a
    point). Returns ``(key_a, key_b, n, sx, sy, sxy, sxx, syy, r)`` — the
    integer sufficient statistics plus the derived correlation.

    ``cents=True`` converts the value to integer cents first (exact
    2-decimal money/metric discipline); pass False when the column is
    already integral."""
    v = F.col(value_col)
    v = F.round(v * 100).cast("long") if cents else v.cast("long")
    s = df.select(
        F.col(key_col).alias("_k"), F.col(time_col).alias("_t"), v.alias("_v")
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(
        b, (F.col("a._t") == F.col("b._t")) & (F.col("a._k") < F.col("b._k"))
    ).select(
        F.col("a._k").alias("key_a"),
        F.col("b._k").alias("key_b"),
        F.col("a._v").alias("_x"),
        F.col("b._v").alias("_y"),
    )
    return _corr_from_pairs(pairs, ["key_a", "key_b"])


def lead_lag_correlation(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    key_a: str,
    key_b: str,
    lags_seconds: list[int],
    cents: bool = True,
) -> DataFrame:
    """Lead-lag analysis for ONE series pair: Pearson r of (A at t, B at
    t + lag) for each requested lag. A positive-lag peak means A LEADS B by
    that amount. Lags materialize as a literal explode (one row per lag per
    A-point — |lags| is a handful), the shifted join stays an equi-join on
    the time column (never a cartesian band), and each lag aggregates its
    own exact integer statistics. Returns
    ``(lag_seconds, n, sx, sy, sxy, sxx, syy, r)``."""
    if not lags_seconds:
        raise ValueError("lead_lag_correlation needs at least one lag")
    v = F.col(value_col)
    v = F.round(v * 100).cast("long") if cents else v.cast("long")
    s = df.select(
        F.col(key_col).alias("_k"), F.col(time_col).alias("_t"), v.alias("_v")
    )
    a = s.where(F.col("_k") == key_a).select(
        F.explode(F.array(*[F.lit(int(l)) for l in lags_seconds])).alias("lag_seconds"),
        F.col("_t").alias("_ta"),
        F.col("_v").alias("_x"),
    )
    # timestampadd on NTZ is wall-clock-safe (repo timezone constraint)
    a = a.withColumn("_ts", F.expr("timestampadd(SECOND, lag_seconds, _ta)"))
    b = s.where(F.col("_k") == key_b).select(
        F.col("_t").alias("_tb"), F.col("_v").alias("_y")
    )
    pairs = a.join(b, a["_ts"] == b["_tb"]).select("lag_seconds", "_x", "_y")
    return _corr_from_pairs(pairs, ["lag_seconds"])


def _corr_from_pairs(pairs: DataFrame, group_cols: list[str]) -> DataFrame:
    stats = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return stats.withColumn(
        "r", F.when(den > 0, num / den).otherwise(F.lit(None).cast("double"))
    )
