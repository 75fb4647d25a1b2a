"""CUSUM changepoint / drift detection over per-key series.

The one-sided CUSUM recursion ``s_t = max(0, s_{t-1} + (x_t - target))``
looks inherently sequential, but it has an exact closed form:

    s_t = C_t - min_{i <= t} C_i,   where C_t = cumsum(x - target)

— a cumulative sum minus its running minimum, i.e. two plain window
functions. That identity is what makes the operator Spark-native: one
shuffle on the key, one ordered window pass per key, no UDF, no recursion.
(Symmetrically, the downward statistic is ``running_max(C) - C``.)

Exactness: deviations are integer cents (``x*100 - target_cents``), so
every cumulative sum is an exact integer — order-independent given the
(key, time) sort, bit-identical at any parallelism, and reproducible by
any SQL engine with window functions (the oracle).

Scale: the per-key window sort requires a key's series to fit a task —
the same bound as every ordered-window operator in this repo
(operators/rolling.py, asof.py); series here are rolled-up TIERS
(minutes/hours per key), not raw events. Ties on the time column are
broken by the value to keep the cumsum deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    target: float,
    threshold: float,
    slack: float = 0.0,
    cents: bool = True,
) -> DataFrame:
    """Per-row two-sided CUSUM against a fixed ``target`` level: every
    input point with ``cusum_up`` / ``cusum_down`` (value units) and
    ``alarm`` = TRUE where either side exceeds ``threshold``.

    ``slack`` is the classic allowance k (typically 0.5–1 sigma): the up
    statistic accumulates ``x - (target + k)``, the down one
    ``(target - k) - x``. Without it, zero-mean NOISE random-walks across
    any threshold at O(sigma * sqrt(n)) — slack makes noise drift
    negative (clamped at 0) while a sustained shift beyond k grows
    linearly. Detects drifts a point-threshold never sees."""
    v = F.col(value_col)

    def _dev(offset: float):
        if cents:
            return (F.round(v * 100) - F.round(F.lit(offset) * 100)).cast("long")
        return (v - F.lit(offset)).cast("long")

    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col, value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c_up = F.sum(_dev(target + slack)).over(w)
    c_dn = F.sum(_dev(target - slack)).over(w)
    up = c_up - F.least(F.min(c_up).over(w), F.lit(0))
    down = F.greatest(F.max(c_dn).over(w), F.lit(0)) - c_dn
    scale = 100.0 if cents else 1.0
    thr = F.lit(float(threshold))
    return df.select(
        key_col,
        time_col,
        value_col,
        (up / scale).alias("cusum_up"),
        (down / scale).alias("cusum_down"),
        ((up / scale > thr) | (down / scale > thr)).alias("alarm"),
    )
