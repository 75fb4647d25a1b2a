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


def best_changepoint(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    min_segment: int = 2,
) -> DataFrame:
    """Per-key single best LEVEL-SHIFT changepoint — the scoring step of
    binary segmentation (Scott & Knott): split the time-ordered series at
    the index maximizing the two-segment fit gain

        gain(i) = S₁²/n₁ + S₂²/n₂ − S²/n

    (algebraically the SSE reduction of fitting two means instead of one;
    also n₁n₂/n · (mean₁ − mean₂)², the classic between-group term). One
    row per key with ≥ ``2 * min_segment`` points:
    ``(key, cp_index, cp_time, n_left, n_right, sum_left, sum_right,
    gain)`` where ``cp_index`` is the left-segment length and ``cp_time``
    the first RIGHT-segment timestamp (the detected shift onset). Recurse
    on the emitted segments for multi-changepoint binary segmentation.

    Exactness discipline: values must be integers (cents — the cusum
    rule), so every prefix sum/count is an exact long. The gain is then
    derived by a FIXED chain of IEEE ops on exactly-representable longs —
    ``double(S₁)·S₁ / n₁ + double(S₂)·S₂ / n₂ − double(S)·S / n`` — which
    every engine computes bit-identically (the rrf_fusion precedent), and
    the argmax tie-breaks to the smallest index, so the emitted row set is
    deterministic at any parallelism and hash-gateable.

    Scale: one shuffle on the key + one ordered window pass (tier-grain
    series, the rolling.py bound); the argmax is a per-key window over the
    candidate rows, never a global sort.
    """
    if min_segment < 1:
        raise ValueError(f"min_segment must be >= 1, got {min_segment}")
    v = F.col(value_col).cast("long")
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(time_col).alias("t"),
        v.alias("v"),
    ).select(
        "k",
        F.row_number().over(Window.partitionBy("k").orderBy("t", "v")).alias("rn"),
        F.sum("v").over(
            Window.partitionBy("k").orderBy("t", "v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.lead("t").over(Window.partitionBy("k").orderBy("t", "v")).alias("next_t"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("n_tot"),
        F.sum("v").over(Window.partitionBy("k")).alias("s_tot"),
    )
    cand = base.where(
        (F.col("rn") >= min_segment) & (F.col("rn") <= F.col("n_tot") - min_segment)
    )
    n1, n2 = F.col("rn"), F.col("n_tot") - F.col("rn")
    s1, s2 = F.col("cum"), F.col("s_tot") - F.col("cum")
    score = (s1.cast("double") * s1.cast("double")) / n1 + (
        s2.cast("double") * s2.cast("double")
    ) / n2
    whole = (F.col("s_tot").cast("double") * F.col("s_tot").cast("double")) / F.col(
        "n_tot"
    )
    scored = cand.select(
        "k",
        F.col("rn").alias("cp_index"),
        F.col("next_t").alias("cp_time"),
        n1.alias("n_left"),
        n2.alias("n_right"),
        s1.alias("sum_left"),
        s2.alias("sum_right"),
        (score - whole).alias("gain"),
    )
    pick = Window.partitionBy("k").orderBy(F.desc("gain"), F.asc("cp_index"))
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .withColumnRenamed("k", key_col)
    )
