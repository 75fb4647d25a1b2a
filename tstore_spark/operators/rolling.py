"""Rolling-window statistics over per-key time series: rolling mean/std,
z-score anomaly detection, OHLC bars, and truncated EWMA — the classic
monitoring/downsampling read path (TimescaleDB ``stats_agg`` / ``ohlc``
family, Prometheus ``stddev_over_time``) rebuilt as Spark window + groupBy
plans over the reference's TSLong shape (tstore/tslong/tslong.py:20-45 is
the frame these run on; the reference delegates rolling math to pandas
``.rolling`` — here it is a distributed plan).

Exactness under parallelism (the repo's hard constraint): every aggregate
carries integer state only. Values are integerized by ``value_scale``
(cents for 2-decimal metrics); rolling sums / sums-of-squares / weighted
sums are exact longs; each output row performs its float divisions last,
in a fixed expression order, so Spark and an oracle engine that mirrors
the order produce identical bits.

Scale notes (100 TB): all four operators are one per-key window pass
(sort within partition) plus at most one hash aggregate — no joins except
EWMA's final co-partitioned equi-join, no Python anywhere, no collect.
Skew bound = the largest single key's series must sort within a task, the
same documented constraint as as-of/LTTB; keys here are metric/domain
names, bounded cardinality per task in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros, ntz_from_epoch_micros

_WINDOW_MICROS = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _scaled(value_col: str, value_scale: int) -> Column:
    return F.round(F.col(value_col) * value_scale).cast("long")


def rolling_stats(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    n_preceding: int = 19,
    value_scale: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rolling mean and sample standard deviation of the current row plus
    the ``n_preceding`` rows before it, per key ordered by (time, tiebreak).

    Emits ``(key, time, value, roll_n, roll_mean, roll_std)`` where
    ``roll_std`` is null while fewer than two rows are in frame. State is
    (count, Σv, Σv²) in exact longs; ``roll_mean = Σv / n / scale`` and
    ``roll_std = sqrt((n·Σv² − (Σv)²) / (n·(n−1))) / scale`` — one fixed
    float expression per row, so an oracle mirroring the order matches
    bit-for-bit. Σv² of cents-scaled metrics stays well inside long range
    for frames of thousands of rows.
    """
    tb = [F.col(tiebreak_col)] if tiebreak_col else []
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_t"), *tb)
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    pts = df.select(
        key_col,
        F.col(time_col).alias("_time"),
        F.col(value_col).alias("_value"),
        ntz_epoch_micros(time_col).alias("_t"),
        _scaled(value_col, value_scale).alias("_v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    )
    n = F.count("_v").over(w)
    s1 = F.sum("_v").over(w)
    s2 = F.sum(F.col("_v") * F.col("_v")).over(w)
    out = pts.select(
        key_col,
        F.col("_time").alias(time_col),
        F.col("_value").alias(value_col),
        n.alias("roll_n"),
        (s1 / n / value_scale).alias("roll_mean"),
        F.when(
            n > 1,
            F.sqrt((n * s2 - s1 * s1) / (n * (n - F.lit(1)))) / value_scale,
        ).alias("roll_std"),
    )
    return out


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    n_preceding: int = 19,
    threshold: float = 3.0,
    min_points: int = 5,
    value_scale: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` rolling standard
    deviations from the rolling mean of the ``n_preceding`` rows STRICTLY
    BEFORE them (the baseline excludes the candidate, so an outlier cannot
    mask itself). Rows with fewer than ``min_points`` baseline points or a
    zero baseline std are never flagged. Emits
    ``(key, time, value, base_n, base_mean, base_std, zscore)``.

    The comparison is done on exact integer cross-products —
    ``(n·v − Σv)² > threshold² · n · (n·Σv² − (Σv)²) / (n−1)`` scaled to
    avoid any float in the DECISION — so whether a near-tie row is an
    anomaly cannot depend on float rounding in either engine; only the
    reported ``zscore`` itself is a float. ``threshold`` is taken to 3
    decimals (``thr1000 = round(threshold·1000)``).
    """
    tb = [F.col(tiebreak_col)] if tiebreak_col else []
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_t"), *tb)
        .rowsBetween(-n_preceding, -1)
    )
    thr1000 = int(round(threshold * 1000))
    pts = df.select(
        key_col,
        F.col(time_col).alias("_time"),
        F.col(value_col).alias("_value"),
        ntz_epoch_micros(time_col).alias("_t"),
        _scaled(value_col, value_scale).alias("_v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    )
    n = F.count("_v").over(w)
    s1 = F.sum("_v").over(w)
    s2 = F.sum(F.col("_v") * F.col("_v")).over(w)
    base = pts.select(
        key_col,
        "_time",
        "_value",
        "_v",
        n.alias("_n"),
        s1.alias("_s1"),
        s2.alias("_s2"),
    )
    # integer decision: (n·v − Σv)²·(n−1)·10⁶ > thr1000²·n·(n·Σv² − (Σv)²)
    # cents-scale magnitudes keep both sides inside a 64-bit long for frames
    # of tens of rows; cast up to DECIMAL(38,0) so thousands-row frames and
    # large value_scale cannot overflow either side silently.
    dev = (base["_n"] * base["_v"] - base["_s1"]).cast("decimal(38,0)")
    msq = (base["_n"] * base["_s2"] - base["_s1"] * base["_s1"]).cast("decimal(38,0)")
    lhs = dev * dev * (base["_n"] - 1).cast("decimal(38,0)") * F.lit(1_000_000).cast("decimal(38,0)")
    rhs = F.lit(thr1000 * thr1000).cast("decimal(38,0)") * base["_n"].cast("decimal(38,0)") * msq
    flagged = base.where(
        (base["_n"] >= min_points) & (msq > 0) & (lhs > rhs)
    )
    # reported float z-score, fixed op order: (v − Σv/n) / std
    mean = flagged["_s1"] / flagged["_n"] / value_scale
    std = (
        F.sqrt(
            (flagged["_n"] * flagged["_s2"] - flagged["_s1"] * flagged["_s1"])
            / (flagged["_n"] * (flagged["_n"] - F.lit(1)))
        )
        / value_scale
    )
    return flagged.select(
        key_col,
        F.col("_time").alias(time_col),
        F.col("_value").alias(value_col),
        F.col("_n").alias("base_n"),
        mean.alias("base_mean"),
        std.alias("base_std"),
        ((flagged["_value"] - mean) / std).alias("zscore"),
    )


def ohlc(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    window: str = "1h",
    value_scale: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close bars per (key, tumbling window): ``open`` is the
    value at the earliest (time, tiebreak) of the window, ``close`` at the
    latest; high/low are exact integer max/min. Emits
    ``(key, window_start, open, high, low, close, n_points)``.

    One window pass (two row_numbers over the same sort) + one hash
    aggregate on the same (key, window) keys — the aggregate reuses the
    window's partitioning, so the plan has a single shuffle. Duplicate
    (time, tiebreak) pairs make open/close partition-dependent; pass a
    unique ``tiebreak_col`` for a total order (measured constraint, same as
    :func:`tstore_spark.operators.timeweighted.time_weighted_avg`).
    """
    if window not in _WINDOW_MICROS:
        raise ValueError(f"window must be one of {sorted(_WINDOW_MICROS)}; got {window!r}")
    wus = _WINDOW_MICROS[window]
    tb = [F.col(tiebreak_col)] if tiebreak_col else []
    pts = df.select(
        key_col,
        ntz_epoch_micros(time_col).alias("_t"),
        _scaled(value_col, value_scale).alias("_v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    ).withColumn(
        # pmod = sign-safe floor: `_t - _t % w` rounds toward zero for
        # pre-1970 epochs and labels the window AFTER the event
        "_w0", F.col("_t") - F.pmod(F.col("_t"), F.lit(wus))
    )
    wasc = Window.partitionBy(key_col, "_w0").orderBy(F.col("_t"), *tb)
    wdesc = Window.partitionBy(key_col, "_w0").orderBy(
        F.col("_t").desc(), *[c.desc() for c in tb]
    )
    ranked = pts.select(
        key_col,
        "_w0",
        "_v",
        F.row_number().over(wasc).alias("_ra"),
        F.row_number().over(wdesc).alias("_rd"),
    )
    out = (
        ranked.groupBy(key_col, "_w0")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("_v"))).alias("_open"),
            F.max("_v").alias("_high"),
            F.min("_v").alias("_low"),
            F.max(F.when(F.col("_rd") == 1, F.col("_v"))).alias("_close"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            key_col,
            ntz_from_epoch_micros("_w0").alias("window_start"),
            (F.col("_open") / value_scale).alias("open"),
            (F.col("_high") / value_scale).alias("high"),
            (F.col("_low") / value_scale).alias("low"),
            (F.col("_close") / value_scale).alias("close"),
            "n_points",
        )
    )
    return out


def ewma_weights(alpha: float, k: int, weight_scale: int = 10**9) -> list[int]:
    """Integer EWMA kernel ``round((1−alpha)^j · weight_scale)`` for
    j = 0..k−1, computed ONCE driver-side and injected as literals into
    both the Spark plan and any oracle SQL — so the two engines share the
    exact same integers instead of each rounding their own ``pow``."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1]; got {alpha}")
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    return [round((1.0 - alpha) ** j * weight_scale) for j in range(k)]


def ewma_truncated(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.2,
    k: int = 20,
    value_scale: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key: at each row
    i, ``ewma = Σ_{j<k} w_j·v_{i−j} / Σ_{j<k, i−j exists} w_j`` with
    ``w_j = round((1−alpha)^j·10⁹)`` — the pandas ``ewm(adjust=True)``
    estimator cut to a k-row kernel, which (a) bounds the error by
    ``(1−alpha)^k`` relatively and (b) makes the sum FINITE and integer, so
    aggregation order cannot change a bit (the repo's hard constraint; the
    untruncated recursion is a float scan that would not be).

    Plan: row_number per key → each source row posexplodes the k-literal
    weight kernel, contributing (w_j·v, w_j) to target row i = source + j →
    hash aggregate on (key, target) → equi-join back to the base row for
    its timestamp/value (co-partitioned on the same keys, no extra
    shuffle stage beyond the join). Emits
    ``(key, time, value, ewma_n, ewma)``. Contributions beyond a key's
    last row are produced then dropped by the inner join — k·rows
    intermediate, fine for small kernels (k ≤ ~64).
    """
    weights = ewma_weights(alpha, k)
    tb = [F.col(tiebreak_col)] if tiebreak_col else []
    wk = Window.partitionBy(key_col).orderBy(F.col("_t"), *tb)
    base = df.select(
        key_col,
        F.col(time_col).alias("_time"),
        F.col(value_col).alias("_value"),
        ntz_epoch_micros(time_col).alias("_t"),
        _scaled(value_col, value_scale).alias("_v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    ).withColumn("_rn", F.row_number().over(wk))
    contrib = base.select(
        key_col,
        "_rn",
        "_v",
        F.posexplode(F.array(*[F.lit(w) for w in weights])).alias("_j", "_w"),
    ).select(
        key_col,
        (F.col("_rn") + F.col("_j")).alias("_target"),
        (F.col("_v") * F.col("_w")).alias("_wv"),
        F.col("_w"),
    )
    agg = (
        contrib.groupBy(key_col, "_target")
        .agg(
            F.sum("_wv").alias("_swv"),
            F.sum("_w").alias("_sw"),
            F.count(F.lit(1)).alias("ewma_n"),
        )
        .withColumnRenamed(key_col, "_k")  # disambiguate the self-lineage join
    )
    out = base.join(
        agg,
        on=[F.col(key_col) == F.col("_k"), F.col("_rn") == F.col("_target")],
        how="inner",
    ).select(
        key_col,
        F.col("_time").alias(time_col),
        F.col("_value").alias(value_col),
        "ewma_n",
        (F.col("_swv") / F.col("_sw") / value_scale).alias("ewma"),
    )
    return out
