"""Irregular-sample continuous aggregates: time-weighted averages and
counter increase/rate — the TimescaleDB `time_weight` / `counter_agg`
family, rebuilt as Spark window + groupBy plans.

The plain rollup tiers weight every observation equally, which is wrong for
irregularly-sampled gauges (a value held for 50 minutes must count 50x a
value held for one). `time_weighted_avg` integrates the
last-observation-carried-forward (LOCF) step function over tumbling
windows; `counter_rate` turns monotone-with-resets counters into per-window
increase and per-second rates.

Exactness under parallelism (the repo's hard constraint): the integral is
summed as ``value_scaled * overlap_micros`` in INTEGER space — values are
integerized by ``value_scale`` (e.g. 100 for 2-decimal metrics) and time by
epoch microseconds — so aggregation order cannot change a bit. The single
double appears at the very end (one division per output row).

Scale notes (100 TB): one per-key window pass (lead) + segment-to-window
fan-out via sequence/explode (same grid construction as gapfill — bounded
by gap length / window size) + one hash aggregate on (key, window). No
Python anywhere. Skew bound = the largest single key's series per task,
the documented as-of/LTTB constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros, ntz_from_epoch_micros

_WINDOW_MICROS = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _win_micros(window: str) -> int:
    if window not in _WINDOW_MICROS:
        raise ValueError(f"window must be one of {sorted(_WINDOW_MICROS)}; got {window!r}")
    return _WINDOW_MICROS[window]


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    window: str = "1h",
    value_scale: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """LOCF time-weighted average of ``value_col`` per (key, tumbling
    window): each observation holds its value until the next one; the last
    observation of a key holds until the end of its own window. Windows a
    segment spans are split exactly at window boundaries. Emits
    ``(key, window_start, twa, covered_us)`` where ``twa`` = integral /
    covered time and ``covered_us`` is the microseconds of the window
    actually covered by observations (first/last windows are partial).

    ``value_scale`` integerizes values (100 = exact for 2-decimal metrics)
    so the weighted sum is an exact long — see module docstring.

    ``tiebreak_col`` makes the observation order TOTAL when timestamps can
    repeat within a key (falls back to the scaled value): without it, which
    duplicate "holds" would depend on partitioning — measured, not
    theoretical.
    """
    w = _win_micros(window)
    tb = F.col("_tb") if tiebreak_col else F.col("_v")
    pts = df.select(
        key_col,
        ntz_epoch_micros(time_col).alias("_t"),
        F.round(F.col(value_col) * value_scale).cast("long").alias("_v"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).select(
        key_col,
        "_t",
        "_v",
        # segment end: next observation, or end of the point's own window.
        # pmod = sign-safe floor (t - t % w rounds toward zero for pre-1970
        # epochs: the window AFTER the event, and an end up to 2w late)
        F.coalesce(
            F.lead("_t").over(Window.partitionBy(key_col).orderBy(F.col("_t"), tb)),
            (F.col("_t") - F.pmod(F.col("_t"), F.lit(w))) + w,
        ).alias("_e"),
    )
    # fan the segment out over every window it touches (gapfill's grid
    # construction). Zero-length segments (duplicate timestamps) are dropped
    # BEFORE the explode: they carry no weight, and their descending
    # sequence bounds (window(_e - 1) < window(_t)) would throw
    seg = pts.where(F.col("_e") > F.col("_t")).select(
        key_col,
        "_t",
        "_v",
        "_e",
        F.explode(
            F.sequence(
                F.col("_t") - F.pmod(F.col("_t"), F.lit(w)),
                (F.col("_e") - 1) - F.pmod(F.col("_e") - 1, F.lit(w)),
                F.lit(w),
            )
        ).alias("_w0"),
    )
    overlap = F.least(F.col("_e"), F.col("_w0") + w) - F.greatest(F.col("_t"), F.col("_w0"))
    out = (
        seg.groupBy(key_col, "_w0")
        .agg(
            F.sum(F.col("_v") * overlap).alias("_area"),
            F.sum(overlap).alias("covered_us"),
        )
        .select(
            key_col,
            ntz_from_epoch_micros("_w0").alias("window_start"),
            (F.col("_area") / F.col("covered_us") / value_scale).alias("twa"),
            "covered_us",
        )
    )
    return out


def counter_rate(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    window: str = "1h",
    value_scale: int = 100,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-window increase and per-second rate of a monotone counter with
    resets: a drop in the raw value means the counter restarted, so the
    post-reset reading itself is the increase (the TimescaleDB
    ``counter_agg`` convention). Each delta is attributed to the window of
    its LATER observation. Emits ``(key, window_start, increase, rate)``;
    keys' first observations carry no delta. ``increase`` is exact (integer
    ``value_scale`` arithmetic summed as longs); ``rate`` = increase /
    window seconds.
    """
    w = _win_micros(window)
    tb = F.col("_tb") if tiebreak_col else F.col("_v")
    wk = Window.partitionBy(key_col).orderBy(F.col("_t"), tb)
    pts = df.select(
        key_col,
        ntz_epoch_micros(time_col).alias("_t"),
        F.round(F.col(value_col) * value_scale).cast("long").alias("_v"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    )
    # first observation of a key: no delta (lag null must NOT fall into the
    # reset branch — that would count the entire initial reading as increase)
    delta = (
        F.when(F.lag("_v").over(wk).isNull(), F.lit(None).cast("long"))
        .when(F.col("_v") >= F.lag("_v").over(wk), F.col("_v") - F.lag("_v").over(wk))
        .otherwise(F.col("_v"))
    )
    deltas = pts.select(
        key_col,
        (F.col("_t") - F.pmod(F.col("_t"), F.lit(w))).alias("_w0"),  # sign-safe floor
        delta.alias("_d"),
    ).where(F.col("_d").isNotNull())
    return (
        deltas.groupBy(key_col, "_w0")
        .agg(F.sum("_d").alias("_inc"))
        .select(
            key_col,
            ntz_from_epoch_micros("_w0").alias("window_start"),
            (F.col("_inc") / value_scale).alias("increase"),
            (F.col("_inc") / value_scale / (w / 1_000_000)).alias("rate"),
        )
    )
