"""As-of join: match each left row to the most recent right row at-or-before
its timestamp, per key.

Spark has no ASOF JOIN (DuckDB/Pandas/kdb do); the scalable Spark-first
construction is the union + windowed-carry-forward trick:

1. tag and union both sides by (key, time) — a narrow transformation;
2. one window pass per key ordered by (time, side, tiebreak): ``last(right
   column, ignoreNulls)`` carries the latest right values forward;
3. keep only left rows.

This is ONE shuffle on the key (the window partition), versus the naive
range-join which Catalyst would execute as a broadcast-nested-loop or a
cartesian per key. Equal timestamps match (>= semantics): right rows sort
*before* left rows at the same instant.

Scale notes: the window partitions by key — per-key data must fit a task's
spill budget (same constraint any per-key sort has); skewed keys can be
range-split by time into sub-partitions carrying boundary state (not needed
at current scales). Deterministic: ties among right rows at the same (key,
time) are broken by ``tiebreak_col`` (latest wins), so output is a pure
function of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str | None = None,
    value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; returns left columns + right ``value_cols``
    renamed with ``suffix`` (null when no right row is at-or-before)."""
    right_time = right_time or left_time
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_time)]

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias(left_time),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *( [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else [F.lit(0).alias("_tb")] ),
    )
    l_cols = [F.col(c) for c in left.columns]
    u = l_tag.withColumn("_tb", F.lit(None).cast("long")).unionByName(
        r_tag, allowMissingColumns=True
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(left_time).asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).select(*l_cols, *[F.col(f"{c}{suffix}") for c in value_cols])
