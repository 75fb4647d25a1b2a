"""Interval coverage — union length of overlapping intervals per key.

"How many seconds was this sensor up?" / "what fraction of the day did
sessions cover?" — the union length of possibly-overlapping [start, end)
intervals. The classic sweep line becomes three window functions
(gaps-and-islands, the same shape as operators/sessions batch mode):

1. per key, order intervals by (start, end);
2. an interval starts a NEW island iff its start exceeds the running max
   of all PRIOR ends (``max(end) over rows unbounded preceding .. 1
   preceding``) — an overlap or touch extends the island;
3. island id = running count of new-island flags; per island the covered
   length is ``max(end) − min(start)``; per key, the coverage is the sum
   of island lengths.

Exactness: all arithmetic is integer epoch seconds via wall-clock field
extraction (functions/timeparts.ntz_epoch_seconds — session-TZ-proof on
NTZ), so results are exact integers, order-independent given the sort,
and reproducible by any SQL engine with window functions.

Scale: one shuffle on the key, one ordered window pass per key — a key's
intervals must fit a task, the repo's standard ordered-window bound
(operators/rolling.py, asof.py). Zero- or negative-length intervals are
rejected loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_seconds


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union coverage of [start, end) intervals:
    ``(key, n_intervals, n_islands, covered_seconds)``. Overlapping or
    touching intervals merge; gaps do not count."""
    s = df.select(
        F.col(key_col).alias("key"),
        ntz_epoch_seconds(start_col).alias("_s"),
        ntz_epoch_seconds(end_col).alias("_e"),
    )
    # Validity guard folded into the SAME scan: end > start is asserted
    # per-row inside the plan (a raise_error branch on _s), so a bad interval
    # fails the job at action time without a separate eager validation pass
    # over the input — at 100 TB an up-front `.count()` guard would double
    # the read. The error surfaces wrapped in Spark's job failure.
    s = s.withColumn(
        "_s",
        F.when(
            F.col("_e") <= F.col("_s"),
            F.raise_error(
                F.format_string(
                    "interval_coverage requires end > start for every row "
                    "(key=%s start_epoch=%d end_epoch=%d)",
                    F.col("key").cast("string"), F.col("_s"), F.col("_e"),
                )
            ).cast("long"),
        ).otherwise(F.col("_s")),
    )
    w = Window.partitionBy("key").orderBy("_s", "_e")
    prior_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = s.withColumn(
        "_new",
        F.when(
            prior_max_end.isNull() | (F.col("_s") > prior_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("key", "_island").agg(
        F.count(F.lit(1)).alias("_n"),
        (F.max("_e") - F.min("_s")).alias("_len"),
    )
    return islands.groupBy("key").agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("_len").alias("covered_seconds"),
    )
