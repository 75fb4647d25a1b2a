"""Visual downsampling of per-key value series: parallel fixed-anchor LTTB.

The reference archives full-resolution series and the rollup tiers give
calendar-window aggregates; what neither provides is a SHAPE-preserving
downsample — "give me ~500 points that still look like this year of data" —
the job LTTB (Steinarsson, "Downsampling Time Series for Visual
Representation", 2013) was designed for.

Classic LTTB is inherently sequential: each bucket's pick depends on the
previously *selected* point. This module implements the standard parallel
variant (fixed anchors): every interior bucket picks the point maximizing
the triangle area against its NEIGHBOR BUCKETS' anchor points, where the
anchor is the bucket's mid-rank point. That decouples all buckets, so the
whole computation is window functions + one bucket-stats groupBy + one
equi-join — no Python, no sequential scan, and (because anchors are chosen
by integer rank, not by averaging floats) results are bit-identical at any
parallelism, which an order-dependent double mean could not guarantee.

Scale notes (100 TB): work is proportional to the input points; shuffles
are (a) the per-key rank window and (b) the bucket join — both keyed on
(key[, bucket]), skew-bounded by the largest single series, the same
documented constraint as the as-of join (split hot keys by time bucket
upstream if one series outgrows a task). The anchor/bucket-stats tables
have target_points rows per key — negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    target_points: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Downsample each key's (time, value) series to ``target_points``
    shape-preserving points (first and last always kept). Series with at
    most ``target_points`` rows pass through untouched.

    ``tiebreak_col`` orders points that share a timestamp (and breaks exact
    area ties) — required for determinism when timestamps can repeat.
    Returns the selected input rows: (key_col, time_col, value_col).
    """
    if target_points < 3:
        raise ValueError("target_points must be >= 3 (endpoints + 1 interior)")

    m = target_points
    t = ntz_epoch_micros(time_col).cast("double")
    order = [F.col(time_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    wk = Window.partitionBy(key_col).orderBy(*order)
    wk_all = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    pts = df.select(
        key_col,
        time_col,
        F.col(value_col).cast("double").alias(value_col),
        t.alias("_t"),
        F.row_number().over(wk).alias("_rank"),
        F.count(F.lit(1)).over(wk_all).alias("_n"),
    )

    small = pts.where(F.col("_n") <= m)

    big = pts.where(F.col("_n") > m)
    # interior ranks 2..n-1 spread over buckets 0..m-3 by exact integer
    # division — every bucket non-empty when n > m, same formula the oracle
    # runs, so bucket boundaries are bit-identical across engines
    interior = big.where((F.col("_rank") > 1) & (F.col("_rank") < F.col("_n"))).withColumn(
        "_bkt", F.expr(f"(_rank - 2) * {m - 2} div (_n - 2)")
    )
    endpoints = big.where((F.col("_rank") == 1) | (F.col("_rank") == F.col("_n")))

    # anchor of a bucket = its mid-rank point (integer choice, never a
    # float mean: a double mean's bits would depend on aggregation order)
    wb = Window.partitionBy(key_col, "_bkt").orderBy("_rank")
    wb_all = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    anchors = (
        interior.select(
            key_col,
            "_bkt",
            "_t",
            value_col,
            F.row_number().over(wb).alias("_rn"),
            F.count(F.lit(1)).over(wb_all).alias("_cnt"),
        )
        .where(F.col("_rn") == F.expr("(_cnt + 1) div 2"))
        .select(key_col, "_bkt", F.col("_t").alias("_at"), F.col(value_col).alias("_av"))
    )
    # pseudo-anchors so bucket 0 sees the series head and the last interior
    # bucket sees the series tail (classic LTTB endpoint handling)
    head = endpoints.where(F.col("_rank") == 1).select(
        key_col, F.lit(-1).alias("_bkt"), F.col("_t").alias("_at"), F.col(value_col).alias("_av")
    )
    tail = endpoints.where(F.col("_rank") == F.col("_n")).select(
        key_col, F.lit(m - 2).alias("_bkt"), F.col("_t").alias("_at"), F.col(value_col).alias("_av")
    )

    wa = Window.partitionBy(key_col).orderBy("_bkt")
    neigh = (
        anchors.unionByName(head)
        .unionByName(tail)
        .select(
            key_col,
            "_bkt",
            F.lag("_at").over(wa).alias("_pt"),
            F.lag("_av").over(wa).alias("_pv"),
            F.lead("_at").over(wa).alias("_nt"),
            F.lead("_av").over(wa).alias("_nv"),
        )
        .where((F.col("_bkt") >= 0) & (F.col("_bkt") <= m - 3))
    )

    # twice the triangle area — the /2 is rank-invariant, dropping it keeps
    # the expression identical to the oracle's
    area = F.abs(
        (F.col("_pt") - F.col("_nt")) * (F.col(value_col) - F.col("_pv"))
        - (F.col("_pt") - F.col("_t")) * (F.col("_nv") - F.col("_pv"))
    )
    ws = Window.partitionBy(key_col, "_bkt").orderBy(F.col("_area").desc(), F.col("_rank"))
    picked = (
        interior.join(neigh, [key_col, "_bkt"])
        .withColumn("_area", area)
        .withColumn("_sel", F.row_number().over(ws))
        .where(F.col("_sel") == 1)
    )

    out = [key_col, time_col, value_col]
    return small.select(*out).unionByName(endpoints.select(*out)).unionByName(picked.select(*out))
