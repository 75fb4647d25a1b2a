"""Data profiling — single-scan column statistics + equi-width histograms.

The quality-gate companion to operators/expectations.py: before writing
rules you need to SEE the data. Standard lakehouse profiling shapes, built
so the whole profile is ONE job:

* ``profile``            — per-column row/null/distinct counts and min/max,
  computed in a single aggregate over one scan (every statistic is an
  expression in the same ``agg``; Spark plans the multi-distinct with one
  Expand, still one pass over the input). The wide 1-row result is then
  unpivoted driver-side into one tidy row per column — O(#columns), not
  data-sized.
* ``numeric_histogram``  — exact equi-width bucket counts for a numeric
  column given FIXED bounds: ``floor((v - lo) / width)`` clamped to
  [0, bins), one groupBy of integer bucket ids. Fixed bounds keep it a
  single pass (no min/max pre-scan) and deterministic at any parallelism
  (integer counts, order-independent).

Scale: ``profile`` with exact distincts costs an Expand ×(#distinct
columns) — fine for a profiling job; pass ``exact_distinct=False`` to use
``approx_count_distinct`` (HLL, no Expand) when profiling petabyte tables
where ±2% is acceptable. Histograms shuffle only (bucket_id, count) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One tidy row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_val, max_val)`` — min/max rendered as strings so mixed column types
    share one schema. Single scan, single aggregate."""
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing or not cols:
        raise ValueError(f"profile columns not in DataFrame (or empty): {missing}")
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__nd"),
            # min/max on the NATIVE type (string-cast first would order
            # numerics lexicographically), rendered to string after
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["__n"],
            row[f"{c}__nulls"],
            row[f"{c}__nd"],
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, n_distinct long,"
        " min_val string, max_val string",
    )


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """Exact equi-width histogram ``(bucket, n)`` over fixed [lo, hi):
    bucket = floor((v - lo) / width) clamped into [0, bins); values at or
    above ``hi`` land in the last bucket, below ``lo`` in the first
    (clamping keeps every row counted — totals always reconcile). NULLs are
    excluded. Empty buckets are emitted with n = 0 so the result always has
    exactly ``bins`` rows."""
    if bins < 1 or not hi > lo:
        raise ValueError("numeric_histogram needs bins >= 1 and hi > lo")
    width = (hi - lo) / bins
    bucket = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(bins - 1))
    got = (
        df.where(F.col(col).isNotNull())
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = df.sparkSession.range(bins).select(F.col("id").alias("bucket"))
    return (
        grid.join(got, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n"))
    )
