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


#: Benford's-law expected share of first significant digit d: log10(1 + 1/d)
BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_profile(
    df: DataFrame,
    key_cols: list[str],
    cents_col,
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the classic
    fabricated-/synthetic-numbers screen, run per key over a SCALED-INTEGER
    amount column (the repo's cents discipline; pass e.g.
    ``F.round(F.col("value") * 100).cast("long")``).

    The first digit comes from the integer's decimal STRING (substring of
    ``cast(cents as string)``) — never ``floor(v / 10^floor(log10 v))``,
    because log10 is engine-defined near powers of ten and the digit would
    flip between engines exactly at the boundaries that matter.
    Non-positive amounts are excluded (Benford applies to positive
    magnitudes).

    Output per key: ``(keys..., n_total, c_1..c_9, chi2)`` — digit counts
    are exact integers (order-independent), ``chi2 =
    Σ_d (c_d − N·p_d)² / (N·p_d)`` is ONE fixed left-to-right expression
    over them (engine-reproducible: the p_d are double literals, no
    transcendentals at query time). Scale: one map-side-combined groupBy,
    nine integer counters per key."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    pos = df.where(c > 0).select(
        *key_cols, F.substring(c.cast("string"), 1, 1).alias("_d")
    )
    agg = pos.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.coalesce(
                F.sum((F.col("_d") == str(d)).cast("long")), F.lit(0)
            ).alias(f"c_{d}")
            for d in range(1, 10)
        ],
    )
    chi2 = None
    for d in range(1, 10):
        exp = F.col("n_total") * F.lit(BENFORD_P[d])
        term = (F.col(f"c_{d}") - exp) * (F.col(f"c_{d}") - exp) / exp
        chi2 = term if chi2 is None else chi2 + term
    return agg.select(
        *key_cols, "n_total", *[f"c_{d}" for d in range(1, 10)],
        chi2.alias("chi2"),
    )


def benford_sql_chi2(total_col: str = "n_total") -> str:
    """The ANSI twin of the chi2 expression — generated from the same
    constants and the same fold order, so the doubles cannot drift."""
    parts = []
    for d in range(1, 10):
        # CAST: a bare decimal literal parses as DECIMAL in DuckDB — the
        # subtraction then squares a DECIMAL(38) and overflows at scale
        # (caught by the sf0.1 gate); the cast keeps everything double,
        # matching the Spark expression bit-for-bit
        p = f"CAST({BENFORD_P[d]!r} AS DOUBLE)"
        parts.append(
            f"(c_{d} - {total_col} * {p}) * (c_{d} - {total_col} * {p})"
            f" / ({total_col} * {p})"
        )
    return " + ".join(parts)
