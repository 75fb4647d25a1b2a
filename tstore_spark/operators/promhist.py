"""Prometheus-style le-bucket histograms and ``histogram_quantile``.

The monitoring stack's native percentile path: instead of shipping raw
samples, each series keeps CUMULATIVE counters per fixed upper bound
(``le`` = less-or-equal, Prometheus classic histograms), and quantiles are
interpolated from the counters at query time (PromQL
``histogram_quantile``). The repo already has two other quantile shapes —
exact histogram-state percentiles (operators/rollup.py) and relative-error
DDSketch (operators/ddsketch.py); this module adds the FIXED-BOUND
contract those systems expose, because its state is the cheapest possible
(one bigint per bound) and merges by plain addition, which makes it the
right quantile carrier for the streaming cascade and for cross-archive
rollup merges.

Design:

- **State is integer sums.** ``le_bucket_counts`` is ONE map-side-combined
  groupBy; each bucket is ``sum(value <= bound)`` — order-independent,
  mergeable across shards/tiers/windows by element-wise addition
  (``merge_bucket_counts``), exactly the Prometheus scrape-merge algebra.
- **Quantile is a closed-form expression.** ``histogram_quantile`` unrolls
  the bucket scan into a literal CASE chain over the (small, fixed) bound
  list — pure codegen, no UDF, and an ANSI-SQL twin can replicate the
  identical op order so the interpolated double is bit-identical across
  engines (only +,-,*,/ on IEEE doubles; no transcendentals).

Semantics match PromQL ``histogram_quantile`` (promql/quantile.go,
public Prometheus source): rank = q·total; the answer lives in the lowest
bucket whose cumulative count reaches rank; linear interpolation within
the bucket from its lower neighbour's cumulative count; the first bucket
interpolates from 0 (or returns its bound when the bound is <= 0, where a
zero lower edge would be wrong for negative-capable scales); rank falling
in the +Inf bucket returns the highest finite bound.

Scale (100 TB): the only shuffle is the groupBy on the grouping keys with
full map-side combine — bucket state is ``len(bounds)`` bigints per group
regardless of input size. Quantile evaluation reads the tiny counter
table. This is the textbook two-level rollup shape; counters for 1m tiers
re-aggregate to 1h/1d by integer addition without touching raw data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_bounds(bounds: Sequence[float]) -> list[float]:
    bs = [float(b) for b in bounds]
    if len(bs) < 1:
        raise ValueError("need at least one finite bucket bound")
    if any(b2 <= b1 for b1, b2 in zip(bs, bs[1:])):
        raise ValueError(f"bounds must be strictly increasing, got {bs}")
    return bs


def bucket_count_columns(value_col: str | Column, bounds: Sequence[float]) -> list[Column]:
    """Aggregate expressions ``[sum(value <= b) for b in bounds]`` —
    cumulative le-bucket counters, for embedding in an existing groupBy
    (the rollup-cascade pattern: ride the same shuffle as count/bytes)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    # coalesce: a group whose every value is NULL has zero observations in
    # every bucket, not a NULL counter (sum over an all-NULL column is NULL)
    return [
        F.coalesce(F.sum((v <= F.lit(b)).cast("long")), F.lit(0)).alias(f"le_{i}")
        for i, b in enumerate(_check_bounds(bounds))
    ]


def le_bucket_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    bounds: Sequence[float],
) -> DataFrame:
    """Per-key cumulative bucket counters: ``(keys..., le_0..le_{k-1},
    n_total)`` where ``le_i = count(value <= bounds[i])`` and ``n_total``
    counts every non-null observation (the +Inf bucket). One
    map-side-combined groupBy; NULL values are not observations."""
    bs = _check_bounds(bounds)
    return df.groupBy(*key_cols).agg(
        *bucket_count_columns(value_col, bs),
        F.count(value_col).alias("n_total"),
    )


def merge_bucket_counts(
    df: DataFrame, key_cols: Sequence[str], n_bounds: int
) -> DataFrame:
    """Re-aggregate counter rows to coarser keys by element-wise integer
    addition — the tier-cascade step (1m counters -> 1h -> 1d) and the
    cross-shard merge. Exact: integer sums commute and associate."""
    return df.groupBy(*key_cols).agg(
        *[F.sum(f"le_{i}").alias(f"le_{i}") for i in range(n_bounds)],
        F.sum("n_total").alias("n_total"),
    )


def quantile_expr(q: float, bounds: Sequence[float], total_col: str = "n_total") -> Column:
    """The PromQL ``histogram_quantile(q, ...)`` value as a pure Catalyst
    expression over ``le_*``/``n_total`` columns. Literal CASE chain — one
    branch per bound, codegen end-to-end, SQL-twin-replicable bit-for-bit.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    bs = _check_bounds(bounds)
    rank = F.lit(float(q)) * F.col(total_col)
    # first bucket: lower edge 0 unless the bound itself is <= 0
    if bs[0] > 0:
        first = F.lit(bs[0]) * rank / F.col("le_0")
    else:
        first = F.lit(bs[0])
    expr = F.when(F.col(total_col) == 0, F.lit(None).cast("double")).when(
        F.col("le_0") >= rank, first
    )
    for i in range(1, len(bs)):
        lo, hi = bs[i - 1], bs[i]
        interp = F.lit(lo) + (F.lit(hi) - F.lit(lo)) * (
            rank - F.col(f"le_{i-1}")
        ) / (F.col(f"le_{i}") - F.col(f"le_{i-1}"))
        expr = expr.when(F.col(f"le_{i}") >= rank, interp)
    # rank beyond every finite bound: the +Inf bucket owns it; PromQL
    # returns the highest finite bound
    return expr.otherwise(F.lit(bs[-1]))


def histogram_quantile(
    bcounts: DataFrame,
    qs: Sequence[float],
    bounds: Sequence[float],
    key_cols: Sequence[str],
    total_col: str = "n_total",
) -> DataFrame:
    """Evaluate PromQL-semantics quantiles from a counter table produced by
    :func:`le_bucket_counts` / :func:`merge_bucket_counts`. Returns
    ``(keys..., n_total, q_<label>...)`` with one double per requested q
    (label = q with the dot stripped: 0.99 -> ``q_0_99``)."""
    bs = _check_bounds(bounds)
    outs = [
        quantile_expr(q, bs, total_col).alias("q_" + str(q).replace(".", "_"))
        for q in qs
    ]
    return bcounts.select(*key_cols, F.col(total_col), *outs)


def quantile_sql_case(
    q: float, bounds: Sequence[float], total_col: str = "n_total"
) -> str:
    """The ANSI-SQL twin of :func:`quantile_expr` — identical branch order
    and identical arithmetic op order, so a DuckDB oracle hash-matches the
    Spark doubles. Kept next to the expression so the two can never drift."""
    bs = _check_bounds(bounds)

    # Every numeric literal participating in arithmetic MUST be CAST(x AS
    # DOUBLE): DuckDB parses bare float literals as DECIMAL and evaluates
    # rank = q * n_total exactly, while Spark computes the inexact double —
    # branch selection and interpolation bits then diverge (e.g. n_total=3,
    # q=0.9: 1.7000000000000002 vs 1.7).  Same hardening as benford_sql_chi2.
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    r = f"({d(q)} * {total_col})"
    first = f"({d(bs[0])} * {r} / le_0)" if bs[0] > 0 else d(bs[0])
    parts = [
        f"WHEN {total_col} = 0 THEN NULL",
        f"WHEN le_0 >= {r} THEN {first}",
    ]
    for i in range(1, len(bs)):
        lo, hi = bs[i - 1], bs[i]
        parts.append(
            f"WHEN le_{i} >= {r} THEN ({d(lo)} + ({d(hi)} - {d(lo)}) * "
            f"({r} - le_{i-1}) / (le_{i} - le_{i-1}))"
        )
    return "CASE " + " ".join(parts) + f" ELSE {d(bs[-1])} END"
