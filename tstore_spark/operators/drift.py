"""Distribution drift — did the data's mix shift between two snapshots?

The pipeline-monitoring companion to the quality gates: compare a
categorical column's distribution between two datasets (yesterday's crawl
vs today's, train vs eval, source A vs source B) and quantify the shift.
Everything reduces to exact integer category counts plus fixed-formula
derivations, the repo's oracle discipline:

* ``categorical_drift``  — full-outer align the two count tables (a
  category missing on one side counts 0) and emit per-category
  ``(n_a, n_b, share_a, share_b, share_diff)``.
* ``drift_summary``      — scalars from the same counts: total variation
  distance ``TVD = 0.5 * Σ|p_a − p_b|`` (the fraction of mass that moved;
  0 = identical, 1 = disjoint) and Pearson's chi-square statistic against
  the pooled distribution. Computed with one fixed expression so any
  engine reproduces the bits.

Plan shape: two map-side-combined count aggregates (one per input), a
full-outer join on the category (category cardinality-sized — tiny), one
1-row totals aggregate broadcast back onto the category rows. Nothing
data-sized ever reaches the driver or a single task, and building the
frame runs NO jobs — totals ride the lazy plan (an earlier shape ran two
eager full-scan ``.head()`` actions per call purely to fetch totals; an
empty side now raises in-plan, at action time, riding the returned share
column so column pruning cannot drop the guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _counts(df: DataFrame, col: str, alias: str) -> DataFrame:
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count(F.lit(1)).alias(alias))
    )


def _aligned_with_totals(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Full-outer aligned counts plus broadcast 1-row totals ``_ta/_tb``."""
    a, b = _counts(df_a, col, "n_a"), _counts(df_b, col, "n_b")
    j = a.join(b, "category", "full_outer").select(
        "category",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    totals = j.agg(F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb"))
    return j.crossJoin(F.broadcast(totals))


def _guarded_share(n: str, total: str, what: str) -> F.Column:
    return F.when(
        F.col(total) > 0, F.col(n).cast("double") / F.col(total).cast("double")
    ).otherwise(
        F.raise_error(
            F.lit(f"categorical_drift needs non-null rows on both sides ({what} side is empty)")
        ).cast("double")
    )


def categorical_drift(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Per-category comparison: ``(category, n_a, n_b, share_a, share_b,
    share_diff)``. Missing categories count 0 on that side; shares divide
    by each side's non-null total (computed from the same counts, no second
    scan). ONE side with zero non-null rows raises at action time; if BOTH
    sides are empty the aligned frame has no rows for the per-row guard to
    fire on, so this returns an empty frame — the summary forms raise
    loudly on that case instead."""
    j = _aligned_with_totals(df_a, df_b, col)
    share_a = _guarded_share("n_a", "_ta", "a")
    share_b = _guarded_share("n_b", "_tb", "b")
    return j.select(
        "category",
        "n_a",
        "n_b",
        share_a.alias("share_a"),
        share_b.alias("share_b"),
        (share_a - share_b).alias("share_diff"),
    )


#: share floor for the PSI log ratio — a category absent on one side would
#: otherwise make ln(p/q) infinite; 1e-6 is the conventional ML-monitoring
#: clip (PSI is a monitoring score, not an oracle-stable statistic)
PSI_EPS = 1e-6


def drift_summary_table(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame ``(n_categories, n_a, n_b, tvd, chi2, psi)`` from
    the same exact counts. chi2 is the two-sample statistic against the
    pooled distribution: ``Σ_sides Σ_cats (n − e)² / e`` with
    ``e = total_side * pooled_share``; psi is the ML-monitoring population
    stability index ``Σ (p_a − p_b)·ln(p_a/p_b)`` with shares floored at
    ``PSI_EPS`` (conventional thresholds: <0.1 stable, >0.25 shifted).
    The scalars are cross-row double sums — pytest-proven, not
    oracle-hashed (summation order is engine-dependent)."""
    j = _aligned_with_totals(df_a, df_b, col)
    ta, tb = F.col("_ta").cast("double"), F.col("_tb").cast("double")
    share_a = _guarded_share("n_a", "_ta", "a")
    share_b = _guarded_share("n_b", "_tb", "b")
    pooled = (F.col("n_a") + F.col("n_b")).cast("double") / (ta + tb)
    ea, eb = pooled * ta, pooled * tb
    chi_c = (F.col("n_a") - ea) ** 2 / ea + (F.col("n_b") - eb) ** 2 / eb
    pa = F.greatest(share_a, F.lit(PSI_EPS))
    pb = F.greatest(share_b, F.lit(PSI_EPS))
    psi_c = (pa - pb) * F.log(pa / pb)
    agged = j.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        (F.sum(F.abs(share_a - share_b)) * 0.5).alias("tvd"),
        F.sum(chi_c).alias("chi2"),
        F.sum(psi_c).alias("psi"),
    )
    # both-sides-empty: the aligned frame has zero rows, so the per-row
    # share guard never evaluates and the sums come back NULL — turn that
    # into the same loud error, still in-plan (the agg always emits 1 row)
    empty_err = F.raise_error(
        F.lit("categorical_drift needs non-null rows on both sides (both sides are empty)")
    )

    def _guard(c: str, typ: str) -> F.Column:
        return (
            F.when(F.col("n_categories") > 0, F.col(c))
            .otherwise(empty_err.cast(typ))
            .alias(c)
        )

    return agged.select(
        "n_categories",
        _guard("n_a", "bigint"),
        _guard("n_b", "bigint"),
        _guard("tvd", "double"),
        _guard("chi2", "double"),
        _guard("psi", "double"),
    )


def drift_summary(df_a: DataFrame, df_b: DataFrame, col: str) -> dict:
    """``{tvd, chi2, n_categories, n_a, n_b}`` — the dict form of
    :func:`drift_summary_table`."""
    r = drift_summary_table(df_a, df_b, col).head()
    return {
        "tvd": float(r["tvd"]),
        "chi2": float(r["chi2"]),
        "psi": float(r["psi"]),
        "n_categories": int(r["n_categories"]),
        "n_a": int(r["n_a"]),
        "n_b": int(r["n_b"]),
    }


def numeric_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Histogram-based drift for a NUMERIC column: both sides bucketed on
    the same fixed [lo, hi) grid (operators/profile.numeric_histogram —
    clamped edges, zero-filled empty buckets, exact integer counts), then
    per-bucket ``(n_a, n_b, share_a, share_b, share_diff)``. Fixed common
    bounds are what make the two histograms comparable. A side with zero
    non-null rows raises at action time (in-plan guard)."""
    from tstore_spark.operators.profile import numeric_histogram

    ha = numeric_histogram(df_a, col, lo, hi, bins).withColumnRenamed("n", "n_a")
    hb = numeric_histogram(df_b, col, lo, hi, bins).withColumnRenamed("n", "n_b")
    j = ha.join(hb, "bucket")
    totals = j.agg(F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb"))
    j = j.crossJoin(F.broadcast(totals))
    share_a = _guarded_share("n_a", "_ta", "a")
    share_b = _guarded_share("n_b", "_tb", "b")
    return j.select(
        "bucket",
        "n_a",
        "n_b",
        share_a.alias("share_a"),
        share_b.alias("share_b"),
        (share_a - share_b).alias("share_diff"),
    )
