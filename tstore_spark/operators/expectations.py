"""Data-quality expectations — declarative constraint validation + quarantine.

The ingest side of a 100 TB pipeline needs the Delta-Live-Tables /
Great-Expectations primitive: declare row-level constraints, get (a) a
violation report and (b) a clean/quarantine split — without a pass per
rule. Both operators here evaluate EVERY rule in ONE scan as pure codegen
expressions: the report is a single aggregate (conditional sums), the
split is a single projection + filter, so N rules cost one traversal, not
N.

Rules are ``name -> boolean Column`` (TRUE = row passes). NULL rule
results count as violations (SQL three-valued logic would otherwise let
NULLs slip through both the pass and fail branches — the classic
constraint-check bug).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violated(rule: Column) -> Column:
    # NULL-safe: a rule evaluating to NULL is a violation, not a pass
    return ~F.coalesce(rule, F.lit(False))


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations) per rule — one aggregate over one scan."""
    if not rules:
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(_violated(rule).cast("long")).alias(name) for name, rule in rules.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', `{name}`" for name in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select("rule", "n_rows", "n_violations")


def quarantine(
    df: DataFrame, rules: dict[str, Column], failed_col: str = "failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): quarantined rows carry the sorted array of the
    rule names they violate — the audit trail a re-ingest needs. One scan,
    one projection; no shuffle."""
    if not rules:
        raise ValueError("no rules given")
    failed = F.array_compact(
        F.array(
            *[
                F.when(_violated(rule), F.lit(name)).otherwise(F.lit(None))
                for name, rule in sorted(rules.items())
            ]
        )
    )
    staged = df.withColumn(failed_col, failed)
    clean = staged.where(F.size(failed_col) == 0).drop(failed_col)
    bad = staged.where(F.size(failed_col) > 0)
    return clean, bad
