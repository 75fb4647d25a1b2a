"""Slowly-changing-dimension (SCD type 2) history from a change log.

A web-scale warehouse keeps dimension history — "what was this host's
crawl policy / quality tier / owner WHEN this page was fetched" — as
validity intervals built from a change feed. This module turns a change
log ``(id, ts, attrs…)`` into the classic SCD2 shape and joins facts to
the version valid at their event time.

* ``scd2_intervals`` — one row per (id, version):
  ``(id, attrs…, valid_from, valid_to)`` half-open, ``valid_to`` NULL on
  the current version. Consecutive no-op changes (identical attrs,
  null-safe) collapse into one version, so replayed/duplicated change
  events do not fragment history.
* ``scd2_join``      — facts ⋈ the version valid at fact time. A fact at
  exactly a version boundary belongs to the NEW version (half-open
  intervals). Implemented as the backward as-of join on ``valid_from``
  (equivalent to the interval join because versions partition each id's
  timeline), so it inherits asof.py's shuffle shape and skew notes.

Exactness: interval construction is two window passes over the change
log (lag to collapse no-ops, lead for valid_to) ordered by (ts,
attr-struct) — a total order, so results are bit-identical at any
parallelism even when a key has several changes in one microsecond.

Scale: the change log shuffles once on the id; dimension histories are
orders of magnitude smaller than fact tables, and the join broadcast/
shuffles per asof.py's documented strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    id_col: str,
    time_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build validity intervals from a change log; see module docstring."""
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # total order: ties on ts break on the attr struct itself, so duplicate
    # timestamps cannot make which-change-wins partition-dependent
    w = Window.partitionBy(id_col).orderBy(F.col(time_col).asc(), attrs.asc())
    marked = changes.select(id_col, time_col, *attr_cols).withColumn(
        "_prev", F.lag(attrs).over(w)
    )
    kept = marked.where(
        F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(attrs)
    ).drop("_prev")
    w2 = Window.partitionBy(id_col).orderBy(F.col(time_col).asc(), attrs.asc())
    return kept.select(
        id_col,
        *attr_cols,
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w2).alias("valid_to"),
    )


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    id_col: str,
    fact_time_col: str,
    how: str = "left",
) -> DataFrame:
    """Join each fact to the dimension version valid at its event time
    (``valid_from <= t < valid_to``; facts before the first version get
    NULL attrs). ``dim`` is :func:`scd2_intervals` output."""
    from tstore_spark.operators.asof import asof_join

    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner'; got {how!r}")
    attr_cols = [c for c in dim.columns if c not in (id_col, "valid_from", "valid_to")]
    # the whole version rides ONE struct so it carries atomically: asof's
    # per-column carry (pandas semantics) would otherwise let an older
    # version's non-null attr shine through a newer version's legitimate
    # NULL attr
    # Drop empty [T, T) intervals (same-microsecond successive changes):
    # they match no fact time by definition, and removing them makes
    # valid_from unique per id — so the as-of join has no ties to break
    # and the result stays bit-identical at any parallelism.
    live = dim.where(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    )
    packed = live.select(
        id_col,
        "valid_from",
        F.struct("valid_from", *attr_cols).alias("_ver"),
    )
    joined = asof_join(
        facts,
        packed,
        key=id_col,
        left_time=fact_time_col,
        right_time="valid_from",
        value_cols=["_ver"],
        suffix="",
    )
    out = joined.select(
        *facts.columns,
        F.col("_ver.valid_from").alias("valid_from"),
        *[F.col(f"_ver.{c}").alias(c) for c in attr_cols],
    )
    if how == "inner":
        out = out.where(F.col("valid_from").isNotNull())
    return out
