"""Bucketed range joins: point-in-interval and interval-overlap joins
without a cartesian product.

Spark turns a bare inequality join (``p.ts BETWEEN i.start AND i.end``)
into BroadcastNestedLoopJoin or CartesianProduct — O(|A|·|B|) at scale.
The classic fix (the reference's pandas ``IntervalIndex`` lookups are the
single-node analog; Flink/KDB window joins the streaming one) is to
quantize time into fixed buckets, explode each interval over the buckets
it covers, and equi-join on (keys…, bucket) before the exact predicate.
Candidate work is then |points| + Σ interval_spans — linear, shuffle on
an equi-key, AQE/skew-join eligible.

Exactly-once semantics without a distinct shuffle:

- point-in-interval: a point lives in exactly ONE bucket, so each
  (interval, point) candidate pair arises once by construction.
- interval-overlap: a pair may share many buckets; each pair is emitted
  only from the bucket containing ``greatest(start_a, start_b)`` — a
  deterministic single representative, so no dedup pass is needed.

Scale notes (100 TB): choose ``bucket`` ≥ the typical interval length so
the explode factor stays ~1-2 (``sequence`` bounds the fan-out to
span/bucket + 1; a pathological month-long interval over 1m buckets would
fan out 43k×, so pick the bucket for the data). Long-interval skew is
visible and tunable, unlike the invisible cliff of a nested-loop join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros

_BUCKET_MICROS = {"1m": 60_000_000, "15m": 900_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _bucket_micros(bucket: str) -> int:
    if bucket not in _BUCKET_MICROS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_MICROS)}; got {bucket!r}")
    return _BUCKET_MICROS[bucket]


def _bucket_of(t: Column, w: int) -> Column:
    """Sign-safe bucket floor (pmod): `t - t % w` rounds toward zero for
    pre-1970 epochs. The buckets are internal join keys, but the single-
    emission predicate compares a point bucket to an interval's spanned
    set, so every site must use the SAME floor — this one."""
    return t - F.pmod(t, F.lit(w))


def _buckets_spanned(start: Column, end: Column, w: int) -> Column:
    """All bucket starts a closed-open [start, end) interval touches.
    Empty/inverted intervals (end <= start) span nothing."""
    return F.when(
        end > start,
        F.sequence(_bucket_of(start, w), _bucket_of(end - 1, w), F.lit(w)),
    ).otherwise(F.array().cast("array<long>"))


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1h",
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with ``start <= t < end`` (and
    equal ``keys``), as an equi-join on (keys…, time bucket). ``how`` may
    be ``inner`` or ``left`` (``left`` keeps unmatched points with null
    interval columns — implemented as inner + anti-union so the bucketed
    path is still used). Column names must be disjoint apart from ``keys``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left'; got {how!r}")
    keys = list(keys or [])
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    w = _bucket_micros(bucket)
    pt = points.withColumn("_pb", _bucket_of(ntz_epoch_micros(point_time_col), w))
    iv = intervals.withColumn(
        "_ib",
        F.explode(
            _buckets_spanned(ntz_epoch_micros(start_col), ntz_epoch_micros(end_col), w)
        ),
    )
    cond = [pt["_pb"] == iv["_ib"]] + [pt[k] == iv[k] for k in keys]
    joined = pt.join(iv, cond, "inner").where(
        (F.col(point_time_col) >= F.col(start_col)) & (F.col(point_time_col) < F.col(end_col))
    )
    out_cols = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in keys
    ]
    inner = joined.select(*out_cols)
    if how == "inner":
        return inner
    # left: unmatched points get null interval columns. The matched point
    # set comes from `inner` (a bucket candidate that failed the exact
    # predicate must still be kept), removed with a null-safe left_anti —
    # a plain equi-anti would resurrect rows containing nulls.
    matched_keys = inner.select(*[F.col(c) for c in points.columns]).dropDuplicates()
    unmatched = points.alias("_p").join(
        matched_keys.alias("_m"),
        on=[F.col(f"_p.{c}").eqNullSafe(F.col(f"_m.{c}")) for c in points.columns],
        how="left_anti",
    )
    null_iv = [
        F.lit(None).cast(intervals.schema[c].dataType).alias(c)
        for c in intervals.columns
        if c not in keys
    ]
    return inner.unionByName(unmatched.select(*points.columns, *null_iv))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "1h",
    keys: list[str] | None = None,
) -> DataFrame:
    """All (left, right) interval pairs that overlap — ``max(starts) <
    min(ends)``, closed-open — with equal ``keys``. Each pair is emitted
    exactly once: only the bucket containing ``greatest(start_l, start_r)``
    produces it, so no distinct/dedup shuffle follows the join."""
    keys = list(keys or [])
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    w = _bucket_micros(bucket)
    lt = left.withColumn(
        "_lb",
        F.explode(_buckets_spanned(ntz_epoch_micros(left_start), ntz_epoch_micros(left_end), w)),
    )
    rt = right.withColumn(
        "_rb",
        F.explode(_buckets_spanned(ntz_epoch_micros(right_start), ntz_epoch_micros(right_end), w)),
    )
    cond = [lt["_lb"] == rt["_rb"]] + [lt[k] == rt[k] for k in keys]
    later_start = F.greatest(ntz_epoch_micros(left_start), ntz_epoch_micros(right_start))
    joined = (
        lt.join(rt, cond, "inner")
        .where(
            later_start
            < F.least(ntz_epoch_micros(left_end), ntz_epoch_micros(right_end))
        )
        .where(F.col("_lb") == _bucket_of(later_start, w))
    )
    out_cols = [lt[c] for c in left.columns] + [
        rt[c] for c in right.columns if c not in keys
    ]
    return joined.select(*out_cols)
