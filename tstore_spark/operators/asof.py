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
spill budget (same constraint any per-key sort has). For skewed keys,
``asof_join_bucketed`` range-splits every key by a coarse time bucket and
carries boundary state across buckets: parallelism becomes keys × buckets
and no single task ever sorts more than one key-bucket. Deterministic: ties
among right rows at the same (key, time) are broken by ``tiebreak_col``
(latest wins), so output is a pure function of the input.
"""

from __future__ import annotations

from functools import reduce

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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join; returns left columns + right ``value_cols`` renamed with
    ``suffix`` (null when no right row matches).

    direction='backward' (default): most recent right row at-or-before the
    left time. 'forward': earliest right row at-or-after. 'nearest': the
    closer of the two, ties to backward (pandas ``merge_asof`` semantics).
    ``tolerance_us`` nulls a match whose |left - right| time gap exceeds it.
    Each value column carries independently (a NULL in a later right row
    does not erase an earlier non-null); among right rows at the exact same
    instant the highest ``tiebreak_col`` wins, in every direction."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction != "backward" or tolerance_us is not None:
        return _asof_join_general(
            left, right, key, left_time, right_time or left_time,
            value_cols, tiebreak_col, suffix, direction, tolerance_us,
        )
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


def _epoch_micros(df: DataFrame, col_name: str) -> F.Column:
    """TZ-safe epoch microseconds (field extraction for NTZ columns)."""
    if dict(df.dtypes).get(col_name) == "timestamp_ntz":
        from tstore_spark.functions.timeparts import ntz_epoch_micros

        return ntz_epoch_micros(col_name)
    return F.unix_micros(F.col(col_name))


def _asof_join_general(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None,
    tiebreak_col: str | None,
    suffix: str,
    direction: str,
    tolerance_us: int | None,
) -> DataFrame:
    """Directional/tolerance as-of: same union + carry construction as the
    backward fast path, but each value column carries an atomic
    (match-time, value) struct so tolerance and nearest-pick can test the
    ACTUAL source row's time per column. 'nearest' runs the backward and
    forward carries over the same union — one shuffle, two in-partition
    sorts. Epochs are wall-clock field extractions for NTZ inputs."""
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_time)]
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)

    l_tag = (
        left.withColumn("_tus", _epoch_micros(left, left_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_tb", F.lit(None).cast("long"))
    )
    r_tus = _epoch_micros(right, right_time)
    r_tag = right.select(
        F.col(key),
        r_tus.alias("_tus"),
        F.lit(0).alias("_side"),
        tb.cast("long").alias("_tb"),
        *[
            F.when(
                F.col(c).isNotNull(),
                F.struct(r_tus.alias("_mt"), F.col(c).alias("v")),
            ).alias(f"_s_{c}")
            for c in value_cols
        ],
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("_tus").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("_tus").desc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        if direction in ("backward", "nearest"):
            u = u.withColumn(f"_b_{c}", F.last(f"_s_{c}", ignorenulls=True).over(wb))
        if direction in ("forward", "nearest"):
            u = u.withColumn(f"_f_{c}", F.last(f"_s_{c}", ignorenulls=True).over(wf))

    out_cols = []
    for c in value_cols:
        b = F.col(f"_b_{c}")
        f = F.col(f"_f_{c}")
        d_b = F.col("_tus") - b.getField("_mt")  # >= 0 when matched
        d_f = f.getField("_mt") - F.col("_tus")  # >= 0 when matched
        ok_b = b.isNotNull() if tolerance_us is None else (b.isNotNull() & (d_b <= tolerance_us))
        ok_f = f.isNotNull() if tolerance_us is None else (f.isNotNull() & (d_f <= tolerance_us))
        if direction == "backward":
            val = F.when(ok_b, b.getField("v"))
        elif direction == "forward":
            val = F.when(ok_f, f.getField("v"))
        else:  # nearest: closer side wins, exact ties to backward
            val = (
                F.when(ok_b & ok_f, F.when(d_b <= d_f, b.getField("v")).otherwise(f.getField("v")))
                .when(ok_b, b.getField("v"))
                .when(ok_f, f.getField("v"))
            )
        out_cols.append(val.alias(f"{c}{suffix}"))
    l_cols = [F.col(c) for c in left.columns]
    return u.where(F.col("_side") == 1).select(*l_cols, *out_cols)


def _epoch_seconds(col_name: str, df: DataFrame) -> F.Column:
    """TZ-safe epoch seconds for bucketing (field extraction for NTZ)."""
    if dict(df.dtypes).get(col_name) == "timestamp_ntz":
        from tstore_spark.functions.timeparts import ntz_epoch_seconds

        return ntz_epoch_seconds(col_name)
    return F.col(col_name).cast("long")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str | None = None,
    value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Backward as-of join with per-key TIME-BUCKET splitting — the hot-key
    scale path. Identical semantics to :func:`asof_join` (asserted by
    tests), different plan:

    1. every row gets a coarse bucket = floor(epoch / bucket_seconds);
    2. the right side is summarized per (key, bucket): its LAST row (by
       time, tiebreak) — one small aggregation;
    3. each left bucket receives a CARRY-IN row: the latest right summary
       from any strictly earlier bucket (computed by a window over the
       per-key bucket summaries — rows there number time_range / bucket,
       never data volume);
    4. the union + carry-forward window then partitions by (key, bucket):
       no task ever sorts more than one key-bucket of rows.

    Cost: two extra small shuffles (summaries, carry alignment) buying
    bounded task size under any key skew. Use the plain operator when keys
    are well distributed.
    """
    right_time = right_time or left_time
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_time)]
    if not value_cols:
        # nothing to carry: plain asof_join degenerates to the left rows
        # unchanged, so the bucketed twin must too
        return left.select(*[F.col(c) for c in left.columns])

    lb = left.withColumn("_bkt", F.floor(_epoch_seconds(left_time, left) / bucket_seconds))
    rb = right.withColumn("_bkt", F.floor(_epoch_seconds(right_time, right) / bucket_seconds))

    # (2) per-(key, bucket) last NON-NULL value of EACH column independently
    # (by time, tiebreak). Plain asof's last(col, ignorenulls) carries every
    # column on its own timeline, so the bucket summary must too — a single
    # whole-row summary would let a NULL in the bucket's final row erase an
    # earlier non-null value of that column.
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    summary = rb.groupBy(key, "_bkt").agg(
        *[
            F.max(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(
                        F.col(right_time).alias("_t"), tb.alias("_tb"), F.col(c).alias("v")
                    ),
                )
            ).alias(f"_s_{c}")
            for c in value_cols
        ]
    )
    s_cols = [f"_s_{c}" for c in value_cols]

    # (3) carry-in per left bucket: latest per-column summary with
    # bucket' < bucket. Summaries become visible from the NEXT bucket on
    # (sort position bucket+1); left-bucket markers sit at their own bucket
    # and sort after any same-position summary.
    markers = (
        lb.select(key, "_bkt")
        .distinct()
        .withColumn("_pos", F.col("_bkt"))
        .withColumn("_ismark", F.lit(1))
    )
    for sc in s_cols:
        markers = markers.withColumn(sc, F.lit(None).cast(summary.schema[sc].dataType))
    summ_pos = summary.select(
        key,
        F.lit(None).cast("long").alias("_bkt"),
        (F.col("_bkt") + 1).alias("_pos"),
        F.lit(0).alias("_ismark"),
        *s_cols,
    )
    wcarry = (
        Window.partitionBy(key)
        .orderBy(F.col("_pos").asc(), F.col("_ismark").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = markers.unionByName(summ_pos)
    for sc in s_cols:
        carried = carried.withColumn(sc, F.last(F.col(sc), ignorenulls=True).over(wcarry))
    carry = (
        carried.where(F.col("_bkt").isNotNull())  # keep the marker rows
        .where(
            reduce(lambda a, b: a | b, [F.col(sc).isNotNull() for sc in s_cols])
        )  # at least one column has carried state
        .select(
            key,
            "_bkt",
            *[
                F.col(f"_s_{c}").getField("v").alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    )

    # (4) per-(key, bucket) union: carry rows sort first, then time order
    l_tag = lb.withColumn("_side", F.lit(1)).withColumn("_carryrow", F.lit(0)).withColumn(
        "_tb", F.lit(None).cast("long")
    )
    r_tag = rb.select(
        F.col(key),
        "_bkt",
        F.col(right_time).alias(left_time),
        F.lit(0).alias("_side"),
        F.lit(0).alias("_carryrow"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *( [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else [F.lit(0).alias("_tb")] ),
    )
    c_tag = carry.withColumn(left_time, F.lit(None).cast(dict(left.dtypes)[left_time])).withColumn(
        "_side", F.lit(0)
    ).withColumn("_carryrow", F.lit(1)).withColumn("_tb", F.lit(None).cast("long"))

    l_cols = [F.col(c) for c in left.columns]
    u = l_tag.unionByName(r_tag, allowMissingColumns=True).unionByName(
        c_tag, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key, "_bkt")
        .orderBy(
            F.col("_carryrow").desc(),
            F.col(left_time).asc_nulls_first(),
            F.col("_side").asc(),
            F.col("_tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).select(
        *l_cols, *[F.col(f"{c}{suffix}") for c in value_cols]
    )
