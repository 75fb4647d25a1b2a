"""Behavioral analytics over event streams: retention cohorts and funnels.

The reference's event-analytics surface stops at per-id time series
(tstore/tslong/tslong.py); these are the two classic page/user-level rollups
a web-scale event warehouse adds on top. Both are exact and
order-independent (integer epochs, distinct sets, greedy folds over sorted
arrays), so results are bit-identical at any parallelism.

Scale notes (100 TB):
- ``retention_cohorts`` is two shuffles: groupBy(user) with map-side-combined
  ``collect_set(day)`` (state bounded by the user's active-day span, never
  raw events), then groupBy(cohort, offset) integer counts.
- ``funnel`` filters to step events FIRST (predicate pushdown removes the
  non-funnel bulk at the scan), then one shuffle to groupBy(user); the fold
  over each user's sorted step events is a JVM higher-order ``aggregate`` —
  no Python, state is k longs per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros


def retention_cohorts(
    df: DataFrame,
    id_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen day (cohort),
    counted on each subsequent active day.

    Output: (cohort date, day_offset int, active_users long) where
    ``active_users`` counts DISTINCT users of that cohort active exactly
    ``day_offset`` days after their first day. ``to_date`` on TIMESTAMP_NTZ
    is field extraction (wall-clock, session-TZ-proof)."""
    day = F.to_date(time_col)
    per_user = (
        df.select(F.col(id_col).alias("_uid"), day.alias("_day"))
        .groupBy("_uid")
        .agg(F.array_sort(F.collect_set("_day")).alias("_days"))
    )
    # the user's first active day is element 0 of the sorted distinct days;
    # exploding the AGGREGATED column is safe (nothing to re-inline upstream)
    exploded = per_user.select(
        F.col("_days")[0].alias("cohort"), F.explode("_days").alias("_day")
    )
    return exploded.groupBy(
        "cohort", F.datediff("_day", "cohort").alias("day_offset")
    ).agg(F.count(F.lit(1)).alias("active_users"))


def funnel(
    df: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: per user, step i's time is the EARLIEST
    step-i event STRICTLY after step i-1's time (greedy, equal to the
    chained-min formulation because events are folded in ascending time
    order); ``within_us`` additionally requires every later step to land
    within that many microseconds of step 0.

    Output: (id, t0_us..t{k-1}_us bigint nullable, depth int). Non-null
    step times always form a prefix, so ``depth`` = #steps reached. Epochs
    are wall-clock field extractions for TIMESTAMP_NTZ inputs (Spark 4
    casts/timestampdiff would route NTZ through the session zone).
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    is_ntz = dict(df.dtypes).get(time_col) == "timestamp_ntz"
    t = ntz_epoch_micros(time_col) if is_ntz else F.unix_micros(F.col(time_col))
    step_arr = F.array(*[F.lit(s) for s in steps])

    evs = (
        df.where(F.col(type_col).isin(list(steps)))  # pushdown: drop non-funnel bulk at the scan
        .select(
            F.col(id_col).alias("_uid"),
            t.alias("_t"),
            F.array_position(step_arr, F.col(type_col)).cast("int").alias("_s"),  # 1-based
        )
    )
    per_user = evs.groupBy("_uid").agg(
        F.array_sort(F.collect_list(F.struct("_t", "_s"))).alias("_evs")
    )

    win = (
        f" AND e._t - element_at(acc, 1) <= {int(within_us)}" if within_us is not None else ""
    )
    # greedy fold: acc is k nullable epoch slots; CASE keeps element_at(acc, 0)
    # from ever evaluating (ANSI) by handling the s=1 branch first
    fold = f"""
        aggregate(
          _evs,
          array_repeat(CAST(NULL AS BIGINT), {k}),
          (acc, e) -> transform(acc, (x, i) ->
            CASE WHEN i = e._s - 1 AND x IS NULL THEN
                   CASE WHEN e._s = 1 THEN e._t
                        WHEN element_at(acc, e._s - 1) IS NOT NULL
                             AND e._t > element_at(acc, e._s - 1){win}
                          THEN e._t
                        ELSE x END
                 ELSE x END)
        )
    """
    out = per_user.withColumn("_f", F.expr(fold))
    return out.select(
        F.col("_uid").alias(id_col),
        *[F.col("_f")[i].alias(f"t{i}_us") for i in range(k)],
        F.expr("size(filter(_f, x -> x IS NOT NULL))").cast("int").alias("depth"),
    )


def transitions(
    df: DataFrame,
    id_col: str = "user_id",
    state_col: str = "event_type",
    time_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    how often state A is immediately followed by state B (the "next page"
    model every clickstream / crawl-scheduling pipeline starts from).

    Per user, events are ordered by ``(time_col, *tiebreak_cols)`` — callers
    MUST supply tiebreakers that make the order total (e.g. a unique event
    id) or equal timestamps would make the sequence, and therefore the
    counts, partition-dependent. The consecutive-pair extraction is one
    ``lead`` window (a single shuffle keyed on the user — the natural key,
    never a global sort); the pair counts are a map-side-combined groupBy
    over (from, to). ``p`` is derived from the two exact longs by ONE fixed
    division, so its double bits reproduce in any engine.

    Output: (from_state, to_state, n_transitions long, n_from long,
    p double) where ``n_from`` totals all transitions leaving
    ``from_state`` and ``p = n_transitions / n_from``. A user's last event
    has no successor and is excluded (standard open-sequence convention).
    """
    from pyspark.sql import Window

    ties = [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(id_col).orderBy(F.col(time_col), *ties)
    pairs = (
        df.select(
            F.col(id_col),
            F.col(time_col),
            *[F.col(c) for c in (tiebreak_cols or [])],
            F.col(state_col).alias("from_state"),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .where(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    # per-source totals over the tiny (#states x #states) count table — a
    # window over the aggregate, never over raw events
    totals = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.sum("n_transitions").over(totals).alias("n_from"),
        (F.col("n_transitions") / F.sum("n_transitions").over(totals)).alias("p"),
    )


def funnel_counts(funnel_df: DataFrame, k: int) -> DataFrame:
    """(step int, users_reached long) from a :func:`funnel` result — the
    funnel chart. One tiny aggregation over per-user depths."""
    depth_counts = funnel_df.groupBy("depth").agg(F.count(F.lit(1)).alias("_n"))
    steps = funnel_df.sparkSession.range(1, k + 1).select(F.col("id").cast("int").alias("step"))
    return (
        steps.join(F.broadcast(depth_counts), F.col("depth") >= F.col("step"), "left")
        .groupBy("step")
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("users_reached"))
    )


def attribute_conversions(
    touches: DataFrame,
    conversions: DataFrame,
    model: str = "linear",
    lookback_us: int = 7 * 86_400 * 1_000_000,
    id_col: str = "user_id",
    touch_id_col: str = "event_id",
    conv_id_col: str = "event_id",
    time_col: str = "ts",
    value_cents_col=None,
) -> DataFrame:
    """Multi-touch attribution — split each conversion's value across the
    user's touchpoints in the lookback window, in EXACT integer cents.

    ``model``: ``last`` / ``first`` give the whole value to the latest /
    earliest eligible touch; ``linear`` splits by largest-remainder — each
    of n touches gets ``v div n`` and the FIRST ``v mod n`` touches (touch
    order = (ts, touch_id), a total order) get one extra cent, so credits
    sum to the conversion value exactly, per conversion, at any
    parallelism. A touch at the conversion instant is eligible; one
    ``lookback_us`` earlier is not ((conv − L, conv] — half-open like
    every window in the repo).

    Output: one row per (conversion, eligible touch):
    ``(id, conv_id, conv_t_us, touch_id, touch_t_us, n_touches,
    credit_cents)``. Conversions with NO eligible touch are absent (join
    them back for an "unattributed" report). Channel/report rollups are
    one integer groupBy over the output.

    Scale shape: ONE equi-join on the user key (both sides shuffle once)
    with the window predicate applied in the join filter, then two
    windows per (user, conversion) over the eligible rows — per-pair cost
    is the user's touch count in the window, the standard per-key
    ordered bound (sessions/asof). NTZ-safe epochs; value defaults to the
    touch-side-free constant 100 cents when ``value_cents_col`` is None.
    """
    from pyspark.sql import Window

    if model not in ("last", "first", "linear"):
        raise ValueError(f"model must be last/first/linear, got {model!r}")
    if lookback_us <= 0:
        raise ValueError(f"lookback_us must be positive, got {lookback_us}")
    t = touches.select(
        F.col(id_col).alias("id"),
        F.col(touch_id_col).alias("touch_id"),
        ntz_epoch_micros(time_col).alias("touch_t_us"),
    )
    v = (
        F.lit(100).cast("long")
        if value_cents_col is None
        else (
            F.col(value_cents_col)
            if isinstance(value_cents_col, str)
            else value_cents_col
        ).cast("long")
    )
    c = conversions.select(
        F.col(id_col).alias("id"),
        F.col(conv_id_col).alias("conv_id"),
        ntz_epoch_micros(time_col).alias("conv_t_us"),
        v.alias("_v"),
    )
    j = t.join(c, "id").where(
        (F.col("touch_t_us") > F.col("conv_t_us") - F.lit(int(lookback_us)))
        & (F.col("touch_t_us") <= F.col("conv_t_us"))
    )
    w = Window.partitionBy("id", "conv_id")
    asc = w.orderBy("touch_t_us", "touch_id")
    n = F.count(F.lit(1)).over(w)
    rn = F.row_number().over(asc)
    if model == "linear":
        # exact integer division: (v - v mod n) / n is integral, so the
        # double division is exact below 2^53 and the cast is lossless
        q = ((F.col("_v") - F.pmod(F.col("_v"), n)) / n).cast("long")
        credit = q + F.when(
            rn <= F.pmod(F.col("_v"), n), F.lit(1)
        ).otherwise(F.lit(0))
    elif model == "first":
        credit = F.when(rn == 1, F.col("_v")).otherwise(F.lit(0))
    else:  # last
        credit = F.when(rn == n, F.col("_v")).otherwise(F.lit(0))
    return j.select(
        "id", "conv_id", "conv_t_us", "touch_id", "touch_t_us",
        n.alias("n_touches"),
        credit.cast("long").alias("credit_cents"),
    )


def conversion_paths(
    touches: DataFrame,
    conversions: DataFrame,
    steps: int = 3,
    lookback_us: int = 7 * 86_400 * 1_000_000,
    id_col: str = "user_id",
    type_col: str = "event_type",
    touch_id_col: str = "event_id",
    conv_id_col: str = "event_id",
    time_col: str = "ts",
) -> DataFrame:
    """Top paths to conversion — "which touch sequences precede a
    purchase": for every conversion, the user's last ``steps`` touch
    TYPES inside the lookback window (strictly before the conversion,
    oldest→newest, joined with ``>``), counted globally:
    ``(path, n_conversions)``.

    The path is a pure function of the (ts, touch_id) total order, so
    counts are exact integers at any parallelism. Conversions with no
    eligible touch count under the empty path ``''`` (the
    "direct conversion" bucket — never silently dropped).

    Scale shape: the same one user-key equi-join as
    :func:`attribute_conversions` (lookback predicate in the join
    filter), one descending row_number window per (user, conversion) that
    caps the kept rows at ``steps`` (rank-limit pushes to
    WindowGroupLimit heaps), one per-conversion sorted fold into the path
    string, one global path groupBy — all map-side combined."""
    from pyspark.sql import Window

    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    if lookback_us <= 0:
        raise ValueError(f"lookback_us must be positive, got {lookback_us}")
    t = touches.select(
        F.col(id_col).alias("id"),
        F.col(touch_id_col).alias("touch_id"),
        F.col(type_col).alias("ttype"),
        ntz_epoch_micros(time_col).alias("touch_t_us"),
    )
    c = conversions.select(
        F.col(id_col).alias("id"),
        F.col(conv_id_col).alias("conv_id"),
        ntz_epoch_micros(time_col).alias("conv_t_us"),
    )
    j = t.join(c, "id").where(
        (F.col("touch_t_us") > F.col("conv_t_us") - F.lit(int(lookback_us)))
        & (F.col("touch_t_us") < F.col("conv_t_us"))
    )
    recent = Window.partitionBy("id", "conv_id").orderBy(
        F.col("touch_t_us").desc(), F.col("touch_id").desc()
    )
    kept = j.withColumn("_rn", F.row_number().over(recent)).where(
        F.col("_rn") <= steps
    )
    # oldest -> newest within the kept tail: fold over the ascending
    # (ts, touch_id) sort — deterministic path string
    per_conv = kept.groupBy("id", "conv_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("touch_t_us"), F.col("touch_id"), F.col("ttype")
                        )
                    )
                ),
                lambda s: s["ttype"],
            ),
        ).alias("path")
    )
    paths = c.join(per_conv, ["id", "conv_id"], "left").select(
        F.coalesce("path", F.lit("")).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_conversions"))
