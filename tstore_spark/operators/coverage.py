"""Interval coverage — union length of overlapping intervals per key.

"How many seconds was this sensor up?" / "what fraction of the day did
sessions cover?" — the union length of possibly-overlapping [start, end)
intervals. The classic sweep line becomes three window functions
(gaps-and-islands, the same shape as operators/sessions batch mode):

1. per key, order intervals by (start, end);
2. an interval starts a NEW island iff its start exceeds the running max
   of all PRIOR ends (``max(end) over rows unbounded preceding .. 1
   preceding``) — an overlap or touch extends the island;
3. island id = running count of new-island flags; per island the covered
   length is ``max(end) − min(start)``; per key, the coverage is the sum
   of island lengths.

Exactness: all arithmetic is integer epoch seconds via wall-clock field
extraction (functions/timeparts.ntz_epoch_seconds — session-TZ-proof on
NTZ), so results are exact integers, order-independent given the sort,
and reproducible by any SQL engine with window functions.

Scale: one shuffle on the key, one ordered window pass per key — a key's
intervals must fit a task, the repo's standard ordered-window bound
(operators/rolling.py, asof.py). Zero- or negative-length intervals are
rejected loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros, ntz_epoch_seconds


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union coverage of [start, end) intervals:
    ``(key, n_intervals, n_islands, covered_seconds)``. Overlapping or
    touching intervals merge; gaps do not count."""
    s = df.select(
        F.col(key_col).alias("key"),
        ntz_epoch_seconds(start_col).alias("_s"),
        ntz_epoch_seconds(end_col).alias("_e"),
    )
    # Validity guard folded into the SAME scan: end > start is asserted
    # per-row inside the plan (a raise_error branch on _s), so a bad interval
    # fails the job at action time without a separate eager validation pass
    # over the input — at 100 TB an up-front `.count()` guard would double
    # the read. The error surfaces wrapped in Spark's job failure.
    s = s.withColumn(
        "_s",
        F.when(
            F.col("_e") <= F.col("_s"),
            F.raise_error(
                F.format_string(
                    "interval_coverage requires end > start for every row "
                    "(key=%s start_epoch=%d end_epoch=%d)",
                    F.col("key").cast("string"), F.col("_s"), F.col("_e"),
                )
            ).cast("long"),
        ).otherwise(F.col("_s")),
    )
    w = Window.partitionBy("key").orderBy("_s", "_e")
    prior_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = s.withColumn(
        "_new",
        F.when(
            prior_max_end.isNull() | (F.col("_s") > prior_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("key", "_island").agg(
        F.count(F.lit(1)).alias("_n"),
        (F.max("_e") - F.min("_s")).alias("_len"),
    )
    return islands.groupBy("key").agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("_len").alias("covered_seconds"),
    )


def interval_union(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key merged maximal islands of [start, end) intervals —
    :func:`interval_coverage`'s islands, RETURNED instead of summed:
    ``(key, island_start, island_end, n_intervals, duration_micros)``.
    Overlapping or touching intervals merge; distinct islands stay apart.

    Exactness: island detection runs on integer epoch MICROseconds from
    wall-clock field extraction (TZ-proof on NTZ); island bounds are the
    original timestamp columns' min/max (timestamp order == epoch order),
    so no epoch->timestamp reconstruction ever transits the session zone.
    Scale: one shuffle on the key + one ordered window pass, the repo's
    standard per-key ordered-window bound.
    """
    s = df.select(
        F.col(key_col).alias("key"),
        ntz_epoch_micros(start_col).alias("_s"),
        ntz_epoch_micros(end_col).alias("_e"),
        F.col(start_col).alias("_ts"),
        F.col(end_col).alias("_te"),
    )
    # in-plan validity guard riding a returned column (end > start per row)
    s = s.withColumn(
        "_s",
        F.when(
            F.col("_e") <= F.col("_s"),
            F.raise_error(
                F.format_string(
                    "interval_union requires end > start for every row "
                    "(key=%s start_us=%d end_us=%d)",
                    F.col("key").cast("string"), F.col("_s"), F.col("_e"),
                )
            ).cast("long"),
        ).otherwise(F.col("_s")),
    )
    w = Window.partitionBy("key").orderBy("_s", "_e")
    prior_max_end = F.max("_e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = s.withColumn(
        "_new",
        F.when(
            prior_max_end.isNull() | (F.col("_s") > prior_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("key", "_island")
        .agg(
            F.min("_ts").alias("island_start"),
            F.max("_te").alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
            (F.max("_e") - F.min("_s")).alias("duration_micros"),
        )
        .drop("_island")
    )


def _boundary_events(
    df: DataFrame, key_col: str, start_col: str, end_col: str, side: str
) -> DataFrame:
    """+1/-1 boundary deltas of one interval table for the two-counter
    sweep. ``side`` routes the deltas into the base (_db) or subtrahend
    (_ds) counter; the original timestamp rides each boundary so the
    output never reconstructs wall clocks from epochs."""
    db, ds = ("_db", "_ds") if side == "base" else ("_ds", "_db")
    s = df.select(
        F.col(key_col).alias("key"),
        ntz_epoch_micros(start_col).alias("_s"),
        ntz_epoch_micros(end_col).alias("_e"),
        F.col(start_col).alias("_tsx"),
        F.col(end_col).alias("_tex"),
    )
    s = s.withColumn(
        "_s",
        F.when(
            F.col("_e") <= F.col("_s"),
            F.raise_error(
                F.format_string(
                    "interval algebra requires end > start for every row "
                    "(key=%s start_us=%d end_us=%d)",
                    F.col("key").cast("string"), F.col("_s"), F.col("_e"),
                )
            ).cast("long"),
        ).otherwise(F.col("_s")),
    )
    starts = s.select(
        "key", F.col("_s").alias("_p"), F.col("_tsx").alias("_t"),
        F.lit(1).alias(db), F.lit(0).alias(ds),
    )
    ends = s.select(
        "key", F.col("_e").alias("_p"), F.col("_tex").alias("_t"),
        F.lit(-1).alias(db), F.lit(0).alias(ds),
    )
    return starts.unionByName(ends)


def interval_difference(
    base: DataFrame,
    sub: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    mode: str = "difference",
) -> DataFrame:
    """Per-key interval-set algebra via ONE boundary sweep:
    ``difference`` = parts of base's union NOT covered by sub's union (the
    downtime/SLA question: scheduled minus observed); ``intersection`` =
    parts covered by BOTH unions. Returns ``(key, part_start, part_end,
    duration_micros)`` with maximal (merged) parts.

    The sweep: every interval contributes +1/-1 boundary deltas to its
    side's counter; deltas collapse per distinct position (one groupBy),
    two running sums give each inter-boundary segment's base/sub coverage
    with exact [start, end) semantics, the mode predicate keeps segments,
    and touching kept segments merge into maximal parts (gaps-and-islands
    over the segment list). All integer epoch-micros arithmetic; part
    bounds are the ORIGINAL timestamps carried on the boundaries.

    Scale: one shuffle keys both inputs together, then two ordered window
    passes per key — per-key cost is the boundary count, never the
    pairwise interval product (an interval-overlap join would be
    quadratic in per-key density; the sweep is linear).
    """
    if mode not in ("difference", "intersection"):
        raise ValueError(f"mode must be 'difference' or 'intersection', got {mode!r}")
    ev = _boundary_events(base, key_col, start_col, end_col, "base").unionByName(
        _boundary_events(sub, key_col, start_col, end_col, "sub")
    )
    # collapse deltas per distinct position: the running sums then carry
    # exact [p, next_p) coverage — an end and a start at the same instant
    # cancel (touching = covered for base, uncovered only beyond)
    agg = ev.groupBy("key", "_p").agg(
        F.sum("_db").alias("_db"),
        F.sum("_ds").alias("_ds"),
        F.min("_t").alias("_ts"),
    )
    w = Window.partitionBy("key").orderBy("_p")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    c = (
        agg.withColumn("_b", F.sum("_db").over(run))
        .withColumn("_sc", F.sum("_ds").over(run))
        .withColumn("_np", F.lead("_p").over(w))
        .withColumn("_nt", F.lead("_ts").over(w))
    )
    keep = (F.col("_b") > 0) & (
        (F.col("_sc") == 0) if mode == "difference" else (F.col("_sc") > 0)
    )
    seg = c.where(keep & F.col("_np").isNotNull())
    prev_end = F.lag("_np").over(w)
    merged = seg.withColumn(
        "_new",
        F.when(prev_end.isNull() | (prev_end < F.col("_p")), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("_isl", F.sum("_new").over(run))
    return (
        merged.groupBy("key", "_isl")
        .agg(
            F.min("_ts").alias("part_start"),
            F.max("_nt").alias("part_end"),
            (F.max("_np") - F.min("_p")).alias("duration_micros"),
        )
        .drop("_isl")
    )


def gap_profile(
    df: DataFrame,
    key_col: str,
    time_col: str,
    step_seconds: int,
    as_of: str | None = None,
    max_age_seconds: int | None = None,
) -> DataFrame:
    """Heartbeat / staleness profile of each key's point series against a
    regular ``step_seconds`` grid — the monitoring question gap_fill
    ANSWERS BY PATCHING, reported instead: which series have holes, how
    big is the worst one, and which have gone silent (PromQL ``absent()``
    over the rollup tiers).

    Per key: ``(key, n_rows, n_windows, first_window, last_window,
    expected_windows, missing_windows, longest_gap_seconds[, age_seconds,
    stale])`` where windows are the sign-safe pmod floor of each
    observation onto the grid (pre-1970-safe), ``expected_windows`` spans
    first..last inclusive, ``longest_gap_seconds`` is the largest distance
    between CONSECUTIVE observed windows minus one step (0 when dense),
    and — when ``as_of`` (an ISO instant, parsed wall-clock via
    ``to_timestamp_ntz``) is given — ``age_seconds`` is the distance from
    the key's last raw observation and ``stale`` flags age beyond
    ``max_age_seconds`` (default: one step).

    Exactness: all integer epoch-second arithmetic on wall-clock fields
    (TZ-proof on NTZ); windows dedupe in one groupBy, the consecutive-gap
    pass is one ordered window over the DEDUPED (window-grain, not
    row-grain) series, so the per-key task is bounded by the grid size.
    """
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds}")
    if max_age_seconds is not None and as_of is None:
        raise ValueError("max_age_seconds requires as_of")
    e = ntz_epoch_seconds(time_col)
    # sign-safe grid floor: pmod keeps pre-1970 epochs on the correct side.
    # The floored TIMESTAMP rides alongside its epoch (timestampadd on NTZ
    # is wall-clock-safe; a from-epoch reconstruction would transit the
    # session zone). Two staged remainders: sub-second micros first (raw
    # timestamps carry fractions; leaving them in splits one window into
    # per-microsecond groups), then the whole-second grid remainder — both
    # int-safe quantities (< 1e6 and < step respectively).
    staged = (
        df.select(
            F.col(key_col).alias("key"), F.col(time_col).alias("_t"), e.alias("_e")
        )
        .withColumn("_us", F.pmod(ntz_epoch_micros("_t"), F.lit(1_000_000)))
        .withColumn("_rem", F.pmod(F.col("_e"), F.lit(int(step_seconds))))
    )
    per_window = (
        staged.select(
            "key",
            (F.col("_e") - F.col("_rem")).alias("_w"),
            F.expr(
                "timestampadd(SECOND, CAST(-_rem AS INT), "
                "timestampadd(MICROSECOND, CAST(-_us AS INT), _t))"
            ).alias("_wts"),
            "_e",
        )
        .groupBy("key", "_w", "_wts")
        .agg(F.count(F.lit(1)).alias("_rows"), F.max("_e").alias("_last_e"))
    )
    win = Window.partitionBy("key").orderBy("_w")
    gapped = per_window.withColumn(
        "_gap", F.col("_w") - F.lag("_w").over(win) - F.lit(int(step_seconds))
    )
    agg = gapped.groupBy("key").agg(
        F.sum("_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_windows"),
        F.min("_wts").alias("first_window"),
        F.max("_wts").alias("last_window"),
        F.min("_w").alias("_w0"),
        F.max("_w").alias("_w1"),
        F.greatest(F.max("_gap"), F.lit(0)).alias("longest_gap_seconds"),
        F.max("_last_e").alias("_last_e"),
    )
    expected = (F.col("_w1") - F.col("_w0")) / F.lit(int(step_seconds)) + F.lit(1)
    out = agg.select(
        "key",
        "n_rows",
        "n_windows",
        "first_window",
        "last_window",
        expected.cast("long").alias("expected_windows"),
        (expected.cast("long") - F.col("n_windows")).alias("missing_windows"),
        "longest_gap_seconds",
        "_last_e",
    )
    if as_of is None:
        return out.drop("_last_e")
    as_of_e = ntz_epoch_seconds(F.to_timestamp_ntz(F.lit(as_of)))
    age = (as_of_e - F.col("_last_e")).alias("age_seconds")
    bar = int(max_age_seconds if max_age_seconds is not None else step_seconds)
    return out.select(
        "key", "n_rows", "n_windows", "first_window", "last_window",
        "expected_windows", "missing_windows", "longest_gap_seconds",
        age,
        (F.col("_last_e") + F.lit(bar) < as_of_e).alias("stale"),
    )


def out_of_order_profile(
    df: DataFrame,
    key_col: str,
    order_col: str,
    time_col: str,
) -> DataFrame:
    """Event-time disorder profile — THE question a streaming pipeline must
    answer before choosing a watermark: when rows are replayed in
    ``order_col`` order (arrival/ingestion sequence), how late does event
    time arrive? Per key: ``(key, n_rows, n_late, max_lateness_us,
    sum_lateness_us)`` where a row's lateness is ``running_max(event
    time over all PRIOR arrivals) − its own event time`` (0 when time
    moved forward). ``max_lateness_us`` IS the minimal watermark that
    would have dropped nothing; ``n_late / n_rows`` is the disorder rate.

    Exact: integer epoch-micros arithmetic over one ordered window per
    key (NTZ-safe), order-independent totals — reproducible by any SQL
    engine. Callers needing a global answer re-aggregate the per-key
    integers (they sum exactly).

    Scale: one shuffle on the key + one ordered window pass — the
    standard per-key bound; at corpus scale run it on a sampled key
    subset or a bounded time slice (the answer is a tuning constant, not
    a per-row product)."""
    w = Window.partitionBy("key").orderBy("_o")
    prior_max = F.max("_t").over(w.rowsBetween(Window.unboundedPreceding, -1))
    s = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("_o"),
        ntz_epoch_micros(time_col).alias("_t"),
    ).withColumn(
        "_late", F.greatest(prior_max - F.col("_t"), F.lit(0))
    )
    return s.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("_late") > 0).cast("long")).alias("n_late"),
        F.max("_late").alias("max_lateness_us"),
        F.sum("_late").alias("sum_lateness_us"),
    )
