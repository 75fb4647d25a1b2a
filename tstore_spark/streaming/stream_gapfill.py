"""Streaming gap-fill: synthesize + interpolate missing windows as they close.

Batch :mod:`tstore_spark.operators.gapfill` answers "which windows are
missing" over a finished tier; this module answers it CONTINUOUSLY: as the
watermark closes tier windows, any grid window strictly between two closed
real windows of the same key is emitted as a synthesized row (zero-filled
counts, linearly interpolated metrics) in the same micro-batch that closed
its right-hand bracket. Spark has no native streaming operator that emits
rows for ABSENT input, so the construction is the standard
``foreachBatch`` + tiny keyed state pattern (the same shape as
:mod:`stream_merge`'s CDC apply):

* the tier stream (e.g. :func:`stream_rollup.stream_rollup_cascade`) emits
  each closed real window exactly once (append mode + watermark);
* per micro-batch, the filler joins the batch's closed rows with a
  one-row-per-key state (the key's last closed real window + its metric
  values), computes the per-key gaps with ``lag`` + ``sequence``/``explode``
  (pure codegen — no Python), interpolates metric columns with the batch
  module's exact formula (``prev + (next - prev) * (t - prev_t) /
  (next_t - prev_t)`` — same op order, bit-identical), and appends
  real + synthesized rows to the sink;
* idempotence: each batch writes its output under ``batch_id=<id>``
  (overwrite — a replayed batch rewrites the same files) and the state is
  VERSIONED by batch id (batch N reads state ``v<N-1>``), so a
  crash-replay recomputes byte-identical output instead of duplicating.

A gap row is emitted only when BOTH brackets are closed (linear
interpolation needs its right neighbor), so a key whose source goes quiet
holds its tail gap until the next real window arrives — exactly the batch
semantics, where the per-key grid ends at the last real window.

Scale notes (100 TB): state is one row per KEY (not per window); the gap
explode is bounded by the grid length between consecutive real windows;
everything in the batch function is Catalyst expressions over the
micro-batch — no collect, no per-row Python.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.operators.gapfill import TIER_INTERVAL


def _interval(tier: str):
    d, h, m, s = TIER_INTERVAL[tier]
    return F.make_dt_interval(F.lit(d), F.lit(h), F.lit(m), F.lit(s))


def incremental_gap_rows(
    closed: DataFrame,
    state: DataFrame | None,
    tier: str,
    key: str = "domain",
    time_col: str = "window_start",
    zero_fill: list[str] | None = None,
    interp_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of the filler: ``(gap_rows, new_state)``.

    ``closed``: this batch's newly closed REAL tier rows. ``state``: one row
    per key — the key's last previously-closed real row (``None`` on the
    first batch) with columns ``(key, time_col, *interp_cols)``.

    Gap rows carry the ``closed`` schema plus ``gap_filled=true``:
    ``zero_fill`` columns 0, ``interp_cols`` linearly interpolated between
    the bracketing real rows (the batch module's exact expression), every
    other metric column NULL. Rows at or before the key's state window are
    ignored (a replayed/late window was already processed).
    """
    zero_fill = list(zero_fill or [])
    interp_cols = list(interp_cols or [])
    unknown = [c for c in (*zero_fill, *interp_cols) if c not in closed.columns]
    if unknown:
        # a typo'd metric name must not silently degrade to NULL-fill
        raise ValueError(
            f"zero_fill/interp_cols name columns absent from the batch "
            f"schema: {unknown} (have: {closed.columns})"
        )

    slim = [key, time_col, *interp_cols]
    pool = closed.select(*slim)
    if state is not None:
        # drop rows at or before the key's state window (the docstring
        # contract): tumbling windows close in per-key time order under a
        # monotone watermark, but a defensive filter keeps a replayed or
        # out-of-contract row from re-emitting gaps over processed ranges
        st = state.select(
            F.col(key).alias("__sk"), F.col(time_col).alias("__st")
        )
        pool = (
            pool.join(st, pool[key] == st["__sk"], "left")
            .where(F.col("__st").isNull() | (F.col(time_col) > F.col("__st")))
            .select(*slim)
        )
        pool = state.select(*slim).unionByName(pool)

    t_type = dict(closed.dtypes).get(time_col, "timestamp")
    if t_type == "timestamp_ntz":
        from tstore_spark.functions.timeparts import ntz_epoch_seconds

        def epoch(c):
            return ntz_epoch_seconds(c)
    else:
        def epoch(c):
            return (F.col(c) if isinstance(c, str) else c).cast("long")

    w = Window.partitionBy(key).orderBy(time_col)
    lagged = pool.select(
        F.col(key),
        F.col(time_col),
        *[F.col(c) for c in interp_cols],
        F.lag(time_col).over(w).alias("_pt"),
        *[F.lag(c).over(w).alias(f"_pv_{c}") for c in interp_cols],
    ).where(
        F.col("_pt").isNotNull()
        & (F.col(time_col) > F.col("_pt") + _interval(tier))
    )
    # one grid timestamp per missing window strictly inside (prev, this)
    gaps = lagged.select(
        F.col(key),
        F.col(time_col).alias("_nt"),
        F.col("_pt"),
        *[F.col(f"_pv_{c}") for c in interp_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in interp_cols],
        F.explode(
            F.sequence(
                (F.col("_pt") + _interval(tier)).cast(t_type),
                (F.col(time_col) - _interval(tier)).cast(t_type),
                _interval(tier),
            )
        ).alias("_gt"),
    )
    t, pt, nt = epoch("_gt"), epoch("_pt"), epoch("_nt")
    cols = [F.col(key), F.col("_gt").cast(t_type).alias(time_col)]
    for c in closed.columns:
        if c in (key, time_col):
            continue
        if c in interp_cols:
            pv, nv = F.col(f"_pv_{c}"), F.col(f"_nv_{c}")
            # EXACTLY the batch formula (gapfill.py): mult before divide,
            # left-assoc — bit-identical interpolated doubles
            cols.append(
                F.when(
                    pv.isNotNull() & nv.isNotNull(),
                    pv + (nv - pv) * (t - pt) / (nt - pt),
                ).otherwise(F.coalesce(pv, nv)).alias(c)
            )
        elif c in zero_fill:
            cols.append(F.lit(0).cast(dict(closed.dtypes)[c]).alias(c))
        else:
            cols.append(F.lit(None).cast(dict(closed.dtypes)[c]).alias(c))
    gap_rows = gaps.select(*cols).withColumn("gap_filled", F.lit(True))

    # new state: each key's newest real row across old state + this batch
    sw = Window.partitionBy(key).orderBy(F.col(time_col).desc())
    new_state = (
        pool.withColumn("_rn", F.row_number().over(sw))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return gap_rows, new_state


def stream_gap_fill(
    tier_stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    state_dir: str,
    tier: str = "1h",
    key: str = "domain",
    time_col: str = "window_start",
    zero_fill: list[str] | None = None,
    interp_cols: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Start the grid-completing sink over a closed-window tier stream.

    Returns the StreamingQuery. The sink at ``out_dir`` holds real rows
    (``gap_filled=false``) plus synthesized rows, partitioned by
    ``batch_id`` (drop that column on read; replays overwrite it). Keyed
    state lives under ``state_dir/v<batch_id>`` — batch N deterministically
    reads ``v<N-1>``, so a restart replays into identical bytes.
    """

    def fill_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = os.path.join(state_dir, f"v{batch_id - 1}")
        state = None
        if batch_id > 0:
            if not os.path.exists(os.path.join(prev, "_SUCCESS")):
                # The contract only ever needs v<N-1>: batch N's own prune
                # keeps versions >= N-1, so a crash-replay of N always finds
                # it. Falling back to an OLDER version would pair stale state
                # with batch-N rows and synthesize gap rows over windows that
                # earlier batches already wrote as REAL rows — fail loudly
                # instead of emitting silent duplicates.
                raise RuntimeError(
                    f"stream_gap_fill state v{batch_id - 1} missing under "
                    f"{state_dir}; refusing to replay batch {batch_id} with "
                    "stale state (would duplicate already-emitted windows)"
                )
            state = spark.read.parquet(prev)

        gap_rows, new_state = incremental_gap_rows(
            batch_df, state, tier, key, time_col, zero_fill, interp_cols
        )
        out = batch_df.withColumn("gap_filled", F.lit(False)).unionByName(gap_rows)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        new_state.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        # prune state versions older than the previous one (crash-replay of
        # batch N only ever needs v<N-1>)
        for d in os.listdir(state_dir):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id - 1:
                shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)

    writer = tier_stream.writeStream.foreachBatch(fill_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_filled(spark, out_dir: str) -> DataFrame:
    """The sink as one DataFrame, ``batch_id`` partition column dropped."""
    return spark.read.parquet(out_dir).drop("batch_id")
