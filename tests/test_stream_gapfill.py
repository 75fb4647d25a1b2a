"""Streaming gap-fill: closed-window grid completion + interpolation must
match the batch gap_fill on the same closed windows, bit for bit."""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.gapfill import gap_fill
from tstore_spark.streaming.stream_gapfill import (
    incremental_gap_rows,
    read_filled,
    stream_gap_fill,
)


def _sparse_events(spark):
    """Hourly-value events with deterministic missing hours per key.

    key A: hours 0,1,4,5,9 present (gaps 2-3 and 6-8);
    key B: hours 0,3 present (gap 1-2); hour 10 on key A closes everything
    up to hour 9 under a 0s watermark (the max event time).
    """
    rows = []
    for k, hours in (("A", [0, 1, 4, 5, 9, 10]), ("B", [0, 3])):
        for h in hours:
            # two events per present hour -> doc_count 2, metric = 10h + ord
            for j in range(2):
                rows.append(
                    {
                        "key": k,
                        "ts": pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h, minutes=j),
                        "v": float(10 * h + j),
                    }
                )
    pdf = pd.DataFrame(rows).astype({"ts": "datetime64[us]"})
    return spark.createDataFrame(pdf)


def _hour_tier(df):
    return df.groupBy(
        "key", F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum("v").cast("double").alias("metric"),
    )


def test_incremental_matches_batch_across_batch_splits(spark):
    """Feed the closed tier rows in several arbitrary batch splits; the
    accumulated (real + gap) rows must equal batch gap_fill with
    interpolation, including the interpolated doubles bit-for-bit."""
    tier = _hour_tier(_sparse_events(spark)).cache()
    rows = tier.orderBy("window_start", "key").collect()

    expected = gap_fill(
        tier,
        "1h",
        key="key",
        zero_fill=["doc_count"],
        interp_cols=["metric"],
        array_fill={},
        presence_col="doc_count",
    ).select("key", "window_start", "doc_count", "metric", "gap_filled")

    # replay the closed rows in window order, split into 3 uneven batches
    splits = [rows[:3], rows[3:4], rows[4:]]
    state = None
    got_parts = []
    for chunk in splits:
        if not chunk:
            continue
        batch = spark.createDataFrame(chunk, tier.schema)
        gaps, state = incremental_gap_rows(
            batch, state, "1h", key="key",
            zero_fill=["doc_count"], interp_cols=["metric"],
        )
        got_parts.append(batch.withColumn("gap_filled", F.lit(False)).unionByName(gaps))
    got = got_parts[0]
    for p in got_parts[1:]:
        got = got.unionByName(p)

    exp = {(r["key"], r["window_start"], r["doc_count"], r["metric"], r["gap_filled"])
           for r in expected.collect()}
    act = {(r["key"], r["window_start"], r["doc_count"], r["metric"], r["gap_filled"])
           for r in got.collect()}
    assert act == exp
    # sanity: gaps actually exist and interpolation actually ran
    n_gaps = sum(1 for t in exp if t[4])
    assert n_gaps == 7  # A: 2,3,6,7,8  B: 1,2
    interp_vals = {t[3] for t in exp if t[4]}
    assert all(v is not None for v in interp_vals)


def test_stream_gap_fill_end_to_end(spark):
    """File-replayed tier stream through stream_gap_fill: the sink equals
    the batch gap_fill over the same closed windows; a restart (fresh
    checkpoint replay into the same sink) is byte-identical, not
    duplicating."""
    base = tempfile.mkdtemp(prefix="ts_sgf_")
    try:
        ev = _sparse_events(spark)
        # instant-typed events for the watermark, NTZ wall-clock bridge
        from tstore_spark.functions.timeparts import ntz_epoch_seconds

        src_df = ev.select(
            "key",
            F.timestamp_seconds(ntz_epoch_seconds(F.col("ts").cast("timestamp_ntz"))).alias("ts"),
            "v",
        )
        # time-ordered replay files: a 0s watermark drops any window whose
        # rows arrive after the watermark passed its end, so randomly-split
        # files would drop most of the input. One file per hour range,
        # written with strictly increasing mtime (the file source replays
        # oldest-first).
        import glob as _glob
        import os as _os

        _os.makedirs(f"{base}/src")
        slices = [(0, 2), (3, 5), (6, 8), (9, 10)]
        for i, (lo, hi) in enumerate(slices):
            part = src_df.where(
                (F.hour("ts") >= lo) & (F.hour("ts") <= hi)
            ).coalesce(1)
            part.write.mode("overwrite").parquet(f"{base}/slice_{i}")
            src_file = _glob.glob(f"{base}/slice_{i}/part-*.parquet")[0]
            dst = f"{base}/src/slice_{i}.parquet"
            _os.rename(src_file, dst)
            _os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        stream = (
            spark.readStream.schema(src_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/src")
        )
        tier_stream = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"), "key")
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.sum("v").cast("double").alias("metric"),
            )
            .select(
                "key",
                F.col("window.start").alias("window_start"),
                "doc_count",
                "metric",
            )
        )
        q = stream_gap_fill(
            tier_stream,
            out_dir=f"{base}/out",
            checkpoint=f"{base}/ckpt",
            state_dir=f"{base}/state",
            tier="1h",
            key="key",
            zero_fill=["doc_count"],
            interp_cols=["metric"],
        )
        q.awaitTermination(120)

        got = read_filled(spark, f"{base}/out").withColumn(
            "window_start",
            F.expr(
                "timestampadd(SECOND, unix_seconds(window_start),"
                " to_timestamp_ntz('1970-01-01'))"
            ),
        )

        # closed windows under a 0s watermark: window end <= max event time
        max_ts = ev.agg(F.max(F.col("ts").cast("timestamp_ntz"))).head()[0]
        tier = _hour_tier(_sparse_events(spark)).where(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts)
        )
        expected = gap_fill(
            tier, "1h", key="key",
            zero_fill=["doc_count"], interp_cols=["metric"], array_fill={},
            presence_col="doc_count",
        ).select("key", "window_start", "doc_count", "metric", "gap_filled")

        key = lambda r: (r["key"], r["window_start"], r["doc_count"], r["metric"], r["gap_filled"])
        exp = sorted(map(key, expected.collect()))
        act = sorted(map(key, got.select(*expected.columns).collect()))
        assert act == exp
        assert any(r[4] for r in act), "no gap rows emitted"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_late_or_replayed_rows_are_ignored(spark):
    """A closed row at or before the key's state window must not re-emit
    gaps over already-processed ranges (the incremental contract)."""
    tier = _hour_tier(_sparse_events(spark))
    rows = sorted(tier.collect(), key=lambda r: (r["window_start"], r["key"]))
    first = spark.createDataFrame(rows, tier.schema)
    gaps1, state = incremental_gap_rows(
        first, None, "1h", key="key",
        zero_fill=["doc_count"], interp_cols=["metric"],
    )
    n1 = gaps1.count()
    # replay the ENTIRE first batch against the final state: everything is
    # at-or-before the state window -> zero new gap rows, state unchanged
    gaps2, state2 = incremental_gap_rows(
        first, state, "1h", key="key",
        zero_fill=["doc_count"], interp_cols=["metric"],
    )
    assert n1 == 7 and gaps2.count() == 0
    s1 = {(r["key"], r["window_start"]) for r in state.collect()}
    s2 = {(r["key"], r["window_start"]) for r in state2.collect()}
    assert s1 == s2


def test_incremental_gap_rows_unknown_columns_raise(spark):
    """Round 5 (ADVICE): a typo'd zero_fill/interp_cols name must raise, not
    silently degrade to NULL-fill."""
    import pytest
    from datetime import datetime

    batch = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0), 1, 1.0)],
        "key string, window_start timestamp, doc_count long, metric double",
    )
    with pytest.raises(ValueError, match="metricc"):
        incremental_gap_rows(batch, None, "1h", key="key",
                             interp_cols=["metricc"])
    with pytest.raises(ValueError, match="doc_cnt"):
        incremental_gap_rows(batch, None, "1h", key="key",
                             zero_fill=["doc_cnt"])
