"""Streaming observability: observed metrics == batch truth, progress
parsing, watermark monotonicity."""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.streaming.monitor import (
    assert_watermark_monotone,
    observe_event_time,
    progress_report,
)


def test_observe_on_batch_matches_truth(spark):
    from pyspark.sql import Observation

    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-02-01", periods=100, freq="min"),
        "v": range(100),
    }).astype({"ts": "datetime64[us]"})
    obs = Observation("batch_truth")
    df = observe_event_time(spark.createDataFrame(pdf), "ts", name=obs)
    assert df.count() == 100  # the action that fires the observation
    got = obs.get
    t0 = pd.Timestamp("2024-02-01")
    us = lambda t: (t - pd.Timestamp("1970-01-01")) // pd.Timedelta(microseconds=1)
    assert got["rows"] == 100
    assert got["et_min_us"] == us(t0)
    assert got["et_max_us"] == us(t0 + pd.Timedelta(minutes=99))


def test_progress_report_and_watermark(spark):
    base = tempfile.mkdtemp(prefix="ts_monitor_")
    try:
        pdf = pd.DataFrame({
            "ts": pd.date_range("2024-02-01", periods=240, freq="min"),
            "v": [float(i) for i in range(240)],
        }).astype({"ts": "datetime64[us]"})
        src = f"{base}/src"
        sdf = spark.createDataFrame(pdf)
        sdf.repartition(4).write.parquet(src)

        stream = (
            spark.readStream.schema(sdf.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream = stream.withColumn(
            "ts_z",
            F.timestamp_seconds(
                F.col("ts").cast("string").cast("timestamp").cast("long")
            ),
        )
        agg = (
            observe_event_time(stream, "ts")
            .withWatermark("ts_z", "10 minutes")
            .groupBy(F.window("ts_z", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rep = progress_report(q)
        assert rep, "no progress entries"
        # observed rows across batches == input rows
        obs_total = sum(r.get("obs_rows") or 0 for r in rep)
        assert obs_total == 240
        # event-time envelope sane and in micros
        mins = [r["et_min_us"] for r in rep if r.get("et_min_us") is not None]
        t0_us = (pd.Timestamp("2024-02-01") - pd.Timestamp("1970-01-01")) \
            // pd.Timedelta(microseconds=1)
        assert min(mins) == t0_us
        # watermark advances monotonically across batches
        assert_watermark_monotone(rep)
        assert any(r.get("watermark_us") for r in rep)
        # a regression is detected
        bad = [{"batch_id": 0, "watermark_us": 100},
               {"batch_id": 1, "watermark_us": 50}]
        with pytest.raises(AssertionError, match="regressed"):
            assert_watermark_monotone(bad)
    finally:
        shutil.rmtree(base, ignore_errors=True)
