"""Batch sessionization: oracle equality + batch==streaming semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.sessions import session_stats, sessionize


def _events() -> pd.DataFrame:
    rows = []
    for day_h, n in ((0, 3), (5, 4), (10, 2)):
        for i in range(n):
            rows.append(("a", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=day_h, minutes=10 * i)))
    for i in range(5):
        rows.append(("b", pd.Timestamp("2024-01-01 01:00") + pd.Timedelta(minutes=20 * i)))
    rows.append(("b", pd.Timestamp("2024-01-01 23:00")))
    return pd.DataFrame(rows, columns=["key", "ts"]).astype({"ts": "datetime64[us]"})


def _oracle_sessions(pdf: pd.DataFrame, gap_s: int):
    out = []
    for k, grp in pdf.groupby("key"):
        ts = sorted(grp["ts"])
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if (t - last).total_seconds() > gap_s:
                out.append((k, start, last, n))
                start, n = t, 0
            last, n = t, n + 1
        out.append((k, start, last, n))
    return sorted(out)


@pytest.fixture(scope="module")
def events_sdf(spark):
    return spark.createDataFrame(_events())


def test_session_stats_matches_oracle(events_sdf):
    got = sorted(
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_stats(events_sdf, key="key", time_col="ts", gap="30 minutes").collect()
    )
    assert got == _oracle_sessions(_events(), 30 * 60)


def test_sessionize_ids_deterministic(events_sdf):
    a = sorted(map(tuple, sessionize(events_sdf, key="key", time_col="ts").collect()))
    b = sorted(map(tuple, sessionize(events_sdf.repartition(7), key="key", time_col="ts").collect()))
    assert a == b
    # session ids are 1-based consecutive per key
    s = sessionize(events_sdf, key="key", time_col="ts", gap="30 minutes")
    per_key = {
        r["key"]: r["m"]
        for r in s.groupBy("key").agg(F.max("session_id").alias("m")).collect()
    }
    assert per_key == {"a": 3, "b": 2}


def test_batch_matches_streaming_sessions(spark, events_sdf):
    """The batch operator and the stateful streaming operator implement the
    same session semantics — run the streaming one on the same (bounded)
    input and compare closed sessions."""
    import shutil
    import tempfile

    from tstore_spark.streaming.sessions import sessionize as stream_sessionize

    base = tempfile.mkdtemp(prefix="ts_sessb_")
    try:
        # micro-batches must respect event-time order (the streaming operator
        # runs with a 0s watermark): one file per time half, written early
        # half first so the file source picks them up in order
        src = f"{base}/src"
        split_at = "2024-01-01 06:00:00"
        events_sdf.where(F.col("ts") < split_at).coalesce(1).write.mode("append").parquet(src)
        events_sdf.where(F.col("ts") >= split_at).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(events_sdf.schema).option("maxFilesPerTrigger", 1).parquet(src)
        out = stream_sessionize(stream, key_col="key", time_col="ts", gap_seconds=1800)
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.read.parquet(f"{base}/out")
        s_rows = sorted(
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in streamed.collect()
        )
        b_rows = sorted(
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in session_stats(events_sdf, key="key", time_col="ts", gap="30 minutes").collect()
        )
        # streaming emits CLOSED sessions (event-time timeout); on a bounded
        # availableNow run the final open session per key may be unflushed —
        # every streamed session must appear in batch, covering all but at
        # most one trailing session per key
        assert set(s_rows) <= set(b_rows)
        assert len(s_rows) >= len(b_rows) - streamed.select("key").distinct().count() - 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
