"""Stateful streaming sessionization vs a straight-line oracle."""

import shutil
import tempfile

import pandas as pd
import pytest

from tstore_spark.streaming.sessions import sessionize


def _events() -> pd.DataFrame:
    rows = []
    # key "a": three sessions (gaps of 2h between them), 10-min event spacing
    for day_h, n in ((0, 3), (5, 4), (10, 2)):
        for i in range(n):
            rows.append(("a", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=day_h, minutes=10 * i)))
    # key "b": one long session then one trailing event far later
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


def test_sessionize_matches_oracle(spark):
    base = tempfile.mkdtemp(prefix="ts_sess_")
    try:
        pdf = _events()
        sdf = spark.createDataFrame(pdf)
        sdf.repartition(2).write.parquet(f"{base}/src")
        stream = spark.readStream.schema(sdf.schema).parquet(f"{base}/src")
        sessions = sessionize(stream, "key", "ts", gap_seconds=3600)
        q = (
            sessions.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(f"{base}/out").collect()
        )
        expect = _oracle_sessions(pdf, 3600)
        # the per-key final session can only close via watermark timeout; the
        # global max event time is b@23:00, so every session ending more than
        # gap before that is emitted — all but b's trailing singleton
        emitted = [s for s in expect if (pdf["ts"].max() - s[2]).total_seconds() > 3600]
        assert got == sorted(emitted)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_sessionize_native_matches_oracle_and_custom(spark):
    """The session_window-based variant: same sessions as the oracle for
    every watermark-closed window (append emits when watermark >= last+gap),
    and identical output schema to the custom stateful operator."""
    from tstore_spark.streaming.sessions import sessionize_native

    base = tempfile.mkdtemp(prefix="ts_sessn_")
    try:
        pdf = _events()
        sdf = spark.createDataFrame(pdf)
        sdf.repartition(2).write.parquet(f"{base}/src")
        stream = spark.readStream.schema(sdf.schema).parquet(f"{base}/src")
        sessions = sessionize_native(stream, "key", "ts", gap_seconds=3600)
        q = (
            sessions.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(f"{base}/out").collect()
        )
        expect = _oracle_sessions(pdf, 3600)
        closed = [s for s in expect
                  if (pdf["ts"].max() - s[2]).total_seconds() >= 3600]
        assert got == sorted(closed) and len(got) > 0

        # batch mode: no watermark gate, EVERY session present
        batch = sessionize_native(spark.createDataFrame(pdf), "key", "ts", gap_seconds=3600)
        got_b = sorted(
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in batch.collect()
        )
        assert got_b == sorted(expect)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_sessionize_out_of_order_within_watermark(spark):
    """A late-but-within-watermark event that sorts BEFORE the session state
    must extend the session bounds monotonically (min start / max end). The
    old merge overwrote last_ts backwards: the session was split in two and
    one emitted row had session_end < session_start."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tempfile.mkdtemp(prefix="ts_sess_ooo_")
    try:
        src = f"{base}/src"
        os.makedirs(src)
        batches = [
            [("a", "2024-01-01 10:00:00")],
            [("a", "2024-01-01 09:59:30")],   # late, within the 10m watermark
            [("a", "2024-01-01 10:00:50")],   # 80s after the REGRESSED last_ts
            [("z", "2024-01-01 11:00:00")],   # advances the watermark
            [("z", "2024-01-01 11:00:01")],   # one more batch: timeout fires
        ]
        schema = pa.schema([("key", pa.string()), ("ts", pa.timestamp("us"))])
        for i, rows in enumerate(batches):
            tbl = pa.table(
                {
                    "key": [k for k, _ in rows],
                    "ts": [pd.Timestamp(t) for _, t in rows],
                },
                schema=schema,
            )
            pq.write_table(tbl, f"{src}/b{i}.parquet")
            time.sleep(1.05)  # distinct mtimes: one file per micro-batch, in order

        spark_schema = spark.createDataFrame(
            pd.DataFrame({"key": ["x"], "ts": [pd.Timestamp("2024-01-01")]})
        ).schema
        stream = spark.readStream.schema(spark_schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        sessions = sessionize(stream, "key", "ts", gap_seconds=60, watermark="10 minutes")
        q = (
            sessions.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            (r["key"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in spark.read.parquet(f"{base}/out").collect()
            if r["key"] == "a"
        )
        assert got == [("a", "2024-01-01 09:59:30", "2024-01-01 10:00:50", 3)], got
    finally:
        shutil.rmtree(base, ignore_errors=True)
