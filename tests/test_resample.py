"""Resample + sliding windows vs brute force and the fixed-tier path."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tstore_spark.operators.resample import resample, sliding_agg


def _events(n=4000) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    return pd.DataFrame(
        {
            "event_type": np.array(["click", "view", "error"])[i % 3],
            "ts": (
                pd.Timestamp("2024-03-01")
                + pd.to_timedelta((h % (2 * 86400)).astype(np.int64), unit="s")
            ).astype("datetime64[us]"),
            "value": np.round(((h % 100000) / 100.0), 2),
        }
    )


@pytest.fixture(scope="module")
def ev_sdf(spark):
    return spark.createDataFrame(_events()).cache()


def test_resample_matches_pandas(spark, ev_sdf):
    got = {
        (r["event_type"], r["window_start"]): (r["event_count"], r["value_sum"])
        for r in resample(ev_sdf, 900).collect()
    }
    pdf = _events()
    pdf["w"] = pdf["ts"].dt.floor("900s")
    pdf["cents"] = np.round(pdf["value"] * 100).astype(np.int64)
    want = pdf.groupby(["event_type", "w"]).agg(n=("cents", "size"), c=("cents", "sum"))
    assert len(got) == len(want)
    for (et, w), row in want.iterrows():
        n, s = got[(et, w.to_pydatetime())]
        assert n == row["n"] and s == pytest.approx(row["c"] / 100.0)


def test_resample_60s_equals_minute_trunc(spark, ev_sdf):
    a = resample(ev_sdf, 60).select("event_type", "window_start", "event_count")
    b = (
        ev_sdf.groupBy(
            "event_type", F.date_trunc("minute", "ts").alias("window_start")
        ).agg(F.count(F.lit(1)).alias("event_count"))
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sliding_matches_brute_force(spark, ev_sdf):
    w, s = 3600, 900
    got = {
        (r["event_type"], r["window_start"]): (r["event_count"], r["value_sum"])
        for r in sliding_agg(ev_sdf, w, s).collect()
    }
    pdf = _events()
    pdf["cents"] = np.round(pdf["value"] * 100).astype(np.int64)
    t_us = pdf["ts"].astype("int64")
    want: dict = {}
    for et, t, c in zip(pdf["event_type"], t_us, pdf["cents"]):
        anchor = t - t % (s * 1_000_000)
        for j in range(w // s):
            ws = anchor - j * s * 1_000_000
            k = (et, pd.Timestamp(ws, unit="us").to_pydatetime())
            n0, c0 = want.get(k, (0, 0))
            want[k] = (n0 + 1, c0 + c)
    assert len(got) == len(want)
    for k, (n, c) in want.items():
        gn, gs = got[k]
        assert gn == n and gs == pytest.approx(c / 100.0)


def test_sliding_each_event_in_k_windows(spark, ev_sdf):
    n_events = ev_sdf.count()
    total = (
        sliding_agg(ev_sdf, 3600, 900)
        .agg(F.sum("event_count").alias("t"))
        .collect()[0]["t"]
    )
    assert total == 4 * n_events


def test_guards(spark, ev_sdf):
    with pytest.raises(ValueError, match="positive"):
        resample(ev_sdf, 0)
    with pytest.raises(ValueError, match="multiple"):
        sliding_agg(ev_sdf, 3600, 1000)


def test_deterministic_across_parallelism(spark, ev_sdf):
    a = sorted(map(tuple, resample(ev_sdf, 900).collect()))
    b = sorted(map(tuple, resample(ev_sdf.repartition(13), 900).collect()))
    assert a == b


def test_resample_negative_epochs_floor(spark):
    """Pre-1970 timestamps: window start must FLOOR (sign-safe pmod), not
    round toward zero — an 1969-12-31 23:59:30 event in a 60s grid belongs
    to the 23:59:00 window, not 00:00:00."""
    pdf = pd.DataFrame(
        {
            "event_type": ["a", "a", "a"],
            "ts": pd.to_datetime(
                ["1969-12-31 23:59:30", "1969-12-31 23:58:10", "1970-01-01 00:00:30"]
            ).astype("datetime64[us]"),
            "value": [1.0, 2.0, 3.0],
        }
    )
    got = {
        str(r["window_start"]): r["event_count"]
        for r in resample(spark.createDataFrame(pdf), 60).collect()
    }
    assert got == {
        "1969-12-31 23:59:00": 1,
        "1969-12-31 23:58:00": 1,
        "1970-01-01 00:00:00": 1,
    }
    # sliding windows use the same anchor: every event lands in w/s windows
    rows = sliding_agg(spark.createDataFrame(pdf), 120, 60).collect()
    starts = {str(r["window_start"]) for r in rows}
    assert "1969-12-31 23:59:00" in starts and "1969-12-31 23:58:00" in starts
    assert sum(r["event_count"] for r in rows) == 6
