"""Seasonal baselines: stats vs pandas, hour-of-week bucketing, scoring
finds a seasonally-abnormal point a global threshold would miss."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.seasonal import (
    seasonal_baseline,
    seasonal_score,
    season_bucket,
)


@pytest.fixture(scope="module")
def seasonal_pdf():
    """Three weeks of hourly points: value = 100 at hour 3, 10 elsewhere —
    a strong daily season. One planted anomaly: week 3, hour 3 reads 10
    (normal globally, wildly low for ITS cohort)."""
    t = pd.date_range("2024-01-01", periods=21 * 24, freq="1h")  # Mon start
    rng = np.random.default_rng(9)
    vals = np.where(t.hour == 3, 100.0, 10.0) + rng.normal(0, 0.5, len(t)).round(2)
    vals = vals.round(2)
    anomaly_ts = pd.Timestamp("2024-01-15 03:00")  # a Monday, hour 3
    vals[t == anomaly_ts] = 10.0
    return pd.DataFrame({"k": "m", "ts": t, "v": vals}), anomaly_ts


def test_bucketing_is_wallclock(spark):
    pdf = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 00:00"),   # Monday
                               pd.Timestamp("2024-01-07 23:00")]})  # Sunday
    got = [r["b"] for r in spark.createDataFrame(pdf).select(
        season_bucket("ts", "hour_of_week").alias("b")).collect()]
    assert got == [0, 167]
    with pytest.raises(ValueError, match="period must be"):
        season_bucket("ts", "weekly")


def test_baseline_matches_pandas(spark, seasonal_pdf):
    pdf, _ = seasonal_pdf
    base = seasonal_baseline(
        spark.createDataFrame(pdf), "k", "ts", "v", period="hour_of_day"
    ).collect()
    got = {r["bucket"]: r for r in base}
    assert len(got) == 24
    for b in (3, 10):
        cohort = pdf[pdf.ts.dt.hour == b]["v"]
        cents = np.round(cohort * 100).astype(np.int64)
        assert got[b]["n"] == len(cohort) == 21
        assert got[b]["sum_cents"] == int(cents.sum())
        assert got[b]["mean"] == pytest.approx(cents.mean() / 100, abs=1e-9)
        assert got[b]["std"] == pytest.approx(
            np.sqrt(len(cents) * (cents**2).sum() - cents.sum() ** 2)
            / len(cents) / 100, abs=1e-9)


def test_seasonal_score_finds_cohort_anomaly(spark, seasonal_pdf):
    pdf, anomaly_ts = seasonal_pdf
    sdf = spark.createDataFrame(pdf)
    base = seasonal_baseline(sdf, "k", "ts", "v", period="hour_of_day")
    scored = seasonal_score(sdf, base, "k", "ts", "v", period="hour_of_day")
    worst = scored.orderBy("sigmas").first()
    assert worst["ts"] == anomaly_ts        # the planted point is the worst
    assert worst["sigmas"] < -4             # many cohort sigmas low
    # globally the anomaly's VALUE is typical — only the cohort sees it
    typical = pdf[(pdf.ts.dt.hour != 3)]["v"]
    assert abs(10.0 - typical.mean()) < 1.0
    # everything else is within a few sigmas
    n_big = scored.where(F.abs("sigmas") > 4).count()
    assert n_big == 1
