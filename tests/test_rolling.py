"""Rolling stats / z-score anomalies / OHLC / truncated EWMA: hand-computed
fixtures, pandas cross-checks, planted outliers, DST-hostile session TZ,
and bit-identity across parallelism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.rolling import (
    ewma_truncated,
    ewma_weights,
    ohlc,
    rolling_stats,
    zscore_anomalies,
)


def _ts_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn("ts", F.to_timestamp_ntz(F.col("ts")))


def _series(spark, values, key="a", start="2024-01-01", step_s=60):
    t0 = pd.Timestamp(start)
    rows = [
        (key, str(t0 + pd.Timedelta(seconds=i * step_s)), float(v))
        for i, v in enumerate(values)
    ]
    return _ts_df(spark, rows)


def test_rolling_stats_matches_pandas(spark):
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 100, 60), 2)
    out = (
        rolling_stats(_series(spark, vals), "key", "ts", "value", n_preceding=9)
        .orderBy("ts")
        .collect()
    )
    s = pd.Series(vals)
    exp_mean = s.rolling(10, min_periods=1).mean()
    exp_std = s.rolling(10, min_periods=2).std()
    for i, r in enumerate(out):
        assert r["roll_n"] == min(i + 1, 10)
        assert r["roll_mean"] == pytest.approx(exp_mean[i], rel=1e-12)
        if i == 0:
            assert r["roll_std"] is None
        else:
            assert r["roll_std"] == pytest.approx(exp_std[i], rel=1e-9)


def test_zscore_flags_planted_outlier_only(spark):
    # stable baseline ~50 with two planted spikes
    vals = [50.0 + (0.5 if i % 2 else -0.5) for i in range(40)]
    vals[20] = 90.0
    vals[33] = 5.0
    out = zscore_anomalies(
        _series(spark, vals), "key", "ts", "value", n_preceding=10, threshold=3.0
    ).collect()
    flagged = sorted(r["value"] for r in out)
    assert flagged == [5.0, 90.0]
    for r in out:
        # baseline excludes the candidate: mean stays near 50 even at spikes
        assert abs(r["base_mean"] - 50.0) < 1.0
        assert abs(r["zscore"]) > 3.0


def test_zscore_min_points_and_zero_std_guard(spark):
    # constant prefix: zero std must never flag (division-free decision)
    vals = [10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 99.0]
    out = zscore_anomalies(
        _series(spark, vals), "key", "ts", "value", n_preceding=10, min_points=5
    ).collect()
    assert out == []
    # ...but one wiggle in the baseline makes the spike detectable
    vals2 = [10.0, 10.2, 10.0, 10.2, 10.0, 10.2, 99.0]
    out2 = zscore_anomalies(
        _series(spark, vals2), "key", "ts", "value", n_preceding=10, min_points=5
    ).collect()
    assert [r["value"] for r in out2] == [99.0]
    # fewer than min_points baseline rows: silent
    out3 = zscore_anomalies(
        _series(spark, vals2[:4] + [99.0]), "key", "ts", "value", n_preceding=10, min_points=5
    ).collect()
    assert out3 == []


def test_ohlc_hand_computed(spark):
    rows = [
        ("x", "2024-01-01 00:05:00", 10.0),
        ("x", "2024-01-01 00:20:00", 40.0),
        ("x", "2024-01-01 00:50:00", 25.0),
        ("x", "2024-01-01 01:10:00", 7.0),
        ("y", "2024-01-01 00:30:00", 3.0),
    ]
    out = {
        (r["key"], str(r["window_start"])): r
        for r in ohlc(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    }
    r = out[("x", "2024-01-01 00:00:00")]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_points"]) == (10.0, 40.0, 10.0, 25.0, 3)
    r = out[("x", "2024-01-01 01:00:00")]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_points"]) == (7.0, 7.0, 7.0, 7.0, 1)
    r = out[("y", "2024-01-01 00:00:00")]
    assert (r["open"], r["close"]) == (3.0, 3.0)


def test_ohlc_dst_session_tz(spark):
    rows = [
        ("d", "2024-03-10 02:10:00", 1.0),  # nonexistent EST wall hour
        ("d", "2024-03-10 02:40:00", 2.0),
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = ohlc(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert len(out) == 1
    assert str(out[0]["window_start"]) == "2024-03-10 02:00:00"
    assert (out[0]["open"], out[0]["close"]) == (1.0, 2.0)


def test_ewma_weights_literal_kernel():
    w = ewma_weights(0.2, 4)
    assert w == [10**9, 800_000_000, 640_000_000, 512_000_000]
    with pytest.raises(ValueError):
        ewma_weights(0.0, 4)
    with pytest.raises(ValueError):
        ewma_weights(0.2, 0)


def test_ewma_truncated_matches_pandas_when_kernel_covers_series(spark):
    # k >= series length -> truncation is a no-op; matches pandas
    # ewm(adjust=True) up to the 1e9 integer weight rounding
    vals = [12.5, 3.0, 44.75, 20.0, 9.25, 31.5]
    out = (
        ewma_truncated(_series(spark, vals), "key", "ts", "value", alpha=0.3, k=10)
        .orderBy("ts")
        .collect()
    )
    exp = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i, r in enumerate(out):
        assert r["ewma_n"] == i + 1
        assert r["ewma"] == pytest.approx(exp[i], rel=1e-7)


def test_ewma_truncated_kernel_cutoff(spark):
    # constant series: ewma must be exactly the constant regardless of k
    out = ewma_truncated(_series(spark, [5.0] * 8), "key", "ts", "value", alpha=0.5, k=3).collect()
    assert all(r["ewma"] == pytest.approx(5.0) for r in out)
    assert {r["ewma_n"] for r in out} == {1, 2, 3}


def test_rolling_ops_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(23)
    rows = [
        (
            f"k{i % 5}",
            str(pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(s))),
            round(float(v), 2),
        )
        for i, (s, v) in enumerate(
            zip(rng.integers(0, 86400 * 2, 2000), rng.uniform(0, 100, 2000))
        )
    ]
    # unique tiebreak: duplicate (key, ts) pairs exist in this fixture
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"]).reset_index()
    df = (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.to_timestamp_ntz(F.col("ts")))
        .withColumnRenamed("index", "rid")
    )
    for op in (
        lambda d: rolling_stats(d, "key", "ts", "value", 9, tiebreak_col="rid"),
        lambda d: zscore_anomalies(d, "key", "ts", "value", 10, 2.5, tiebreak_col="rid"),
        lambda d: ohlc(d, "key", "ts", "value", "1h", tiebreak_col="rid"),
        lambda d: ewma_truncated(d, "key", "ts", "value", 0.25, 12, tiebreak_col="rid"),
    ):
        a = op(df.repartition(2)).collect()
        b = op(df.repartition(16)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) > 0


def test_ohlc_pre_1970(spark):
    """Negative epochs get the wall-clock window, not the toward-zero one."""
    rows = [
        ("a", "1969-12-31 23:05:00", 3.0),
        ("a", "1969-12-31 23:25:00", 9.0),
        ("a", "1969-12-31 23:45:00", 5.0),
    ]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    sdf = spark.createDataFrame(pdf).withColumn("ts", F.to_timestamp_ntz("ts"))
    out = ohlc(sdf, "key", "ts", "value", "1h").collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["window_start"]) == "1969-12-31 23:00:00"
    assert (r["open"], r["high"], r["low"], r["close"]) == (3.0, 9.0, 3.0, 5.0)
