"""Seasonal profile / deseasonalization: exact state + fixed derivations."""

import pandas as pd
import pytest

from tstore_spark.operators.seasonal import deseasonalize, seasonal_profile


def _series(spark):
    # key A: pure hour-of-day shape (value = 10 + hour), 4 full days
    rows = []
    for d in range(4):
        for h in range(24):
            ts = pd.Timestamp("2024-03-04") + pd.Timedelta(days=d, hours=h)
            rows.append(("A", ts, 10.0 + h))
    # key B: flat
    for d in range(2):
        for h in range(24):
            ts = pd.Timestamp("2024-03-04") + pd.Timedelta(days=d, hours=h)
            rows.append(("B", ts, 5.0))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "value"]))


def test_profile_matches_pandas_reference(spark):
    got = {
        (r["key"], r["phase"]): (r["n_p"], r["s_p"], r["offset"], r["ratio"])
        for r in seasonal_profile(_series(spark), "key", "ts", "value").collect()
    }
    # key A: each hour h appears 4x with value 10+h; total mean = 10+11.5
    for h in range(24):
        n_p, s_p, offset, ratio = got[("A", h)]
        assert (n_p, s_p) == (4, 4 * round((10.0 + h) * 100))
        assert offset == pytest.approx((10.0 + h) - 21.5, abs=1e-12)
        assert ratio == pytest.approx((10.0 + h) / 21.5, rel=1e-12)
    # key B: flat -> every offset exactly 0.0, ratio exactly 1.0
    for h in range(24):
        _, _, offset, ratio = got[("B", h)]
        assert offset == 0.0 and ratio == 1.0


def test_dow_phase_and_guard(spark):
    df = _series(spark)
    got = {
        (r["key"], r["phase"]): r["n_p"]
        for r in seasonal_profile(df, "key", "ts", "value", phase="dow").collect()
    }
    # 2024-03-04 is a Monday: key A covers Mon..Thu (weekday 0..3), 24 each
    assert {p for (k, p) in got if k == "A"} == {0, 1, 2, 3}
    assert all(v == 24 for (k, _p), v in got.items() if k == "A")
    with pytest.raises(ValueError, match="phase"):
        seasonal_profile(df, "key", "ts", "value", phase="month")


def test_deseasonalize_flattens_pure_seasonal_series(spark):
    df = _series(spark)
    out = deseasonalize(df, "key", "ts", "value").collect()
    for r in out:
        want = 21.5 if r["key"] == "A" else 5.0  # residual = the key mean
        assert r["value_adj"] == pytest.approx(want, abs=1e-9)


def test_deseasonalize_with_train_profile_and_unseen_phase(spark):
    train = _series(spark)
    prof = seasonal_profile(train, "key", "ts", "value")
    score = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["A", "C"],
                "ts": pd.to_datetime(["2024-03-10 05:00:00", "2024-03-10 05:00:00"]),
                "value": [20.0, 9.0],
            }
        )
    )
    got = {r["key"]: r["value_adj"] for r in deseasonalize(
        score, "key", "ts", "value", profile=prof).collect()}
    assert got["A"] == pytest.approx(20.0 - (15.0 - 21.5), abs=1e-9)
    assert got["C"] is None  # unseen key -> NULL, not a silent passthrough


def test_profile_deterministic_across_parallelism(spark):
    df = _series(spark)

    def run(parts):
        return sorted(
            tuple(r)
            for r in seasonal_profile(
                df.repartition(parts), "key", "ts", "value"
            ).collect()
        )

    assert run(1) == run(16)

# ---------------------------------------------------------------------------
# seasonal_baseline / seasonal_score (cohort sigmas)
# ---------------------------------------------------------------------------


def test_seasonal_baseline_exact_state_and_derivations(spark):
    from tstore_spark.operators.seasonal import seasonal_baseline

    got = {
        (r["key"], r["bucket"]): (r["n"], r["sum_cents"], r["sumsq_cents"],
                                  r["mean"], r["std"])
        for r in seasonal_baseline(
            _series(spark), "key", "ts", "value", period="hour_of_day"
        ).collect()
    }
    # key A, hour h: 4 samples of 10+h exactly
    for h in range(24):
        c = round((10.0 + h) * 100)
        n, s, sq, mean, std = got[("A", h)]
        assert (n, s, sq) == (4, 4 * c, 4 * c * c)
        assert mean == pytest.approx(10.0 + h, abs=1e-12)
        assert std == 0.0  # constant cohort -> exactly zero
    # hour_of_week buckets: Monday 00:00 of 2024-03-04 -> bucket 0
    how = {
        (r["key"], r["bucket"]): r["n"]
        for r in seasonal_baseline(_series(spark), "key", "ts", "value").collect()
    }
    assert how[("A", 0)] == 1 and how[("A", 95)] == 1  # Thu 23:00 = 3*24+23
    assert ("A", 96) not in how  # only 4 days of data
    with pytest.raises(ValueError, match="period"):
        seasonal_baseline(_series(spark), "key", "ts", "value", period="minute")


def test_seasonal_score_sigmas_and_min_n_guard(spark):
    import pyspark.sql.functions as F

    from tstore_spark.operators.seasonal import seasonal_baseline, seasonal_score

    # cohort with spread: hour 5 on four days gets values 8, 10, 12, 10
    rows = []
    for d, v in zip(range(4), [8.0, 10.0, 12.0, 10.0]):
        rows.append(("A", pd.Timestamp("2024-03-04") + pd.Timedelta(days=d, hours=5), v))
    # a thin cohort (hour 6, one sample) must score NULL under min_n=3
    rows.append(("A", pd.Timestamp("2024-03-04 06:00:00"), 99.0))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "value"]))
    base = seasonal_baseline(df, "key", "ts", "value", period="hour_of_day")
    out = seasonal_score(df, base, "key", "ts", "value",
                         period="hour_of_day", min_n=3).collect()
    by_ts = {r["ts"]: r for r in out}
    # mean 10, population std = sqrt(2): sigmas for 12.0 = 2/sqrt(2) = sqrt(2)
    r12 = by_ts[pd.Timestamp("2024-03-06 05:00:00")]
    assert r12["sigmas"] == pytest.approx(2.0 ** 0.5, rel=1e-12)
    r8 = by_ts[pd.Timestamp("2024-03-04 05:00:00")]
    assert r8["sigmas"] == pytest.approx(-(2.0 ** 0.5), rel=1e-12)
    # thin cohort: baseline filtered out -> NULL mean/std/sigmas
    r99 = by_ts[pd.Timestamp("2024-03-04 06:00:00")]
    assert r99["sigmas"] is None and r99["mean"] is None


def test_seasonal_score_flat_cohort_yields_null_not_inf(spark):
    from tstore_spark.operators.seasonal import seasonal_baseline, seasonal_score

    df = _series(spark)  # key B is perfectly flat -> std 0 everywhere
    base = seasonal_baseline(df, "key", "ts", "value", period="hour_of_day")
    scored = seasonal_score(df, base, "key", "ts", "value", period="hour_of_day")
    vals = [r["sigmas"] for r in scored.where("key = 'B'").collect()]
    assert vals and all(v is None for v in vals)


def test_seasonal_score_isolates_cohort_abnormal_point(spark):
    """A point that is NORMAL globally but abnormal for ITS cohort: nightly
    traffic ~2, daytime ~50; a 3am reading of 20 sits well inside the global
    range yet scores >4 cohort sigmas."""
    import numpy as np

    from tstore_spark.operators.seasonal import seasonal_baseline, seasonal_score

    rng = np.random.default_rng(7)
    rows = []
    for d in range(14):
        for h in range(24):
            ts = pd.Timestamp("2024-03-04") + pd.Timedelta(days=d, hours=h)
            base = 2.0 if h < 6 else 50.0
            rows.append(("traffic", ts, base + float(rng.integers(0, 3))))
    anomaly_ts = pd.Timestamp("2024-03-18 03:00:00")
    rows.append(("traffic", anomaly_ts, 20.0))  # globally mid-range
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "value"]))
    # train on the 14 clean days, score everything (the production split —
    # a live anomaly must not inflate its own cohort's std)
    train = df.where("ts < timestamp'2024-03-18 00:00:00'")
    base = seasonal_baseline(train, "key", "ts", "value", period="hour_of_day")
    out = seasonal_score(df, base, "key", "ts", "value", period="hour_of_day")
    scored = {r["ts"]: r["sigmas"] for r in out.collect()}
    assert scored[anomaly_ts] > 4.0
    normals = [abs(s) for t, s in scored.items() if t != anomaly_ts and s is not None]
    assert max(normals) < 4.0


def test_seasonal_baseline_skips_null_values(spark):
    from tstore_spark.operators.seasonal import seasonal_baseline

    rows = [
        ("A", pd.Timestamp("2024-03-04 05:00:00"), 10.0),
        ("A", pd.Timestamp("2024-03-05 05:00:00"), 10.0),
        ("A", pd.Timestamp("2024-03-06 05:00:00"), None),  # carries nothing
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "value"]))
    r = seasonal_baseline(df, "key", "ts", "value", period="hour_of_day").collect()[0]
    # n counts OBSERVATIONS: a NULL in n while the sums skip it would give
    # mean 6.67 / std 4.71 for a constant-10 cohort (review finding)
    assert (r["n"], r["mean"], r["std"]) == (2, 10.0, 0.0)
    assert r["period"] == "hour_of_day"


def test_seasonal_score_period_mismatch_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from tstore_spark.operators.seasonal import seasonal_baseline, seasonal_score

    df = _series(spark)
    base_day = seasonal_baseline(df, "key", "ts", "value", period="hour_of_day")
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="period"):
        seasonal_score(df, base_day, "key", "ts", "value",
                       period="hour_of_week").collect()
    with pytest.raises(ValueError, match="period"):
        seasonal_score(df, base_day.drop("period"), "key", "ts", "value")
