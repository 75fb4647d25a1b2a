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
