"""Per-key OLS trend fit: numpy replica, exact degenerate cases,
anchor invariance, parallelism bit-identity."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.trend import predict_linear, trend_fit


def _events(rng, n, keys=3):
    return pd.DataFrame({
        "key": [f"k{i % keys}" for i in range(n)],
        "ts": pd.Timestamp("2024-02-01")
        + pd.to_timedelta(rng.integers(0, 120 * 86400, n), unit="s"),
        "value": np.round(rng.normal(40, 9, n) + rng.integers(0, 3, n) * 0.5, 2),
    })


def _numpy_fit(pdf, anchor_us):
    """Replay the operator's exact discretization (floored minutes since
    anchor, integer cents) through numpy lstsq."""
    out = {}
    for k, g in pdf.groupby("key"):
        t = np.floor(
            (g["ts"].astype("datetime64[us]").astype("int64") - anchor_us) / 60_000_000
        )
        v = np.round(g["value"] * 100)
        A = np.vstack([t, np.ones_like(t)]).T
        (slope, intercept), res, *_ = np.linalg.lstsq(A, v, rcond=None)
        ss_tot = np.sum((v - v.mean()) ** 2)
        r2 = 1 - (res[0] / ss_tot) if len(res) and ss_tot > 0 else None
        out[k] = (slope / 100, intercept / 100, r2)
    return out


def test_trend_matches_numpy_and_parallelism(spark):
    rng = np.random.default_rng(7)
    pdf = _events(rng, 3000)
    anchor_us = int(pdf["ts"].min().value // 1000)

    outs = []
    for parts in (1, 16):
        rows = trend_fit(
            spark.createDataFrame(pdf).repartition(parts), "key", "ts", "value"
        ).collect()
        outs.append(sorted(rows, key=lambda r: r["key"]))
    assert [tuple(r) for r in outs[0]] == [tuple(r) for r in outs[1]]  # bit-identical across parallelism

    ref = _numpy_fit(pdf, anchor_us)
    got = {r["key"]: r for r in outs[0]}
    assert set(got) == set(ref)
    for k, (slope, intercept, r2) in ref.items():
        r = got[k]
        assert r["slope"] == pytest.approx(slope, rel=1e-9)
        assert r["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert r["r2"] == pytest.approx(r2, rel=1e-9)
        assert r["n"] == (pdf["key"] == k).sum()


def test_trend_exact_line_and_degenerate_cases(spark):
    # exact line on the minute grid with small cent values: slope exact,
    # r2 exactly 1.0 (all double conversions exact at this magnitude)
    t = pd.date_range("2024-01-01", periods=50, freq="1min")
    line = pd.DataFrame({"key": "line", "ts": t, "value": 2.0 + 0.25 * np.arange(50)})
    single = pd.DataFrame({"key": ["one"], "ts": [t[0]], "value": [3.0]})
    const = pd.DataFrame({"key": "flat", "ts": t[:10], "value": 7.5})
    stack = pd.DataFrame({"key": "stack", "ts": [t[0]] * 5, "value": np.arange(5.0)})
    withnull = pd.DataFrame(
        {"key": "line", "ts": [t[0]], "value": [np.nan]}
    )  # NULL rows are skipped
    pdf = pd.concat([line, single, const, stack, withnull], ignore_index=True)

    got = {r["key"]: r for r in trend_fit(spark.createDataFrame(pdf), "key", "ts", "value").collect()}
    assert got["line"]["slope"] == 0.25 and got["line"]["r2"] == 1.0
    assert got["line"]["n"] == 50  # the NaN row did not count
    assert got["one"]["slope"] is None and got["one"]["r2"] is None
    assert got["flat"]["slope"] == 0.0 and got["flat"]["r2"] is None
    assert got["stack"]["slope"] is None

    pred = {
        r["key"]: r["predicted"]
        for r in predict_linear(
            trend_fit(spark.createDataFrame(line), "key", "ts", "value"), 100
        ).collect()
    }
    assert pred["line"] == pytest.approx(2.0 + 0.25 * 100)


def test_trend_anchor_invariance(spark):
    rng = np.random.default_rng(13)
    pdf = _events(rng, 800, keys=2)
    df = spark.createDataFrame(pdf)
    base = {r["key"]: r for r in trend_fit(df, "key", "ts", "value").collect()}
    # explicit anchor one day BEFORE the data (negative-t floor consistency
    # is exercised by an anchor strictly inside the span)
    mid = pdf["ts"].min() + (pdf["ts"].max() - pdf["ts"].min()) / 2
    shifted = {
        r["key"]: r
        for r in trend_fit(df, "key", "ts", "value", anchor=mid).collect()
    }
    for k in base:
        # slope and r2 are anchor-invariant up to the minute re-flooring
        assert shifted[k]["slope"] == pytest.approx(base[k]["slope"], rel=1e-2)
        assert shifted[k]["r2"] == pytest.approx(base[k]["r2"], rel=1e-2)
        # intercept is defined AT the anchor: shifting forward by m minutes
        # moves it by ~slope*m
        assert shifted[k]["intercept"] != base[k]["intercept"]
