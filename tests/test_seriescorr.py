"""Pairwise series correlation: numpy brute force, alignment semantics,
constant-series NULL, parallelism determinism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.seriescorr import pairwise_correlation


@pytest.fixture(scope="module")
def series_pdf():
    rng = np.random.default_rng(11)
    t = pd.date_range("2024-01-01", periods=200, freq="1min")
    base = rng.normal(50, 10, 200)
    rows = []
    for ts, b, noise in zip(t, base, rng.normal(0, 1, 200)):
        rows.append(("up", ts, round(b, 2)))
        rows.append(("up2", ts, round(b * 2 + noise, 2)))
        rows.append(("down", ts, round(100 - b, 2)))
        rows.append(("flat", ts, 7.0))
    # a sparse series present only on even minutes (alignment check)
    for ts, b in list(zip(t, base))[::2]:
        rows.append(("sparse", ts, round(b + 1, 2)))
    return pd.DataFrame(rows, columns=["k", "ts", "v"])


def _np_corr(pdf, ka, kb):
    a = pdf[pdf.k == ka].set_index("ts")["v"]
    b = pdf[pdf.k == kb].set_index("ts")["v"]
    j = pd.concat([a, b], axis=1, join="inner")
    x = np.round(j.iloc[:, 0] * 100).astype(np.int64)
    y = np.round(j.iloc[:, 1] * 100).astype(np.int64)
    n = len(x)
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt(
        float(n * (x * x).sum() - x.sum() ** 2)
        * float(n * (y * y).sum() - y.sum() ** 2)
    )
    return len(j), (num / den if den > 0 else None)


def test_correlations_match_numpy(spark, series_pdf):
    sdf = spark.createDataFrame(series_pdf)
    got = {(r["key_a"], r["key_b"]): r for r in
           pairwise_correlation(sdf, "k", "ts", "v").collect()}
    assert len(got) == 10  # C(5, 2) unordered pairs
    for ka, kb in (("up", "up2"), ("down", "up"), ("sparse", "up"), ("down", "up2")):
        key = (ka, kb) if ka < kb else (kb, ka)
        n, r = _np_corr(series_pdf, *key)
        assert got[key]["n"] == n
        assert got[key]["r"] == pytest.approx(r, abs=1e-12)
    assert got[("up", "up2")]["r"] > 0.99       # strongly positive
    assert got[("down", "up")]["r"] == pytest.approx(-1.0, abs=1e-9)
    assert got[("sparse", "up")]["n"] == 100     # inner alignment

    # constant series: undefined correlation -> NULL, never an error
    for k in ("down", "up", "up2", "sparse"):
        key = ("flat", k) if "flat" < k else (k, "flat")
        assert got[key]["r"] is None


def test_lead_lag_finds_the_shift(spark):
    """B is A delayed by 120 s (plus noise-free construction): the lag scan
    peaks at +120 with r == 1, and mismatched lags align fewer/uncorrelated
    points."""
    from tstore_spark.operators.seriescorr import lead_lag_correlation

    rng = np.random.default_rng(3)
    t = pd.date_range("2024-01-01", periods=300, freq="1min")
    a_vals = rng.normal(50, 10, 300).round(2)
    rows = [("a", ts, v) for ts, v in zip(t, a_vals)]
    rows += [("b", ts + pd.Timedelta(seconds=120), v) for ts, v in zip(t, a_vals)]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))

    got = {r["lag_seconds"]: r for r in lead_lag_correlation(
        sdf, "k", "ts", "v", "a", "b", [-120, 0, 60, 120, 240]).collect()}
    assert got[120]["r"] == pytest.approx(1.0, abs=1e-12)
    assert got[120]["n"] == 300
    assert got[0]["n"] == 298          # overlap shrinks off the true lag
    assert abs(got[0]["r"]) < 0.3      # shifted alignment decorrelates
    with pytest.raises(ValueError, match="at least one lag"):
        lead_lag_correlation(sdf, "k", "ts", "v", "a", "b", [])


def test_correlation_deterministic_across_parallelism(spark, series_pdf):
    outs = []
    for n in (1, 8):
        sdf = spark.createDataFrame(series_pdf).repartition(n)
        outs.append(sorted(
            (r["key_a"], r["key_b"], r["n"], r["sx"], r["sxy"], r["r"])
            for r in pairwise_correlation(sdf, "k", "ts", "v").collect()
        ))
    assert outs[0] == outs[1]  # integer state + fixed formula: bit-identical
