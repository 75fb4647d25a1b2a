"""CUSUM via the cumsum-minus-running-min identity vs the literal
recursion, drift detection, determinism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.changepoint import cusum


def _brute(vals, target, slack=0.0):
    up = down = 0.0
    ups, downs = [], []
    for x in vals:
        up = max(0.0, up + (x - (target + slack)))
        down = max(0.0, down + ((target - slack) - x))
        ups.append(up)
        downs.append(down)
    return ups, downs


@pytest.fixture(scope="module")
def drift_pdf():
    rng = np.random.default_rng(5)
    t = pd.date_range("2024-01-01", periods=400, freq="1min")
    vals = rng.normal(50, 2, 400).round(2)
    vals[250:] += 4.0  # sustained +4 drift from t=250 (2 sigma — subtle)
    spike = vals.copy()
    rows = [("drift", ts, v) for ts, v in zip(t, vals)]
    rows += [("steady", ts, round(v - (4.0 if i >= 250 else 0.0), 2))
             for i, (ts, v) in enumerate(zip(t, spike))]
    return pd.DataFrame(rows, columns=["k", "ts", "v"])


def test_cusum_equals_recursion(spark, drift_pdf):
    got = (
        cusum(spark.createDataFrame(drift_pdf), "k", "ts", "v",
              target=50.0, threshold=40.0, slack=2.0)
        .orderBy("k", "ts")
        .collect()
    )
    for key in ("drift", "steady"):
        vals = [round(v, 2) for v in
                drift_pdf[drift_pdf.k == key].sort_values("ts")["v"]]
        ups, downs = _brute(vals, 50.0, slack=2.0)
        rows = [r for r in got if r["k"] == key]
        for r, u, d in zip(rows, ups, downs):
            assert r["cusum_up"] == pytest.approx(u, abs=1e-9)
            assert r["cusum_down"] == pytest.approx(d, abs=1e-9)


def test_cusum_detects_sustained_drift_not_noise(spark, drift_pdf):
    got = (
        cusum(spark.createDataFrame(drift_pdf), "k", "ts", "v",
              target=50.0, threshold=40.0, slack=2.0)
        .where("alarm")
        .groupBy("k")
        .agg(F.min("ts").alias("first_alarm"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_key = {r["k"]: r for r in got}
    assert "drift" in by_key                       # the +4 drift alarms...
    t = pd.date_range("2024-01-01", periods=400, freq="1min")
    assert by_key["drift"]["first_alarm"] >= t[250]  # ...only after onset
    assert by_key["drift"]["first_alarm"] <= t[290]  # ...and promptly
    assert "steady" not in by_key                  # pure noise never alarms


def test_cusum_deterministic_across_parallelism(spark, drift_pdf):
    outs = []
    for n in (1, 8):
        sdf = spark.createDataFrame(drift_pdf).repartition(n)
        outs.append(sorted(
            (r["k"], r["ts"], r["cusum_up"], r["cusum_down"], r["alarm"])
            for r in cusum(sdf, "k", "ts", "v", 50.0, 40.0, slack=2.0).collect()
        ))
    assert outs[0] == outs[1]
