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


# ---------------------------------------------------------------------------
# best_changepoint: binary-segmentation split scoring
# ---------------------------------------------------------------------------


def _brute_best(vals, min_segment=2):
    """Straight-line reference with the operator's exact IEEE op order."""
    n, s = len(vals), sum(vals)
    best = None
    for i in range(min_segment, n - min_segment + 1):
        s1 = sum(vals[:i])
        s2 = s - s1
        gain = float(s1) * s1 / i + float(s2) * s2 / (n - i) - float(s) * s / n
        if best is None or gain > best[1]:
            best = (i, gain)
    return best


def test_best_changepoint_recovers_planted_shift(spark):
    from tstore_spark.operators.changepoint import best_changepoint

    rows = [("a", i, 10 if i < 30 else 200) for i in range(50)]
    rows += [("b", i, 7 if i < 12 else -40) for i in range(20)]
    rows += [("flat", i, 5) for i in range(10)]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "t", "v"]))
    got = {r["k"]: r for r in best_changepoint(sdf, "k", "t", "v").collect()}
    for key, vals in [("a", [10] * 30 + [200] * 20), ("b", [7] * 12 + [-40] * 8)]:
        i, gain = _brute_best(vals)
        assert got[key]["cp_index"] == i
        assert got[key]["gain"] == gain  # identical IEEE op order -> same bits
        assert got[key]["cp_time"] == i  # first right-segment timestamp
        assert got[key]["sum_left"] + got[key]["sum_right"] == sum(vals)
    assert got["flat"]["gain"] == 0.0  # constant series: zero gain, index tie->smallest


def test_best_changepoint_min_segment_and_short_series(spark):
    from tstore_spark.operators.changepoint import best_changepoint

    rows = [("a", i, i) for i in range(6)] + [("tiny", i, 1) for i in range(3)]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "t", "v"]))
    out = {r["k"]: r for r in best_changepoint(sdf, "k", "t", "v", min_segment=3).collect()}
    assert "tiny" not in out            # n=3 < 2*min_segment: no row
    assert out["a"]["cp_index"] == 3    # only candidate
    with pytest.raises(ValueError, match="min_segment"):
        best_changepoint(sdf, "k", "t", "v", min_segment=0)


def test_best_changepoint_deterministic_across_parallelism(spark):
    from tstore_spark.operators.changepoint import best_changepoint

    rows = [("k%d" % (i % 7), i, (i * 37 + 11) % 23 - 11) for i in range(400)]
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"])
    a = best_changepoint(spark.createDataFrame(pdf).repartition(1), "k", "t", "v").collect()
    b = best_changepoint(spark.createDataFrame(pdf).repartition(16), "k", "t", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) != []
