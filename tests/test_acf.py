"""Autocorrelation function: exact integer state + fixed double derivation."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.acf import acf, acf_oracle_sql


def _series(spark):
    rows = []
    # key A: a clean period-4 sawtooth (strong acf at lag 4)
    for t in range(24):
        rows.append(("A", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t), float(t % 4)))
    # key B: a linear ramp
    for t in range(12):
        rows.append(("B", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t), float(t) * 0.25))
    # key C: constant (zero variance -> NULL acf)
    for t in range(6):
        rows.append(("C", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t), 7.0))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    return spark.createDataFrame(pdf)


def _reference_acf(values, max_lag):
    """Straight-line biased-denominator ACF over integer cents."""
    c = np.round(np.asarray(values) * 100).astype(np.int64)
    n = len(c)
    mu = c.sum() / n
    den = (c * c).sum() - c.sum() * mu
    out = {}
    for lag in range(0, max_lag + 1):
        if lag >= n:
            continue
        head, tail = c[: n - lag], c[lag:]
        m = n - lag
        num = (head * tail).sum() - mu * (head.sum() + tail.sum()) + m * mu * mu
        out[lag] = None if den <= 0 else num / den
    return out


def test_acf_matches_reference_and_lag0_is_exactly_one(spark):
    got = {
        (r["key"], r["lag"]): r["acf"]
        for r in acf(_series(spark), "key", "ts", "value", max_lag=5).collect()
    }
    saw = [float(t % 4) for t in range(24)]
    ramp = [t * 0.25 for t in range(12)]
    for key, vals in (("A", saw), ("B", ramp)):
        ref = _reference_acf(vals, 5)
        for lag, want in ref.items():
            assert got[(key, lag)] == pytest.approx(want, abs=1e-12)
    assert got[("A", 0)] == 1.0  # exact bit identity, not approx
    assert got[("A", 4)] == pytest.approx(1.0, abs=0.35)  # periodic peak
    assert got[("A", 4)] > got[("A", 2)]  # period-4 beats off-period
    # constant series: zero variance -> NULL at every lag
    assert all(v is None for (k, _l), v in got.items() if k == "C")


def test_acf_skips_nulls_and_guards(spark):
    pdf = pd.DataFrame(
        {
            "key": ["A"] * 5,
            "ts": pd.date_range("2024-01-01", periods=5, freq="1min"),
            "value": [1.0, None, 2.0, None, 3.0],
        }
    )
    out = acf(spark.createDataFrame(pdf), "key", "ts", "value", max_lag=2).collect()
    # 3 observed points -> lag 0,1,2 rows with m = 3,2,1
    assert sorted((r["lag"], r["m"]) for r in out) == [(0, 3), (1, 2), (2, 1)]
    with pytest.raises(ValueError, match="max_lag"):
        acf(spark.createDataFrame(pdf), "key", "ts", "value", max_lag=0)


def test_acf_deterministic_across_parallelism_with_tiebreaks(spark):
    rows = []
    for t in range(10):  # duplicate timestamps, two sources per minute
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t)
        rows += [("A", ts, float(t), 2 * t), ("A", ts, float(t) + 0.5, 2 * t + 1)]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value", "seq"])
    df = spark.createDataFrame(pdf)

    def run(parts):
        return sorted(
            (r["key"], r["lag"], r["m"], r["sxy"], r["sh"], r["stl"], r["acf"])
            for r in acf(
                df.repartition(parts), "key", "ts", "value",
                max_lag=3, tiebreak_cols=["seq"],
            ).collect()
        )

    assert run(1) == run(16)


def test_acf_oracle_sql_parity(spark):
    import duckdb as _dd

    sdf = _series(spark)
    got = sorted(
        tuple(r) for r in acf(sdf, "key", "ts", "value", max_lag=4).collect()
    )
    pdf = sdf.toPandas()
    con = _dd.connect()
    con.register("src", pdf)
    sql = acf_oracle_sql(
        "SELECT key, ts, CAST(round(value * 100) AS BIGINT) AS c FROM src",
        max_lag=4,
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want  # exact, including the double bits
