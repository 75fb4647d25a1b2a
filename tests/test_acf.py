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


# ---------------------------------------------------------------------------
# ccf (lagged cross-correlation / lead-lag)
# ---------------------------------------------------------------------------


def _two_series(spark):
    rows = []
    vals = [float((7 * t * t + 3 * t) % 50) for t in range(40)]
    base = pd.Timestamp("2024-01-01")
    for t, v in enumerate(vals):
        rows.append(("imp", base + pd.Timedelta(minutes=t), v))
        # clk is imp shifted +2 minutes (imp leads clk by 2), scaled 0.5
        rows.append(("clk", base + pd.Timedelta(minutes=t + 2), v * 0.5))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "value"]))


def test_ccf_finds_the_planted_lead_lag(spark):
    from tstore_spark.operators.acf import ccf

    got = {r["lag"]: (r["m"], r["r"]) for r in ccf(
        _two_series(spark), "key", "ts", "value", "imp", "clk", max_lag=4
    ).collect()}
    assert set(got) == set(range(-4, 5))
    m2, r2 = got[2]
    assert m2 == 40 and r2 == pytest.approx(1.0, abs=1e-12)  # the planted lag
    assert all(r is None or r < 0.999 for lag, (_m, r) in got.items() if lag != 2)
    # pair counts shrink away from the overlap
    assert got[-4][0] < got[2][0]


def test_ccf_matches_numpy_reference(spark):
    from tstore_spark.operators.acf import ccf

    sdf = _two_series(spark)
    got = {r["lag"]: r["r"] for r in ccf(
        sdf, "key", "ts", "value", "imp", "clk", max_lag=3).collect()}
    pdf = sdf.toPandas()
    a = pdf[pdf.key == "imp"].set_index("ts")["value"]
    b = pdf[pdf.key == "clk"].set_index("ts")["value"]
    for lag, r in got.items():
        bs = b.copy()
        bs.index = bs.index - pd.Timedelta(minutes=lag)
        j = pd.concat([a, bs], axis=1, join="inner")
        x = np.round(j.iloc[:, 0].to_numpy() * 100)
        y = np.round(j.iloc[:, 1].to_numpy() * 100)
        want = np.corrcoef(x, y)[0, 1] if len(x) > 1 and x.std() and y.std() else None
        if want is None:
            assert r is None
        else:
            assert r == pytest.approx(want, abs=1e-9)


def test_ccf_oracle_sql_parity_and_guards(spark):
    import duckdb as _dd

    from tstore_spark.operators.acf import ccf, ccf_oracle_sql

    sdf = _two_series(spark)
    got = sorted(tuple(r) for r in ccf(
        sdf, "key", "ts", "value", "imp", "clk", max_lag=3).collect())
    con = _dd.connect()
    con.register("src", sdf.toPandas())
    sql = ccf_oracle_sql(
        "SELECT key, ts, CAST(round(value * 100) AS BIGINT) AS c "
        "FROM src WHERE value IS NOT NULL",
        "'imp'", "'clk'", max_lag=3,
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want  # exact, including the sqrt-derived double bits
    with pytest.raises(ValueError, match="max_lag"):
        ccf(sdf, "key", "ts", "value", "imp", "clk", max_lag=0)
    with pytest.raises(ValueError, match="step_minutes"):
        ccf(sdf, "key", "ts", "value", "imp", "clk", step_minutes=0)
