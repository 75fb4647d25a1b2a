"""Holt smoothing: straight-line reference (exact bits), semantics, guards."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.forecast import holt_fit


def _series(n_ids=8, n=200) -> pd.DataFrame:
    i = np.arange(n_ids * n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    sid = i // n
    pos = i % n
    val = np.round(sid * 3.0 + pos * 0.11 + (h % 100) * 0.07, 2)
    return pd.DataFrame(
        {
            "id": np.char.add("s", sid.astype(str)),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(pos * 3600, unit="s").astype("timedelta64[us]"),
            "value": val,
            "event_id": i,
        }
    )


def _ref_holt(pdf: pd.DataFrame, alpha: float, beta: float, horizon: int) -> dict:
    out = {}
    for sid, g in pdf[pdf["value"].notna()].sort_values(["id", "ts", "event_id"]).groupby("id"):
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        xs = [c / 100.0 for c in cents.tolist()]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (nl - l) + (1.0 - beta) * b
            l = nl
        out[sid] = (len(xs), l, b, l + float(horizon) * b)
    return out


@pytest.fixture(scope="module")
def holt_sdf(spark):
    return spark.createDataFrame(_series()).cache()


def test_holt_matches_reference_bits(spark, holt_sdf):
    got = {
        r["id"]: (r["n_points"], r["level"], r["trend"], r["forecast"])
        for r in holt_fit(
            holt_sdf, "id", "ts", "value", alpha="0.5", beta="0.3", horizon=3,
            tiebreak_cols=["event_id"],
        ).collect()
    }
    want = _ref_holt(_series(), 0.5, 0.3, 3)
    assert got == want  # exact double bits: one fixed fold order


def test_holt_ramp_extrapolates(spark):
    n = 50
    pdf = pd.DataFrame(
        {
            "id": ["ramp"] * n,
            "ts": pd.date_range("2024-01-01", periods=n, freq="1h"),
            "value": [float(10 + 2 * i) for i in range(n)],
            "event_id": range(n),
        }
    )
    r = holt_fit(
        spark.createDataFrame(pdf), "id", "ts", "value",
        alpha="0.5", beta="0.3", horizon=5, tiebreak_cols=["event_id"],
    ).collect()[0]
    # on a clean +2/step ramp the trend converges near 2 and the forecast
    # leads the last observation
    assert 1.5 < r["trend"] < 2.5
    assert r["forecast"] > 10 + 2 * (n - 1)


def test_holt_single_point(spark):
    pdf = pd.DataFrame(
        {"id": ["x"], "ts": [pd.Timestamp("2024-01-01")], "value": [7.25],
         "event_id": [0]}
    )
    r = holt_fit(spark.createDataFrame(pdf), "id", "ts", "value").collect()[0]
    assert (r["level"], r["trend"], r["forecast"]) == (7.25, 0.0, 7.25)
    assert r["n_points"] == 1


def test_holt_nulls_excluded(spark):
    pdf = pd.DataFrame(
        {
            "id": ["a"] * 4 + ["allnull"] * 2,
            "ts": list(pd.date_range("2024-01-01", periods=4, freq="1h"))
            + list(pd.date_range("2024-01-01", periods=2, freq="1h")),
            "value": [1.0, None, 2.0, 3.0, None, None],
            "event_id": range(6),
        }
    )
    rows = holt_fit(
        spark.createDataFrame(pdf), "id", "ts", "value", tiebreak_cols=["event_id"]
    ).collect()
    assert len(rows) == 1 and rows[0]["id"] == "a" and rows[0]["n_points"] == 3


def test_holt_guards(spark, holt_sdf):
    with pytest.raises(ValueError, match="alpha"):
        holt_fit(holt_sdf, "id", "ts", "value", alpha="0")
    with pytest.raises(ValueError, match="horizon"):
        holt_fit(holt_sdf, "id", "ts", "value", horizon=-1)
    with pytest.raises(Exception, match="max_points"):
        holt_fit(holt_sdf, "id", "ts", "value", max_points=5).collect()


def test_holt_deterministic_across_parallelism(spark, holt_sdf):
    kw = dict(alpha="0.5", beta="0.3", horizon=2, tiebreak_cols=["event_id"])
    a = sorted(map(tuple, holt_fit(holt_sdf, "id", "ts", "value", **kw).collect()))
    b = sorted(
        map(tuple, holt_fit(holt_sdf.repartition(11), "id", "ts", "value", **kw).collect())
    )
    assert a == b


def test_holt_duckdb_twin_bits(spark, holt_sdf):
    """The DuckDB fold produces the IDENTICAL doubles (the gate contract)."""
    import duckdb

    from tstore_spark.operators.forecast import holt_oracle_sql

    got = {
        r["id"]: (r["n_points"], r["level"], r["trend"], r["forecast"])
        for r in holt_fit(
            holt_sdf, "id", "ts", "value", alpha="0.5", beta="0.3", horizon=3,
            tiebreak_cols=["event_id"],
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", _series())
    sql = holt_oracle_sql(
        "t", "id", "ts", "value", alpha="0.5", beta="0.3", horizon=3,
        tiebreak_cols=["event_id"],
    )
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# Holt-Winters (additive seasonal)
# ---------------------------------------------------------------------------


def _ref_hw(pdf, m, alpha, beta, gamma, horizon):
    out = {}
    for sid, g in pdf[pdf["value"].notna()].sort_values(
        ["id", "ts", "event_id"]
    ).groupby("id"):
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        xs = [c / 100.0 for c in cents.tolist()]
        n = len(xs)
        l0 = 0.0
        for x in xs[:m]:
            l0 = l0 + x
        l0 = l0 / float(m)
        l, b = l0, 0.0
        s = [x - l0 for x in xs[:m]]
        for i in range(m, n):
            x, pos = xs[i], i % m
            sp = s[pos]
            nl = alpha * (x - sp) + (1.0 - alpha) * (l + b)
            b = beta * (nl - l) + (1.0 - beta) * b
            s[pos] = gamma * (x - nl) + (1.0 - gamma) * sp
            l = nl
        season = s[(n - 1 + horizon) % m]
        out[sid] = (n, l, b, season, l + float(horizon) * b + season)
    return out


def test_holt_winters_matches_reference_bits(spark, holt_sdf):
    from tstore_spark.operators.forecast import holt_winters_fit

    got = {
        r["id"]: (r["n_points"], r["level"], r["trend"], r["season"], r["forecast"])
        for r in holt_winters_fit(
            holt_sdf, "id", "ts", "value", period=24,
            alpha="0.5", beta="0.3", gamma="0.3", horizon=3,
            tiebreak_cols=["event_id"],
        ).collect()
    }
    want = _ref_hw(_series(), 24, 0.5, 0.3, 0.3, 3)
    assert got == want  # exact double bits: one fixed fold order


def test_holt_winters_oracle_sql_parity(spark, holt_sdf):
    import duckdb

    from tstore_spark.operators.forecast import (
        holt_winters_fit,
        holt_winters_oracle_sql,
    )

    got = sorted(
        tuple(r)
        for r in holt_winters_fit(
            holt_sdf, "id", "ts", "value", period=12,
            alpha="0.4", beta="0.2", gamma="0.25", horizon=2,
            tiebreak_cols=["event_id"],
        ).collect()
    )
    con = duckdb.connect()
    con.register("src", _series())
    sql = holt_winters_oracle_sql(
        "src", "id", "ts", "value", period=12,
        alpha="0.4", beta="0.2", gamma="0.25", horizon=2,
        tiebreak_cols=["event_id"],
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want  # identical bits, both engines


def test_holt_winters_learns_planted_seasonality(spark):
    from tstore_spark.operators.forecast import holt_winters_fit

    # pure additive seasonal signal, zero trend: value = 10 + phase effect
    m = 6
    effects = [0.0, 5.0, -3.0, 8.0, -6.0, 1.0]
    n = 20 * m
    pdf = pd.DataFrame(
        {
            "id": ["k"] * n,
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n) * 3600, unit="s").astype("timedelta64[us]"),
            "value": [10.0 + effects[i % m] for i in range(n)],
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    fits = {}
    for h in range(m):
        r = holt_winters_fit(
            spark.createDataFrame(pdf), "id", "ts", "value", period=m,
            alpha="0.3", beta="0.1", gamma="0.4", horizon=h + 1,
            tiebreak_cols=["event_id"],
        ).collect()[0]
        fits[(n - 1 + h + 1) % m] = r["forecast"]
        assert abs(r["trend"]) < 1e-6
    for phase, f in fits.items():
        assert f == pytest.approx(10.0 + effects[phase], abs=1e-3)


def test_holt_winters_guards(spark, holt_sdf):
    from tstore_spark.operators.forecast import holt_winters_fit

    with pytest.raises(ValueError, match="period"):
        holt_winters_fit(holt_sdf, "id", "ts", "value", period=1)
    with pytest.raises(ValueError, match="alpha"):
        holt_winters_fit(holt_sdf, "id", "ts", "value", alpha="0")
    with pytest.raises(ValueError, match="horizon"):
        holt_winters_fit(holt_sdf, "id", "ts", "value", horizon=-1)
    # series shorter than 2*period raises in-plan (loud, not silent garbage)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    short = spark.createDataFrame(_series(n_ids=1, n=30))
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        holt_winters_fit(
            short, "id", "ts", "value", period=24, tiebreak_cols=["event_id"]
        ).collect()


def test_holt_winters_deterministic_across_parallelism(spark, holt_sdf):
    from tstore_spark.operators.forecast import holt_winters_fit

    def run(parts):
        return sorted(
            tuple(r)
            for r in holt_winters_fit(
                holt_sdf.repartition(parts), "id", "ts", "value", period=24,
                tiebreak_cols=["event_id"],
            ).collect()
        )

    assert run(1) == run(16)
