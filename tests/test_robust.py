"""Robust statistics: MAD outlier scoring and winsorization."""

import duckdb
import pandas as pd
import pytest

from tstore_spark.operators.robust import mad_scores, winsorize


@pytest.fixture(scope="module")
def series(spark):
    rows = []
    # key 'a': tight cluster around 10 with two wild points
    for i, v in enumerate([9.0, 10.0, 10.5, 11.0, 10.2, 9.8, 500.0, -300.0]):
        rows.append(("a", i, v))
    # key 'b': constant -> mad 0, single deviation flagged
    for i, v in enumerate([5.0, 5.0, 5.0, 5.0, 6.0]):
        rows.append(("b", i, v))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "i", "v"])
    )


def test_mad_flags_wild_points_not_tails(series):
    out = mad_scores(series, "k", "v", k=3.0).toPandas()
    a = out[out.k == "a"]
    flagged = set(a[a.is_outlier].v)
    assert flagged == {500.0, -300.0}
    # classic z-score would be masked here: stddev ~ 180, |9-mean| < 1 sigma
    assert a.med.iloc[0] == pytest.approx(10.1)


def test_mad_zero_constant_key(series):
    b = mad_scores(series, "k", "v", k=3.0).toPandas().query("k == 'b'")
    assert (b.mad == 0).all()
    assert set(b[b.is_outlier].v) == {6.0}


def test_mad_matches_duckdb(series):
    got = mad_scores(series, "k", "v", k=3.0)
    agg = (
        got.select("k", "med", "mad")
        .distinct()
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pdf = series.toPandas()
    duckdb.register("t", pdf)
    want = duckdb.sql(
        """
        WITH med AS (SELECT k, round(quantile_cont(v, 0.5), 4) AS med FROM t GROUP BY k),
        dev AS (SELECT t.k, abs(t.v - m.med) AS d, m.med FROM t JOIN med m USING (k))
        SELECT k, max(med) AS med, round(quantile_cont(d, 0.5), 4) AS mad
        FROM dev GROUP BY k ORDER BY k
        """
    ).df()
    pd.testing.assert_frame_equal(agg, want)


def test_winsorize_bounds_and_clip(spark):
    pdf = pd.DataFrame({"k": ["x"] * 101, "i": range(101), "v": [float(i) for i in range(101)]})
    out = winsorize(spark.createDataFrame(pdf), "k", "v", 0.05, 0.95).toPandas()
    assert out.lo.iloc[0] == 5.0 and out.hi.iloc[0] == 95.0
    assert out.winsorized.min() == 5.0 and out.winsorized.max() == 95.0
    # interior untouched
    mid = out[(out.v > 5) & (out.v < 95)]
    assert (mid.winsorized == mid.v).all()


def test_winsorize_validates_bounds(spark):
    df = spark.createDataFrame([("x", 1.0)], "k string, v double")
    with pytest.raises(ValueError):
        winsorize(df, "k", "v", 0.9, 0.1)


# ---------------------------------------------------------------------------
# theil_sen
# ---------------------------------------------------------------------------


def _ts_series(spark):
    import numpy as np
    import pandas as pd

    rows = []
    rng = np.random.default_rng(5)
    for k, (slope, base) in {"up": (0.5, 10.0), "flat": (0.0, 4.0)}.items():
        for i in range(40):
            noise = float(rng.integers(-100, 101)) / 100.0
            rows.append(
                (k, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                 round(base + slope * i + noise, 2))
            )
    # one massive outlier in 'up' (the OLS breaker)
    rows.append(("up", pd.Timestamp("2024-01-01 00:20:30"), 10_000.0))
    # a key whose points all share one minute: pairs impossible
    rows.append(("stack", pd.Timestamp("2024-01-01 00:00:10"), 1.0))
    rows.append(("stack", pd.Timestamp("2024-01-01 00:00:40"), 9.0))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "value"]))


def _ref_theil_sen(pdf, anchor_us):
    import numpy as np

    out = {}
    for k, g in pdf[pdf.value.notna()].groupby("key"):
        x = ((g["ts"].astype("int64") // 1000 - anchor_us) // 60_000_000).to_numpy()
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        sl = [
            (float(c[j] - c[i]) / float(x[j] - x[i])) / 100.0
            for i in range(len(x))
            for j in range(len(x))
            if x[i] < x[j]
        ]
        if sl:
            slope = round(float(np.median(sl)), 4)
            resid = c / 100.0 - slope * x
            out[k] = (len(x), len(sl), slope, round(float(np.median(resid)), 4))
        else:
            out[k] = (len(x), 0, None, None)
    return out


def test_theil_sen_matches_reference_and_resists_outlier(spark):
    from tstore_spark.operators.robust import theil_sen
    from tstore_spark.operators.trend import trend_fit

    sdf = _ts_series(spark)
    got = {
        r["key"]: (r["n_points"], r["n_pairs"], r["slope"], r["intercept"])
        for r in theil_sen(sdf, "key", "ts", "value").collect()
    }
    pdf = sdf.toPandas()
    anchor_us = int(pdf["ts"].astype("int64").min() // 1000)
    assert got == _ref_theil_sen(pdf, anchor_us)
    # robustness: the planted 10k spike drags OLS far off; Theil-Sen stays
    assert abs(got["up"][2] - 0.5) < 0.05
    ols = {r["key"]: r["slope"] for r in trend_fit(sdf, "key", "ts", "value").collect()}
    assert abs(ols["up"] - 0.5) > 0.5  # OLS dragged ~2x off the true slope
    # same-minute stack: no valid pair -> NULL slope, zero pairs
    assert got["stack"][1] == 0 and got["stack"][2] is None


def test_theil_sen_guard_and_determinism(spark):
    import pytest as _pt

    from tstore_spark.operators.robust import theil_sen

    sdf = _ts_series(spark)
    with _pt.raises(ValueError, match="max_points_per_key"):
        theil_sen(sdf, "key", "ts", "value", max_points_per_key=10)

    def run(parts):
        return sorted(
            tuple(r)
            for r in theil_sen(sdf.repartition(parts), "key", "ts", "value").collect()
        )

    assert run(1) == run(16)
