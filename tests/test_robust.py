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
