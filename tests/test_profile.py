"""Single-scan profiling: per-column stats vs pandas brute force, exact
equi-width histograms with clamping, guards."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.profile import numeric_histogram, profile


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, 500)
    vals[::17] = np.nan
    return pd.DataFrame(
        {
            "k": [f"u{i % 23}" for i in range(500)],
            "v": vals,
            "n": np.arange(500) % 41,
        }
    )


def test_profile_matches_pandas(spark, pdf):
    got = {r["column"]: r.asDict() for r in profile(spark.createDataFrame(pdf)).collect()}
    assert set(got) == {"k", "v", "n"}
    for c in ("k", "v", "n"):
        assert got[c]["n_rows"] == 500
    assert got["v"]["n_nulls"] == int(pdf["v"].isna().sum()) > 0
    assert got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 23
    assert got["n"]["n_distinct"] == 41
    assert got["n"]["min_val"] == "0" and got["n"]["max_val"] == "40"
    # column subset + guard
    assert profile(spark.createDataFrame(pdf), ["k"]).count() == 1
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile(spark.createDataFrame(pdf), ["nope"])


def test_profile_approx_distinct_close(spark, pdf):
    got = {r["column"]: r["n_distinct"]
           for r in profile(spark.createDataFrame(pdf), exact_distinct=False).collect()}
    assert abs(got["k"] - 23) <= 2 and abs(got["n"] - 41) <= 3


def test_histogram_exact_counts_and_clamping(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    hist = {r["bucket"]: r["n"] for r in numeric_histogram(sdf, "v", 0.0, 100.0, 10).collect()}
    assert len(hist) == 10
    clean = pdf["v"].dropna()
    brute = np.clip(np.floor(clean / 10.0), 0, 9).astype(int)
    for b in range(10):
        assert hist[b] == int((brute == b).sum())
    assert sum(hist.values()) == len(clean)  # every non-null row counted
    # out-of-range values clamp into edge buckets
    edge = spark.createDataFrame(pd.DataFrame({"v": [-5.0, 1000.0]}))
    eh = {r["bucket"]: r["n"] for r in numeric_histogram(edge, "v", 0.0, 100.0, 4).collect()}
    assert eh == {0: 1, 1: 0, 2: 0, 3: 1}
    with pytest.raises(ValueError, match="bins >= 1"):
        numeric_histogram(sdf, "v", 0.0, 0.0, 4)


def test_histogram_deterministic_across_parallelism(spark, pdf):
    outs = []
    for n in (1, 8):
        sdf = spark.createDataFrame(pdf).repartition(n)
        outs.append(sorted(
            (r["bucket"], r["n"])
            for r in numeric_histogram(sdf, "v", 0.0, 100.0, 16).collect()
        ))
    assert outs[0] == outs[1]
