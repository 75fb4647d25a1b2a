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


def test_benford_profile_matches_brute_force(spark):
    import math

    from pyspark.sql import functions as F

    from tstore_spark.operators.profile import BENFORD_P, benford_profile

    vals = [(("a" if i % 2 else "b"), float(v)) for i, v in enumerate(
        [1.23, 12.3, 19.99, 0.02, 0.0, -5.0, 91.0, 88.8, 3.33, 7.0, 100.0])]
    df = spark.createDataFrame(vals, "k string, v double")
    out = {r["k"]: r for r in benford_profile(
        df, ["k"], F.round(F.col("v") * 100).cast("long")).collect()}

    want = {}
    for k, v in vals:
        cents = round(v * 100)
        if cents <= 0:
            continue
        d = int(str(cents)[0])
        n, cs = want.get(k, (0, {}))
        cs[d] = cs.get(d, 0) + 1
        want[k] = (n + 1, cs)
    assert set(out) == set(want)
    for k, (n, cs) in want.items():
        assert out[k]["n_total"] == n
        for d in range(1, 10):
            assert out[k][f"c_{d}"] == cs.get(d, 0), (k, d)
        chi2 = 0.0
        for d in range(1, 10):
            e = n * BENFORD_P[d]
            chi2 = chi2 + (cs.get(d, 0) - e) * (cs.get(d, 0) - e) / e
        assert math.isclose(out[k]["chi2"], chi2, rel_tol=1e-12), k


def test_benford_uniform_digits_scores_high(spark):
    from pyspark.sql import functions as F

    from tstore_spark.operators.profile import benford_profile

    # uniform first digits (fabricated-looking) vs geometric (benford-ish)
    uni = [("u", float(d) * 10 + 1) for d in range(1, 10)] * 40
    ben = [("g", float(v)) for v in
           [1, 1, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5, 6, 7, 9] * 24]
    df = spark.createDataFrame(uni + ben, "k string, v double")
    out = {r["k"]: r["chi2"] for r in benford_profile(
        df, ["k"], F.round(F.col("v") * 100).cast("long")).collect()}
    assert out["u"] > out["g"]


def test_benford_deterministic_across_parallelism(spark):
    from pyspark.sql import functions as F

    from tstore_spark.operators.profile import benford_profile

    vals = [(f"k{i % 3}", float(1 + (i * 7919) % 997) / 7.0) for i in range(3000)]
    df = spark.createDataFrame(vals, "k string, v double")
    cents = F.round(F.col("v") * 100).cast("long")
    a = sorted(map(tuple, benford_profile(df.repartition(1), ["k"], cents).collect()))
    b = sorted(map(tuple, benford_profile(df.repartition(17), ["k"], cents).collect()))
    assert a == b
