"""Distribution drift: counts/shares vs pandas, TVD + chi2 vs scipy-free
reference, missing-category handling, guards."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.drift import (
    categorical_drift,
    drift_summary,
    drift_summary_table,
)


@pytest.fixture(scope="module")
def two_sides(spark):
    rng = np.random.default_rng(13)
    a = rng.choice(["en", "de", "fr", "es"], 2000, p=[0.7, 0.15, 0.1, 0.05])
    b = rng.choice(["en", "de", "fr", "zh"], 1500, p=[0.5, 0.2, 0.1, 0.2])
    df_a = spark.createDataFrame(pd.DataFrame({"lang": a}))
    df_b = spark.createDataFrame(pd.DataFrame({"lang": b}))
    return df_a, df_b, pd.Series(a), pd.Series(b)


def test_per_category_counts_and_shares(spark, two_sides):
    df_a, df_b, a, b = two_sides
    got = {r["category"]: r for r in categorical_drift(df_a, df_b, "lang").collect()}
    assert set(got) == {"en", "de", "fr", "es", "zh"}
    for c, r in got.items():
        na, nb = int((a == c).sum()), int((b == c).sum())
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["share_a"] == pytest.approx(na / len(a), abs=1e-12)
        assert r["share_b"] == pytest.approx(nb / len(b), abs=1e-12)
    assert got["es"]["n_b"] == 0 and got["zh"]["n_a"] == 0  # one-sided cats


def test_summary_matches_reference(spark, two_sides):
    df_a, df_b, a, b = two_sides
    s = drift_summary(df_a, df_b, "lang")
    cats = sorted(set(a) | set(b))
    pa = np.array([(a == c).mean() for c in cats])
    pb = np.array([(b == c).mean() for c in cats])
    assert s["tvd"] == pytest.approx(0.5 * np.abs(pa - pb).sum(), abs=1e-12)
    na = np.array([(a == c).sum() for c in cats], dtype=float)
    nb = np.array([(b == c).sum() for c in cats], dtype=float)
    ta, tb = na.sum(), nb.sum()
    ea, eb = (na + nb) * ta / (ta + tb), (na + nb) * tb / (ta + tb)
    chi = (((na - ea) ** 2) / ea + ((nb - eb) ** 2) / eb).sum()
    assert s["chi2"] == pytest.approx(chi, rel=1e-12)
    from tstore_spark.operators.drift import PSI_EPS

    ca, cb = np.maximum(pa, PSI_EPS), np.maximum(pb, PSI_EPS)
    psi = ((ca - cb) * np.log(ca / cb)).sum()
    assert s["psi"] == pytest.approx(psi, rel=1e-12) and s["psi"] > 0
    assert s["n_categories"] == 5 and s["n_a"] == 2000 and s["n_b"] == 1500


def test_identical_distributions_have_zero_drift(spark, two_sides):
    df_a, _, _, _ = two_sides
    s = drift_summary(df_a, df_a, "lang")
    assert s["tvd"] == 0.0 and s["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_numeric_drift_buckets(spark):
    from tstore_spark.operators.drift import numeric_drift

    rng = np.random.default_rng(17)
    a = rng.uniform(0, 100, 1000)
    b = rng.uniform(20, 120, 800)  # shifted distribution
    df_a = spark.createDataFrame(pd.DataFrame({"v": a}))
    df_b = spark.createDataFrame(pd.DataFrame({"v": b}))
    got = {r["bucket"]: r for r in numeric_drift(df_a, df_b, "v", 0.0, 120.0, 12).collect()}
    assert len(got) == 12
    ba = np.clip(np.floor(a / 10.0), 0, 11).astype(int)
    bb = np.clip(np.floor(b / 10.0), 0, 11).astype(int)
    for k in range(12):
        assert got[k]["n_a"] == int((ba == k).sum())
        assert got[k]["n_b"] == int((bb == k).sum())
        assert got[k]["share_diff"] == pytest.approx(
            (ba == k).mean() - (bb == k).mean(), abs=1e-12)
    # drift direction: low buckets heavier in A, high buckets in B
    assert got[0]["share_diff"] > 0 and got[11]["share_diff"] < 0


def test_guard_on_empty_side(spark, two_sides):
    """The guard is in-plan (riding the returned share columns) so building
    the frame runs no jobs; it raises at action time."""
    df_a, _, _, _ = two_sides
    with pytest.raises(Exception, match="both sides"):
        categorical_drift(df_a, df_a.where(F.lit(False)), "lang").collect()


def test_guard_when_both_sides_empty(spark, two_sides):
    """BOTH sides empty leaves the aligned frame with zero rows, so the
    per-row guard can't fire; the summary forms must still raise the loud
    error (the agg emits 1 row; the guard rides its columns) instead of
    crashing on float(None). categorical_drift documents empty->empty."""
    from tstore_spark.operators.drift import drift_summary

    df_a, _, _, _ = two_sides
    empty = df_a.where(F.lit(False))
    assert categorical_drift(empty, empty, "lang").count() == 0
    with pytest.raises(Exception, match="both sides"):
        drift_summary_table(empty, empty, "lang").collect()
    with pytest.raises(Exception, match="both sides"):
        drift_summary(empty, empty, "lang")


def test_build_runs_no_jobs(spark, two_sides):
    """An earlier shape ran two eager full-scan .head() actions per call
    just to fetch totals; totals now ride the lazy plan."""
    df_a, df_b, _, _ = two_sides
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    categorical_drift(df_a, df_b, "lang")
    drift_summary_table(df_a, df_b, "lang")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
