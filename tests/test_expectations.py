"""Expectations: single-scan report, NULL-as-violation, quarantine split."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.expectations import expectation_report, quarantine


@pytest.fixture(scope="module")
def messy(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "v": [10.0, -1.0, None, 5.0, -2.0, 0.0],
            "kind": ["a", "b", "a", "zz", "b", None],
        }
    )
    return spark.createDataFrame(pdf)


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "v_non_negative": F.col("v") >= 0,
        "kind_known": F.col("kind").isin("a", "b"),
    }


def test_report_counts(spark, messy):
    rep = {r["rule"]: r for r in expectation_report(messy, _rules()).collect()}
    assert rep["v_non_negative"]["n_rows"] == 6
    # -1, -2 violate; NULL v is a violation too (three-valued-logic guard)
    assert rep["v_non_negative"]["n_violations"] == 3
    assert rep["kind_known"]["n_violations"] == 2  # 'zz' and NULL


def test_quarantine_split(spark, messy):
    clean, bad = quarantine(messy, _rules())
    assert {r["id"] for r in clean.collect()} == {1}  # only row 1 passes both
    got = {r["id"]: list(r["failed_rules"]) for r in bad.collect()}
    assert got[2] == ["v_non_negative"]
    assert got[4] == ["kind_known"]
    assert got[3] == ["v_non_negative"]
    assert got[6] == ["kind_known"]
    assert got[5] == ["v_non_negative"]
    assert clean.count() + bad.count() == 6


def test_empty_rules_rejected(spark, messy):
    with pytest.raises(ValueError):
        expectation_report(messy, {})
    with pytest.raises(ValueError):
        quarantine(messy, {})
