"""Count-min sketch: overestimate theorem, register-exact merge, bounded
state, determinism across parallelism, and keyed sketches."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.countmin import (
    cms_estimate,
    cms_from_items,
    cms_merge,
)

D, W = 4, 512


@pytest.fixture(scope="module")
def items(spark):
    # zipf-ish corpus: token t_i appears ~ 3000/i times, planted heavy hitter
    rows = []
    for i in range(1, 200):
        rows.extend([f"t{i}"] * (3000 // i))
    rows.extend(["HEAVY"] * 5000)
    pdf = pd.DataFrame({"tok": rows, "day": [i % 3 for i in range(len(rows))]})
    return spark.createDataFrame(pdf)


def _exact(items):
    return items.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))


def test_estimate_never_underestimates(spark, items):
    exact = _exact(items)
    sk = cms_from_items(items, "tok", d=D, w=W)
    est = cms_estimate(sk, exact.select("tok"), "tok", d=D, w=W)
    j = est.join(exact, "tok")
    assert j.where(F.col("cms_est") < F.col("cnt")).count() == 0


def test_heavy_hitter_accuracy(spark, items):
    n = items.count()
    exact = _exact(items)
    sk = cms_from_items(items, "tok", d=D, w=W)
    est = cms_estimate(sk, exact.select("tok"), "tok", d=D, w=W)
    j = est.join(exact, "tok").where(F.col("tok") == "HEAVY").head()
    assert j["cms_est"] - j["cnt"] <= 3 * n / W


def test_merge_is_register_exact(spark, items):
    """Per-day sketches merged cell-wise == the one-shot sketch of the union
    (frame equality, not approximate agreement)."""
    one_shot = cms_from_items(items, "tok", d=D, w=W)
    per_day = cms_from_items(items, "tok", keys=["day"], d=D, w=W)
    merged = cms_merge(per_day.drop("day"))
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0


def test_state_bound(spark, items):
    sk = cms_from_items(items, "tok", d=D, w=W)
    assert sk.count() <= D * W


def test_deterministic_across_parallelism(spark, items):
    a = cms_from_items(items.repartition(1), "tok", d=D, w=W)
    b = cms_from_items(items.repartition(16), "tok", d=D, w=W)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_unseen_item_small(spark, items):
    n = items.count()
    sk = cms_from_items(items, "tok", d=D, w=W)
    probe = spark.createDataFrame(pd.DataFrame({"tok": ["never-seen-xyz"]}))
    est = cms_estimate(sk, probe, "tok", d=D, w=W).head()
    assert 0 <= est["cms_est"] <= 3 * n / W


def test_keyed_sketch_isolated(spark, items):
    """Keyed sketches estimate within their group only."""
    sk = cms_from_items(items, "tok", keys=["day"], d=D, w=W)
    exact = items.groupBy("day", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    est = cms_estimate(sk, exact.select("day", "tok"), "tok", keys=["day"], d=D, w=W)
    j = est.join(exact, ["day", "tok"])
    assert j.where(F.col("cms_est") < F.col("cnt")).count() == 0
    heavy = j.where((F.col("tok") == "HEAVY")).collect()
    assert len(heavy) == 3
    total_exact = sum(r["cnt"] for r in heavy)
    assert total_exact == 5000
