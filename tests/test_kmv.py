"""KMV bottom-k distinct sketch: exactness, merge identity, set ops."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.kmv import (
    kmv_estimate,
    kmv_intersection_estimate,
    kmv_jaccard_estimate,
    kmv_merge,
    kmv_merge_expr,
    kmv_sketch,
)


def _items(spark, groups):
    """groups: {group: [items]} -> DataFrame(g, item)."""
    rows = [(g, it) for g, its in groups.items() for it in its]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["g", "item"]))


def test_small_set_regime_is_exact(spark):
    df = _items(spark, {"a": [f"u{i}" for i in range(40)] * 3, "b": ["x", "y"]})
    sk = kmv_sketch(df, ["g"], "item", k=64)
    got = {
        r["g"]: (len(r["kmv"]), r["est"])
        for r in sk.withColumn("est", kmv_estimate("kmv", 64)).collect()
    }
    assert got == {"a": (40, 40.0), "b": (2, 2.0)}


def test_estimation_regime_within_bound(spark):
    n, k = 20000, 128
    df = _items(spark, {"big": [f"item{i}" for i in range(n)]})
    est = (
        kmv_sketch(df, ["g"], "item", k=k)
        .select(kmv_estimate("kmv", k).alias("e"), F.size("kmv").alias("s"))
        .head()
    )
    assert est["s"] == k
    # ~1/sqrt(k) ≈ 8.8% standard error; 4 sigma for a deterministic dataset
    assert abs(est["e"] - n) / n < 4 / (k**0.5)


def test_merge_equals_one_shot(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) bit-for-bit."""
    a = _items(spark, {"g": [f"u{i}" for i in range(500)]})
    b = _items(spark, {"g": [f"u{i}" for i in range(300, 900)]})
    k = 64
    one = kmv_sketch(a.unionAll(b), ["g"], "item", k=k).head()["kmv"]
    parts = kmv_sketch(a, ["g"], "item", k=k).unionAll(
        kmv_sketch(b, ["g"], "item", k=k)
    )
    merged = kmv_merge(parts, ["g"], k=k).head()["kmv"]
    assert merged == one
    # the pure-expression two-sketch merge agrees too
    sa = kmv_sketch(a, ["g"], "item", k=k).select(F.col("kmv").alias("ka"))
    sb = kmv_sketch(b, ["g"], "item", k=k).select(F.col("kmv").alias("kb"))
    expr = sa.crossJoin(sb).select(kmv_merge_expr("ka", "kb", k).alias("m")).head()["m"]
    assert expr == one


def test_intersection_and_jaccard_exact_below_capacity(spark):
    a = _items(spark, {"g": [f"u{i}" for i in range(100)]})
    b = _items(spark, {"g": [f"u{i}" for i in range(60, 160)]})
    k = 256  # both sets fit -> everything exact
    sa = kmv_sketch(a, ["g"], "item", k=k).select(F.col("kmv").alias("ka"))
    sb = kmv_sketch(b, ["g"], "item", k=k).select(F.col("kmv").alias("kb"))
    row = (
        sa.crossJoin(sb)
        .select(
            kmv_intersection_estimate("ka", "kb", k).alias("i"),
            kmv_jaccard_estimate("ka", "kb", k).alias("j"),
        )
        .head()
    )
    assert row["i"] == 40.0
    assert row["j"] == 40.0 / 160.0


def test_intersection_estimate_large_sets(spark):
    n, overlap, k = 8000, 2000, 256
    a = _items(spark, {"g": [f"u{i}" for i in range(n)]})
    b = _items(spark, {"g": [f"u{i}" for i in range(n - overlap, 2 * n - overlap)]})
    sa = kmv_sketch(a, ["g"], "item", k=k).select(F.col("kmv").alias("ka"))
    sb = kmv_sketch(b, ["g"], "item", k=k).select(F.col("kmv").alias("kb"))
    est = sa.crossJoin(sb).select(
        kmv_intersection_estimate("ka", "kb", k).alias("i")
    ).head()["i"]
    assert abs(est - overlap) / overlap < 0.35  # deterministic for this data


def test_deterministic_across_parallelism(spark):
    df = _items(spark, {"g": [f"u{i}" for i in range(5000)]})
    k = 64
    a = kmv_sketch(df.repartition(1), ["g"], "item", k=k).head()["kmv"]
    b = kmv_sketch(df.repartition(16), ["g"], "item", k=k).head()["kmv"]
    assert a == b and len(a) == k and a == sorted(a)


def test_prefilter_shortfall_raises(spark):
    df = _items(spark, {"g": [f"u{i}" for i in range(5000)]})
    with pytest.raises(Exception, match="prefilter shortfall"):
        kmv_sketch(df, ["g"], "item", k=64, prefilter_margin=0.0001).collect()


def test_k_guard(spark):
    df = _items(spark, {"g": ["x"]})
    with pytest.raises(ValueError):
        kmv_sketch(df, ["g"], "item", k=1)


def test_kmins_cells_bounded_and_deterministic(spark):
    from tstore_spark.operators.kmv import kmins_cells

    df = _items(spark, {"g": [f"u{i}" for i in range(5000)]})
    k = 32
    a = sorted(map(tuple, kmins_cells(df.repartition(1), ["g"], "item", k=k).collect()))
    b = sorted(map(tuple, kmins_cells(df.repartition(16), ["g"], "item", k=k).collect()))
    assert a == b and len(a) <= k
    assert all(0 <= r[1] < k for r in a)


def test_kmins_estimate_within_bound(spark):
    from tstore_spark.operators.kmv import kmins_cells, kmins_estimate

    n, k = 20000, 256
    df = _items(spark, {"big": [f"item{i}" for i in range(n)]})
    est = kmins_estimate(kmins_cells(df, ["g"], "item", k=k), ["g"], k=k).head()[
        "distinct_est"
    ]
    assert abs(est - n) / n < 4 / (k**0.5)


def test_kmins_jaccard_planted_overlap(spark):
    from tstore_spark.operators.kmv import kmins_cells, kmins_jaccard

    k = 256
    a = _items(spark, {"g": [f"u{i}" for i in range(4000)]})
    b = _items(spark, {"g": [f"u{i}" for i in range(3000, 7000)]})
    # |A ∩ B| = 1000, |A ∪ B| = 7000 -> J = 1/7
    ca = kmins_cells(a, ["g"], "item", k=k)
    cb = kmins_cells(b, ["g"], "item", k=k)
    j = kmins_jaccard(ca, cb, ["g"], k=k).head()["jaccard_est"]
    assert abs(j - 1 / 7) < 4 * ((1 / 7) * (6 / 7) / k) ** 0.5


def test_difference_exact_below_capacity(spark):
    from tstore_spark.operators.kmv import kmv_difference_estimate, kmv_sketch

    rows = [("a", f"u{i}") for i in range(40)] + [("b", f"u{i}") for i in range(25, 70)]
    df = spark.createDataFrame(rows, "grp string, item string")
    sk = kmv_sketch(df, ["grp"], "item", k=256)
    a = sk.where("grp = 'a'").select(F.col("kmv").alias("ka"))
    b = sk.where("grp = 'b'").select(F.col("kmv").alias("kb"))
    (row,) = (
        a.crossJoin(b)
        .select(
            kmv_difference_estimate("ka", "kb", k=256).alias("a_minus_b"),
            kmv_difference_estimate("kb", "ka", k=256).alias("b_minus_a"),
        )
        .collect()
    )
    # exact below capacity: |A\B| = 25 (u0..u24), |B\A| = 30 (u40..u69)
    assert row["a_minus_b"] == 25.0
    assert row["b_minus_a"] == 30.0
