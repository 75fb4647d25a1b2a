"""Prometheus le-bucket histograms: counters vs brute force, quantile vs a
straight-line PromQL reference, merge algebra, edge cases, determinism."""

import bisect

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.promhist import (
    histogram_quantile,
    le_bucket_counts,
    merge_bucket_counts,
    quantile_expr,
    quantile_sql_case,
)

BOUNDS = [1.0, 2.0, 5.0, 10.0]


def _prom_quantile(q, bounds, cum, total):
    """Straight-line PromQL histogram_quantile (promql/quantile.go)."""
    if total == 0:
        return None
    rank = q * total
    for i, b in enumerate(bounds):
        if cum[i] >= rank:
            if i == 0:
                return b if b <= 0 else b * rank / cum[0]
            lo, hi = bounds[i - 1], bounds[i]
            return lo + (hi - lo) * (rank - cum[i - 1]) / (cum[i] - cum[i - 1])
    return bounds[-1]


@pytest.fixture(scope="module")
def samples():
    # key a: dense spread incl. exact-bound hits; b: all beyond last bound;
    # c: nulls only; d: single value
    rows = []
    for i, v in enumerate([0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 7.5, 9.0, 12.0, 40.0]):
        rows.append(("a", v))
    rows += [("b", 20.0), ("b", 30.0), ("b", 99.0)]
    rows += [("c", None)]
    rows += [("d", 4.25)]
    return rows


def _counts(rows, key):
    vals = [v for k, v in rows if k == key and v is not None]
    cum = [sum(1 for v in vals if v <= b) for b in BOUNDS]
    return cum, len(vals)


def test_counts_match_brute_force(spark, samples):
    sdf = spark.createDataFrame(samples, "k string, value double")
    got = {r["k"]: ([r[f"le_{i}"] for i in range(4)], r["n_total"])
           for r in le_bucket_counts(sdf, ["k"], "value", BOUNDS).collect()}
    for key in "abcd":
        assert got[key] == _counts(samples, key), key


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9, 0.99, 1.0])
def test_quantile_matches_promql_reference(spark, samples, q):
    sdf = spark.createDataFrame(samples, "k string, value double")
    bc = le_bucket_counts(sdf, ["k"], "value", BOUNDS)
    got = {r["k"]: r["q_" + str(q).replace(".", "_")]
           for r in histogram_quantile(bc, [q], BOUNDS, ["k"]).collect()}
    for key in "abcd":
        cum, total = _counts(samples, key)
        want = _prom_quantile(q, BOUNDS, cum, total)
        if want is None:
            assert got[key] is None, key
        else:
            assert got[key] == pytest.approx(want, abs=0), (key, q)


def test_quantile_monotone_in_q(spark, samples):
    sdf = spark.createDataFrame(samples, "k string, value double")
    bc = le_bucket_counts(sdf, ["k"], "value", BOUNDS)
    out = histogram_quantile(bc, [0.25, 0.5, 0.75, 1.0], BOUNDS, ["k"])
    for r in out.where(F.col("n_total") > 0).collect():
        qs = [r["q_0_25"], r["q_0_5"], r["q_0_75"], r["q_1_0"]]
        assert qs == sorted(qs)


def test_rank_in_inf_bucket_returns_top_bound(spark):
    sdf = spark.createDataFrame([("x", 50.0), ("x", 60.0)], "k string, value double")
    bc = le_bucket_counts(sdf, ["k"], "value", BOUNDS)
    r = histogram_quantile(bc, [0.5], BOUNDS, ["k"]).collect()[0]
    assert r["q_0_5"] == BOUNDS[-1]


def test_nonpositive_first_bound_returns_bound(spark):
    bounds = [-1.0, 0.0, 1.0]
    sdf = spark.createDataFrame([("x", -5.0), ("x", -3.0)], "k string, value double")
    bc = le_bucket_counts(sdf, ["k"], "value", bounds)
    r = histogram_quantile(bc, [0.5], bounds, ["k"]).collect()[0]
    assert r["q_0_5"] == -1.0  # first-bucket bound <= 0: no zero-edge interpolation


def test_merge_equals_direct(spark, samples):
    sdf = spark.createDataFrame(
        [(k, v, i % 3) for i, (k, v) in enumerate(samples)],
        "k string, value double, shard int",
    )
    per_shard = le_bucket_counts(sdf, ["k", "shard"], "value", BOUNDS)
    merged = merge_bucket_counts(per_shard, ["k"], len(BOUNDS))
    direct = le_bucket_counts(sdf, ["k"], "value", BOUNDS)
    cols = ["k"] + [f"le_{i}" for i in range(4)] + ["n_total"]
    assert sorted(map(tuple, merged.select(cols).collect())) == sorted(
        map(tuple, direct.select(cols).collect())
    )


def test_sql_twin_matches_spark_bits(spark, samples):
    import duckdb

    sdf = spark.createDataFrame(samples, "k string, value double")
    bc = le_bucket_counts(sdf, ["k"], "value", BOUNDS)
    pdf = bc.toPandas()
    spark_vals = {
        r["k"]: r["q_0_9"]
        for r in bc.select("k", quantile_expr(0.9, BOUNDS).alias("q_0_9")).collect()
    }
    case = quantile_sql_case(0.9, BOUNDS)
    duck = duckdb.sql(f"SELECT k, {case} AS q FROM pdf").fetchall()
    for k, v in duck:
        if v is None:
            assert spark_vals[k] is None
        else:
            assert spark_vals[k] == v, k  # exact bit equality


def test_guards(spark):
    sdf = spark.createDataFrame([("x", 1.0)], "k string, value double")
    with pytest.raises(ValueError, match="strictly increasing"):
        le_bucket_counts(sdf, ["k"], "value", [1.0, 1.0])
    with pytest.raises(ValueError, match="q must be"):
        quantile_expr(0.0, BOUNDS)
    with pytest.raises(ValueError, match="q must be"):
        quantile_expr(1.5, BOUNDS)


def test_deterministic_across_parallelism(spark, samples):
    sdf = spark.createDataFrame(samples * 50, "k string, value double")
    outs = []
    for n in (1, 7):
        bc = le_bucket_counts(sdf.repartition(n), ["k"], "value", BOUNDS)
        out = histogram_quantile(bc, [0.5, 0.99], BOUNDS, ["k"])
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]


def test_quantile_twins_bit_identical_adversarial(spark):
    """The generated SQL twin must match the Spark expression BIT-FOR-BIT
    on counts engineered to hit divergent branches — including the round-3
    advice counterexample shape (n_total=3, q=0.9: a DECIMAL rank in
    DuckDB gave 1.7 vs Spark's 1.7000000000000002 before every literal
    was CAST AS DOUBLE)."""
    import duckdb
    import pandas as pd

    from tstore_spark.operators.promhist import quantile_expr, quantile_sql_case

    bounds = [5.0, 10.0, 25.0, 50.0, 100.0]
    cases = []
    for n_total in [1, 2, 3, 5, 7, 9, 10, 33, 100]:
        for cum in (
            [0, 1, 2, 2, n_total],
            [1, 1, 2, 3, n_total],
            [0, 0, 0, 0, n_total],
            [n_total] * 5,
            [0, 2, 3, 3, n_total],
        ):
            if any(cum[i] > cum[i + 1] for i in range(4)) or cum[-1] != n_total:
                continue
            cases.append(cum + [n_total])
    pdf = pd.DataFrame(
        cases, columns=["le_0", "le_1", "le_2", "le_3", "le_4", "n_total"]
    )
    qs = [0.5, 0.9, 0.99, 0.3333333]
    got = spark.createDataFrame(pdf).select(
        *[quantile_expr(q, bounds).alias(f"q{i}") for i, q in enumerate(qs)]
    ).collect()
    con = duckdb.connect()
    con.register("t", pdf)
    exprs = ", ".join(
        f"{quantile_sql_case(q, bounds)} AS q{i}" for i, q in enumerate(qs)
    )
    want = con.execute(f"SELECT {exprs} FROM t").fetchall()
    for srow, drow in zip(got, want):
        for i in range(len(qs)):
            assert srow[f"q{i}"] == drow[i] or (
                srow[f"q{i}"] is None and drow[i] is None
            ), (srow, drow, i)
