"""Interval coverage: union length vs a brute-force merge, touch/overlap
semantics, guard, determinism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.coverage import interval_coverage

T0 = pd.Timestamp("2024-01-01")


def _iv(key, s_min, e_min):
    return (key, T0 + pd.Timedelta(minutes=s_min), T0 + pd.Timedelta(minutes=e_min))


def _brute(rows):
    out = {}
    for k in {r[0] for r in rows}:
        ivs = sorted((r[1], r[2]) for r in rows if r[0] == k)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        out[k] = (
            len(ivs),
            len(merged),
            int(sum((e - s).total_seconds() for s, e in merged)),
        )
    return out


@pytest.fixture(scope="module")
def intervals():
    rows = [
        _iv("a", 0, 10),     # overlaps next
        _iv("a", 5, 20),     # extends island
        _iv("a", 20, 30),    # TOUCHES (end == start): merges
        _iv("a", 40, 45),    # gap -> second island
        _iv("a", 41, 43),    # nested inside
        _iv("b", 0, 60),     # one long interval
        _iv("b", 10, 20),    # fully nested
        _iv("c", 0, 1),      # singleton
    ]
    return rows


def test_coverage_matches_brute_force(spark, intervals):
    sdf = spark.createDataFrame(
        pd.DataFrame(intervals, columns=["k", "s", "e"]).astype(
            {"s": "datetime64[us]", "e": "datetime64[us]"}
        )
    )
    got = {r["key"]: (r["n_intervals"], r["n_islands"], r["covered_seconds"])
           for r in interval_coverage(sdf, "k", "s", "e").collect()}
    assert got == _brute(intervals)
    assert got["a"] == (5, 2, 30 * 60 + 5 * 60)  # [0,30) + [40,45)
    assert got["b"] == (2, 1, 3600)


def test_guard_rejects_empty_intervals(spark, intervals):
    bad = intervals + [_iv("z", 5, 5)]
    sdf = spark.createDataFrame(
        pd.DataFrame(bad, columns=["k", "s", "e"]).astype(
            {"s": "datetime64[us]", "e": "datetime64[us]"}
        )
    )
    # the guard is folded into the single scan (no eager validation pass),
    # so it fires at action time as a Spark job failure carrying the message
    with pytest.raises(Exception, match="end > start"):
        interval_coverage(sdf, "k", "s", "e").collect()


def test_coverage_deterministic_across_parallelism(spark, intervals):
    pdf = pd.DataFrame(intervals, columns=["k", "s", "e"]).astype(
        {"s": "datetime64[us]", "e": "datetime64[us]"}
    )
    outs = []
    for n in (1, 8):
        sdf = spark.createDataFrame(pdf).repartition(n)
        outs.append(sorted(
            tuple(r) for r in interval_coverage(sdf, "k", "s", "e").collect()
        ))
    assert outs[0] == outs[1]
