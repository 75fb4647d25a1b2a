"""Interval union/difference/intersection: brute-force minute-grid oracle,
touch semantics, guards, determinism across parallelism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.coverage import interval_difference, interval_union

T0 = pd.Timestamp("2024-01-01")


def _iv(key, s_min, e_min):
    return (key, T0 + pd.Timedelta(minutes=s_min), T0 + pd.Timedelta(minutes=e_min))


def _sdf(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "s", "e"]).astype(
            {"s": "datetime64[us]", "e": "datetime64[us]"}
        )
    )


def _covered_minutes(rows, key):
    """Brute force: the set of covered minute indices (intervals here are
    minute-aligned, so the minute grid is exact)."""
    out = set()
    for k, s, e in rows:
        if k == key:
            a = int((s - T0).total_seconds() // 60)
            b = int((e - T0).total_seconds() // 60)
            out |= set(range(a, b))
    return out


def _islands(mins):
    """Sorted minute-set -> list of (start_min, end_min) maximal runs."""
    isl, run = [], None
    for m in sorted(mins):
        if run and m == run[1]:
            run[1] = m + 1
        else:
            if run:
                isl.append(tuple(run))
            run = [m, m + 1]
    if run:
        isl.append(tuple(run))
    return isl


BASE = [
    _iv("a", 0, 10), _iv("a", 5, 20), _iv("a", 20, 30),  # one island [0,30)
    _iv("a", 40, 45), _iv("a", 41, 43),                  # island [40,45)
    _iv("b", 0, 60),
    _iv("c", 0, 5),
]
SUB = [
    _iv("a", 8, 12),    # punches a hole inside [0,30)
    _iv("a", 25, 41),   # spans the gap and bites into [40,45)
    _iv("b", 0, 60),    # erases b entirely
    _iv("d", 0, 99),    # key absent from base: no effect
]


def test_union_matches_brute_force(spark):
    out = interval_union(_sdf(spark, BASE), "k", "s", "e").collect()
    for key in "abc":
        want = _islands(_covered_minutes(BASE, key))
        rows = sorted(
            (r["island_start"], r["island_end"], r["duration_micros"])
            for r in out
            if r["key"] == key
        )
        assert [
            (int((s - T0).total_seconds() // 60), int((e - T0).total_seconds() // 60))
            for s, e, _ in rows
        ] == want, key
        for s, e, d in rows:
            assert d == int((e - s).total_seconds() * 1_000_000)
    a_rows = [r for r in out if r["key"] == "a"]
    assert sorted(r["n_intervals"] for r in a_rows) == [2, 3]


@pytest.mark.parametrize("mode", ["difference", "intersection"])
def test_algebra_matches_brute_force(spark, mode):
    out = interval_difference(
        _sdf(spark, BASE), _sdf(spark, SUB), "k", "s", "e", mode=mode
    ).collect()
    for key in "abcd":
        b, s = _covered_minutes(BASE, key), _covered_minutes(SUB, key)
        want = _islands(b - s if mode == "difference" else b & s)
        rows = sorted(
            (r["part_start"], r["part_end"], r["duration_micros"])
            for r in out
            if r["key"] == key
        )
        assert [
            (int((ps - T0).total_seconds() // 60), int((pe - T0).total_seconds() // 60))
            for ps, pe, _ in rows
        ] == want, (key, mode)
        for ps, pe, d in rows:
            assert d == int((pe - ps).total_seconds() * 1_000_000)


def test_touching_subtraction_keeps_boundary_exact(spark):
    # sub ends exactly where base starts: nothing removed; sub starting at
    # base end: nothing removed ([start, end) semantics both sides)
    base = [_iv("x", 10, 20)]
    sub = [_iv("x", 0, 10), _iv("x", 20, 30)]
    out = interval_difference(_sdf(spark, base), _sdf(spark, sub), "k", "s", "e")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["duration_micros"] == 10 * 60 * 1_000_000


def test_empty_sub_is_identity_with_union(spark):
    u = interval_union(_sdf(spark, BASE), "k", "s", "e")
    empty = _sdf(spark, BASE).where(F.lit(False))
    d = interval_difference(_sdf(spark, BASE), empty, "k", "s", "e")
    assert sorted(
        (r["key"], r["island_start"], r["island_end"], r["duration_micros"])
        for r in u.collect()
    ) == sorted(
        (r["key"], r["part_start"], r["part_end"], r["duration_micros"])
        for r in d.collect()
    )


def test_guards(spark):
    bad = _sdf(spark, [_iv("x", 5, 5)])
    with pytest.raises(Exception, match="end > start"):
        interval_union(bad, "k", "s", "e").collect()
    with pytest.raises(ValueError, match="mode must be"):
        interval_difference(bad, bad, "k", "s", "e", mode="xor")


def test_deterministic_across_parallelism(spark):
    rows = BASE * 20
    outs = []
    for n in (1, 7):
        out = interval_difference(
            _sdf(spark, rows).repartition(n), _sdf(spark, SUB).repartition(n),
            "k", "s", "e",
        )
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]
