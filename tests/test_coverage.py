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


# ---------------------------------------------------------------------------
# gap_profile (heartbeat / staleness)
# ---------------------------------------------------------------------------


def _gap_series(spark):
    import pandas as pd

    rows = []
    # key A: minutes 0..9 then 13..15 then 30 (gaps of 3 and 15 windows-ish)
    for m in list(range(10)) + [13, 14, 15, 30]:
        rows.append(("A", pd.Timestamp("2024-01-01 00:00:30") + pd.Timedelta(minutes=m)))
    # duplicate rows inside one window must not inflate window counts
    rows.append(("A", pd.Timestamp("2024-01-01 00:05:10")))
    # key B: dense, and pre-1970 (sign-safe floor regression)
    for m in range(5):
        rows.append(("B", pd.Timestamp("1969-12-31 23:58:20") + pd.Timedelta(minutes=m)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts"]))


def test_gap_profile_counts_and_longest_gap(spark):
    import pandas as pd

    from tstore_spark.operators.coverage import gap_profile

    got = {r["key"]: r.asDict() for r in gap_profile(
        _gap_series(spark), "key", "ts", 60).collect()}
    a = got["A"]
    assert a["n_rows"] == 15 and a["n_windows"] == 14
    assert a["first_window"] == pd.Timestamp("2024-01-01 00:00:00")
    assert a["last_window"] == pd.Timestamp("2024-01-01 00:30:00")
    assert a["expected_windows"] == 31 and a["missing_windows"] == 17
    # biggest hole: 00:15 -> 00:30 = 900s minus one step
    assert a["longest_gap_seconds"] == 840
    b = got["B"]
    assert b["n_windows"] == 5 and b["missing_windows"] == 0
    assert b["longest_gap_seconds"] == 0
    # pre-1970 floor rounds DOWN (toward earlier wall time), never up
    assert b["first_window"] == pd.Timestamp("1969-12-31 23:58:00")


def test_gap_profile_staleness(spark):
    from tstore_spark.operators.coverage import gap_profile

    got = {r["key"]: r.asDict() for r in gap_profile(
        _gap_series(spark), "key", "ts", 60,
        as_of="2024-01-01 00:33:00", max_age_seconds=120).collect()}
    # A's last raw observation is 00:30:30 -> age 150s > 120 -> stale
    assert got["A"]["age_seconds"] == 150 and got["A"]["stale"] is True
    assert got["B"]["stale"] is True  # 1969 series is long gone
    fresh = {r["key"]: r["stale"] for r in gap_profile(
        _gap_series(spark), "key", "ts", 60,
        as_of="2024-01-01 00:31:00").collect()}
    assert fresh["A"] is False  # age 30s <= default bar of one step


def test_gap_profile_guards_and_determinism(spark):
    import pytest as _pt

    from tstore_spark.operators.coverage import gap_profile

    df = _gap_series(spark)
    with _pt.raises(ValueError, match="step_seconds"):
        gap_profile(df, "key", "ts", 0)
    with _pt.raises(ValueError, match="as_of"):
        gap_profile(df, "key", "ts", 60, max_age_seconds=10)

    def run(parts):
        return sorted(tuple(r) for r in gap_profile(
            df.repartition(parts), "key", "ts", 60).collect())

    assert run(1) == run(16)


def test_out_of_order_profile_matches_brute_force(spark):
    from tstore_spark.operators.coverage import out_of_order_profile

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # key a: arrival order 0..5, event times with two regressions
    times_a = [0, 10, 5, 20, 3, 25]  # minutes
    for i, m in enumerate(times_a):
        rows.append(("a", i, t0 + pd.Timedelta(minutes=m)))
    # key b: perfectly ordered
    for i in range(4):
        rows.append(("b", i, t0 + pd.Timedelta(minutes=i)))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "seq", "ts"]).astype(
            {"ts": "datetime64[us]"})
    )
    got = {r["key"]: (r["n_rows"], r["n_late"], r["max_lateness_us"],
                      r["sum_lateness_us"])
           for r in out_of_order_profile(sdf, "k", "seq", "ts").collect()}
    M = 60 * 1_000_000
    # a: row2 late by 5m (max prior 10), row4 late by 17m (max prior 20)
    assert got["a"] == (6, 2, 17 * M, (5 + 17) * M)
    assert got["b"] == (4, 0, 0, 0)


def test_out_of_order_deterministic_across_parallelism(spark):
    from tstore_spark.operators.coverage import out_of_order_profile

    t0 = pd.Timestamp("2024-01-01")
    rows = [(f"k{i % 5}", i, t0 + pd.Timedelta(seconds=(i * 7919) % 1000))
            for i in range(2000)]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "seq", "ts"]).astype(
            {"ts": "datetime64[us]"})
    )
    a = sorted(map(tuple, out_of_order_profile(
        sdf.repartition(1), "k", "seq", "ts").collect()))
    b = sorted(map(tuple, out_of_order_profile(
        sdf.repartition(17), "k", "seq", "ts").collect()))
    assert a == b
