"""Bucketed range joins: hand-computed point/interval fixtures, randomized
equivalence vs a naive cross-join filter, exactly-once pair emission,
boundary semantics, left-join null handling, no-cartesian plan assertion."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.rangejoin import interval_overlap_join, interval_point_join


def _points(spark, rows):
    pdf = pd.DataFrame(rows, columns=["key", "ts", "pid"])
    return spark.createDataFrame(pdf).withColumn("ts", F.to_timestamp_ntz("ts"))


def _intervals(spark, rows, start="start", end="end"):
    pdf = pd.DataFrame(rows, columns=["key", start, end, "iid"])
    return (
        spark.createDataFrame(pdf)
        .withColumn(start, F.to_timestamp_ntz(start))
        .withColumn(end, F.to_timestamp_ntz(end))
    )


def test_point_join_hand_computed_closed_open(spark):
    pts = _points(
        spark,
        [
            ("a", "2024-01-01 10:00:00", 1),  # == start: in
            ("a", "2024-01-01 11:30:00", 2),  # == end: OUT (closed-open)
            ("a", "2024-01-01 10:59:59", 3),
            ("a", "2024-01-01 12:00:00", 4),  # after
            ("b", "2024-01-01 10:30:00", 5),  # other key
        ],
    )
    ivs = _intervals(spark, [("a", "2024-01-01 10:00:00", "2024-01-01 11:30:00", 100)])
    got = sorted(
        r["pid"]
        for r in interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"]).collect()
    )
    assert got == [1, 3]


def test_point_join_left_keeps_unmatched(spark):
    pts = _points(
        spark,
        [
            ("a", "2024-01-01 10:30:00", 1),
            ("a", "2024-01-01 13:00:00", 2),  # no interval
        ],
    )
    ivs = _intervals(spark, [("a", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 7)])
    out = interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"], how="left")
    rows = {r["pid"]: r["iid"] for r in out.collect()}
    assert rows == {1: 7, 2: None}


def test_point_join_randomized_equals_naive(spark):
    rng = np.random.default_rng(5)
    t0 = pd.Timestamp("2024-01-01")
    pts = _points(
        spark,
        [
            (f"k{i % 3}", str(t0 + pd.Timedelta(seconds=int(s))), i)
            for i, s in enumerate(rng.integers(0, 86400 * 3, 400))
        ],
    )
    ivs = _intervals(
        spark,
        [
            (
                f"k{i % 3}",
                str(t0 + pd.Timedelta(seconds=int(s))),
                str(t0 + pd.Timedelta(seconds=int(s) + int(d))),
                1000 + i,
            )
            for i, (s, d) in enumerate(
                zip(rng.integers(0, 86400 * 3, 60), rng.integers(0, 7200, 60))
            )
        ],
    )
    fast = interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"])
    naive = pts.alias("p").join(
        ivs.alias("i"),
        (F.col("p.key") == F.col("i.key"))
        & (F.col("p.ts") >= F.col("i.start"))
        & (F.col("p.ts") < F.col("i.end")),
    )
    assert sorted((r["pid"], r["iid"]) for r in fast.collect()) == sorted(
        (r["pid"], r["iid"]) for r in naive.collect()
    )


def test_overlap_join_exactly_once_long_intervals(spark):
    # two day-long intervals sharing 24 hourly buckets: one output row
    left = _intervals(
        spark, [("a", "2024-01-01 00:00:00", "2024-01-02 00:00:00", 1)], "ls", "le"
    ).withColumnRenamed("iid", "lid")
    right = _intervals(
        spark, [("a", "2024-01-01 12:00:00", "2024-01-02 12:00:00", 2)], "rs", "re"
    ).withColumnRenamed("iid", "rid")
    out = interval_overlap_join(left, right, "ls", "le", "rs", "re", "1h", keys=["key"]).collect()
    assert len(out) == 1 and (out[0]["lid"], out[0]["rid"]) == (1, 2)


def test_overlap_join_randomized_equals_naive(spark):
    rng = np.random.default_rng(9)
    t0 = pd.Timestamp("2024-01-01")

    def mk(n, seed_off, tag):
        return [
            (
                f"k{i % 2}",
                str(t0 + pd.Timedelta(seconds=int(s))),
                str(t0 + pd.Timedelta(seconds=int(s) + int(d))),
                tag + i,
            )
            for i, (s, d) in enumerate(
                zip(
                    rng.integers(0, 86400 * 2, n),
                    rng.integers(0, 86400, n),
                )
            )
        ]

    left = _intervals(spark, mk(50, 0, 0), "ls", "le").withColumnRenamed("iid", "lid")
    right = _intervals(spark, mk(50, 1, 1000), "rs", "re").withColumnRenamed("iid", "rid")
    fast = interval_overlap_join(left, right, "ls", "le", "rs", "re", "1h", keys=["key"])
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.key") == F.col("r.key"))
        & (F.greatest(F.col("l.ls"), F.col("r.rs")) < F.least(F.col("l.le"), F.col("r.re"))),
    )
    f = sorted((r["lid"], r["rid"]) for r in fast.collect())
    n = sorted((r["lid"], r["rid"]) for r in naive.collect())
    assert f == n and len(f) == len(set(f))  # equal AND no duplicate pairs


def test_empty_and_inverted_intervals_drop(spark):
    pts = _points(spark, [("a", "2024-01-01 10:00:00", 1)])
    ivs = _intervals(
        spark,
        [
            ("a", "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1),  # empty
            ("a", "2024-01-01 11:00:00", "2024-01-01 10:00:00", 2),  # inverted
        ],
    )
    assert interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"]).count() == 0


def test_no_cartesian_in_plan(spark):
    pts = _points(spark, [("a", "2024-01-01 10:00:00", 1)])
    ivs = _intervals(spark, [("a", "2024-01-01 09:00:00", "2024-01-01 11:00:00", 1)])
    for df in (
        interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"]),
        interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"], how="left"),
        interval_overlap_join(
            ivs.withColumnRenamed("iid", "lid"),
            _intervals(spark, [("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00", 2)])
            .withColumnRenamed("iid", "rid")
            .withColumnRenamed("start", "rs")
            .withColumnRenamed("end", "re"),
            "start",
            "end",
            "rs",
            "re",
            "1h",
            keys=["key"],
        ),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_bad_args(spark):
    pts = _points(spark, [("a", "2024-01-01 10:00:00", 1)])
    ivs = _intervals(spark, [("a", "2024-01-01 09:00:00", "2024-01-01 11:00:00", 1)])
    with pytest.raises(ValueError):
        interval_point_join(pts, ivs, "ts", "start", "end", "7h", keys=["key"])
    with pytest.raises(ValueError):
        interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"], how="full")
    with pytest.raises(ValueError):
        # non-key column collision
        interval_point_join(
            pts.withColumnRenamed("pid", "iid"), ivs, "ts", "start", "end", "1h", keys=["key"]
        )


def test_point_join_pre_1970_equals_naive(spark):
    """Negative-epoch buckets: every floor site must use the same sign-safe
    pmod grid, or points and intervals land on different bucket labels."""
    rng = np.random.default_rng(11)
    t0 = pd.Timestamp("1969-12-30")  # spans the epoch boundary
    pts = _points(
        spark,
        [
            (f"k{i % 2}", str(t0 + pd.Timedelta(seconds=int(s))), i)
            for i, s in enumerate(rng.integers(0, 86400 * 4, 300))
        ],
    )
    ivs = _intervals(
        spark,
        [
            (
                f"k{i % 2}",
                str(t0 + pd.Timedelta(seconds=int(s))),
                str(t0 + pd.Timedelta(seconds=int(s) + int(d))),
                1000 + i,
            )
            for i, (s, d) in enumerate(
                zip(rng.integers(0, 86400 * 4, 50), rng.integers(0, 10800, 50))
            )
        ],
    )
    fast = interval_point_join(pts, ivs, "ts", "start", "end", "1h", keys=["key"])
    naive = pts.alias("p").join(
        ivs.alias("i"),
        (F.col("p.key") == F.col("i.key"))
        & (F.col("p.ts") >= F.col("i.start"))
        & (F.col("p.ts") < F.col("i.end")),
    )
    got = sorted((r["pid"], r["iid"]) for r in fast.collect())
    want = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert got == want and len(want) > 0
