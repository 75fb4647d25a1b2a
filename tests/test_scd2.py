"""SCD2 dimension history: interval construction and as-of-version joins."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.scd2 import scd2_intervals, scd2_join


def _changes(spark):
    rows = [
        # host h1: tier changes a -> b (with a replayed no-op) -> NULL
        ("h1", "2024-01-01 00:00:00", "a"),
        ("h1", "2024-01-03 00:00:00", "b"),
        ("h1", "2024-01-03 00:00:00", "b"),   # exact duplicate event
        ("h1", "2024-01-04 00:00:00", "b"),   # replayed no-op change
        ("h1", "2024-01-06 00:00:00", None),  # attr legitimately goes NULL
        # host h2: single version
        ("h2", "2024-01-02 00:00:00", "x"),
    ]
    pdf = pd.DataFrame(rows, columns=["host", "ts", "tier"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_intervals_collapse_noops_and_close_versions(spark):
    got = sorted(
        (r["host"], str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]), r["tier"])
        for r in scd2_intervals(_changes(spark), "host", "ts", ["tier"]).collect()
    )
    assert got == [
        ("h1", "2024-01-01 00:00:00", "2024-01-03 00:00:00", "a"),
        ("h1", "2024-01-03 00:00:00", "2024-01-06 00:00:00", "b"),
        ("h1", "2024-01-06 00:00:00", None, None),
        ("h2", "2024-01-02 00:00:00", None, "x"),
    ]


def test_join_picks_version_at_fact_time(spark):
    dim = scd2_intervals(_changes(spark), "host", "ts", ["tier"])
    facts = pd.DataFrame(
        {
            "host": ["h1", "h1", "h1", "h1", "h2"],
            "ts": pd.to_datetime(
                [
                    "2023-12-30 12:00:00",  # before any version -> NULLs
                    "2024-01-02 12:00:00",  # version a
                    "2024-01-03 00:00:00",  # boundary -> NEW version b
                    "2024-01-07 00:00:00",  # current version, NULL attr
                    "2024-01-05 00:00:00",  # h2's only version
                ]
            ),
            "fact_id": list(range(5)),
        }
    )
    out = scd2_join(spark.createDataFrame(facts), dim, "host", "ts")
    got = {r["fact_id"]: (r["tier"], r["valid_from"] is not None) for r in out.collect()}
    assert got == {
        0: (None, False),
        1: ("a", True),
        2: ("b", True),
        3: (None, True),  # matched version whose attr is legitimately NULL
        4: ("x", True),
    }
    inner = scd2_join(spark.createDataFrame(facts), dim, "host", "ts", how="inner")
    assert sorted(r["fact_id"] for r in inner.collect()) == [1, 2, 3, 4]


def test_intervals_deterministic_across_parallelism(spark):
    ch = _changes(spark)

    def rows(df):
        return sorted(
            (str(r["host"]), str(r["valid_from"]), str(r["valid_to"]), str(r["tier"]))
            for r in df.collect()
        )

    a = rows(scd2_intervals(ch.repartition(1), "host", "ts", ["tier"]))
    b = rows(scd2_intervals(ch.repartition(16), "host", "ts", ["tier"]))
    assert a == b


def test_join_skips_empty_same_timestamp_intervals(spark):
    """Two distinct changes in the same microsecond produce an empty
    [T, T) interval for the losing version; the join must always return
    the surviving version (the one whose interval actually covers T),
    bit-identically at any parallelism."""
    rows = [("h1", "2024-01-01 00:00:00", "a"), ("h1", "2024-01-01 00:00:00", "b")]
    pdf = pd.DataFrame(rows, columns=["host", "ts", "tier"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    ch = spark.createDataFrame(pdf)
    dim = scd2_intervals(ch, "host", "ts", ["tier"])
    facts = pd.DataFrame(
        {"host": ["h1"], "ts": pd.to_datetime(["2024-01-01 00:00:00"]), "fact_id": [0]}
    )
    for parts in (1, 16):
        out = scd2_join(
            spark.createDataFrame(facts), dim.repartition(parts), "host", "ts"
        ).collect()
        assert len(out) == 1 and out[0]["tier"] == "b"


def test_guards(spark):
    with pytest.raises(ValueError):
        scd2_intervals(_changes(spark), "host", "ts", [])
    dim = scd2_intervals(_changes(spark), "host", "ts", ["tier"])
    with pytest.raises(ValueError):
        scd2_join(_changes(spark), dim, "host", "ts", how="full")
