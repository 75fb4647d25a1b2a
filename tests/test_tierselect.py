"""Tiered range reads: cover minimality + exactness vs direct raw aggregation."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tstore_spark.operators.metric_rollup import (
    finalize,
    metric_rollup_all_tiers,
    metric_rollup_from_raw,
)
from tstore_spark.operators.tierselect import range_aggregate, tile_cover


def _events(n=6000) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta((h % (5 * 86400)).astype(np.int64), unit="s")
    return pd.DataFrame(
        {
            "event_type": np.array(["click", "view", "error", "signup", "purchase"])[i % 5],
            "ts": ts.astype("datetime64[us]"),
            "user_id": (h % 40).astype(np.int64),
            "value": np.round(((h % 100000) / 100.0), 2),
        }
    )


@pytest.fixture(scope="module")
def ev_sdf(spark):
    return spark.createDataFrame(_events()).cache()


def test_tile_cover_partitions_the_range():
    t0 = dt.datetime(2024, 3, 1, 0, 7)
    t1 = dt.datetime(2024, 3, 4, 19, 54)
    cover = tile_cover(t0, t1)
    # disjoint + exhaustive: total tile time == range length
    total = sum(
        (b - a).total_seconds() for runs in cover.values() for a, b in runs
    )
    assert total == (t1 - t0).total_seconds()
    # minimal shape: full interior days as 1d tiles, bounded edge runs
    assert sum((b - a).days for a, b in cover["1d"]) == 2  # full interior days: Mar 2, Mar 3
    assert all((b - a) <= dt.timedelta(minutes=59) for a, b in cover["1m"])
    assert all((b - a) <= dt.timedelta(hours=23) for a, b in cover["1h"])


def test_tile_cover_aligned_bounds():
    t0 = dt.datetime(2024, 3, 1)
    t1 = dt.datetime(2024, 3, 3)
    cover = tile_cover(t0, t1)
    assert cover["1m"] == [] and cover["1h"] == []
    assert cover["1d"] == [(t0, t1)]


def _eq(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.mark.parametrize(
    "t0,t1",
    [
        ("2024-03-01 00:07:00", "2024-03-04 19:54:00"),  # all three tiers
        ("2024-03-01 05:03:00", "2024-03-01 05:41:00"),  # pure 1m (no coarse tiles)
    ],
)
def test_range_aggregate_equals_direct(ev_sdf, t0, t1):
    tiers = metric_rollup_all_tiers(ev_sdf)
    got = finalize(range_aggregate(tiers, t0, t1)).drop("window_start")
    from tstore_spark.functions.filters import time_range_filter

    sliced = ev_sdf.where(time_range_filter("ts", t0, t1, inclusive="left"))
    # direct recompute, collapsed to one row per key via a huge-window trunc:
    want = (
        finalize(metric_rollup_from_raw(sliced.withColumn("ts", F.lit(t0).cast("timestamp")), "1d"))
        .drop("window_start")
    )
    assert _eq(got, want), f"range [{t0}, {t1}) mismatch"


def test_range_aggregate_sketch_flavors(ev_sdf):
    t0, t1 = "2024-03-01 00:07:00", "2024-03-04 19:54:00"
    tiers = metric_rollup_all_tiers(ev_sdf, id_sketch=True, value_sketch=True)
    got = finalize(range_aggregate(tiers, t0, t1)).drop("window_start")
    from tstore_spark.functions.filters import time_range_filter

    sliced = ev_sdf.where(time_range_filter("ts", t0, t1, inclusive="left"))
    want = finalize(
        metric_rollup_from_raw(
            sliced.withColumn("ts", F.lit(t0).cast("timestamp")),
            "1d",
            id_sketch=True,
            value_sketch=True,
        )
    ).drop("window_start")
    assert _eq(got, want)


def test_range_aggregate_guards(ev_sdf):
    tiers = metric_rollup_all_tiers(ev_sdf)
    with pytest.raises(ValueError, match="minute-aligned"):
        range_aggregate(tiers, "2024-03-01 00:00:30", "2024-03-02 00:00:00")
    with pytest.raises(ValueError, match="empty range"):
        range_aggregate(tiers, "2024-03-01 00:00:00", "2024-03-01 00:00:00")
    with pytest.raises(ValueError):
        range_aggregate(tiers, "2024-03-02 00:00:00", "2024-03-01 00:00:00")
