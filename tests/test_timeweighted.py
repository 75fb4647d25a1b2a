"""Time-weighted average and counter increase/rate: hand-computed fixtures,
window-boundary splitting, reset handling, DST-hostile session TZ, and
bit-identity across parallelism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.timeweighted import counter_rate, time_weighted_avg


def _ts_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn("ts", F.to_timestamp_ntz(F.col("ts")))


def test_twa_hand_computed(spark):
    # key a, hour 00: v=10 held 00:00->00:30, v=20 held 00:30->01:00 (LOCF
    # into the lead segment), lead crosses into hour 01 until 01:15
    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 00:30:00", 20.0),
        ("a", "2024-01-01 01:15:00", 40.0),
    ]
    out = {
        (r["key"], str(r["window_start"])): (r["twa"], r["covered_us"])
        for r in time_weighted_avg(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    }
    # hour 00: 10*30min + 20*30min over 60min = 15.0
    twa0, cov0 = out[("a", "2024-01-01 00:00:00")]
    assert twa0 == pytest.approx(15.0) and cov0 == 3_600_000_000
    # hour 01: 20 held 01:00->01:15, then 40 held 01:15->02:00 (last point
    # extends to the end of its own window) -> (20*15 + 40*45)/60 = 35.0
    twa1, cov1 = out[("a", "2024-01-01 01:00:00")]
    assert twa1 == pytest.approx(35.0) and cov1 == 3_600_000_000


def test_twa_partial_coverage_and_duplicates(spark):
    rows = [
        ("b", "2024-01-01 05:40:00", 6.0),   # covers 05:40 -> 06:00 only
        ("b", "2024-01-01 05:40:00", 99.0),  # duplicate ts: zero-length segment
    ]
    out = time_weighted_avg(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    assert len(out) == 1
    r = out[0]
    assert r["covered_us"] == 20 * 60 * 1_000_000
    # which duplicate survives is the later-ordered one; its value is held
    assert r["twa"] in (6.0, 99.0)


def test_counter_rate_resets(spark):
    rows = [
        ("c", "2024-01-01 00:05:00", 100.0),
        ("c", "2024-01-01 00:25:00", 150.0),  # +50
        ("c", "2024-01-01 00:45:00", 30.0),   # reset -> +30
        ("c", "2024-01-01 01:10:00", 80.0),   # +50 in hour 01
    ]
    out = {
        str(r["window_start"]): (r["increase"], r["rate"])
        for r in counter_rate(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    }
    assert out["2024-01-01 00:00:00"][0] == pytest.approx(80.0)
    assert out["2024-01-01 01:00:00"][0] == pytest.approx(50.0)
    assert out["2024-01-01 01:00:00"][1] == pytest.approx(50.0 / 3600)
    # first observation contributed no delta
    assert sum(v[0] for v in out.values()) == pytest.approx(130.0)


def test_twa_dst_session_tz(spark):
    """Wall-clock windows at any session TZ: run the same input under
    America/New_York across the spring-forward boundary."""
    rows = [
        ("d", "2024-03-10 01:30:00", 10.0),
        ("d", "2024-03-10 02:30:00", 30.0),  # nonexistent EST wall hour
        ("d", "2024-03-10 03:30:00", 50.0),
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = sorted(
            (str(r["window_start"]), r["twa"], r["covered_us"])
            for r in time_weighted_avg(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == [
        ("2024-03-10 01:00:00", pytest.approx(10.0), 1_800_000_000),
        ("2024-03-10 02:00:00", pytest.approx(20.0), 3_600_000_000),
        ("2024-03-10 03:00:00", pytest.approx(40.0), 3_600_000_000),
    ]


def test_twa_deterministic_across_parallelism(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (f"k{i % 7}", str(pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(s))), round(float(v), 2))
        for i, (s, v) in enumerate(zip(rng.integers(0, 86400 * 3, 3000), rng.uniform(0, 100, 3000)))
    ]
    df = _ts_df(spark, rows)
    a = time_weighted_avg(df.repartition(2), "key", "ts", "value", "1h").collect()
    b = time_weighted_avg(df.repartition(16), "key", "ts", "value", "1h").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ca = counter_rate(df.repartition(2), "key", "ts", "value", "1h").collect()
    cb = counter_rate(df.repartition(16), "key", "ts", "value", "1h").collect()
    assert sorted(map(tuple, ca)) == sorted(map(tuple, cb))


def test_twa_and_counter_rate_pre_1970(spark):
    """Negative epochs: `t - t % w` rounds toward zero and would label the
    window AFTER the event (and extend the last segment up to 2w late);
    the pmod floor keeps wall-clock window starts."""
    rows = [
        ("a", "1969-12-31 23:10:00", 10.0),
        ("a", "1969-12-31 23:40:00", 40.0),
    ]
    out = {
        str(r["window_start"]): (r["twa"], r["covered_us"])
        for r in time_weighted_avg(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    }
    # 10 held 23:10->23:40, 40 held 23:40->00:00 (end of its OWN hour)
    assert set(out) == {"1969-12-31 23:00:00"}
    twa, cov = out["1969-12-31 23:00:00"]
    assert twa == pytest.approx((10 * 30 + 40 * 20) / 50)
    assert cov == 50 * 60_000_000

    rates = {
        str(r["window_start"]): r["increase"]
        for r in counter_rate(_ts_df(spark, rows), "key", "ts", "value", "1h").collect()
    }
    assert rates == {"1969-12-31 23:00:00": 30.0}
