"""Property tests: field-based NTZ epochs equal Python wall-clock epochs for
arbitrary timestamps, at any session timezone."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros, ntz_epoch_seconds

EPOCH = dt.datetime(1970, 1, 1)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1971, 1, 1),
            max_value=dt.datetime(2100, 1, 1),
        ).map(lambda d: d.replace(microsecond=(d.microsecond // 1) - (d.microsecond % 1))),
        min_size=1,
        max_size=8,
    )
)
def test_epochs_match_python_wall_clock(spark, datetimes):
    pdf = pd.DataFrame({"i": range(len(datetimes)), "s": [d.isoformat(sep=" ") for d in datetimes]})
    df = spark.createDataFrame(pdf).select(
        "i",
        ntz_epoch_seconds(F.to_timestamp_ntz("s")).alias("es"),
        ntz_epoch_micros(F.to_timestamp_ntz("s")).alias("eu"),
    )
    got = {r["i"]: (r["es"], r["eu"]) for r in df.collect()}
    for i, d in enumerate(datetimes):
        delta = d - EPOCH
        want_us = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        assert got[i][0] == want_us // 1_000_000
        assert got[i][1] == want_us


@pytest.mark.parametrize("tz", ["UTC", "America/New_York", "Asia/Kolkata"])
def test_epochs_session_tz_independent(spark, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = spark.sql(
            "SELECT to_timestamp_ntz('2024-03-10 02:30:00.123456') AS t"
        ).select(ntz_epoch_micros("t").alias("eu"))
        # 2024-03-10 02:30 does not exist in America/New_York — field
        # extraction must still yield the pure wall-clock epoch
        want = int((dt.datetime(2024, 3, 10, 2, 30, 0, 123456) - EPOCH).total_seconds() * 1_000_000)
        assert df.collect()[0]["eu"] == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
