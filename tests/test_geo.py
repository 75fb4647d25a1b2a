"""WKB point helpers: encode/decode round-trip, endianness, bbox filtering."""

import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.functions import geo


def le_point(lon, lat):
    return struct.pack("<BIdd", 1, 1, lon, lat)


def be_point(lon, lat):
    return struct.pack(">BIdd", 0, 1, lon, lat)


@pytest.fixture(scope="module")
def points_sdf(spark):
    rows = [
        (0, le_point(7.44, 46.95)),      # Bern
        (1, le_point(-122.42, 37.77)),   # SF
        (2, be_point(151.21, -33.87)),   # Sydney, big-endian (slow path)
        (3, None),                        # null geometry
        (4, struct.pack("<BIdd", 1, 2, 0.0, 0.0)),  # non-point type
    ]
    pdf = pd.DataFrame(rows, columns=["id", "wkb"])
    return spark.createDataFrame(pdf, schema="id long, wkb binary")


def test_decode(points_sdf):
    rows = {r["id"]: r for r in points_sdf.select("id", geo.wkb_point_xy("wkb").alias("xy")).collect()}
    assert rows[0]["xy"]["lon"] == pytest.approx(7.44)
    assert rows[1]["xy"]["lat"] == pytest.approx(37.77)
    assert rows[2]["xy"]["lon"] == pytest.approx(151.21)  # BE handled
    # NaN sentinels surface as SQL nulls through Arrow — the cleaner contract
    assert rows[3]["xy"]["lon"] is None
    assert rows[4]["xy"]["lat"] is None  # non-point


def test_encode_roundtrip(spark):
    pdf = pd.DataFrame({"lon": [1.5, -77.25, 0.0], "lat": [2.25, 12.125, -90.0]})
    sdf = spark.createDataFrame(pdf)
    out = sdf.select(
        "lon", "lat", geo.wkb_point_xy(geo.point_wkb("lon", "lat")).alias("xy")
    ).collect()
    for r in out:
        assert r["xy"]["lon"] == r["lon"]
        assert r["xy"]["lat"] == r["lat"]
    # bytes match the canonical LE WKB encoding exactly
    blob = sdf.select(geo.point_wkb("lon", "lat").alias("b")).limit(1).collect()[0]["b"]
    assert bytes(blob) == le_point(1.5, 2.25)


def test_bbox_filter(points_sdf):
    europe = points_sdf.where(geo.in_bbox("wkb", -10, 35, 30, 60))
    assert [r["id"] for r in europe.collect()] == [0]
    nothing = points_sdf.where(geo.in_bbox("wkb", 0, 0, 1, 1))
    assert nothing.count() == 0  # nulls and non-points never match
