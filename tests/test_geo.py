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


def _py_in_polygon(px, py, rings):
    """Straight-line even-odd reference."""
    crossings = 0
    for r in rings:
        ring = list(r)
        if ring[0] == ring[-1]:
            ring = ring[:-1]
        for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
            if (y1 > py) != (y2 > py):
                xs = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xs:
                    crossings += 1
    return crossings % 2 == 1


def test_in_polygon_matches_reference_with_hole(spark):
    import numpy as np

    from tstore_spark.functions.geo import in_polygon, point_wkb

    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {
            "pid": range(400),
            "lon": rng.uniform(-0.2, 1.2, 400),
            "lat": rng.uniform(-0.2, 1.2, 400),
        }
    )
    outer = [(0.0, 0.0), (1.0, 0.05), (0.9, 1.0), (0.05, 0.9)]
    hole = [(0.4, 0.4), (0.6, 0.42), (0.55, 0.6)]
    sdf = spark.createDataFrame(pts).withColumn("g", point_wkb("lon", "lat"))
    got = {
        r["pid"]: r["in_poly"]
        for r in sdf.withColumn("in_poly", in_polygon("g", [outer, hole])).collect()
    }
    want = {
        int(r.pid): _py_in_polygon(r.lon, r.lat, [outer, hole])
        for r in pts.itertuples()
    }
    assert got == want
    assert 50 < sum(want.values()) < 350  # non-degenerate fixture
    # a point inside the hole is OUTSIDE the polygon
    probe = spark.createDataFrame(pd.DataFrame({"lon": [0.5], "lat": [0.45]}))
    row = probe.withColumn("g", point_wkb("lon", "lat")).withColumn(
        "in_poly", in_polygon("g", [outer, hole])
    ).head()
    assert row["in_poly"] is False


def test_in_polygon_nulls_and_guards(spark):
    from tstore_spark.functions.geo import in_polygon

    df = spark.createDataFrame(
        pd.DataFrame({"g": [None, b"notwkb"]}), schema="g binary"
    )
    got = [r["p"] for r in df.withColumn("p", in_polygon("g", [[(0, 0), (1, 0), (0, 1)]])).collect()]
    assert got == [False, False]
    with pytest.raises(ValueError):
        in_polygon("g", [[(0, 0), (1, 0)]])
    with pytest.raises(ValueError):
        in_polygon("g", [])
