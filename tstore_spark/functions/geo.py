"""Geometry helpers over WKB columns (no GEOS/shapely in this container).

The reference stores per-id point geometry via GeoParquet
(tstore/archive/attributes/geopandas.py:15-27); the interop layer
(sources/tstore_layout.py) moves those bytes losslessly. This module makes
the bytes QUERYABLE for the dominant archive case — point geometries — with
Arrow-batched kernels (attrs tables are dimension-sized; the kernels are
vectorized numpy over the batch, no per-row Python on the fast path):

- :func:`wkb_point_xy` — decode WKB points to (lon, lat) doubles
- :func:`point_wkb` — encode (lon, lat) doubles to little-endian WKB
- :func:`in_bbox` — bounding-box predicate over a WKB point column

Full geometry algebra (polygons, ST_* predicates) belongs to a spatial
extension (Sedona et al.) and is out of scope; the WKB byte contract here is
exactly what such an extension consumes.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType, StructField, StructType

_XY_SCHEMA = StructType([StructField("lon", DoubleType()), StructField("lat", DoubleType())])

#: little-endian WKB point: byte-order tag 1, geometry type 1, lon, lat
_LE_POINT_LEN = 21


def _decode_one(b: bytes) -> tuple[float, float]:
    if b is None or len(b) < _LE_POINT_LEN:
        return (float("nan"), float("nan"))
    order = "<" if b[0] == 1 else ">"
    gtype = struct.unpack_from(f"{order}I", b, 1)[0]
    if gtype != 1:  # not a point
        return (float("nan"), float("nan"))
    x, y = struct.unpack_from(f"{order}dd", b, 5)
    return (x, y)


def _decode_xy_batch(wkb: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized WKB-point decode of a whole Arrow batch -> (lon, lat)
    float64 arrays (NaN for nulls/non-points)."""
    n = len(wkb)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    # vectorized fast path: every non-null value is a 21-byte LE point
    vals = wkb.to_numpy(dtype=object)
    mask = np.array(
        [v is not None and len(v) == _LE_POINT_LEN and v[0] == 1 for v in vals],
        dtype=bool,
    ) if n else np.zeros(0, dtype=bool)
    if mask.any():
        buf = b"".join(bytes(v) for v in vals[mask])
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, _LE_POINT_LEN)
        gtypes = arr[:, 1:5].copy().view(np.uint32).ravel()
        coords = arr[:, 5:].copy().view(np.float64).reshape(-1, 2)
        ok = gtypes == 1
        idx = np.where(mask)[0][ok]
        lon[idx] = coords[ok, 0]
        lat[idx] = coords[ok, 1]
    # slow path only for irregular encodings (big-endian, EWKB, etc.)
    for i in np.where(~mask)[0]:
        lon[i], lat[i] = _decode_one(vals[i])
    return lon, lat


@pandas_udf(_XY_SCHEMA)
def _wkb_point_xy(wkb: pd.Series) -> pd.DataFrame:
    lon, lat = _decode_xy_batch(wkb)
    return pd.DataFrame({"lon": lon, "lat": lat})


@pandas_udf(BinaryType())
def _point_wkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
    n = len(lon)
    out = np.empty((n, _LE_POINT_LEN), dtype=np.uint8)
    out[:, 0] = 1
    out[:, 1:5] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
    out[:, 5:13] = lon.to_numpy(dtype=np.float64).view(np.uint8).reshape(n, 8)
    out[:, 13:21] = lat.to_numpy(dtype=np.float64).view(np.uint8).reshape(n, 8)
    return pd.Series([row.tobytes() for row in out])


def wkb_point_xy(wkb_col: str | Column) -> Column:
    """struct<lon, lat> doubles from a WKB point column (the NaN sentinel for
    nulls/non-points surfaces as SQL NULL through Arrow)."""
    c = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _wkb_point_xy(c)


def point_wkb(lon: str | Column, lat: str | Column) -> Column:
    """Little-endian WKB point bytes from two double columns."""
    lo = F.col(lon) if isinstance(lon, str) else lon
    la = F.col(lat) if isinstance(lat, str) else lat
    return _point_wkb(lo.cast("double"), la.cast("double"))


def in_polygon(wkb_col: str | Column, rings: list) -> Column:
    """Even-odd point-in-polygon predicate over a WKB point column.

    ``rings`` is a small constant geometry — a geofence, a country outline —
    as ``[[(x, y), …exterior], [(x, y), …hole], …]`` (closing vertex
    optional). Even-odd crossing counting over ALL rings handles holes for
    free; the vertex arrays ship inside the Arrow kernel's closure (one
    serialization per task, vectorized numpy per batch — points × edges,
    fine for dimension-sized fences). NULLs and non-points are never
    inside. Boundary points follow the ray-crossing convention — don't put
    decision thresholds exactly on an edge.

    This stays deliberately short of a spatial engine (no ST_* algebra,
    no polygon-polygon ops — Sedona's job); it makes the archive's WKB
    point attributes FILTERABLE by region, which is the dominant archive
    query (reference stores per-id points via GeoParquet)."""
    from pyspark.sql.types import BooleanType

    arrs = []
    for r in rings:
        a = np.asarray(r, dtype=np.float64)
        if a.ndim != 2 or a.shape[1] != 2 or a.shape[0] < 3:
            raise ValueError("each ring needs >= 3 (x, y) vertices")
        if np.array_equal(a[0], a[-1]):
            a = a[:-1]  # drop the explicit closing vertex
        if a.shape[0] < 3:
            raise ValueError("each ring needs >= 3 distinct vertices")
        arrs.append(a)
    if not arrs:
        raise ValueError("rings must be non-empty")

    @pandas_udf(BooleanType())
    def _inside(wkb: pd.Series) -> pd.Series:
        px, py = _decode_xy_batch(wkb)
        crossings = np.zeros(len(px), dtype=np.int64)
        for a in arrs:
            x1, y1 = a[:, 0], a[:, 1]
            x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
            # points x edges: edge straddles the horizontal ray iff exactly
            # one endpoint is strictly above it
            straddle = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
            with np.errstate(divide="ignore", invalid="ignore"):
                xs = x1[None, :] + (py[:, None] - y1[None, :]) * (
                    (x2 - x1)[None, :] / (y2 - y1)[None, :]
                )
            crossings += (straddle & (px[:, None] < xs)).sum(axis=1)
        inside = (crossings % 2).astype(bool)
        inside[np.isnan(px)] = False
        return pd.Series(inside)

    c = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _inside(c)


def in_bbox(
    wkb_col: str | Column,
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
) -> Column:
    """Bounding-box predicate over a WKB point column (never true for nulls
    or non-points — their coordinates are NULL and NULL comparisons are
    not-true in SQL semantics)."""
    xy = wkb_point_xy(wkb_col)
    return (
        (xy["lon"] >= F.lit(float(min_lon)))
        & (xy["lon"] <= F.lit(float(max_lon)))
        & (xy["lat"] >= F.lit(float(min_lat)))
        & (xy["lat"] <= F.lit(float(max_lat)))
    )
