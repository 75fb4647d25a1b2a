"""Reference-layout interop: golden directory fixture (built the way the
reference library writes it — pyarrow per (id, var) trees + YAML metadata +
a single _attributes.parquet), read via open_tstore, written via to_tstore.

Golden shape: tstore/tests/test_tslong.py:286-301 asserts
``sorted(listdir) == ['1','2','3','4','_attributes.parquet',
'tstore_metadata.yaml']`` with ``<id>/<var>/year=2000/month=1/part-0.parquet``.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import yaml

from tstore_spark.sources import tstore_layout as TL

IDS = ["1", "2", "3", "4"]
TS_VARS = {"ts_var1": ["var1", "var2"], "ts_var2": ["var3", "var4"]}


def _point_wkb(lon: float, lat: float) -> bytes:
    """Minimal WKB point (little-endian) — the byte payload geopandas stores."""
    import struct

    return struct.pack("<BIdd", 1, 1, lon, lat)


def _times():
    # 48 hourly points per id, 2000-01-01 .. 2000-01-03 (reference fixture)
    return pd.date_range("2000-01-01", periods=48, freq="h")


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    """Write the reference's on-disk layout with plain pyarrow/pandas —
    byte-for-byte the directory contract the reference library produces."""
    base = str(tmp_path_factory.mktemp("golden") / "tstore")
    os.makedirs(base)
    rng = np.random.default_rng(42)
    times = _times()
    for tid in IDS:
        for var, cols in TS_VARS.items():
            df = pd.DataFrame({"time": times})
            for c in cols:
                df[c] = rng.integers(0, 100, len(times)).astype("int64")
            df["year"] = df["time"].dt.year
            df["month"] = df["time"].dt.month
            table = pa.Table.from_pandas(df, preserve_index=False)
            pq.write_to_dataset(
                table,
                root_path=os.path.join(base, tid, var),
                partition_cols=["year", "month"],
            )
    attrs = pd.DataFrame(
        {
            "tstore_id": IDS,
            "static_var1": ["A", "B", "C", "D"],
            "static_var2": [1.0, 2.0, 3.0, 4.0],
            "geometry": [_point_wkb(float(i), float(i) * 2) for i in range(4)],
        }
    )
    attrs.to_parquet(os.path.join(base, "_attributes.parquet"), index=False)
    with open(os.path.join(base, "tstore_metadata.yaml"), "w") as f:
        yaml.dump(
            {
                "ts_variables": list(TS_VARS),
                "id_var": "tstore_id",
                "tstore_structure": "id-var",
                "partitioning": {v: "year/month" for v in TS_VARS},
            },
            f,
        )
    return base


def test_open_golden_archive(spark, golden_dir):
    tl = TL.open_tstore(spark, golden_dir)
    d = tl.descriptor
    assert d.id_var == "tstore_id" and d.time_var == "time"
    assert d.ts_vars == TS_VARS
    assert sorted(d.static_vars) == ["geometry", "static_var1", "static_var2"]
    rows = tl.df.count()
    assert rows == 4 * 48  # 192, matching the reference's own load test
    ids = sorted(r[0] for r in tl.df.select("tstore_id").distinct().collect())
    assert ids == IDS
    # statics joined per id
    sv = {r["tstore_id"]: r["static_var1"] for r in tl.df.select("tstore_id", "static_var1").distinct().collect()}
    assert sv == {"1": "A", "2": "B", "3": "C", "4": "D"}


def test_open_with_filters(spark, golden_dir):
    tl = TL.open_tstore(
        spark,
        golden_dir,
        ts_variables=["ts_var1"],
        start_time="2000-01-01 10:00:00",
        end_time="2000-01-01 19:00:00",
        inclusive="both",
        tstore_ids=["2", "4"],
    )
    assert set(tl.descriptor.ts_vars) == {"ts_var1"}
    rows = tl.df.select("tstore_id", "time").collect()
    assert len(rows) == 2 * 10
    assert {r["tstore_id"] for r in rows} == {"2", "4"}


def test_geometry_wkb_roundtrip(spark, golden_dir):
    """WKB geometry bytes survive attributes read byte-identically
    (reference stores point geometry via GeoParquet; the WKB payload is the
    interop surface — tstore/archive/attributes/geopandas.py:15-27)."""
    tl = TL.open_tstore(spark, golden_dir)
    got = {
        r["tstore_id"]: bytes(r["geometry"])
        for r in tl.df.select("tstore_id", "geometry").distinct().collect()
    }
    for i, tid in enumerate(IDS):
        assert got[tid] == _point_wkb(float(i), float(i) * 2)


def test_write_reference_layout(spark, golden_dir, tmp_path):
    """to_tstore emits the golden directory shape and round-trips."""
    tl = TL.open_tstore(spark, golden_dir)
    out = str(tmp_path / "tstore_out")
    TL.to_tstore(tl, out, partitioning="year/month")

    assert sorted(os.listdir(out)) == [*IDS, "_attributes.parquet", "tstore_metadata.yaml"]
    sub = os.listdir(os.path.join(out, "1", "ts_var1", "year=2000", "month=1"))
    assert any(p.endswith(".parquet") for p in sub)
    with open(os.path.join(out, "tstore_metadata.yaml")) as f:
        meta = yaml.safe_load(f)
    assert meta == {
        "id_var": "tstore_id",
        "ts_variables": list(TS_VARS),
        "partitioning": {v: "year/month" for v in TS_VARS},
        "tstore_structure": "id-var",
    }

    back = TL.open_tstore(spark, out)
    key = ["tstore_id", "time"]
    a = tl.df.select(*key, "var1", "var3").toPandas().sort_values(key).reset_index(drop=True)
    b = back.df.select(*key, "var1", "var3").toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_write_var_id_structure(spark, golden_dir, tmp_path):
    tl = TL.open_tstore(spark, golden_dir)
    out = str(tmp_path / "tstore_varid")
    TL.to_tstore(tl, out, tstore_structure="var-id")
    assert sorted(os.listdir(os.path.join(out, "ts_var1"))) == IDS
    back = TL.open_tstore(spark, out, ts_variables=["ts_var2"])
    assert back.df.count() == 192


def test_special_char_ids_and_filter_fallback(spark, tmp_path):
    """Ids containing glob metacharacters must not break id-filter pruning —
    the reader falls back to full listing + row filter."""
    import pandas as pd

    from tstore_spark.model.tslong import TSLong

    times = _times()[:6]
    rows = []
    for tid in ["x.1", "y-2", "a,b"]:
        for t in times:
            rows.append((tid, t, float(len(tid))))
    pdf = pd.DataFrame(rows, columns=["tstore_id", "time", "v"])
    tl = TSLong.wrap(
        spark.createDataFrame(pdf), id_var="tstore_id", time_var="time",
        ts_vars={"g": ["v"]},
    )
    out = str(tmp_path / "special")
    TL.to_tstore(tl, out)
    back = TL.open_tstore(spark, out, tstore_ids=["a,b"])
    got = back.df.select("tstore_id", "time", "v").collect()
    assert len(got) == 6
    assert {r["tstore_id"] for r in got} == {"a,b"}
    # plain ids still take the pruned glob path
    back2 = TL.open_tstore(spark, out, tstore_ids=["x.1"])
    assert back2.df.count() == 6


def test_uri_encoded_ids_roundtrip(spark, tmp_path):
    """Ids whose directory names get percent-encoded in input_file_name()
    URIs (space, %, +) must come back byte-identical, both unfiltered and
    through the id filter."""
    import pandas as pd

    from tstore_spark.model.tslong import TSLong

    times = _times()[:4]
    ids = ["a b", "100%x", "c+d"]
    rows = [(tid, t, float(len(tid))) for tid in ids for t in times]
    pdf = pd.DataFrame(rows, columns=["tstore_id", "time", "v"])
    tl = TSLong.wrap(
        spark.createDataFrame(pdf), id_var="tstore_id", time_var="time",
        ts_vars={"g": ["v"]},
    )
    out = str(tmp_path / "encoded")
    TL.to_tstore(tl, out)
    back = TL.open_tstore(spark, out)
    assert {r["tstore_id"] for r in back.df.select("tstore_id").distinct().collect()} == set(ids)
    for tid in ids:
        got = TL.open_tstore(spark, out, tstore_ids=[tid]).df.collect()
        assert len(got) == 4, tid
        assert {r["tstore_id"] for r in got} == {tid}


def test_empty_id_filter_returns_empty(spark, golden_dir):
    """tstore_ids=[] means "these zero ids": an empty TSLong with the full
    schema (the empty glob alternation "{}" used to crash the read)."""
    tl = TL.open_tstore(spark, golden_dir, tstore_ids=[])
    assert tl.df.count() == 0
    full = TL.open_tstore(spark, golden_dir)
    assert set(tl.df.columns) == set(full.df.columns)
