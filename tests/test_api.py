"""Reference-parity API: open_tslong/open_tsdf/open_tswide/to_tstore on the
reference-shaped fixture (4 ids x 48 hourly points, conftest.py analog)."""

import pytest

from tstore_spark import TSLong, open_tsdf, open_tslong, open_tswide, to_tstore
from tstore_spark.datagen import tstore_parity_pandas


@pytest.fixture(scope="module")
def parity_archive(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("parity_arch"))
    pdf = tstore_parity_pandas()
    tl = TSLong.wrap(
        spark.createDataFrame(pdf),
        id_var="tstore_id",
        time_var="time",
        ts_vars={"ts_var1": ["var1", "var2"], "ts_var2": ["var3", "var4"]},
        static_vars=["static_var1", "static_var2"],
        partitioning="year/month",
    )
    to_tstore(tl, base)
    return base


def test_open_tslong_roundtrip(spark, parity_archive):
    tl = open_tslong(spark, parity_archive)
    assert tl.df.count() == 192  # 4 ids x 48 points (reference test_tslong.py:328-330)
    assert set(tl.descriptor.ts_vars) == {"ts_var1", "ts_var2"}


def test_open_tslong_query_params(spark, parity_archive):
    tl = open_tslong(
        spark, parity_archive,
        ts_variables=["ts_var1"],
        start_time="2000-01-01 10:00:00",
        end_time="2000-01-02 00:00:00",
        inclusive="left",
        tstore_ids=["1", "3"],
    )
    rows = tl.df.collect()
    assert len(rows) == 2 * 14  # 14 hourly points in [10:00, 24:00) per id
    assert {r["tstore_id"] for r in rows} == {"1", "3"}
    assert "var3" not in tl.df.columns and "var1" in tl.df.columns


def test_open_tsdf_nested(spark, parity_archive):
    nested = open_tsdf(spark, parity_archive)
    rows = nested.collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r["ts_var1"]) == 48
        assert r["ts_var1"][0]["time"] <= r["ts_var1"][-1]["time"]


def test_open_tswide_pivot(spark, parity_archive):
    wide = open_tswide(spark, parity_archive)
    assert wide.count() == 48  # one row per timestamp
    assert any(c.endswith("(1)") for c in wide.columns)  # "var(id)" naming
