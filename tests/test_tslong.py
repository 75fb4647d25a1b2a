"""TSLong wrapper semantics — mirrors the reference's constructor-semantics
tests (tstore/tests/test_tslong.py:126-265) and view round-trips."""

import pandas as pd
import pytest

from tstore_spark.datagen import tstore_parity_pandas
from tstore_spark.model.descriptor import TableDescriptor, normalize_ts_vars
from tstore_spark.model.tslong import TSLong

TS_VARS = {"ts_var1": ["var1", "var2"], "ts_var2": ["var3", "var4"]}
STATICS = ["static_var1", "static_var2"]


@pytest.fixture(scope="module")
def parity_sdf(spark):
    return spark.createDataFrame(tstore_parity_pandas()).cache()


@pytest.fixture(scope="module")
def tsl(parity_sdf):
    return TSLong.wrap(parity_sdf, "tstore_id", "time", ts_vars=TS_VARS, static_vars=STATICS)


# -- ts_vars normalization (reference tslong.py:199-225) ----------------------

def test_ts_vars_none_one_group_per_column():
    cols = ["tstore_id", "time", "var1", "var2", "static_var1"]
    got = normalize_ts_vars(cols, "tstore_id", "time", None, ["static_var1"])
    assert got == {"var1": ["var1"], "var2": ["var2"]}


def test_ts_vars_list_single_group():
    got = normalize_ts_vars(["id", "t", "a", "b"], "id", "t", ["a", "b"], None)
    assert got == {"ts_variable": ["a", "b"]}


def test_ts_vars_dict_passthrough():
    got = normalize_ts_vars(["id", "t", "a", "b"], "id", "t", {"g": ["a"]}, None)
    assert got == {"g": ["a"]}


# -- validation errors --------------------------------------------------------

@pytest.mark.parametrize(
    "kwargs,match",
    [
        (dict(id_var="nope", time_var="time"), "id_var"),
        (dict(id_var="tstore_id", time_var="nope"), "time_var"),
        (dict(id_var="tstore_id", time_var="time", ts_vars={"g": ["missing"]}), "not in DataFrame"),
        (dict(id_var="tstore_id", time_var="time", ts_vars={"g": ["var1"], "h": ["var1"]}), "appears in"),
        (dict(id_var="tstore_id", time_var="time", ts_vars={"g": ["var1"]}, static_vars=["var1"]), "both"),
    ],
)
def test_invalid_args_raise(parity_sdf, kwargs, match):
    with pytest.raises((ValueError, TypeError), match=match):
        TSLong.wrap(parity_sdf, **kwargs)


def test_id_cast_to_string(spark):
    df = spark.createDataFrame([(1, pd.Timestamp("2000-01-01"), 2.0)], ["id", "time", "v"])
    t = TSLong.wrap(df, "id", "time")
    assert dict(t.df.dtypes)["id"] == "string"


# -- query surface ------------------------------------------------------------

def test_query_rows_192(tsl):
    assert tsl.df.count() == 192  # 4 ids x 48 hours


def test_query_time_range_inclusive(tsl):
    q = lambda inc: tsl.query(
        start_time="2000-01-01 10:00:00", end_time="2000-01-01 20:00:00", inclusive=inc
    ).df.count()
    assert q("both") == 4 * 11
    assert q("left") == 4 * 10
    assert q("right") == 4 * 10
    assert q("neither") == 4 * 9


def test_query_ids_and_variables(tsl):
    got = tsl.query(ts_variables=["ts_var1"], ids=["1", "3"])
    assert got.df.count() == 96
    assert set(got.df.columns) == {"tstore_id", "time", "var1", "var2", *STATICS}


def test_query_unknown_variable_raises(tsl):
    with pytest.raises(ValueError, match="unknown ts_variables"):
        tsl.query(ts_variables=["nope"])


def test_wrapper_rewraps_dataframe_methods(tsl):
    """Proxy behavior (reference tswrapper.py:144-155): DataFrame-returning
    methods keep the wrapper."""
    out = tsl.where("tstore_id = '1'")
    assert isinstance(out, TSLong)
    assert out.df.count() == 48


def test_static_uniqueness_guard(spark):
    df = spark.createDataFrame(
        [("1", pd.Timestamp("2000-01-01"), 1.0, "A"), ("1", pd.Timestamp("2000-01-02"), 2.0, "B")],
        ["id", "time", "v", "s"],
    )
    t = TSLong.wrap(df, "id", "time", ts_vars={"g": ["v"]}, static_vars=["s"])
    with pytest.raises(ValueError, match="not unique"):
        t.check_static_uniqueness()


# -- views ---------------------------------------------------------------------

def test_wide_view(tsl):
    wide = tsl.to_tswide(values=["var3"])
    pdf = wide.toPandas()
    assert len(pdf) == 48  # one row per timestamp
    assert len(pdf.columns) == 1 + 4  # time + 4 ids


def test_wide_guard(tsl):
    with pytest.raises(ValueError, match="wide view"):
        tsl.to_tswide(max_ids=2)


def test_nested_roundtrip(tsl):
    nested = tsl.to_tsdf()
    assert nested.count() == 4
    back = TSLong.from_tsdf(nested, "tstore_id", TS_VARS, static_vars=STATICS)
    assert back.df.count() == 192
    a = tsl.df.toPandas().sort_values(["tstore_id", "time"]).reset_index(drop=True)
    b = back.df.select(*a.columns).toPandas().sort_values(["tstore_id", "time"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_wide_naming_and_roundtrip(tsl):
    """TSWide carries (var, id) column naming parity with the reference's
    MultiIndex TSWide and inverts via to_tslong — an operation the reference
    left NotImplementedError in all four backends (tswide/pandas.py:24-26)."""
    wide = tsl.to_tswide(values=["var3", "var4"])
    assert "var3(1)" in wide.df.columns and "var4(4)" in wide.df.columns
    back = wide.to_tslong()
    a = (
        tsl.df.select("tstore_id", "time", "var3", "var4")
        .toPandas().sort_values(["tstore_id", "time"]).reset_index(drop=True)
    )
    b = (
        back.df.select("tstore_id", "time", "var3", "var4")
        .toPandas().sort_values(["tstore_id", "time"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_wide_roundtrip_hostile_ids(spark):
    """Ids containing backslashes, quotes, and backticks must survive the
    to_tswide().to_tslong() round-trip: the melt builds a stack() SQL string,
    so every id rides through a string literal and every column name through
    a quoted identifier."""
    ids = ["a\\b", "x'y", "t`u", "end\\"]
    rows = [
        (i, pd.Timestamp("2000-01-01") + pd.Timedelta(hours=h), float(h))
        for i in ids
        for h in range(3)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "time", "v"]))
    t = TSLong.wrap(df, "id", "time", ts_vars={"g": ["v"]})
    back = t.to_tswide(values=["v"]).to_tslong()
    a = df.toPandas().sort_values(["id", "time"]).reset_index(drop=True)
    b = (
        back.df.select("id", "time", "v")
        .toPandas().sort_values(["id", "time"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tsdf_wrapper_roundtrip(tsl):
    """TSDF is a carrying wrapper: to_tsdf().to_tslong() needs no schema
    re-specification and reproduces the long table."""
    nested = tsl.to_tsdf()
    assert nested.descriptor.ts_vars == TS_VARS
    back = nested.to_tslong()
    a = tsl.df.toPandas().sort_values(["tstore_id", "time"]).reset_index(drop=True)
    b = (
        back.df.select(*a.columns)
        .toPandas().sort_values(["tstore_id", "time"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_time_filter_boundary_instant(spark):
    """start == end with inclusive='both' selects exactly that instant;
    'neither' selects nothing (reference check_start_end_time allows
    equality — tstore/archive/checks.py)."""
    import pandas as pd

    from tstore_spark.functions.filters import time_range_filter

    pdf = pd.DataFrame(
        {
            "id": ["1"] * 3,
            "time": pd.to_datetime(
                ["2000-01-01 00:00:00", "2000-01-01 01:00:00", "2000-01-01 02:00:00"]
            ),
            "v": [1.0, 2.0, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    instant = "2000-01-01 01:00:00"
    both = df.where(time_range_filter("time", instant, instant, inclusive="both"))
    assert [r["v"] for r in both.collect()] == [2.0]
    neither = df.where(time_range_filter("time", instant, instant, inclusive="neither"))
    assert neither.count() == 0


def test_ts_vars_normalization_shapes(spark):
    """Reference ts_vars semantics (tslong.py:199-225): None -> one group
    per remaining column; list -> single group 'ts_variable'; dict as-is."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"id": ["1"], "time": pd.to_datetime(["2000-01-01"]), "a": [1.0], "b": [2.0]})
    )
    none_form = TSLong.wrap(df, "id", "time")
    assert none_form.descriptor.ts_vars == {"a": ["a"], "b": ["b"]}
    list_form = TSLong.wrap(df, "id", "time", ts_vars=["a", "b"])
    assert list_form.descriptor.ts_vars == {"ts_variable": ["a", "b"]}
    dict_form = TSLong.wrap(df, "id", "time", ts_vars={"g": ["a"], "h": ["b"]})
    assert dict_form.descriptor.ts_vars == {"g": ["a"], "h": ["b"]}


def test_wide_pivot_underscore_collision(spark):
    """Ids ['a','a_x'] with values ['x_b','b'] both render as "a_x_b" under
    Spark's native "{id}_{alias}" pivot naming — the pivot now rides a hex
    id encoding so the rename to "{var}({id})" can never be ambiguous."""
    ids = ["a", "a_x"]
    rows = [
        (i, pd.Timestamp("2000-01-01") + pd.Timedelta(hours=h), float(h) + (10.0 if i == "a" else 20.0), float(h) * 2)
        for i in ids
        for h in range(3)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "time", "x_b", "b"]))
    t = TSLong.wrap(df, "id", "time", ts_vars={"g": ["x_b", "b"]})
    wide = t.to_tswide(values=["x_b", "b"])
    for col in ["x_b(a)", "x_b(a_x)", "b(a)", "b(a_x)"]:
        assert col in wide.df.columns, wide.df.columns
    got = wide.df.orderBy("time").toPandas()
    assert got["x_b(a)"].tolist() == [10.0, 11.0, 12.0]
    assert got["x_b(a_x)"].tolist() == [20.0, 21.0, 22.0]
    assert got["b(a)"].tolist() == [0.0, 2.0, 4.0]
    back = wide.to_tslong()
    a = (
        t.df.select("id", "time", "x_b", "b")
        .toPandas().sort_values(["id", "time"]).reset_index(drop=True)
    )
    b = (
        back.df.select("id", "time", "x_b", "b")
        .toPandas().sort_values(["id", "time"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
