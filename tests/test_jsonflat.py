"""JSON flattening vs a straight-line json reference."""

import json

import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.jsonflat import flatten_json, json_leaf_paths

ROWS = [
    (1, '{"a": 1, "b": {"c": "x", "d": [1, 2]}, "e": null}'),
    (2, '{"a": 2.5, "b": {"c": "y", "f": {"g": true}}}'),
    (3, '{"h": "only-here"}'),
    (4, None),
    (5, '{"b": "scalar-here"}'),   # heterogeneous: b object elsewhere
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, meta string")


def test_leaf_paths_discovered(spark):
    got = json_leaf_paths(_df(spark), "meta")
    assert got == ["a", "b.c", "b.d", "b.f.g", "e", "h"]


def test_flatten_values(spark):
    out = {r["doc_id"]: r.asDict() for r in flatten_json(_df(spark), "meta").collect()}
    assert out[1]["a"] == "1"
    assert out[1]["b.c"] == "x"
    assert out[1]["b.d"] == "[1,2]"          # arrays stay JSON text
    assert out[1]["e"] is None               # JSON null -> NULL
    assert out[2]["a"] == "2.5"
    assert out[2]["b.f.g"] == "true"
    assert out[3]["h"] == "only-here"
    assert out[3]["a"] is None               # absent -> NULL
    assert out[4]["a"] is None               # NULL json -> NULL everywhere
    assert out[5]["b.c"] is None             # scalar-at-object-path -> NULL child
    assert "meta" not in out[1]              # dropped by default


def test_max_depth_truncates_to_json_text(spark):
    paths = json_leaf_paths(_df(spark), "meta", max_depth=2)
    assert "b.f" in paths and "b.f.g" not in paths
    out = {r["doc_id"]: r.asDict()
           for r in flatten_json(_df(spark), "meta", max_depth=2).collect()}
    assert json.loads(out[2]["b.f"]) == {"g": True}


def test_explicit_paths_and_prefix(spark):
    out = flatten_json(
        _df(spark), "meta", paths=["b.c"], prefix="m_", drop=False
    )
    assert out.columns == ["doc_id", "meta", "m_b.c"]


def test_metachar_key_refused(spark):
    df = spark.createDataFrame([(1, '{"a.b": 1}')], "doc_id long, meta string")
    with pytest.raises(ValueError, match="metacharacter"):
        json_leaf_paths(df, "meta")


def test_no_paths_raises(spark):
    df = spark.createDataFrame([(1, "3"), (2, None)], "doc_id long, meta string")
    with pytest.raises(ValueError, match="no leaf paths"):
        flatten_json(df, "meta")


def test_matches_duckdb_extract(spark):
    import duckdb

    out = flatten_json(_df(spark), "meta")
    got = sorted(
        (r["doc_id"], r["a"], r["b.c"], r["b.d"]) for r in out.collect()
    )
    vals = ", ".join(
        f"({i}, {'NULL' if m is None else chr(39) + m + chr(39)})" for i, m in ROWS
    )
    want = sorted(
        duckdb.sql(
            f"SELECT doc_id, json_extract_string(meta, '$.a'), "
            f"json_extract_string(meta, '$.b.c'), "
            f"json_extract_string(meta, '$.b.d') "
            f"FROM (VALUES {vals}) t(doc_id, meta)"
        ).fetchall()
    )
    assert got == want
