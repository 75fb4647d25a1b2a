"""Grouping-set rollups: margins exact, gid bit order engine-portable."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.olap import cube_oracle_sql, cube_rollup


def _docs(spark):
    pdf = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "fr", None],
            "source": ["a", "b", "a", "a", "b", "a"],
            "n": [10, 20, 30, 40, 50, 60],
        }
    )
    return spark.createDataFrame(pdf), pdf


def _collect(df):
    return sorted(
        ((r["lang"], r["source"], r["gid"], r["docs"], r["chars"]) for r in df.collect()),
        key=lambda t: (t[2], str(t[0]), str(t[1])),
    )


MEASURES = lambda: {"docs": F.count(F.lit(1)), "chars": F.sum("n")}  # noqa: E731


def test_cube_matches_duckdb_all_margins(spark):
    sdf, pdf = _docs(spark)
    got = _collect(cube_rollup(sdf, ["lang", "source"], MEASURES()))
    con = duckdb.connect()
    con.register("src", pdf)
    sql = cube_oracle_sql(
        "SELECT * FROM src",
        ["lang", "source"],
        {"docs": "CAST(COUNT(*) AS BIGINT)", "chars": "CAST(SUM(n) AS BIGINT)"},
    )
    want = sorted(
        (tuple(r) for r in con.execute(sql).fetchall()),
        key=lambda t: (t[2], str(t[0]), str(t[1])),
    )
    assert got == want
    # 4 grouping sets: gid 0 (both), 1 (source rolled), 2 (lang rolled), 3 (all)
    assert {g for (_l, _s, g, _d, _c) in got} == {0, 1, 2, 3}
    # grand total row
    grand = [t for t in got if t[2] == 3]
    assert grand == [(None, None, 3, 6, 210)]


def test_gid_disambiguates_genuine_null_dim(spark):
    sdf, _ = _docs(spark)
    out = _collect(cube_rollup(sdf, ["lang", "source"], MEASURES()))
    # the genuine NULL lang (60 chars) appears at gid 0 with lang None...
    assert (None, "a", 0, 1, 60) in out
    # ...while the lang margin for source 'a' (gid 2) sums ALL langs incl. NULL
    assert (None, "a", 2, 4, 140) in out


def test_rollup_mode_prefix_hierarchy_only(spark):
    sdf, pdf = _docs(spark)
    got = _collect(cube_rollup(sdf, ["lang", "source"], MEASURES(), grouping="rollup"))
    # rollup never emits gid 2 (lang rolled up while source kept)
    assert {g for (_l, _s, g, _d, _c) in got} == {0, 1, 3}
    con = duckdb.connect()
    con.register("src", pdf)
    sql = cube_oracle_sql(
        "SELECT * FROM src",
        ["lang", "source"],
        {"docs": "CAST(COUNT(*) AS BIGINT)", "chars": "CAST(SUM(n) AS BIGINT)"},
        grouping="rollup",
    )
    want = sorted(
        (tuple(r) for r in con.execute(sql).fetchall()),
        key=lambda t: (t[2], str(t[0]), str(t[1])),
    )
    assert got == want


def test_explicit_grouping_sets(spark):
    sdf, pdf = _docs(spark)
    sets = [["lang"], ["source"], []]
    got = _collect(cube_rollup(sdf, ["lang", "source"], MEASURES(), grouping=sets))
    assert {g for (_l, _s, g, _d, _c) in got} == {1, 2, 3}
    con = duckdb.connect()
    con.register("src", pdf)
    sql = cube_oracle_sql(
        "SELECT * FROM src",
        ["lang", "source"],
        {"docs": "CAST(COUNT(*) AS BIGINT)", "chars": "CAST(SUM(n) AS BIGINT)"},
        grouping=sets,
    )
    want = sorted(
        (tuple(r) for r in con.execute(sql).fetchall()),
        key=lambda t: (t[2], str(t[0]), str(t[1])),
    )
    assert got == want


def test_pre_aggregate_identical_to_full_expand(spark):
    sdf, _ = _docs(spark)
    fast = _collect(cube_rollup(sdf, ["lang", "source"], MEASURES()))
    slow = _collect(
        cube_rollup(sdf, ["lang", "source"], MEASURES(), pre_aggregate=False)
    )
    assert fast == slow


def test_min_max_reagg_and_guards(spark):
    sdf, pdf = _docs(spark)
    out = cube_rollup(
        sdf,
        ["lang"],
        {"lo": F.min("n"), "hi": F.max("n")},
        reagg={"lo": "min", "hi": "max"},
    )
    got = {(r["lang"], r["gid"]): (r["lo"], r["hi"]) for r in out.collect()}
    assert got[("en", 0)] == (10, 20)
    assert got[(None, 1)] == (10, 60)  # grand total min/max
    with pytest.raises(ValueError, match="dim"):
        cube_rollup(sdf, [], MEASURES())
    with pytest.raises(ValueError, match="measure"):
        cube_rollup(sdf, ["lang"], {})
    with pytest.raises(ValueError, match="collide"):
        cube_rollup(sdf, ["lang"], {"lang": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="grouping"):
        cube_rollup(sdf, ["lang"], MEASURES(), grouping="pivot")
    with pytest.raises(ValueError, match="non-dim"):
        cube_rollup(sdf, ["lang"], MEASURES(), grouping=[["source"]])
    with pytest.raises(ValueError, match="reagg"):
        cube_rollup(sdf, ["lang"], MEASURES(), reagg={"docs": "avg"})
    with pytest.raises(ValueError, match="reagg names"):
        cube_rollup(sdf, ["lang"], MEASURES(), reagg={"nope": "sum"})


def test_deterministic_across_parallelism(spark):
    sdf, _ = _docs(spark)

    def run(parts):
        return _collect(cube_rollup(sdf.repartition(parts), ["lang", "source"], MEASURES()))

    assert run(1) == run(16)


def test_windowed_topk_matches_brute_force(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from tstore_spark.operators.olap import windowed_topk

    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for i in range(600):
        rows.append((t0 + pd.Timedelta(minutes=i % 300),
                     f"d{i % 7}", 100 + (i * 13) % 500))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "dom", "cents"]).astype(
            {"ts": "datetime64[us]"}))
    out = windowed_topk(df, "ts", "dom", k=3, width="1 hour",
                        weight_cents="cents").collect()
    got = {}
    for r in out:
        got.setdefault(r["window_start"], []).append(
            (r["rnk"], r["key"], r["cnt"], r["cents"]))
    want = {}
    for ts, dom, cents in rows:
        h = ts.floor("h")
        c = want.setdefault(h, {}).setdefault(dom, [0, 0])
        c[0] += 1
        c[1] += cents
    for h, per in want.items():
        ranked = sorted(per.items(), key=lambda kv: (-kv[1][1], -kv[1][0], kv[0]))[:3]
        exp = [(i + 1, d, n, c) for i, (d, (n, c)) in enumerate(ranked)]
        assert sorted(got[pd.Timestamp(h)]) == exp, h


def test_windowed_topk_plans_group_limit_and_guards(spark):
    import pandas as pd
    import pytest as _pt
    from pyspark.sql import functions as F

    from tstore_spark.operators.olap import windowed_topk

    df = spark.createDataFrame(
        pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=400, freq="min"),
            "dom": [f"d{i % 9}" for i in range(400)],
        }).astype({"ts": "datetime64[us]"}))
    out = windowed_topk(df, "ts", "dom", k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    with _pt.raises(ValueError, match="width"):
        windowed_topk(df, "ts", "dom", 2, width="2 hours")
    with _pt.raises(ValueError, match="k must"):
        windowed_topk(df, "ts", "dom", 0)
    a = sorted(map(tuple, windowed_topk(df.repartition(1), "ts", "dom", 2).collect()))
    b = sorted(map(tuple, windowed_topk(df.repartition(13), "ts", "dom", 2).collect()))
    assert a == b
