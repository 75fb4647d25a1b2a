"""Parallel fixed-anchor LTTB downsampling: exact invariants on planted
series + a brute-force pandas replica of the same variant."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.downsample import lttb_downsample


def _series_df(spark, n, keys=("a", "b"), seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for k in keys:
        vals = np.cumsum(rng.standard_normal(n))
        for i in range(n):
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=60 * i), float(vals[i]), i))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value", "eid"])
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn("ts", sdf["ts"].cast("timestamp_ntz")), pdf


def test_lttb_counts_and_endpoints(spark):
    sdf, pdf = _series_df(spark, 500)
    out = lttb_downsample(sdf, "key", "ts", "value", 50, tiebreak_col="eid").toPandas()
    for k, g in out.groupby("key"):
        assert len(g) == 50
        src = pdf[pdf["key"] == k]
        assert g["ts"].min() == src["ts"].min()
        assert g["ts"].max() == src["ts"].max()
        # selected points are a subset of the input
        merged = g.merge(src, on=["key", "ts", "value"], how="left", indicator=True)
        assert (merged["_merge"] == "both").all()


def test_lttb_small_series_pass_through(spark):
    sdf, pdf = _series_df(spark, 20)
    out = lttb_downsample(sdf, "key", "ts", "value", 50).toPandas()
    assert len(out) == len(pdf)


def test_lttb_target_guard(spark):
    sdf, _ = _series_df(spark, 10)
    with pytest.raises(ValueError, match="target_points"):
        lttb_downsample(sdf, "key", "ts", "value", 2)


def _lttb_fixed_anchor_pandas(g, m):
    """Straight-line replica of the parallel variant for one series."""
    g = g.sort_values(["ts", "eid"]).reset_index(drop=True)
    n = len(g)
    if n <= m:
        return set(g.index)
    t = g["ts"].astype("int64").to_numpy().astype(float)
    v = g["value"].to_numpy()
    bkt = np.array([((r - 2) * (m - 2)) // (n - 2) for r in range(2, n)])  # ranks 2..n-1
    keep = {0, n - 1}
    # mid-rank anchors
    anchors = {}
    for b in range(m - 2):
        idxs = np.where(bkt == b)[0] + 1  # positions of interior points
        anchors[b] = idxs[(len(idxs) + 1) // 2 - 1]
    anchors[-1], anchors[m - 2] = 0, n - 1
    for b in range(m - 2):
        pa, na = anchors[b - 1], anchors[b + 1]
        idxs = np.where(bkt == b)[0] + 1
        area = np.abs((t[pa] - t[na]) * (v[idxs] - v[pa]) - (t[pa] - t[idxs]) * (v[na] - v[pa]))
        best = idxs[np.lexsort((idxs, -area))[0]]
        keep.add(int(best))
    return keep


def test_lttb_matches_pandas_replica(spark):
    sdf, pdf = _series_df(spark, 300, keys=("a", "b", "c"), seed=4)
    out = lttb_downsample(sdf, "key", "ts", "value", 30, tiebreak_col="eid").toPandas()
    for k, g in pdf.groupby("key"):
        want = _lttb_fixed_anchor_pandas(g, 30)
        got_ts = set(out[out["key"] == k]["ts"])
        want_ts = set(g.sort_values(["ts", "eid"]).reset_index(drop=True).loc[sorted(want), "ts"])
        assert got_ts == want_ts, k


def test_lttb_deterministic_across_parallelism(spark):
    sdf, _ = _series_df(spark, 400, seed=9)
    a = lttb_downsample(sdf.repartition(2), "key", "ts", "value", 40, tiebreak_col="eid").collect()
    b = lttb_downsample(sdf.repartition(16), "key", "ts", "value", 40, tiebreak_col="eid").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------------- M4
def _m4_ref(pdf, n_buckets, lo_us=None, hi_us=None):
    """Straight-line M4 reference: per (key, bucket) first/min/max/last with
    (time, value) lexicographic tie-breaks, exact integer bucket math."""
    out = {}
    us = pdf["time"].astype("datetime64[us]").astype("int64")
    lo = int(us.min()) if lo_us is None else lo_us
    hi = int(us.max()) if hi_us is None else hi_us
    span = hi - lo + 1
    for (k, t, v), e in zip(pdf[["key", "time", "value"]].itertuples(index=False), us):
        if v is None or not (lo <= e <= hi):
            continue
        b = (e - lo) * n_buckets // span
        cur = out.setdefault((k, b), {"f": (e, v), "l": (e, v), "mn": v, "mx": v, "n": 0})
        cur["f"] = min(cur["f"], (e, v))
        cur["l"] = max(cur["l"], (e, v))
        cur["mn"] = min(cur["mn"], v)
        cur["mx"] = max(cur["mx"], v)
        cur["n"] += 1
    return out


def test_m4_matches_reference_and_is_deterministic(spark):
    import numpy as np

    from tstore_spark.operators.downsample import m4_downsample

    rng = np.random.default_rng(11)
    n = 4000
    pdf = pd.DataFrame({
        "key": [f"k{i % 3}" for i in range(n)],
        "time": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "value": np.round(rng.normal(100, 25, n), 2),
    })
    # duplicate timestamps with different values: tie-break must bite
    dup = pdf.iloc[:50].copy()
    dup["value"] = dup["value"] + 7.5
    pdf = pd.concat([pdf, dup], ignore_index=True)

    ref = _m4_ref(pdf, 32)
    outs = []
    for parts in (1, 8):
        df = spark.createDataFrame(pdf).repartition(parts)
        got = m4_downsample(df, "key", "time", "value", 32).collect()
        outs.append(sorted(
            (r["key"], r["bucket"], r["t_first"], r["v_first"], r["v_min"],
             r["v_max"], r["t_last"], r["v_last"], r["n_points"]) for r in got))
    assert outs[0] == outs[1]  # bit-identical across parallelism

    got_map = {(r[0], r[1]): r for r in outs[0]}
    assert set(got_map) == set(ref)
    for k, exp in ref.items():
        r = got_map[k]
        assert r[3] == exp["f"][1] and r[7] == exp["l"][1], k   # first/last
        assert r[4] == exp["mn"] and r[5] == exp["mx"], k       # min/max
        assert r[8] == exp["n"], k
        ef, el = pd.Timestamp(exp["f"][0], unit="us"), pd.Timestamp(exp["l"][0], unit="us")
        assert r[2] == ef and r[6] == el, k


def test_m4_t_range_clips_like_a_viewport(spark):
    from tstore_spark.operators.downsample import m4_downsample

    pdf = pd.DataFrame({
        "key": ["a"] * 10,
        "time": pd.date_range("2024-01-01", periods=10, freq="1h"),
        "value": [float(i) for i in range(10)],
    })
    df = spark.createDataFrame(pdf)
    got = m4_downsample(df, "key", "time", "value", 2,
                        t_range=("2024-01-01 02:00:00", "2024-01-01 05:00:00"))
    rows = {r["bucket"]: r for r in got.collect()}
    # viewport keeps hours 2..5 only; 2 buckets of 2 hours each
    assert sorted(rows) == [0, 1]
    assert rows[0]["v_first"] == 2.0 and rows[0]["v_last"] == 3.0
    assert rows[1]["v_first"] == 4.0 and rows[1]["v_last"] == 5.0
    assert rows[0]["n_points"] == 2 and rows[1]["n_points"] == 2

    with pytest.raises(ValueError, match="after end"):
        m4_downsample(df, "key", "time", "value", 2,
                      t_range=("2024-01-02", "2024-01-01"))
    with pytest.raises(ValueError, match="n_buckets"):
        m4_downsample(df, "key", "time", "value", 0)


def test_m4_single_bucket_and_empty(spark):
    from tstore_spark.operators.downsample import m4_downsample

    pdf = pd.DataFrame({
        "key": ["a", "a", "b"],
        "time": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
        "value": [5.0, 1.0, 9.0],
    })
    got = {(r["key"], r["bucket"]): r
           for r in m4_downsample(spark.createDataFrame(pdf), "key", "time", "value", 1).collect()}
    assert got[("a", 0)]["v_min"] == 1.0 and got[("a", 0)]["v_max"] == 5.0
    assert got[("a", 0)]["v_first"] == 5.0 and got[("a", 0)]["v_last"] == 1.0
    assert got[("b", 0)]["n_points"] == 1

    empty = m4_downsample(
        spark.createDataFrame(pdf).where("value > 100"), "key", "time", "value", 4)
    assert empty.count() == 0
    assert "bucket_start" in empty.columns


# -------------------------------------------------------------- heatmap
def test_heatmap_matches_reference_and_is_deterministic(spark):
    import numpy as np

    from tstore_spark.operators.downsample import heatmap_downsample

    rng = np.random.default_rng(5)
    n = 5000
    pdf = pd.DataFrame({
        "key": [f"k{i % 2}" for i in range(n)],
        "time": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 7 * 86400, n), unit="s"),
        "value": np.round(rng.normal(0, 30, n), 2),
    })
    pdf.loc[0, "value"] = None  # skipped

    # straight-line reference with the identical integer math
    live = pdf.dropna(subset=["value"])
    e = live["time"].astype("datetime64[us]").astype("int64")
    c = (live["value"] * 100).round().astype("int64")
    t_lo, t_span = e.min(), e.max() - e.min() + 1
    v_lo, v_span = c.min(), c.max() - c.min() + 1
    ref = {}
    for k, ee, cc in zip(live["key"], e, c):
        cell = (k, (ee - t_lo) * 16 // t_span, (cc - v_lo) * 8 // v_span)
        ref[cell] = ref.get(cell, 0) + 1

    outs = []
    for parts in (1, 16):
        got = heatmap_downsample(
            spark.createDataFrame(pdf).repartition(parts), "key", "time", "value", 16, 8
        ).collect()
        outs.append(sorted(tuple(r) for r in got))
    assert outs[0] == outs[1]  # bit-identical across parallelism

    got_map = {(r[0], r[1], r[2]): r for r in outs[0]}
    assert {k: v for k, v in ref.items()} == {
        k: r[5] for k, r in got_map.items()
    }
    assert sum(ref.values()) == n - 1

    # global domain: edges identical across keys for the same bucket ids
    edges = {}
    for r in outs[0]:
        prev = edges.setdefault((r[1], r[2]), (r[3], r[4]))
        assert prev == (r[3], r[4])

    with pytest.raises(ValueError, match="t_buckets"):
        heatmap_downsample(spark.createDataFrame(pdf), "key", "time", "value", 0, 8)


# ---------------------------------------------------------------------------
# swinging-door (error-bounded PLA)
# ---------------------------------------------------------------------------


def _sdt_frame(spark, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["key", "ts", "cents"]).astype(
        {"ts": "datetime64[us]"})
    return spark.createDataFrame(pdf)


def test_swinging_door_line_collapses_to_endpoints(spark):
    import pandas as pd

    from tstore_spark.operators.downsample import swinging_door

    t0 = pd.Timestamp("2024-01-01")
    rows = [("a", t0 + pd.Timedelta(minutes=i), 100 + 10 * i) for i in range(50)]
    out = swinging_door(_sdt_frame(spark, rows), "key", "ts", "cents",
                        epsilon_cents=5).collect()
    assert len(out) == 2
    assert sorted(r["pt_index"] for r in out) == [0, 49]


def test_swinging_door_bound_holds_exactly(spark):
    import pandas as pd

    from tstore_spark.operators.downsample import sdt_bound_check, swinging_door

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(400):
        v = 1000 + ((i * 37) % 97) - ((i * 13) % 53) + (50 if 100 <= i < 110 else 0)
        rows.append(("a", t0 + pd.Timedelta(minutes=i), v))
        rows.append(("b", t0 + pd.Timedelta(minutes=i), 500 + (i % 7) * 30))
    raw = _sdt_frame(spark, rows)
    for eps in (0, 10, 80):
        kept = swinging_door(raw, "key", "ts", "cents", epsilon_cents=eps)
        chk = {r["key"]: r for r in sdt_bound_check(
            raw.withColumnRenamed("key", "key"), kept, eps).collect()}
        for k in ("a", "b"):
            assert chk[k]["within_bound"], (k, eps)
            assert chk[k]["n_kept"] <= chk[k]["n_raw"]
        if eps == 80:
            assert chk["b"]["n_kept"] < chk["b"]["n_raw"] / 2  # real compression


def test_swinging_door_eps_zero_keeps_noncollinear(spark):
    import pandas as pd

    from tstore_spark.operators.downsample import swinging_door

    t0 = pd.Timestamp("2024-01-01")
    rows = [("a", t0 + pd.Timedelta(minutes=i), [0, 5, 0, 5][i]) for i in range(4)]
    out = swinging_door(_sdt_frame(spark, rows), "key", "ts", "cents", 0).collect()
    assert len(out) == 4  # zigzag at eps=0: every point is a corner


def test_swinging_door_guards_and_determinism(spark):
    import pandas as pd
    import pytest as _pt

    from tstore_spark.operators.downsample import swinging_door

    t0 = pd.Timestamp("2024-01-01")
    rows = [(f"k{i % 3}", t0 + pd.Timedelta(minutes=i), (i * 31) % 211)
            for i in range(900)]
    raw = _sdt_frame(spark, rows)
    with _pt.raises(ValueError, match="epsilon"):
        swinging_door(raw, "key", "ts", "cents", -1)
    a = sorted(map(tuple, swinging_door(
        raw.repartition(1), "key", "ts", "cents", 20).collect()))
    b = sorted(map(tuple, swinging_door(
        raw.repartition(13), "key", "ts", "cents", 20).collect()))
    assert a == b
