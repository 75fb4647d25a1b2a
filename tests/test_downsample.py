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
