"""As-of join vs a straight-line pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.asof import asof_join


def _frames():
    # left: 200 observations across 3 keys; right: sparse quotes w/ dup times
    i = np.arange(200, dtype=np.int64)
    h = (i * 40503 + 7) % 997
    left = pd.DataFrame(
        {
            "k": np.array(["a", "b", "c"])[i % 3],
            "t": pd.Timestamp("2024-01-01") + pd.to_timedelta(h % 500, unit="m"),
            "obs_id": i,
        }
    )
    j = np.arange(40, dtype=np.int64)
    right = pd.DataFrame(
        {
            "k": np.array(["a", "b", "c"])[j % 3],
            "t": pd.Timestamp("2024-01-01") + pd.to_timedelta((j * 29) % 480, unit="m"),
            "quote": (j * 11 % 100).astype(np.float64),
            "qid": j,
        }
    )
    # duplicate-timestamp right rows to exercise the tiebreak (latest qid wins)
    dup = right.iloc[:5].copy()
    dup["qid"] += 1000
    dup["quote"] += 0.5
    right = pd.concat([right, dup], ignore_index=True)
    return left, right


def _pandas_asof(left, right):
    out = []
    for _, lr in left.iterrows():
        cand = right[(right["k"] == lr["k"]) & (right["t"] <= lr["t"])]
        if len(cand):
            best = cand.sort_values(["t", "qid"]).iloc[-1]
            out.append(best["quote"])
        else:
            out.append(None)
    return out


def test_asof_matches_pandas(spark):
    left, right = _frames()
    l_sdf = spark.createDataFrame(left)
    r_sdf = spark.createDataFrame(right)
    got = asof_join(
        l_sdf, r_sdf, key="k", left_time="t", value_cols=["quote"], tiebreak_col="qid"
    )
    g = {r["obs_id"]: r["quote_asof"] for r in got.collect()}
    expect = dict(zip(left["obs_id"], _pandas_asof(left, right)))
    assert len(g) == len(left)
    for k, v in expect.items():
        assert g[k] == (None if v is None else v), k


def test_asof_deterministic_across_parallelism(spark):
    left, right = _frames()
    l_sdf = spark.createDataFrame(left)
    r_sdf = spark.createDataFrame(right)
    a = sorted(
        (r["obs_id"], r["quote_asof"])
        for r in asof_join(l_sdf, r_sdf, "k", "t", value_cols=["quote"], tiebreak_col="qid").collect()
    )
    b = sorted(
        (r["obs_id"], r["quote_asof"])
        for r in asof_join(
            l_sdf.repartition(7), r_sdf.repartition(3), "k", "t", value_cols=["quote"], tiebreak_col="qid"
        ).collect()
    )
    assert a == b


def test_bucketed_equals_plain_random(spark):
    """asof_join_bucketed must equal asof_join on arbitrary data, for bucket
    widths smaller, comparable, and larger than the data's time span —
    including right rows exactly on bucket boundaries."""
    import numpy as np
    import pandas as pd

    from tstore_spark.operators.asof import asof_join, asof_join_bucketed

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    lrows, rrows = [], []
    for k in ("a", "b", "c"):
        for i in range(200):
            lrows.append((k, base + pd.Timedelta(seconds=int(rng.integers(0, 86_400 * 3))), i))
        for j in range(60):
            # include exact bucket-boundary instants (multiples of 3600)
            s = int(rng.integers(0, 72)) * 3600 if j % 3 == 0 else int(rng.integers(0, 86_400 * 3))
            # ~25% NULL values: per-column last-non-null carry must match
            v = None if rng.integers(0, 4) == 0 else float(j) * 1.5
            rrows.append((k, base + pd.Timedelta(seconds=s), j, v))
    left = spark.createDataFrame(pd.DataFrame(lrows, columns=["k", "ts", "lid"]))
    right = spark.createDataFrame(pd.DataFrame(rrows, columns=["k", "ts", "rid", "val"]))

    plain = asof_join(left, right, key="k", left_time="ts", value_cols=["val"], tiebreak_col="rid")
    for width in (3600, 86_400, 10 * 86_400):
        bucketed = asof_join_bucketed(
            left, right, key="k", left_time="ts", value_cols=["val"],
            tiebreak_col="rid", bucket_seconds=width,
        )
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, bucketed.collect()))
        assert a == b, f"bucket width {width} diverged"


def test_bucketed_null_values_carry_per_column(spark):
    """A NULL in a bucket's LAST right row must not erase an earlier non-null
    value: plain asof carries each column independently (last ignorenulls),
    and the bucketed summary/carry must match — including two value columns
    whose latest non-null values come from DIFFERENT right rows."""
    import pandas as pd

    from tstore_spark.operators.asof import asof_join, asof_join_bucketed

    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x", "x", "y"],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00", "2024-01-01 12:00", "2024-01-03 06:00", "2024-01-01 00:00"]
                ),
                "rid": [0, 1, 2, 0],
                # bucket 0 (day 1): last row (12:00) has val=NULL, aux=7.0;
                # earlier row has val=5.0 — the carry into day 2 must be
                # val=5.0 (from 00:00) AND aux=7.0 (from 12:00)
                "val": [5.0, None, 2.0, None],
                "aux": [None, 7.0, None, 3.0],
            }
        )
    )
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x", "y"],
                "ts": pd.to_datetime(["2024-01-02 06:00", "2024-01-04 00:00", "2024-01-02 00:00"]),
                "lid": [1, 2, 3],
            }
        )
    )
    plain = sorted(
        map(tuple, asof_join(left, right, key="k", left_time="ts",
                             value_cols=["val", "aux"], tiebreak_col="rid").collect())
    )
    bucketed = sorted(
        map(tuple, asof_join_bucketed(left, right, key="k", left_time="ts",
                                      value_cols=["val", "aux"], tiebreak_col="rid",
                                      bucket_seconds=86_400).collect())
    )
    assert plain == bucketed
    by_lid = {t[2]: (t[3], t[4]) for t in bucketed}
    assert by_lid[1] == (5.0, 7.0)  # per-column carry from different rows
    assert by_lid[2] == (2.0, 7.0)  # later bucket updates val, keeps aux
    assert by_lid[3] == (None, 3.0)


def test_bucketed_left_before_any_right(spark):
    import pandas as pd

    from tstore_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "ts": [pd.Timestamp("2024-01-01")], "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "ts": [pd.Timestamp("2024-06-01")], "val": [9.0]})
    )
    out = asof_join_bucketed(left, right, key="k", left_time="ts", value_cols=["val"]).collect()
    assert out[0]["val_asof"] is None


def _brute_directional(left, right, direction, tolerance_us=None):
    """Straight-line reference for forward/nearest/tolerance: per left row,
    scan candidates; among equal-time rights the highest qid wins."""
    out = []
    tol = tolerance_us
    for _, lr in left.iterrows():
        k, t = lr["k"], lr["t"]
        rk = right[right["k"] == k]
        back = rk[rk["t"] <= t]
        fwd = rk[rk["t"] >= t]
        bv = bt = fv = ft = None
        if len(back):
            bm = back[back["t"] == back["t"].max()].sort_values("qid").iloc[-1]
            bv, bt = bm["quote"], bm["t"]
        if len(fwd):
            fm = fwd[fwd["t"] == fwd["t"].min()].sort_values("qid").iloc[-1]
            fv, ft = fm["quote"], fm["t"]
        if tol is not None:
            if bt is not None and (t - bt).value // 1000 > tol:
                bv = bt = None
            if ft is not None and (ft - t).value // 1000 > tol:
                fv = ft = None
        if direction == "backward":
            out.append(bv)
        elif direction == "forward":
            out.append(fv)
        else:  # nearest, ties to backward
            if bv is not None and fv is not None:
                out.append(bv if (t - bt) <= (ft - t) else fv)
            else:
                out.append(bv if bv is not None else fv)
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance_us", [None, 90 * 60 * 1_000_000])
def test_asof_directions_match_brute_force(spark, direction, tolerance_us):
    left, right = _frames()
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key="k",
        left_time="t",
        value_cols=["quote"],
        tiebreak_col="qid",
        direction=direction,
        tolerance_us=tolerance_us,
    )
    g = {r["obs_id"]: r["quote_asof"] for r in got.collect()}
    expect = dict(zip(left["obs_id"], _brute_directional(left, right, direction, tolerance_us)))
    assert len(g) == len(left)
    for k, v in expect.items():
        assert g[k] == pytest.approx(v) if v is not None else g[k] is None, (
            f"{direction} tol={tolerance_us} obs {k}: got {g[k]} want {v}"
        )


def test_asof_forward_null_values_carry_per_column(spark):
    left = pd.DataFrame(
        {"k": ["a"], "t": [pd.Timestamp("2024-01-01 00:00")], "obs_id": [0]}
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a"],
            "t": [pd.Timestamp("2024-01-01 00:10"), pd.Timestamp("2024-01-01 00:20")],
            "x": [None, 1.5],
            "y": [2.5, None],
            "qid": [0, 1],
        }
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key="k",
        left_time="t",
        value_cols=["x", "y"],
        tiebreak_col="qid",
        direction="forward",
    ).collect()[0]
    # each column independently takes its nearest FOLLOWING non-null
    assert got["x_asof"] == 1.5 and got["y_asof"] == 2.5


def test_asof_direction_guard(spark):
    left, right = _frames()
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            key="k", left_time="t", direction="sideways",
        )
