"""Burst detection: integer two-state DP vs brute force and the SQL twin."""

import duckdb
import pandas as pd
import pytest

from tstore_spark.operators.burst import burst_intervals, burst_label, burst_oracle_sql


def _brute_burst(ns, mult=3, gf=2):
    """Exhaustive reference: enumerate ALL 2^T state paths (T small),
    pick the min-cost set, then apply the operator's marginal rule
    against min-over-paths-through-(t,s)."""
    t_n = len(ns)
    base = sum(ns) // t_n
    r1 = mult * base + 1
    gamma = gf * (r1 - base) ** 2
    best_through = {}  # (t, s) -> min cost over paths with state s at t
    for mask in range(2 ** t_n):
        states = [(mask >> i) & 1 for i in range(t_n)]
        cost = gamma if states[0] == 1 else 0
        prev = states[0]
        cost += (ns[0] - (r1 if states[0] else base)) ** 2
        for i in range(1, t_n):
            s = states[i]
            if prev == 0 and s == 1:
                cost += gamma
            cost += (ns[i] - (r1 if s else base)) ** 2
            prev = s
        for i, s in enumerate(states):
            k = (i, s)
            if k not in best_through or cost < best_through[k]:
                best_through[k] = cost
    return [
        1 if best_through[(i, 1)] < best_through[(i, 0)] else 0
        for i in range(t_n)
    ]


CASES = [
    [1, 1, 2, 1, 9, 9, 8, 1, 1, 2],          # one sustained burst
    [1, 9, 1, 1, 1, 1, 1, 1, 1, 1],          # lone spike: toll should kill it?
    [5, 5, 5, 5, 5, 5, 5, 5],                # flat: no burst
    [0, 0, 0, 20, 21, 19, 0, 0, 9, 9, 9, 0],  # two episodes
    [3, 2, 4, 3, 2, 3, 4, 12, 11, 13, 12, 3, 2],
]


def test_burst_label_vs_bruteforce(spark):
    for ns in CASES:
        pdf = pd.DataFrame({"key": "k", "t": range(len(ns)), "n": ns})
        got = (
            burst_label(spark.createDataFrame(pdf), "key", "t", "n")
            .orderBy("t")
            .toPandas()
        )
        assert list(got["burst"]) == _brute_burst(ns), ns
        assert list(got["n"]) == ns


def test_burst_flat_series_no_burst(spark):
    pdf = pd.DataFrame({"key": "k", "t": range(8), "n": [5] * 8})
    got = burst_label(spark.createDataFrame(pdf), "key", "t", "n").toPandas()
    assert got["burst"].sum() == 0


def test_burst_oracle_parity_multi_key(spark):
    rows = []
    for k in range(6):
        for t in range(40):
            n = (t * 7 + k * 3) % 5 + (15 if (t + k) % 13 < 3 else 0)
            rows.append((f"k{k}", t, n))
    pdf = pd.DataFrame(rows, columns=["key", "t", "n"])
    got = sorted(
        map(tuple, burst_label(spark.createDataFrame(pdf), "key", "t", "n").collect())
    )
    duckdb.sql("CREATE OR REPLACE TABLE c AS SELECT * FROM pdf")
    sql = burst_oracle_sql("SELECT key, t, n FROM c")
    exp = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == exp
    assert sum(r[3] for r in got) > 0  # the planted bursts fire


def test_burst_intervals(spark):
    ns = [0, 0, 20, 21, 19, 0, 0, 9, 9, 9, 0, 0]
    pdf = pd.DataFrame({"key": "k", "t": range(len(ns)), "n": ns})
    lab = burst_label(spark.createDataFrame(pdf), "key", "t", "n")
    eps = burst_intervals(lab, "key", "t").orderBy("start").collect()
    flags = _brute_burst(ns)
    # derive expected episodes from the brute labels
    runs, cur = [], None
    for i, f in enumerate(flags):
        if f and cur is None:
            cur = [i, i]
        elif f:
            cur[1] = i
        elif cur is not None:
            runs.append(tuple(cur))
            cur = None
    if cur is not None:
        runs.append(tuple(cur))
    assert [(r["start"], r["end"]) for r in eps] == runs
    for r in eps:
        assert r["total_n"] == sum(ns[r["start"]: r["end"] + 1])


def test_burst_guards(spark):
    pdf = pd.DataFrame({"key": "k", "t": [0, 0, 1], "n": [1, 2, 3]})
    with pytest.raises(Exception, match="duplicate window"):
        burst_label(spark.createDataFrame(pdf), "key", "t", "n").collect()
    pdf2 = pd.DataFrame({"key": ["k"], "t": [0], "n": [pd.NA]}).astype(
        {"n": "Int64"}
    )
    with pytest.raises(Exception, match="NULL count"):
        burst_label(spark.createDataFrame(pdf2), "key", "t", "n").collect()
    with pytest.raises(ValueError, match="burst_mult"):
        burst_label(spark.createDataFrame(pdf), "key", "t", "n", burst_mult=1)


def test_burst_deterministic_across_parallelism(spark):
    rows = [
        (f"k{k}", t, (t * 11 + k) % 7 + (25 if t % 17 in (4, 5) else 0))
        for k in range(4)
        for t in range(60)
    ]
    pdf = pd.DataFrame(rows, columns=["key", "t", "n"])
    a = burst_label(
        spark.createDataFrame(pdf).repartition(2), "key", "t", "n"
    ).collect()
    b = burst_label(
        spark.createDataFrame(pdf).repartition(16), "key", "t", "n"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) != []
