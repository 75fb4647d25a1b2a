"""Banded DTW: kernel vs a straight-line reference DP, SQL-twin parity,
SAX blocking valve, unreachable-band NULLs, parallelism determinism."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.dtw import (
    _dtw_kernel,
    dtw_distances,
    dtw_oracle_sql,
    dtw_sax_pairs,
    series_vectors,
)


def _ref_dtw(a, b, band):
    """Textbook O(n*m) DP with a Sakoe-Chiba band; None = unreachable."""
    n, m = len(a), len(b)
    D = [[None] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            if abs(i - j) > band:
                continue
            c = (a[i] - b[j]) ** 2
            if i == 0 and j == 0:
                D[0][0] = c
                continue
            cands = [
                x
                for x in (
                    D[i - 1][j] if i > 0 else None,
                    D[i][j - 1] if j > 0 else None,
                    D[i - 1][j - 1] if i > 0 and j > 0 else None,
                )
                if x is not None
            ]
            D[i][j] = c + min(cands) if cands else None
    return D[n - 1][m - 1]


CASES = [
    ([1, 3, 2, 8, 4], [1, 2, 2, 9, 3]),
    ([5, 5, 5], [5, 6, 5, 6]),
    ([0, 10, 0, 10, 0, 10], [10, 0, 10, 0, 10, 0]),
    ([7], [7]),
    ([7], [1, 2, 3]),
    ([2, 2, 2, 2], [2, 2, 2, 2]),
    ([-3, 0, 3], [3, 0, -3]),
]


def test_kernel_matches_reference_dp():
    for a, b in CASES:
        for band in (0, 1, 2, 3, 100):
            assert _dtw_kernel(a, b, band) == _ref_dtw(a, b, band), (a, b, band)


def test_kernel_band_shortcuts():
    assert _dtw_kernel([], [1], 5) is None
    assert _dtw_kernel([1, 2, 3, 4], [1], 2) is None  # band < |n-m|
    assert _dtw_kernel([1, 2], [1, 2], 0) == 0  # diagonal-only


def test_distances_and_oracle_parity(spark):
    rows = []
    for sid, (a, _b) in enumerate(CASES):
        rows += [(f"s{sid}", t, v) for t, v in enumerate(a)]
    df = spark.createDataFrame(rows, "id string, ts int, value long")
    vec = series_vectors(df, time_col="ts")
    ids = sorted(f"s{i}" for i in range(len(CASES)))
    pairs = spark.createDataFrame(
        [(x, y) for x in ids for y in ids if x < y], "id_a string, id_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dtw"]
        for r in dtw_distances(vec, pairs, band=2).collect()
    }
    series = {f"s{i}": a for i, (a, _b) in enumerate(CASES)}
    want = {
        (x, y): _ref_dtw(series[x], series[y], 2) for x in ids for y in ids if x < y
    }
    assert got == want

    vals = ", ".join(
        f"('{x}', '{y}', {list(map(int, series[x]))}::BIGINT[], "
        f"{list(map(int, series[y]))}::BIGINT[])"
        for x in ids
        for y in ids
        if x < y
    )
    sql = dtw_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(id_a, id_b, va, vb)", band=2
    )
    oracle = {(a, b): d for a, b, d in duckdb.sql(sql).fetchall()}
    assert oracle == want


def test_sax_blocking_pairs_and_guard(spark):
    # two shape families: rising ramps and spikes — same-family pairs only
    rows = []
    for sid, base in [("r1", 0), ("r2", 100)]:
        rows += [(sid, t, base + t * 10) for t in range(16)]
    for sid in ("k1", "k2"):
        rows += [(sid, t, 500 if t == 8 else 0) for t in range(16)]
    df = spark.createDataFrame(rows, "id string, ts int, value long")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dtw_sax_pairs(df, word_len=4, alphabet_size=4).collect()
    }
    assert ("r1", "r2") in pairs and ("k1", "k2") in pairs
    assert not any({a, b} == {"r1", "k1"} for a, b in pairs)

    with pytest.raises(ValueError, match="max_block"):
        dtw_sax_pairs(df, word_len=4, alphabet_size=4, max_block=1)


def test_sax_blocking_tiebreak_passthrough(spark):
    """Duplicate timestamps need tiebreak_cols for a total order; the
    parameter must reach sax_words so candidate sets are bit-identical at
    any parallelism (same rows, shuffled partitioning, same pairs)."""
    rows = []
    for sid, base in [("r1", 0), ("r2", 100)]:
        # every timestamp duplicated with two different values
        for t in range(8):
            rows += [(sid, t, base + t * 10, 2 * t), (sid, t, base + t * 10 + 5, 2 * t + 1)]
    df = spark.createDataFrame(rows, "id string, ts int, value long, seq long")

    def pairs(parts):
        return sorted(
            (r["id_a"], r["id_b"])
            for r in dtw_sax_pairs(
                df.repartition(parts),
                word_len=4,
                alphabet_size=4,
                tiebreak_cols=["seq"],
            ).collect()
        )

    assert pairs(1) == pairs(16) == [("r1", "r2")]


def test_distances_deterministic_across_parallelism(spark):
    rows = [(f"s{i}", t, (i * 7 + t * t) % 23) for i in range(6) for t in range(12)]
    df = spark.createDataFrame(rows, "id string, ts int, value long")
    pairs = spark.createDataFrame(
        [(f"s{i}", f"s{j}") for i in range(6) for j in range(i + 1, 6)],
        "id_a string, id_b string",
    )
    a = sorted(
        map(tuple, dtw_distances(series_vectors(df.repartition(7), time_col="ts"), pairs, 3).collect())
    )
    b = sorted(
        map(tuple, dtw_distances(series_vectors(df.coalesce(1), time_col="ts"), pairs, 3).collect())
    )
    assert a == b


def test_band_guard(spark):
    df = spark.createDataFrame([("a", 0, 1)], "id string, ts int, value long")
    with pytest.raises(ValueError, match="band"):
        dtw_distances(series_vectors(df, time_col="ts"), df.select(F.lit("a").alias("id_a"), F.lit("a").alias("id_b")), -1)
