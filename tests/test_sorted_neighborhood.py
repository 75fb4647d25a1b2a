"""Sorted-neighborhood blocking: brute force, rank exactness, determinism."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.dedup import sorted_neighborhood_pairs


def _docs(n=500) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    # keys cluster by construction: ~125 stems, several docs per stem with
    # small suffix variations -> lexicographic neighbors
    stem = (h % 125).astype(np.int64)
    key = np.char.add(
        np.char.add("k", np.char.zfill(stem.astype(str), 3)),
        np.char.zfill((h % 7).astype(str), 2),
    )
    pdf = pd.DataFrame({"doc_id": i, "key": key.astype(object)})
    pdf.loc[pdf.index[::50], "key"] = None  # NULL keys must be excluded
    return pdf


def _brute_pairs(pdf: pd.DataFrame, w: int) -> set:
    rows = pdf[pdf["key"].notna()].sort_values(["key", "doc_id"]).reset_index(drop=True)
    out = set()
    for a in range(len(rows)):
        for b in range(a + 1, min(a + w, len(rows))):
            out.add((int(rows["doc_id"][a]), int(rows["doc_id"][b]), b - a))
    return out


@pytest.fixture(scope="module")
def snm_sdf(spark):
    return spark.createDataFrame(_docs()).cache()


def test_snm_brute_force(spark, snm_sdf):
    got = {
        (r["id_a"], r["id_b"], r["rank_dist"])
        for r in sorted_neighborhood_pairs(snm_sdf, "key", window=5).collect()
    }
    assert got == _brute_pairs(_docs(), 5)


def test_snm_pair_count_formula(spark, snm_sdf):
    w = 8
    n = _docs()["key"].notna().sum()
    got = sorted_neighborhood_pairs(snm_sdf, "key", window=w).count()
    # exact linear candidate count: sum_{d=1..w-1} (n - d)
    assert got == sum(n - d for d in range(1, w))


def test_snm_single_char_prefix_same_result(spark, snm_sdf):
    a = sorted(
        map(tuple, sorted_neighborhood_pairs(snm_sdf, "key", window=5).collect())
    )
    b = sorted(
        map(
            tuple,
            sorted_neighborhood_pairs(snm_sdf, "key", window=5, prefix_len=4).collect(),
        )
    )
    assert a == b  # bucket granularity must never change the answer


def test_snm_deterministic_across_parallelism(spark, snm_sdf):
    a = sorted(
        map(tuple, sorted_neighborhood_pairs(snm_sdf, "key", window=6).collect())
    )
    b = sorted(
        map(
            tuple,
            sorted_neighborhood_pairs(snm_sdf.repartition(13), "key", window=6).collect(),
        )
    )
    assert a == b


def test_snm_guards(spark, snm_sdf):
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(snm_sdf, "key", window=1)
    with pytest.raises(ValueError, match="prefix_len"):
        sorted_neighborhood_pairs(snm_sdf, "key", prefix_len=0)


def test_snm_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, key string")
    assert sorted_neighborhood_pairs(empty, "key").count() == 0


def test_snm_numeric_key_uses_string_collation_consistently(spark):
    """A numeric key is cast to string so the prefix buckets (necessarily
    lexicographic) and the within-bucket ordering agree: keys 9 and 10
    must rank as '10' < '9' everywhere — the documented
    row_number() OVER (ORDER BY CAST(key AS STRING), id) contract."""
    df = spark.createDataFrame(
        [(1, 9), (2, 10), (3, 11), (4, 90)], "doc_id long, key long"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["rank_dist"])
        for r in sorted_neighborhood_pairs(df, "key", window=2, prefix_len=1).collect()
    )
    # string order: '10'(2) < '11'(3) < '9'(1) < '90'(4) -> adjacent pairs
    assert got == [(1, 4, 1), (2, 3, 1), (3, 1, 1)]


# ---------------------------------------------------------------------------
# edit_distance_pairs (SND blocking + Levenshtein verify)
# ---------------------------------------------------------------------------


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_python_reference(spark, snm_sdf):
    from tstore_spark.operators.dedup import edit_distance_pairs

    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(snm_sdf, "key", window=6, max_dist=2).collect()
    }
    assert got  # the clustered fixture must produce verified pairs
    pdf = snm_sdf.toPandas().set_index("doc_id")["key"]
    # every kept pair carries the exact full edit distance (the threshold
    # variant abandons early but never alters kept distances)
    for (a, b), d in got.items():
        assert d == _py_lev(pdf[a], pdf[b]) and d <= 2
    # and nothing within the window at dist <= 2 is missed
    base = sorted_neighborhood_pairs(snm_sdf, "key", window=6)
    for r in base.collect():
        full = _py_lev(r["key_a"], r["key_b"])
        assert ((r["id_a"], r["id_b"]) in got) == (full <= 2)


def test_edit_distance_pairs_guard(spark, snm_sdf):
    from tstore_spark.operators.dedup import edit_distance_pairs

    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(snm_sdf, "key", max_dist=0)


def test_edit_distance_pairs_duckdb_levenshtein_parity(spark, snm_sdf):
    """The oracle relies on Spark and DuckDB agreeing on the classic
    Levenshtein (unit insert/delete/substitute) — check on the fixture's
    real candidate keys, not just toy strings."""
    import duckdb as _dd

    from tstore_spark.operators.dedup import edit_distance_pairs

    rows = edit_distance_pairs(snm_sdf, "key", window=6, max_dist=3).collect()
    con = _dd.connect()
    for r in rows[:200]:
        want = con.execute(
            "SELECT levenshtein(?, ?)", [r["key_a"], r["key_b"]]
        ).fetchone()[0]
        assert r["dist"] == want
