"""Reciprocal-rank fusion."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.ranking import ranked_by, rrf_fuse


def _fuse_reference(lists, k=60):
    ids = set().union(*[set(l) for l in lists])
    out = {}
    for d in ids:
        s = 0.0
        for l in lists:
            if d in l:
                s += 1.0 / (k + l.index(d) + 1)
        out[d] = s
    return out


def test_ranked_by_total_order(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 1, 2, 4], "score": [9, 9, 5, 7]})
    )
    r = {x["doc_id"]: x["rank"] for x in ranked_by(df, "doc_id", F.desc("score")).collect()}
    # tie on score=9 broken by id: doc 1 before doc 3
    assert r == {1: 1, 3: 2, 4: 3, 2: 4}


def test_rrf_matches_reference(spark):
    l1 = ["a", "b", "c", "d"]
    l2 = ["c", "a", "e"]
    r1 = spark.createDataFrame([(d, i + 1) for i, d in enumerate(l1)], "doc_id string, rank int")
    r2 = spark.createDataFrame([(d, i + 1) for i, d in enumerate(l2)], "doc_id string, rank int")
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([r1, r2], k=60).collect()}
    want = _fuse_reference([l1, l2])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=0.0)  # exact bits
    # doc in both lists outranks single-list docs
    top = rrf_fuse([r1, r2], k=60, top=2).collect()
    assert [r["doc_id"] for r in top] == ["a", "c"]


def test_rrf_deterministic_across_partitioning(spark):
    import random

    rnd = random.Random(7)
    ids = [f"d{i}" for i in range(200)]
    l1 = rnd.sample(ids, 150)
    l2 = rnd.sample(ids, 150)
    mk = lambda l, n: spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(l)], "doc_id string, rank int"
    ).repartition(n)
    a = [tuple(r) for r in rrf_fuse([mk(l1, 1), mk(l2, 1)]).collect()]
    b = [tuple(r) for r in rrf_fuse([mk(l1, 7), mk(l2, 3)]).collect()]
    assert a == b


def test_rrf_empty_raises(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
