"""Asymmetric shingle containment (quote / aggregator detection)."""

import pandas as pd
import pytest

from tstore_spark.operators.dedup import containment_pairs

BASE = " ".join(f"w{i}" for i in range(200))  # 200 distinct tokens
QUOTE = " ".join(f"w{i}" for i in range(30))  # exact prefix of BASE
OTHER = " ".join(f"z{i}" for i in range(50))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [BASE, QUOTE, OTHER]}
        )
    )


def test_quote_fully_contained_but_low_jaccard(corpus):
    out = containment_pairs(corpus, threshold=0.9).toPandas()
    rows = {(r.contained_id, r.container_id): r.containment for r in out.itertuples()}
    # the 30-token quote's shingles are a strict subset of BASE's
    assert rows == {(2, 1): 1.0}
    # Jaccard of that pair is ~28/198 — minhash LSH at 0.5+ would never pair it


def test_both_directions_for_near_identical(spark):
    a = BASE
    b = BASE + " w0 w1"  # two extra trailing shingles
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": [a, b]}))
    out = containment_pairs(df, threshold=0.9).toPandas()
    assert set(zip(out.contained_id, out.container_id)) == {(1, 2), (2, 1)}


def test_no_shared_shingles_no_rows(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [BASE, OTHER]})
    )
    assert containment_pairs(df, threshold=0.1).count() == 0


def test_max_gram_df_drops_boilerplate_candidates(spark):
    # 6 docs all sharing one boilerplate sentence; pairs exist only via it
    boiler = "all rights reserved contact us today"
    rows = [(i, boiler + f" unique{i} filler{i} tail{i}") for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    exact = containment_pairs(df, threshold=0.3)
    assert exact.count() > 0
    pruned = containment_pairs(df, threshold=0.3, max_gram_df=3)
    assert pruned.count() == 0  # every shared gram has df=6 > 3


def test_deterministic_across_partitioning(corpus):
    a = sorted(map(tuple, containment_pairs(corpus.repartition(8), threshold=0.5).collect()))
    b = sorted(map(tuple, containment_pairs(corpus.coalesce(1), threshold=0.5).collect()))
    assert a == b


def test_max_gram_df_scores_remain_exact(spark):
    """max_gram_df restricts CANDIDATES to rare-gram sharers but must not
    bias the score: a contained quote that is mostly boilerplate (common
    grams) still scores by its FULL intersection, not just the rare part."""
    boiler = " ".join(f"c{i}" for i in range(40))  # shared by 5 docs -> common
    quote = boiler + " r1 r2 r3"                   # 3 rare trailing tokens
    container = quote + " " + " ".join(f"x{i}" for i in range(100))
    rows = [(1, quote), (2, container)] + [(i, boiler + f" pad{i}") for i in range(3, 7)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    exact = containment_pairs(df, threshold=0.9).toPandas()
    pruned = containment_pairs(df, threshold=0.9, max_gram_df=3).toPandas()
    e = {(r.contained_id, r.container_id): r.containment for r in exact.itertuples()}
    p = {(r.contained_id, r.container_id): r.containment for r in pruned.itertuples()}
    assert e[(1, 2)] == 1.0
    # the (1,2) pair shares rare grams, so it survives pruning AND keeps the
    # exact score (the old filtered-count scoring gave it ~rare/total < 0.1)
    assert p[(1, 2)] == 1.0
