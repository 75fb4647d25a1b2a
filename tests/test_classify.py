"""Linear BoW classifier scoring: exactness, OOV, empty docs, filter."""

import pytest

from tstore_spark.operators.classify import classifier_filter, classifier_score


@pytest.fixture(scope="module")
def lexicon(spark):
    return spark.createDataFrame(
        [("good", 5), ("great", 7), ("spam", -10), ("click", -4)],
        "token string, weight long",
    )


def test_scores_exact(spark, lexicon):
    docs = spark.createDataFrame(
        [
            (1, "good good great unknownword"),  # 5+5+7 = 17
            (2, "spam click click"),             # -10-4-4 = -18
            (3, "neutral words only"),           # 0 in-vocab
            (4, ""),                             # empty text
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in classifier_score(docs, lexicon, bias=2).collect()}
    assert rows[1]["score"] == 19 and rows[1]["n_tokens"] == 4
    assert rows[2]["score"] == -16
    assert rows[3]["score"] == 2
    assert rows[4]["score"] == 2 and rows[4]["n_tokens"] == 0
    assert len(rows) == 4


def test_filter_keeps_original_columns(spark, lexicon):
    docs = spark.createDataFrame(
        [(1, "good great", "en"), (2, "spam spam spam", "en")],
        "doc_id long, text string, lang string",
    )
    kept = classifier_filter(docs, lexicon, min_score=0).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["lang"] == "en"


def test_score_deterministic_across_parallelism(spark, lexicon):
    docs = spark.createDataFrame(
        [(i, "good spam great click good") for i in range(200)],
        "doc_id long, text string",
    )
    a = sorted(classifier_score(docs.repartition(1), lexicon).collect())
    b = sorted(classifier_score(docs.repartition(13), lexicon).collect())
    assert a == b and a[0]["score"] == 5 - 10 + 7 - 4 + 5


def test_float_weights_truncate_not_crash(spark):
    # cast("bigint") on a double weight truncates toward zero — the caller
    # contract is integral weights; this documents the cast behavior.
    docs = spark.createDataFrame([(1, "tok")], "doc_id long, text string")
    w = spark.createDataFrame([("tok", 2.9)], "token string, weight double")
    (row,) = classifier_score(docs, w).collect()
    assert row["score"] == 2
