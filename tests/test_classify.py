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


def test_calibration_report_matches_brute_force(spark):
    import math

    from tstore_spark.operators.classify import (
        calibration_report, expected_calibration_error)

    rows = [(i, (i % 100) / 100.0, 1 if (i * 7) % 100 < i % 100 else 0)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, prob double, label int")
    rep = {r["bucket"]: r for r in calibration_report(df, "prob", "label").collect()}

    want = {}
    for _, p, y in rows:
        b = min(int(p * 10), 9)
        n, np_, pm = want.get(b, (0, 0, 0))
        want[b] = (n + 1, np_ + y, pm + round(p * 1_000_000))
    assert set(rep) == set(want)
    for b, (n, np_, pm) in want.items():
        r = rep[b]
        assert (r["n"], r["n_pos"], r["conf_micros"]) == (n, np_, pm), b
        assert r["accuracy"] == np_ / n
        assert r["confidence"] == pm / 1_000_000.0 / n
        assert math.isclose(r["gap"], abs(np_ / n - pm / 1e6 / n), rel_tol=1e-12)
        assert r["lo"] == b * 0.1 and r["hi"] == (b + 1) * 0.1

    ece = expected_calibration_error(calibration_report(df, "prob", "label"))
    num = sum(n * abs(np_ / n - pm / 1e6 / n) for n, np_, pm in want.values())
    assert math.isclose(ece, num / 1000, rel_tol=1e-9)


def test_calibration_top_bucket_and_guards(spark):
    import pytest as _pt

    from tstore_spark.operators.classify import calibration_report

    df = spark.createDataFrame(
        [(0, 1.0, 1), (1, 0.999999, 0)], "id long, prob double, label int")
    rep = {r["bucket"]: r["n"] for r in
           calibration_report(df, "prob", "label").collect()}
    assert rep == {9: 2}  # prob == 1.0 folds into the top bucket

    bad = spark.createDataFrame([(0, 1.5, 1)], "id long, prob double, label int")
    with _pt.raises(Exception, match="prob in"):
        calibration_report(bad, "prob", "label").collect()
    with _pt.raises(ValueError, match="n_buckets"):
        calibration_report(df, "prob", "label", n_buckets=1)


def test_calibration_deterministic_across_parallelism(spark):
    from tstore_spark.operators.classify import calibration_report

    rows = [(i, ((i * 37) % 1000) / 1000.0, i % 2) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, prob double, label int")
    a = sorted(map(tuple, calibration_report(df.repartition(1), "prob", "label").collect()))
    b = sorted(map(tuple, calibration_report(df.repartition(17), "prob", "label").collect()))
    assert a == b
