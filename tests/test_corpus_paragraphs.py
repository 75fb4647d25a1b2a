"""Paragraph-grain exact dedup: first-occurrence survival, reassembly."""

import pytest

from tstore_spark.operators.corpus import dedup_paragraphs


@pytest.fixture(scope="module")
def pdocs(spark):
    return spark.createDataFrame(
        [
            (1, "unique one\n\nBOILER\n\nunique two"),
            (2, "BOILER\n\nother text"),
            (3, "BOILER"),
            (4, "keeps\n\n\n\nblank"),   # empty para: structural, never cut
            (5, "unique one"),            # dup of doc1's first para
        ],
        "doc_id long, text string",
    )


def test_first_occurrence_survives(spark, pdocs):
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(pdocs).collect()}
    assert out[1] == "unique one\n\nBOILER\n\nunique two"  # global first keeps all
    assert out[2] == "other text"
    assert out[3] == ""                  # fully cut doc stays as a row
    assert out[4] == "keeps\n\n\n\nblank"  # empty paragraph preserved verbatim
    assert out[5] == ""                  # its only para first occurred in doc 1
    assert len(out) == 5


def test_deterministic_across_parallelism(spark, pdocs):
    a = sorted(map(tuple, dedup_paragraphs(pdocs.repartition(1)).collect()))
    b = sorted(map(tuple, dedup_paragraphs(pdocs.repartition(7)).collect()))
    assert a == b


def test_no_dedup_identity(spark):
    docs = spark.createDataFrame(
        [(1, "aaa\n\nbbb"), (2, "ccc\n\nddd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs).collect()}
    assert out == {1: "aaa\n\nbbb", 2: "ccc\n\nddd"}


def test_metachar_separator_is_literal(spark):
    docs = spark.createDataFrame(
        [(1, "alpha|beta"), (2, "beta|gamma")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"]
           for r in dedup_paragraphs(docs, sep="|").collect()}
    assert out == {1: "alpha|beta", 2: "gamma"}
