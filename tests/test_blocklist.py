"""Blocklist operators vs straight-line reference semantics."""

import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.blocklist import (
    blocklist_filter,
    blocklist_matches,
    domain_blocklist_filter,
    domain_suffixes,
)

DOCS = [
    (1, "Free FREE free money"),
    (2, "perfectly clean prose"),
    (3, "aaaa"),  # overlapping 'aa' occurs 3x, non-overlapping count = 2
    (4, None),
]


def test_matches_exact_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pattern"]): r["n_hits"]
        for r in blocklist_matches(df, ["free", "aa", "money"]).collect()
    }
    assert got == {(1, "free"): 3, (1, "money"): 1, (3, "aa"): 2}


def test_case_sensitive_mode(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pattern"]): r["n_hits"]
        for r in blocklist_matches(df, ["free"], case_insensitive=False).collect()
    }
    assert got == {(1, "free"): 1}


def test_filter_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert sorted(
        r["doc_id"] for r in blocklist_filter(df, ["free"]).collect()
    ) == [2, 3, 4]
    # max_hits=3 tolerates the three 'free' occurrences
    assert sorted(
        r["doc_id"] for r in blocklist_filter(df, ["free"], max_hits=3).collect()
    ) == [1, 2, 3, 4]


def test_empty_pattern_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(Exception, match="empty pattern"):
        blocklist_matches(df, ["ok", ""]).collect()


def test_domain_suffixes_expr(spark):
    got = spark.range(1).select(
        domain_suffixes(F.lit("a.b.example.com")).alias("s")
    ).collect()[0]["s"]
    assert got == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_domain_blocklist_subdomains(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://spam.example.com/x"),
            (2, "https://example.com/y"),
            (3, "https://examplexcom.org/z"),   # no suffix match, survives
            (4, "https://good.org/ok"),
            (5, "not a url"),                   # NULL host survives
        ],
        "doc_id long, url string",
    )
    kept = sorted(
        r["doc_id"]
        for r in domain_blocklist_filter(urls, ["example.com"]).collect()
    )
    assert kept == [3, 4, 5]


def test_deterministic_across_parallelism(spark):
    df = spark.createDataFrame(DOCS * 5, "doc_id long, text string")
    a = sorted(map(tuple, blocklist_matches(df.repartition(1), ["free", "aa"]).collect()))
    b = sorted(map(tuple, blocklist_matches(df.repartition(7), ["free", "aa"]).collect()))
    assert a == b
