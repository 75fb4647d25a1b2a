"""Text-analysis columns vs straight-line Python oracles."""

import hashlib
import math

import pandas as pd
import pytest

from tstore_spark.functions import text as TX
from pyspark.sql import functions as F

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "spark rollup window tier archive"),
    (2, "  padded   whitespace   and the tokens  "),
    (3, "a"),
    (4, "für naïve café déjà vu — unicode tokens the of and"),
]


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def _py_tokens(t):
    return t.strip().lower().split()


def test_token_counts(docs_sdf):
    got = {
        r["doc_id"]: (r["n"], r["bpe"])
        for r in docs_sdf.select(
            "doc_id",
            TX.ws_token_count("text").alias("n"),
            TX.approx_bpe_token_count("text").alias("bpe"),
        ).collect()
    }
    for i, t in DOCS:
        assert got[i][0] == len(_py_tokens(t)), t
        assert got[i][1] == math.ceil(len(t) / 4)


def test_stopword_and_langid(docs_sdf):
    got = {
        r["doc_id"]: (r["hits"], r["lang"])
        for r in docs_sdf.select(
            "doc_id",
            TX.stopword_hits("text").alias("hits"),
            TX.lang_id("text").alias("lang"),
        ).collect()
    }
    sw = set(TX.EN_STOPWORDS)
    for i, t in DOCS:
        toks = _py_tokens(t)
        hits = sum(1 for x in toks if x in sw)
        assert got[i][0] == hits, t
        expect = "en" if toks and hits / len(toks) >= 0.05 else "und"
        assert got[i][1] == expect, t


def test_fingerprint_is_md5_of_normalized(docs_sdf):
    got = {r["doc_id"]: r["fp"] for r in docs_sdf.select("doc_id", TX.fingerprint("text").alias("fp")).collect()}
    for i, t in DOCS:
        assert got[i] == hashlib.md5(t.strip().lower().encode("utf-8")).hexdigest()


def test_quality_bounds(docs_sdf):
    vals = [r["q"] for r in docs_sdf.select(TX.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
