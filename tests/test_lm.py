"""Bigram LM quality scoring vs a straight-line Python reference."""

import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.lm import (
    DEFAULT_ALPHA,
    bigram_counts,
    lm_score,
    unigram_counts,
)

TRUSTED = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "a quick fox and a lazy dog are friends",
    "the dog and the fox play in the sun",
] * 3
PROBES = {
    1: "the quick fox jumps over the dog",      # in-domain
    2: "zxq vvw qqq zxq vvw qqq zxq vvw",        # garbage
    3: "the the the the the the",                # degenerate repetition
    4: "fox",                                    # single token -> NULL
    5: "",                                       # empty -> NULL
}


def _toks(s):
    return [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]


def _py_scores(trusted, probes, alpha):
    uni, bi = {}, {}
    for s in trusted:
        t = _toks(s)
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for d, s in probes.items():
        t = _toks(s)
        pairs = list(zip(t, t[1:]))
        if not pairs:
            out[d] = (0, None, None)
            continue
        lp = 0.0
        for a, b in pairs:  # same fixed order as the Spark fold
            lp = lp + math.log(
                (bi.get((a, b), 0) + alpha) / (uni.get(a, 0) + alpha * v)
            )
        out[d] = (len(pairs), lp, -lp / len(pairs))
    return out, v


@pytest.fixture(scope="module")
def model(spark):
    corpus = spark.createDataFrame(pd.DataFrame({"text": TRUSTED}))
    uni = unigram_counts(corpus).cache()
    bi = bigram_counts(corpus).cache()
    yield uni, bi, uni.count()
    uni.unpersist()
    bi.unpersist()


def test_counts_match_python(spark, model):
    uni, bi, v = model
    py, pv = _py_scores(TRUSTED, {}, DEFAULT_ALPHA)[0], None
    ref_uni, ref_bi = {}, {}
    for s in TRUSTED:
        t = _toks(s)
        for w in t:
            ref_uni[w] = ref_uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            ref_bi[(a, b)] = ref_bi.get((a, b), 0) + 1
    assert {r["token"]: r["c1"] for r in uni.collect()} == ref_uni
    assert {(r["w1"], r["w2"]): r["c2"] for r in bi.collect()} == ref_bi
    assert v == len(ref_uni)


def test_scores_match_python_reference(spark, model):
    uni, bi, v = model
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(PROBES), "text": [PROBES[d] for d in PROBES]}
        )
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_sum"], r["cross_entropy"])
        for r in lm_score(docs, uni, bi, v).collect()
    }
    want, _ = _py_scores(TRUSTED, PROBES, DEFAULT_ALPHA)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None and got[d][2] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], rel=1e-12), d
            assert got[d][2] == pytest.approx(want[d][2], rel=1e-12), d
    # the quality ordering CCNet relies on: in-domain scores best; full-OOV
    # garbage gets the smoothed floor 1/V; a FREQUENT history with an
    # unseen continuation ("the the") scores even worse — the strongest
    # evidence of degenerate text is contradicting a well-attested history
    assert got[1][2] < got[2][2] < got[3][2]


def test_deterministic_across_parallelism(spark, model):
    uni, bi, v = model
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(200),
                "text": [
                    " ".join(
                        ["the quick fox", "lazy dog runs", "zxq vvw"][i % 3]
                        for _ in range(1 + i % 7)
                    )
                    for i in range(200)
                ],
            }
        )
    )
    a = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_score(docs.repartition(1), uni, bi, v).collect()
    }
    b = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_score(docs.repartition(16), uni, bi, v).collect()
    }
    assert a == b  # bit-identical doubles, not approx


def test_vocab_guard(spark, model):
    uni, bi, _ = model
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        lm_score(docs, uni, bi, 0)
