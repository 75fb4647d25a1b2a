"""DSIR importance resampling: features vs brute force, log weights vs a
straight-line Python reference, Gumbel-top-k determinism, hashed buckets."""

import hashlib
import math
import re
from collections import Counter

import pytest

from tstore_spark.operators.dsir import (
    dsir_features,
    dsir_log_weights,
    dsir_resample,
    feature_distribution,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "spark shuffles data across the cluster"),
    (3, "cat cat cat"),
    (4, ""),
    (5, "Wiki-style text: the cat article, revised"),
]
TARGET = [(100, "the cat sat"), (101, "the cat article text")]


def _feats(text):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_weights(docs, target, raw=None, alpha=0.1):
    raw = docs if raw is None else raw
    ct = Counter(f for _, t in target for f in _feats(t))
    cr = Counter(f for _, t in raw for f in _feats(t))
    vocab = set(ct) | set(cr)
    v, tt, tr = len(vocab), sum(ct.values()), sum(cr.values())
    dt, dr = tt + alpha * v, tr + alpha * v
    out = {}
    for did, t in docs:
        fs = Counter(_feats(t))
        # feature-sorted fixed-order fold, mirroring the Spark expression
        w = 0.0
        for f in sorted(fs):
            llr = math.log((ct.get(f, 0) + alpha) / dt) - math.log(
                (cr.get(f, 0) + alpha) / dr
            )
            w = w + fs[f] * llr
        out[did] = (len(fs), sum(fs.values()), w)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    t = spark.createDataFrame(TARGET, "doc_id long, text string")
    return d, t


def test_features_match_brute_force(spark, frames):
    d, _ = frames
    got = {
        (r["doc_id"], r["feat"]): r["f"]
        for r in dsir_features(d).collect()
    }
    want = {
        (did, f): c
        for did, t in DOCS
        for f, c in Counter(_feats(t)).items()
    }
    assert got == want


def test_distribution_totals(spark, frames):
    _, t = frames
    got = {r["feat"]: r["c"] for r in feature_distribution(t).collect()}
    assert got == dict(Counter(f for _, x in TARGET for f in _feats(x)))


def test_log_weights_match_reference(spark, frames):
    d, t = frames
    want = _py_weights(DOCS, TARGET)
    got = {
        r["doc_id"]: (r["n_feats"], r["n_grams"], r["log_weight"])
        for r in dsir_log_weights(d, t).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did][:2] == want[did][:2], did
        assert got[did][2] == pytest.approx(want[did][2], rel=1e-12), did
    # the wiki-like docs should outscore the spark-jargon doc
    assert got[0][2] > got[2][2]
    assert got[5][2] > got[2][2]
    assert got[4] == (0, 0, 0.0)  # empty doc: empty product


def test_resample_matches_reference(spark, frames):
    d, t = frames
    w = dsir_log_weights(d, t)
    picked = [r["doc_id"] for r in dsir_resample(w, 3).collect()]
    assert len(picked) == len(set(picked)) == 3
    # straight-line Gumbel-top-k with the identical md5 variate
    ref = _py_weights(DOCS, TARGET)
    keys = {}
    for did, (_, _, lw) in ref.items():
        h = int(hashlib.md5(f"{did}:42".encode()).hexdigest()[:8], 16)
        u = h / 4294967296.0 + 1.0 / 8589934592.0
        keys[did] = lw - math.log(-math.log(u))
    want = [d_ for d_, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))][:3]
    assert picked == want


def test_hashed_buckets_bounded_and_deterministic(spark, frames):
    d, t = frames
    fd = feature_distribution(d.union(t), num_buckets=16)
    assert fd.count() <= 16
    a = sorted(map(tuple, dsir_log_weights(d, t, num_buckets=16).collect()))
    b = sorted(
        map(tuple, dsir_log_weights(d.repartition(7), t, num_buckets=16).collect())
    )
    assert a == b


def test_external_raw_pool_floor(spark, frames):
    d, t = frames
    raw = spark.createDataFrame([(200, "entirely disjoint tokens here")],
                                "doc_id long, text string")
    out = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(d, t, raw=raw).collect()}
    assert all(isinstance(v, float) for v in out.values())  # no NULL poisoning


def test_guards(spark, frames):
    d, t = frames
    with pytest.raises(ValueError, match="alpha"):
        dsir_log_weights(d, t, alpha=0.0)
    with pytest.raises(ValueError, match="k must be"):
        dsir_resample(d, 0)
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_features(d, num_buckets=1)


def test_deterministic_across_parallelism(spark, frames):
    d, t = frames
    outs = []
    for n in (1, 7):
        w = dsir_log_weights(d.repartition(n), t.repartition(n))
        outs.append(sorted(map(tuple, w.collect())))
    assert outs[0] == outs[1]  # exact double bits: fixed-order fold


def test_resample_plans_takeordered(spark, frames):
    d, t = frames
    w = dsir_log_weights(d, t)
    plan = dsir_resample(w, 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort
