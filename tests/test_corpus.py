"""Composed corpus admission filter: dedup + lang + quality + length."""

import pandas as pd
import pytest

from tstore_spark.operators.corpus import corpus_filter

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs off to "
    "the river for a drink of water with all of its friends in the morning"
)


@pytest.fixture(scope="module")
def corpus_sdf(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),                     # exact dup of 0 -> dropped
        (2, "short"),                  # under min_tokens
        (3, "x " * 300),               # no stopwords -> 'und' + low quality
        (4, GOOD + " another good sentence with the same natural style"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_corpus_filter_composition(corpus_sdf):
    kept = corpus_filter(corpus_sdf, min_quality=0.05, min_tokens=5)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 4]
    cols = kept.columns
    assert cols == ["doc_id", "ws_tokens", "quality"]


def test_corpus_filter_no_dedup_keeps_copies(corpus_sdf):
    kept = corpus_filter(corpus_sdf, min_quality=0.05, min_tokens=5, dedup=False)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 1, 4]


def test_corpus_filter_lang_gate_off(corpus_sdf):
    kept = corpus_filter(corpus_sdf, lang=None, min_quality=0.0, min_tokens=1)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 3 in ids  # no language gate -> 'und' doc admitted


def test_corpus_job_smoke(tmp_path):
    """End-to-end spark-submit entrypoint: gates -> near-dup prune -> split
    -> partitioned write (subprocess: the job owns its session)."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "corpus_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "corpus_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet", "--output", out],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["docs_in"] == 500
    assert 0 < summary["docs_out"] <= 500
    assert set(summary["by_split"]) <= {"train", "eval"}
    assert os.path.isdir(os.path.join(out, "split=train"))
