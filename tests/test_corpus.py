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


def test_ngram_contamination(spark):
    """Corpus docs sharing >= min_hits distinct n-grams with the eval set are
    flagged with exact hit counts; clean docs are not."""
    from tstore_spark.operators.corpus import ngram_contamination

    evald = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["the capital of france is paris and the capital of spain is madrid"],
    }))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # contains the eval 5-gram "the capital of france is" (+ shifted ones)
            "as everyone knows the capital of france is paris which is large",
            "a completely unrelated document about spark shuffles and parquet",
            # exact copy of the eval doc: max contamination
            "the capital of france is paris and the capital of spain is madrid",
        ],
    }))
    got = {r["doc_id"]: r["n_hits"] for r in
           ngram_contamination(corpus, evald, n=5, min_hits=1).collect()}
    assert 2 not in got
    assert got[3] == 9  # 13 tokens -> 9 distinct 5-grams, all shared
    assert 1 <= got[1] < 9
    # min_hits raises the bar
    strict = {r["doc_id"] for r in
              ngram_contamination(corpus, evald, n=5, min_hits=9).collect()}
    assert strict == {3}


def test_remove_boilerplate_lines(spark):
    from tstore_spark.operators.corpus import remove_boilerplate_lines

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "COOKIE BANNER\nunique first article\nFOOTER",
            "COOKIE BANNER\nanother unique body\nFOOTER",
            "totally unique document\nwith two lines",
            "COOKIE BANNER\nFOOTER",   # pure boilerplate
        ],
    }))
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in remove_boilerplate_lines(docs, min_docs=2).collect()}
    assert got[1] == ("unique first article", 3, 2)
    assert got[2] == ("another unique body", 3, 2)
    assert got[3] == ("totally unique document\nwith two lines", 2, 0)
    assert got[4] == ("", 2, 2)  # fully-boilerplate doc survives with empty text
    # order preservation with an interleaved boilerplate line
    docs2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a\nAD\nb\nAD\nc", "x\nAD\ny"],
    }))
    got2 = {r["doc_id"]: r["clean_text"]
            for r in remove_boilerplate_lines(docs2, min_docs=2).collect()}
    assert got2[1] == "a\nb\nc" and got2[2] == "x\ny"


def test_word_ngrams_and_top_ngrams(spark):
    import pandas as pd
    from tstore_spark.functions.text import word_ngrams
    from tstore_spark.operators.corpus import top_ngrams
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d",          # grams: "a b c", "b c d"
            "a b c",            # "a b c"
            "x y",              # too short -> none
            "",                 # empty -> none
        ],
    })
    df = spark.createDataFrame(pdf)
    grams = df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    got = {r["doc_id"]: r["g"] for r in grams}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == ["a b c"]
    assert got[3] == [] and got[4] == []

    top = top_ngrams(df, n=3, k=2).collect()
    assert [(r["gram"], r["cnt"]) for r in top] == [("a b c", 2), ("b c d", 1)]


def test_top_ngrams_tiebreak_deterministic(spark):
    import pandas as pd
    from tstore_spark.operators.corpus import top_ngrams

    # four distinct trigrams, all count 1 -> limit must cut by gram order
    df = spark.createDataFrame(pd.DataFrame({"text": ["p q r", "k l m", "d e f", "w x y"]}))
    a = [r["gram"] for r in top_ngrams(df.repartition(2), n=3, k=2).collect()]
    b = [r["gram"] for r in top_ngrams(df.repartition(7), n=3, k=2).collect()]
    assert a == b == ["d e f", "k l m"]


def test_boilerplate_preserves_blank_lines(spark):
    """Blank lines reach min_docs in any multi-paragraph corpus but are NOT
    boilerplate — the frequency rule must not strip every paragraph break."""
    import pandas as pd

    from tstore_spark.operators.corpus import remove_boilerplate_lines

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["para one\n\npara two\nSHARED FOOTER",
                     "alpha\n\nbeta\nSHARED FOOTER"],
        }
    )
    out = remove_boilerplate_lines(spark.createDataFrame(docs), min_docs=2).toPandas()
    got = dict(zip(out.doc_id, out.clean_text))
    assert got[1] == "para one\n\npara two"
    assert got[2] == "alpha\n\nbeta"
    assert dict(zip(out.doc_id, out.n_removed)) == {1: 1, 2: 1}


def test_crawl_diff_statuses(spark):
    import pandas as pd

    from tstore_spark.operators.corpus import crawl_diff

    old = pd.DataFrame(
        {
            "url": [
                "http://A.com/x?utm_source=t",   # same (canonicalizes to a.com/x)
                "http://b.com/y",                 # changed
                "http://c.com/z",                 # gone
                "http://b.com/y",                 # re-crawl dup, same text
            ],
            "text": ["alpha", "beta v1", "gamma", "beta v1"],
        }
    )
    new = pd.DataFrame(
        {
            "url": ["http://a.com/x", "http://b.com/y", "http://d.com/w"],
            "text": ["  ALPHA  ", "beta v2", "delta"],  # alpha same post-normalize
        }
    )
    got = {
        r["url"]: r["status"]
        for r in crawl_diff(
            spark.createDataFrame(old), spark.createDataFrame(new)
        ).collect()
    }
    assert got == {
        "http://a.com/x": "same",
        "http://b.com/y": "changed",
        "http://c.com/z": "gone",
        "http://d.com/w": "new",
    }


def test_crawl_diff_null_text_presence(spark):
    """Presence is URL membership, not fingerprint nullity: a page whose
    text is NULL still existed in that crawl. NULL->text is 'changed',
    NULL->NULL is 'same' (null-safe fingerprint compare)."""
    import pandas as pd

    from tstore_spark.operators.corpus import crawl_diff

    old = pd.DataFrame(
        {"url": ["http://a.com/1", "http://a.com/2"], "text": [None, None]}
    )
    new = pd.DataFrame(
        {"url": ["http://a.com/1", "http://a.com/2"], "text": ["hello", None]}
    )
    got = {
        r["url"]: r["status"]
        for r in crawl_diff(
            spark.createDataFrame(old), spark.createDataFrame(new)
        ).collect()
    }
    assert got == {"http://a.com/1": "changed", "http://a.com/2": "same"}


def test_crawl_diff_deterministic_across_parallelism(spark):
    import pandas as pd

    from tstore_spark.operators.corpus import crawl_diff

    pdf = pd.DataFrame(
        {
            "url": [f"http://h{i % 7}.com/p{i % 31}" for i in range(300)],
            "text": [f"t{i % 13}" for i in range(300)],
        }
    )
    a_old, a_new = pdf.iloc[:200], pdf.iloc[100:]
    x = sorted(
        map(tuple, crawl_diff(
            spark.createDataFrame(a_old).repartition(1),
            spark.createDataFrame(a_new).repartition(1),
        ).collect())
    )
    y = sorted(
        map(tuple, crawl_diff(
            spark.createDataFrame(a_old).repartition(16),
            spark.createDataFrame(a_new).repartition(16),
        ).collect())
    )
    assert x == y and len(x) > 0


# ---------------------------------------------------------------------------
# url_template_profile (crawler-trap mining)
# ---------------------------------------------------------------------------


def _trap_urls() -> list[str]:
    urls = []
    # calendar trap: one handler, many distinct urls
    for y in (2023, 2024):
        for m in range(1, 13):
            for d in (1, 9, 17, 25):
                urls.append(f"https://t.com/cal/{y}/{m:02d}/{d:02d}")
    # session-id trap (long hex)
    for i in range(30):
        urls.append(f"https://t.com/s/{'%016x' % (i * 2654435761)}/home")
    # uuid profile pages
    urls.append("https://t.com/u/550e8400-e29b-41d4-a716-446655440000")
    urls.append("https://t.com/u/6ba7b810-9dad-11d1-80b4-00c04fd430c8")
    # stable pages (no placeholders), with a re-crawl duplicate
    urls += ["https://t.com/about", "https://t.com/about", "https://t.com/contact"]
    return urls


def test_url_template_profile_known_answers(spark):
    from tstore_spark.operators.corpus import url_template_profile

    sdf = spark.createDataFrame([(u,) for u in _trap_urls()], "url string")
    rows = {r["template"]: r for r in url_template_profile(sdf, trap_min_urls=20).collect()}

    cal = rows["https://t.com/cal/{n}/{n}/{n}"]
    assert cal["n_urls"] == 96 and cal["n_pages"] == 96
    assert cal["n_slots"] == 3 and cal["is_trap"]
    assert cal["example_url"] == "https://t.com/cal/2023/01/01"

    sess = rows["https://t.com/s/{hex}/home"]
    assert sess["n_urls"] == 30 and sess["is_trap"] and sess["n_slots"] == 1

    prof = rows["https://t.com/u/{uuid}"]
    assert prof["n_urls"] == 2 and not prof["is_trap"] and prof["n_slots"] == 1

    about = rows["https://t.com/about"]
    assert about["n_pages"] == 2 and about["n_urls"] == 1 and about["n_slots"] == 0
    assert not about["is_trap"]


def test_url_template_profile_brute_force(spark):
    from tstore_spark.functions.urls import url_template_sql
    from tstore_spark.operators.corpus import url_template_profile

    import duckdb

    urls = _trap_urls()
    sdf = spark.createDataFrame([(u,) for u in urls], "url string")
    got = sorted(
        (r["template"], r["n_pages"], r["n_urls"], r["example_url"])
        for r in url_template_profile(sdf).collect()
    )
    con = duckdb.connect()
    con.register("u", __import__("pandas").DataFrame({"url": urls}))
    want = sorted(
        con.sql(
            f"SELECT {url_template_sql('url')} AS t, count(*), count(DISTINCT url), min(url) "
            "FROM u GROUP BY 1"
        ).fetchall()
    )
    assert [tuple(g) for g in got] == [tuple(w) for w in want]


def test_url_template_profile_deterministic_across_parallelism(spark):
    from tstore_spark.operators.corpus import url_template_profile

    sdf = spark.createDataFrame([(u,) for u in _trap_urls()], "url string")
    a = sorted(map(tuple, url_template_profile(sdf).collect()))
    b = sorted(map(tuple, url_template_profile(sdf.repartition(11)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# chunk_documents (token-window chunking)
# ---------------------------------------------------------------------------


def _ref_chunks(text, chunk, overlap):
    toks = text.split()
    if not toks:
        return []
    step = chunk - overlap
    n = len(toks)
    ub = max(n - chunk, 0)
    ub = -(-ub // step) * step  # ceil to a multiple of step
    out = []
    for cid, s in enumerate(range(0, ub + 1, step)):
        w = toks[s : s + chunk]
        out.append((cid, len(w), " ".join(w)))
    return out


def test_chunk_documents_matches_reference(spark):
    import pandas as pd

    from tstore_spark.operators.corpus import chunk_documents

    texts = {
        1: " ".join(f"t{i}" for i in range(25)),   # 25 toks
        2: " ".join(f"t{i}" for i in range(8)),    # exactly one window
        3: "single",
        4: " ".join(f"t{i}" for i in range(9)),    # window + 1
        5: "  padded   whitespace\ttokens\nhere  ",
        6: "",                                     # zero rows
        7: None,                                   # zero rows
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    for chunk, overlap in [(8, 0), (8, 4), (5, 2), (1, 0)]:
        got = sorted(
            tuple(r)
            for r in chunk_documents(
                spark.createDataFrame(pdf), chunk_tokens=chunk,
                overlap_tokens=overlap,
            ).collect()
        )
        want = sorted(
            (d, cid, n, t)
            for d, txt in texts.items()
            if txt
            for cid, n, t in _ref_chunks(txt, chunk, overlap)
        )
        assert got == want, (chunk, overlap)


def test_chunk_documents_coverage_and_no_contained_chunks(spark):
    import pandas as pd

    from tstore_spark.operators.corpus import chunk_documents

    pdf = pd.DataFrame({"doc_id": [1], "text": [" ".join(f"t{i}" for i in range(10))]})
    rows = chunk_documents(
        spark.createDataFrame(pdf), chunk_tokens=8, overlap_tokens=4
    ).collect()
    # starts 0 and 4 only: the would-be chunk at 8 is contained in [4:10]
    assert [(r["chunk_id"], r["n_tokens"]) for r in sorted(rows, key=lambda r: r["chunk_id"])] == [(0, 8), (1, 6)]
    # total coverage: union of windows == all tokens
    seen = set()
    for r in rows:
        s = r["chunk_id"] * 4
        seen.update(range(s, s + r["n_tokens"]))
    assert seen == set(range(10))


def test_chunk_documents_guards(spark):
    import pandas as pd
    import pytest as _pt

    from tstore_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
    with _pt.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


# ---------------------------------------------------------------------------
# term_cooccurrence / pmi
# ---------------------------------------------------------------------------


def _cooc_docs(spark):
    import pandas as pd

    texts = [
        "spark rollup tier",
        "spark rollup cascade",
        "spark tier",
        "rollup tier spark",
        "cascade only here",
        "Spark SPARK spark",  # distinct-per-doc + lowercasing
    ]
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_term_cooccurrence_matches_reference(spark):
    from itertools import combinations

    from tstore_spark.operators.corpus import term_cooccurrence

    sdf = _cooc_docs(spark)
    got = {
        (r["token_a"], r["token_b"]): (r["n_pair"], r["df_a"], r["df_b"], r["n_docs"])
        for r in term_cooccurrence(sdf, min_pair_count=1).collect()
    }
    docs = [set(t.lower().split()) for t in sdf.toPandas()["text"]]
    from collections import Counter

    pair_c, df_c = Counter(), Counter()
    for s in docs:
        df_c.update(s)
        pair_c.update(combinations(sorted(s), 2))
    want = {
        p: (c, df_c[p[0]], df_c[p[1]], len(docs)) for p, c in pair_c.items()
    }
    assert got == want
    assert got[("rollup", "spark")][0] == 3
    # min_pair_count filters deterministically
    got2 = {
        (r["token_a"], r["token_b"])
        for r in term_cooccurrence(sdf, min_pair_count=2).collect()
    }
    assert got2 == {p for p, c in pair_c.items() if c >= 2}


def test_term_cooccurrence_guards_and_pmi(spark):
    import math

    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from tstore_spark.operators.corpus import pmi_expr, term_cooccurrence

    sdf = _cooc_docs(spark)
    with _pt.raises(ValueError, match="min_pair_count"):
        term_cooccurrence(sdf, min_pair_count=0)
    with _pt.raises((SparkRuntimeException, Py4JJavaError)):
        term_cooccurrence(sdf, max_doc_tokens=2).collect()
    out = term_cooccurrence(sdf, min_pair_count=1).withColumn("pmi", pmi_expr())
    for r in out.collect():
        want = math.log(r["n_pair"] * r["n_docs"] / (r["df_a"] * r["df_b"]))
        assert r["pmi"] == _pt.approx(want, rel=1e-12)
    # 'spark rollup' co-occur maximally -> PMI above independence (> 0)
    top = {(r["token_a"], r["token_b"]): r["pmi"] for r in out.collect()}
    assert top[("rollup", "spark")] > 0


def test_term_cooccurrence_deterministic(spark):
    from tstore_spark.operators.corpus import term_cooccurrence

    sdf = _cooc_docs(spark)

    def run(parts):
        return sorted(
            tuple(r) for r in term_cooccurrence(sdf.repartition(parts)).collect()
        )

    assert run(1) == run(16)


# ---------------------------------------------------------------------------
# readability scores
# ---------------------------------------------------------------------------


def _ref_readability(text):
    import re

    words = [w for w in text.split()]
    sents = [s for s in re.split(r"[.!?]+", text) if s.strip()]
    syll = sum(max(1, len(re.findall(r"[aeiouy]+", w.lower()))) for w in words)
    if not words or not sents:
        return (len(words), len(sents), syll, None, None)
    wps, spw = len(words) / len(sents), syll / len(words)
    return (
        len(words), len(sents), syll,
        206.835 - 1.015 * wps - 84.6 * spw,
        0.39 * wps + 11.8 * spw - 15.59,
    )


def test_readability_vs_reference(spark):
    from tstore_spark.operators.corpus import readability_scores

    texts = [
        "The cat sat on the mat. It was happy!",
        "Notwithstanding heretofore promulgated regulations, implementation "
        "necessitates comprehensive organizational restructuring.",
        "no terminator here at all",
        "Word",
        "!!!",
        "",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"],
                      r["flesch"], r["fk_grade"])
        for r in readability_scores(spark.createDataFrame(pdf)).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_readability(t), (i, t)
    # simple prose scores far easier than legalese
    assert got[0][3] > got[1][3] + 50
