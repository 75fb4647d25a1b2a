"""Full-text search: index shape, conjunctive intersection vs brute force,
exact term stats, BM25 vs a straight-line Python reference, guards."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.search import (
    bm25_reference,
    bm25_topk,
    build_inverted_index,
    build_positional_index,
    phrase_search,
    search_all_terms,
    term_stats,
)

TEXTS = {
    0: "spark window agg window window",
    1: "spark table scan",
    2: "window table spark spark",
    3: "hash join only",
    4: "Spark, WINDOW!  punct-uation splits;",
    5: "",
}


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(TEXTS), "text": list(TEXTS.values())})
    )
    return build_inverted_index(docs).cache()


def test_index_one_row_per_token_doc_with_tf(index):
    rows = {(r["token"], r["doc_id"]): r["tf"] for r in index.collect()}
    assert rows[("window", 0)] == 3 and rows[("spark", 2)] == 2
    assert rows[("spark", 4)] == 1 and rows[("window", 4)] == 1  # case/punct
    assert ("", 5) not in rows and not any(d == 5 for _, d in rows)


def test_conjunctive_search_is_posting_intersection(index):
    got = sorted(r["doc_id"] for r in search_all_terms(index, ["spark", "window"]).collect())
    brute = sorted(
        d for d, s in TEXTS.items()
        if "spark" in s.lower().replace(",", " ").replace("!", " ").split()
        and "window" in s.lower().replace("!", " ").replace(",", " ").split()
    )
    assert got == brute == [0, 2, 4]
    assert [r["doc_id"] for r in search_all_terms(index, ["only"]).collect()] == [3]
    assert search_all_terms(index, ["spark", "nosuchterm"]).count() == 0
    with pytest.raises(ValueError, match="non-empty term"):
        search_all_terms(index, ["  ", ""])


def test_term_stats_exact_integers(index):
    got = {r["token"]: (r["df"], r["tf_total"]) for r in
           term_stats(index, ["spark", "window", "only"]).collect()}
    assert got == {"spark": (4, 5), "window": (3, 5), "only": (1, 1)}


def test_phrase_search_consecutive_in_order(spark):
    import re

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(TEXTS), "text": list(TEXTS.values())})
    )
    pidx = build_positional_index(docs).cache()
    # brute force on the same tokenizer
    toks = {d: [w for w in re.split("[^a-z0-9]+", s.lower()) if w]
            for d, s in TEXTS.items()}

    def brute(*phrase):
        k = len(phrase)
        return sorted(
            d for d, v in toks.items()
            if any(tuple(v[i:i + k]) == phrase for i in range(len(v) - k + 1))
        )

    got = sorted(r["doc_id"] for r in phrase_search(pidx, ["spark", "window"]).collect())
    assert got == brute("spark", "window") == [0, 4]
    # order matters: reversed phrase matches different docs
    got_rev = sorted(r["doc_id"] for r in phrase_search(pidx, ["window", "spark"]).collect())
    assert got_rev == brute("window", "spark")
    assert got_rev != got
    # repeated-token phrase (same term twice must need two POSITIONS)
    got2 = sorted(r["doc_id"] for r in phrase_search(pidx, ["window", "window"]).collect())
    assert got2 == brute("window", "window") == [0]
    # three-word phrase
    got3 = sorted(r["doc_id"] for r in phrase_search(pidx, ["spark", "window", "agg"]).collect())
    assert got3 == brute("spark", "window", "agg") == [0]
    with pytest.raises(ValueError, match=">= 2"):
        phrase_search(pidx, ["spark"])


def test_proximity_search_band(spark):
    import re

    from tstore_spark.operators.search import proximity_search

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(TEXTS), "text": list(TEXTS.values())})
    )
    pidx = build_positional_index(docs).cache()
    toks = {d: [w for w in re.split("[^a-z0-9]+", s.lower()) if w]
            for d, s in TEXTS.items()}

    def brute(a, b, dist):
        return sorted(
            d for d, v in toks.items()
            if any(x == a and y == b or x == b and y == a
                   for i, x in enumerate(v)
                   for j, y in enumerate(v)
                   if i != j and abs(i - j) <= dist)
        )

    for a, b, dist in (("spark", "table", 2), ("spark", "agg", 1),
                       ("spark", "agg", 2), ("table", "scan", 1)):
        got = sorted(r["doc_id"] for r in proximity_search(pidx, a, b, dist).collect())
        assert got == brute(a, b, dist), (a, b, dist, got)
    with pytest.raises(ValueError, match="max_distance"):
        proximity_search(pidx, "spark", "table", 0)


def test_bm25_matches_python_reference(index):
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(index, ["spark", "window"], k=4).collect()]
    ref = bm25_reference(TEXTS, ["spark", "window"], k=4)
    assert [d for d, _ in got] == [d for d, _ in ref]
    for (_, a), (_, b) in zip(got, ref):
        assert abs(a - b) < 1e-9


def test_bucketed_index_prunes_buckets_on_term_lookup(spark, index):
    """Persisted bucketed-by-token, a term equality probe reads ONE bucket
    (SelectedBucketsCount in the scan) and returns the same postings."""
    import io
    from contextlib import redirect_stdout

    from tstore_spark.sources.bucketed import write_bucketed

    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        write_bucketed(index, "ts_search_idx", "token", num_buckets=8, sort_cols=["token"])
        probe = spark.table("ts_search_idx").where(F.col("token") == "window")
        buf = io.StringIO()
        with redirect_stdout(buf):
            probe.explain()
        assert "SelectedBucketsCount: 1 out of 8" in buf.getvalue()
        got = {(r["doc_id"], r["tf"]) for r in probe.collect()}
        exp = {(r["doc_id"], r["tf"]) for r in
               index.where(F.col("token") == "window").collect()}
        assert got == exp and got
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS ts_search_idx")


def test_append_to_index_is_incremental(spark):
    """Index old docs, append a new batch: the table equals a full rebuild
    and the pre-existing bucket files are byte-untouched."""
    import os

    from tstore_spark.operators.search import append_to_index
    from tstore_spark.sources.bucketed import write_bucketed

    old = {d: s for d, s in TEXTS.items() if d < 3}
    new = {d: s for d, s in TEXTS.items() if d >= 3}
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"doc_id": list(m), "text": list(m.values())})
    )
    try:
        write_bucketed(build_inverted_index(mk(old)), "ts_inc_idx", "token",
                       num_buckets=4, sort_cols=["token"])
        loc = (spark.sql("DESCRIBE TABLE EXTENDED ts_inc_idx")
               .where("col_name = 'Location'").head()["data_type"])
        path = loc.replace("file:", "")
        before = {f: os.path.getmtime(os.path.join(path, f))
                  for f in os.listdir(path) if not f.startswith(("_", "."))}
        append_to_index(mk(new), "ts_inc_idx", num_buckets=4, sort_cols=["token"])
        after = {f: os.path.getmtime(os.path.join(path, f))
                 for f in os.listdir(path) if not f.startswith(("_", "."))}
        assert set(before) <= set(after) and len(after) > len(before)
        assert all(after[f] == before[f] for f in before)  # old files untouched

        got = {(r["token"], r["doc_id"], r["tf"])
               for r in spark.table("ts_inc_idx").collect()}
        full = {(r["token"], r["doc_id"], r["tf"])
                for r in build_inverted_index(mk(TEXTS)).collect()}
        assert got == full
    finally:
        spark.sql("DROP TABLE IF EXISTS ts_inc_idx")


def test_bm25_plan_is_broadcast_and_takeordered(index):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        bm25_topk(index, ["spark", "window"], k=3).explain()
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p


def test_bm25_precomputed_doc_lengths_identical(index):
    """Passing a precomputed doc_lengths table (the interactive-load path:
    one persisted aggregation for ALL queries) gives identical results."""
    from tstore_spark.operators.search import doc_lengths

    dl = doc_lengths(index).cache()
    try:
        a = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(index, ["spark", "window"], k=4).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(index, ["spark", "window"], k=4, dl=dl).collect()]
        assert a == b
    finally:
        dl.unpersist()


def _mlt_reference(texts, query_ids, k, max_terms, max_df_ratio, idf_scale=1_000_000):
    """Straight-line Python MoreLikeThis (same tokenizer + integer weights)."""
    import re

    toks = {d: [w for w in re.split("[^a-z0-9]+", s.lower()) if w] for d, s in texts.items()}
    toks = {d: v for d, v in toks.items() if v}
    n = len(toks)
    max_df = int(max_df_ratio * n)
    dfs: dict[str, int] = {}
    for v in toks.values():
        for w in set(v):
            dfs[w] = dfs.get(w, 0) + 1
    out = []
    for q in query_ids:
        terms = {w: toks[q].count(w) for w in set(toks[q]) if dfs[w] <= max_df}
        weighted = sorted(
            ((tf * max(idf_scale // dfs[w], 1), w) for w, tf in terms.items()),
            key=lambda x: (-x[0], x[1]),
        )[:max_terms]
        scores: dict[int, int] = {}
        for wgt, w in weighted:
            for d, v in toks.items():
                if d == q:
                    continue
                tf_c = v.count(w)
                if tf_c:
                    scores[d] = scores.get(d, 0) + wgt * tf_c
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out += [(q, d, s, i + 1) for i, (d, s) in enumerate(ranked)]
    return sorted(out)


def test_more_like_this_matches_python_reference(index):
    from tstore_spark.operators.search import more_like_this

    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in more_like_this(index, [0, 3], k=3, max_terms=5, max_df_ratio=0.9).collect()
    )
    assert got == _mlt_reference(TEXTS, [0, 3], k=3, max_terms=5, max_df_ratio=0.9)
    # doc 0 is "spark window..." => docs 2/1/4 related; doc 3 shares terms
    # with nobody under the df guard except via 'join'/'hash'/'only' (df=1)
    assert all(d != q for q, d, _s, _r in got)


def test_more_like_this_stopword_guard_is_scale_valve(spark):
    """A term in >max_df_ratio of docs must never generate candidates: the
    doc sharing ONLY the stopword drops out entirely."""
    from tstore_spark.operators.search import build_inverted_index, more_like_this

    texts = {
        1: "common rare1 rare2",
        2: "common rare1 rare2",
        3: "common unrelated words",
        4: "common other stuff",
    }
    idx = build_inverted_index(
        spark.createDataFrame(pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}))
    )
    got = more_like_this(idx, [1], k=10, max_df_ratio=0.5).collect()
    assert [(r["doc_id"], r["rank"]) for r in got] == [(2, 1)]


def test_more_like_this_idf_never_floors_to_zero(spark):
    """df > idf_scale used to zero a term's weight entirely (idf_scale div
    df = 0), erasing its contribution; the weight floors at 1 now. With
    idf_scale=1 every quotient floors, so every shared term must still
    score (weight tf_q * 1, never 0)."""
    from tstore_spark.operators.search import build_inverted_index, more_like_this

    texts = {1: "alpha beta", 2: "alpha beta", 3: "gamma delta"}
    idx = build_inverted_index(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        )
    )
    got = more_like_this(idx, [1], k=10, max_df_ratio=1.0, idf_scale=1).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [(2, 2)]


def test_more_like_this_max_terms_bounds_probe(index):
    from tstore_spark.operators.search import more_like_this

    # with max_terms=1 doc 0's probe is its single most characteristic term
    got = more_like_this(index, [0], k=10, max_terms=1, max_df_ratio=0.9).collect()
    ref = _mlt_reference(TEXTS, [0], k=10, max_terms=1, max_df_ratio=0.9)
    assert sorted((r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in got) == ref


def test_more_like_this_guards(index):
    from tstore_spark.operators.search import more_like_this

    with pytest.raises(ValueError, match="query_ids"):
        more_like_this(index, [])


def test_doc_keywords_and_oracle(spark):
    import duckdb as _dd

    from tstore_spark.operators.search import (
        build_inverted_index,
        doc_keywords,
        doc_keywords_oracle_sql,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "quantum cats purr quantum quantum a b",  # rare term repeated
                    "the cats sleep the the sofa",
                    "quantum sofa sofa",
                ],
            }
        )
    )
    idx = build_inverted_index(docs)
    got = doc_keywords(idx, k=2).orderBy("doc_id", "rank").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["token"])
    # doc 1: 'quantum' tf=3 df=2 beats 'purr' tf=1 df=1; short 'a'/'b' dropped
    assert by_doc[1][0] == "quantum" and len(by_doc[1]) == 2
    assert all(len(t) >= 3 for toks in by_doc.values() for t in toks)
    # rank column is a total order: ranks are 1..k per doc
    assert [r["rank"] for r in got if r["doc_id"] == 1] == [1, 2]

    pidx = idx.toPandas()
    _dd.sql("CREATE OR REPLACE TABLE post AS SELECT * FROM pidx")
    exp = sorted(
        map(tuple, _dd.sql(
            doc_keywords_oracle_sql("SELECT doc_id, token, tf FROM post", k=2)
        ).fetchall())
    )
    assert sorted(map(tuple, got)) == exp


def test_doc_keywords_guard(spark):
    import pytest as _pt

    from tstore_spark.operators.search import doc_keywords

    idx = spark.createDataFrame(
        pd.DataFrame({"token": ["abc"], "doc_id": [1], "tf": [1]})
    )
    with _pt.raises(ValueError, match="k must be"):
        doc_keywords(idx, k=0)
