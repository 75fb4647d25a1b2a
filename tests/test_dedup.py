"""Dedup operators: exact, token-Jaccard, MinHash+LSH, SimHash.

Strategy mirrors the reference suite's fixture style (small deterministic
inputs, exact assertions) with planted duplicates so each tier has a known
answer.
"""

import pandas as pd
import pytest

from tstore_spark.operators import dedup as DD

BASE = (
    "the quick brown fox jumps over the lazy dog while a crawler "
    "archives pages into parquet tiers for rollup and retention"
)


@pytest.fixture(scope="module")
def docs_sdf(spark):
    rows = [
        (0, BASE, "s0"),
        (1, BASE, "s0"),  # exact dup of 0
        (2, BASE + " extra token", "s0"),  # near dup of 0
        (3, "completely different content about embeddings and similarity search", "s1"),
        (4, "THE QUICK brown fox JUMPS over the lazy dog while a crawler "
            "archives pages into parquet tiers for rollup and retention", "s1"),  # case-dup of 0
        (5, "unrelated short text", "s1"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    return spark.createDataFrame(pdf)


def test_exact_dedup(docs_sdf):
    groups = DD.exact_dedup_groups(docs_sdf).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    # 0,1,4 share a normalized fingerprint (lower+trim)
    assert by_keep[0] == 3
    assert by_keep[2] == 1
    kept = DD.exact_dedup(docs_sdf)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2, 3, 5]


def test_token_jaccard_pairs(docs_sdf):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.token_jaccard_pairs(docs_sdf, block_col=None, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0  # case-insensitive tokens
    assert 0.9 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_finds_near_dups(docs_sdf):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_near_dup_pairs(docs_sdf, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 4) in pairs
    assert (0, 2) in pairs  # shingle jaccard of near-dup is high
    assert (0, 3) not in pairs
    assert (3, 5) not in pairs


def _pair_set(rows):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in rows}


def test_incremental_crawls_equal_oneshot(docs_sdf, tmp_path):
    """Ingesting the corpus as two crawls (index crawl 1, incrementally dedup
    crawl 2 against it — with the index ROUND-TRIPPED through parquet) must
    yield exactly the one-shot pair set: crawl-1-internal pairs from the
    first ingest plus incremental pairs from the second."""
    from pyspark.sql import functions as F

    oneshot = _pair_set(DD.minhash_near_dup_pairs(docs_sdf, threshold=0.5).collect())

    crawl1 = docs_sdf.where(F.col("doc_id") % 2 == 0)
    crawl2 = docs_sdf.where(F.col("doc_id") % 2 == 1)
    round1 = _pair_set(DD.minhash_near_dup_pairs(crawl1, threshold=0.5).collect())

    idx_path = str(tmp_path / "minhash_index")
    DD.minhash_index(crawl1).write.parquet(idx_path)
    idx = crawl1.sparkSession.read.parquet(idx_path)

    round2 = _pair_set(
        DD.incremental_minhash_near_dup(crawl2, idx, threshold=0.5).collect()
    )
    assert round1 | round2 == oneshot
    assert round1 & round2 == set()  # no pair reported twice
    # cross-crawl near-dups actually found: 0 (crawl1) x 1 (crawl2) exact dup
    assert (0, 1, 1.0) in round2


def test_incremental_new_new_flag(docs_sdf):
    """include_new_new=False restricts the output to corpus-x-new pairs."""
    from pyspark.sql import functions as F

    crawl1 = docs_sdf.where(F.col("doc_id") <= 1)   # 0 and its exact dup 1
    crawl2 = docs_sdf.where(F.col("doc_id") >= 2)   # contains near-dups 2, 4 of 0
    idx = DD.minhash_index(crawl1)
    cross_only = _pair_set(
        DD.incremental_minhash_near_dup(crawl2, idx, threshold=0.5,
                                        include_new_new=False).collect()
    )
    # every pair touches the corpus side (ids 0/1)
    assert cross_only and all(a <= 1 < b for a, b, _ in cross_only)
    both = _pair_set(
        DD.incremental_minhash_near_dup(crawl2, idx, threshold=0.5).collect()
    )
    new_new = both - cross_only
    assert all(a >= 2 for a, _, _ in new_new)  # e.g. (2,4) if above threshold
    assert cross_only <= both


def test_minhash_deterministic(docs_sdf):
    a = DD.minhash_signatures(docs_sdf).orderBy("doc_id").collect()
    b = DD.minhash_signatures(docs_sdf.repartition(5)).orderBy("doc_id").collect()
    assert [r["sig"] for r in a] == [r["sig"] for r in b]


def test_simhash_near_dup(docs_sdf):
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs_sdf).collect()}
    # identical token multisets -> identical signature
    assert sigs[0] == sigs[1] == sigs[4]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_near_dup_pairs(docs_sdf, max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs.get((0, 2), 99) <= 10  # near dup within hamming budget
    assert (0, 3) not in pairs


def test_minhash_seeds_are_independent(docs_sdf):
    """Regression: transform()'s lambda-arity sniffing once bound the seed
    parameter to the element INDEX (a two-arg lambda default), collapsing
    all k hash functions into one position-sensitive hash — near-dups with
    shifted tokens then shared ZERO signature slots."""
    sigs = {r["doc_id"]: list(r["sig"]) for r in DD.minhash_signatures(docs_sdf).collect()}
    # k independent hash functions -> a multi-shingle doc's slots are not all equal
    assert len(set(sigs[0])) > 16
    # near-dup (one extra trailing token) must agree on most slots
    agree = sum(x == y for x, y in zip(sigs[0], sigs[2]))
    assert agree >= 24, f"near-dup shares only {agree}/32 minhash slots"


def test_simhash_verified_pairs(docs_sdf):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.simhash_near_dup_pairs(docs_sdf, max_hamming=8, verify_jaccard=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert (0, 3) not in pairs  # unrelated never verified


def test_simhash_empty_and_hash_batching(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["", "   ", "alpha beta gamma", None]}
    )
    sigs = {r["doc_id"]: r["simhash"] for r in DD.simhash(spark.createDataFrame(pdf)).collect()}
    assert sigs[0] == 0 and sigs[1] == 0
    assert sigs[2] != 0
    assert sigs[3] == 0  # NULL text hashes like empty, never crashes the kernel


def test_token_jaccard_block_guard(docs_sdf):
    with pytest.raises(ValueError, match="minhash_near_dup_pairs"):
        DD.token_jaccard_pairs(docs_sdf, block_col="source", max_block_candidates=2)
    with pytest.raises(ValueError, match="unblocked"):
        DD.token_jaccard_pairs(docs_sdf, block_col=None, max_block_candidates=3)
    # generous budget: results unchanged
    pairs = DD.token_jaccard_pairs(docs_sdf, block_col=None, threshold=0.5).collect()
    assert len(pairs) > 0


def test_simhash_homogeneous_corpus_guard(spark):
    """Same-vocabulary docs collapse simhash band entropy — the guard must
    fire before the band join goes quadratic."""
    import random

    rng = random.Random(5)
    words = [f"w{i}" for i in range(20)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(300),
            "text": [" ".join(rng.choices(words, k=50)) for _ in range(300)],
        }
    )
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="minhash_near_dup_pairs"):
        DD.simhash_near_dup_pairs(sdf, max_hamming=8, max_candidates=1000)
    # disabled guard still works
    out = DD.simhash_near_dup_pairs(sdf, max_hamming=0, max_candidates=None)
    assert out.count() >= 0


# ---------------------------------------------------------------------------
# connected components / survivor selection
# ---------------------------------------------------------------------------


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["id_a", "id_b"]))


def test_dedup_clusters_chain_and_star(spark):
    # chain 1-2-3-4-5 (diameter 4, forces multiple propagation rounds),
    # star 10-{11,12,13}, isolated pair (20,21)
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)]
    got = {r["node"]: r["cluster_id"] for r in DD.dedup_clusters(_pairs_df(spark, pairs)).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_dedup_clusters_bridged_components(spark):
    # two stars bridged by one pair -> single component labeled by global min
    pairs = [(7, 8), (7, 9), (3, 4), (3, 5), (9, 5)]
    got = {r["node"]: r["cluster_id"] for r in DD.dedup_clusters(_pairs_df(spark, pairs)).collect()}
    assert set(got.values()) == {3}
    assert set(got) == {3, 4, 5, 7, 8, 9}


def test_dedup_clusters_convergence_guard(spark):
    pairs = [(i, i + 1) for i in range(6)]  # path of diameter 6
    with pytest.raises(ValueError, match="did not converge"):
        DD.dedup_clusters(_pairs_df(spark, pairs), max_iterations=2)


def test_near_dup_dedup_transitive_survivors(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 9], "text": ["a", "b", "c", "solo"]})
    )
    # a~b, b~c: one family -> only doc 1 survives; 9 untouched
    kept = DD.near_dup_dedup(docs, _pairs_df(spark, [(1, 2), (2, 3)]))
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 9]


def test_dedup_clusters_deterministic_across_parallelism(spark):
    pairs = [(i, i + 100) for i in range(50)] + [(i, i + 200) for i in range(0, 50, 2)]
    a = DD.dedup_clusters(_pairs_df(spark, pairs), num_partitions=2).collect()
    b = DD.dedup_clusters(_pairs_df(spark, pairs), num_partitions=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# duplicate_spans: exact cross-doc duplicate passages (Lee et al. 2022 shape)
# ---------------------------------------------------------------------------


def _brute_spans(docs, n):
    """Straight-line reference: maximal equal-token runs >= n per pair."""
    toks = {i: t.split() for i, t in docs}
    out = []
    ids = sorted(toks)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            A, B = toks[a], toks[b]
            for i in range(len(A)):
                for j in range(len(B)):
                    if A[i] != B[j] or (i > 0 and j > 0 and A[i - 1] == B[j - 1]):
                        continue  # not a run start
                    k = 0
                    while i + k < len(A) and j + k < len(B) and A[i + k] == B[j + k]:
                        k += 1
                    if k >= n:
                        out.append((a, b, i, j, k))
    return sorted(out)


_SPAN_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail one"),
    # shares the 10-token prefix run with doc 1 (run length 10 exactly)
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa other end"),
    # shares an 11-token INTERNAL quote with doc 1 (offset alignment)
    (3, "lead in alpha beta gamma delta epsilon zeta eta theta iota kappa tail"),
    # 9-token overlap only -> below n, no row
    (4, "alpha beta gamma delta epsilon zeta eta theta iota MISMATCH x y"),
    # case-sensitive: no match despite lowercase equality
    (5, "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA IOTA KAPPA tail one"),
    # two disjoint runs on the same diagonal vs doc 6b
    (6, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 BREAK q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
    (7, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 SPLIT q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
]


def _spans_df(spark, docs=_SPAN_DOCS):
    return spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))


def test_duplicate_spans_vs_brute(spark):
    got = sorted(
        tuple(r)
        for r in DD.duplicate_spans(_spans_df(spark), n=10).collect()
    )
    assert got == _brute_spans(_SPAN_DOCS, 10)
    # the planted shapes actually exercised what they claim
    assert (1, 2, 0, 0, 10) in got           # exact-n prefix run
    assert (1, 3, 0, 2, 11) in got           # internal quote, offset diagonal
    assert not any(r[0] == 4 or r[1] == 4 for r in got)   # 9-token overlap absent
    assert not any(r[0] == 5 or r[1] == 5 for r in got)   # case-sensitive
    assert [r for r in got if r[:2] == (6, 7)] == [
        (6, 7, 0, 0, 10), (6, 7, 11, 11, 10)]             # two islands, one diagonal


def test_duplicate_spans_min_span_filter(spark):
    got = DD.duplicate_spans(_spans_df(spark), n=10, min_span_tokens=11).collect()
    assert sorted(tuple(r) for r in got) == [(1, 3, 0, 2, 11)]
    with pytest.raises(ValueError, match="min_span_tokens"):
        DD.duplicate_spans(_spans_df(spark), n=10, min_span_tokens=9)
    with pytest.raises(ValueError, match="n must be"):
        DD.duplicate_spans(_spans_df(spark), n=1)


def test_duplicate_spans_gram_df_guard(spark):
    import pyspark.errors

    boiler = " ".join(f"w{i}" for i in range(12))
    docs = [(i, boiler) for i in range(5)]
    # round 5: the guard is an eager action — it raises at CALL time (and
    # materializes the posting cache so the join plans on measured sizes)
    with pytest.raises(ValueError, match="max_gram_df"):
        DD.duplicate_spans(_spans_df(spark, docs), n=10, max_gram_df=3)
    # cap not exceeded -> all 10 pairs, full-doc span
    ok = DD.duplicate_spans(_spans_df(spark, docs), n=10, max_gram_df=5).collect()
    assert len(ok) == 10 and all(r["span_tokens"] == 12 for r in ok)


def test_duplicate_spans_deterministic_across_parallelism(spark):
    df = _spans_df(spark)
    a = DD.duplicate_spans(df.repartition(1), n=10).collect()
    b = DD.duplicate_spans(df.repartition(16), n=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duplicate_spans_null_and_short_texts(spark):
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c", None, "   "]}
    )
    assert DD.duplicate_spans(spark.createDataFrame(docs), n=2).count() == 0


def test_remove_duplicate_spans_semantics(spark):
    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            quote + " tail one two",            # keeps its copy (smallest id)
            "lead in " + quote + " end bit",    # loses the quote
            "nothing shared here whatsoever in this document",
            quote,                               # whole doc duplicated -> ""
            None,                                # NULL passes through
        ],
    })
    out = {r["doc_id"]: r["text"]
           for r in DD.remove_duplicate_spans(spark.createDataFrame(docs)).collect()}
    assert out[1] == docs.text[0]               # untouched: byte-identical
    assert out[2] == "lead in end bit"
    assert out[3] == docs.text[2]
    assert out[4] == ""
    assert out[5] is None


def test_remove_duplicate_spans_overlap_merge(spark):
    # doc 30 shares overlapping runs with docs 10 and 20: the two intervals
    # into doc 30 overlap and must merge (no double-deletion, no slivers)
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    docs = pd.DataFrame({
        "doc_id": [10, 20, 30],
        "text": [
            a,                                       # tokens 0..11
            " ".join(a.split()[2:]) + " x1 x2",      # tokens w3..w12 + tail
            "pre " + a + " post",                    # contains both runs
        ],
    })
    out = {r["doc_id"]: r["text"]
           for r in DD.remove_duplicate_spans(
               spark.createDataFrame(docs), n=10).collect()}
    assert out[10] == docs.text[0]
    # doc 30 loses the merged [1, 13) interval: 'pre' and 'post' survive
    assert out[30] == "pre post"


def test_remove_duplicate_spans_precomputed_and_columns(spark):
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d e f g h i j k", "a b c d e f g h i j z"],
        "lang": ["en", "de"],
    })
    sdf = spark.createDataFrame(docs)
    spans = DD.duplicate_spans(sdf, n=10)
    out = DD.remove_duplicate_spans(sdf, spans=spans).collect()
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in out}
    assert got[1] == ("a b c d e f g h i j k", "en")
    assert got[2] == ("z", "de")    # surviving token, lang passes through


def test_fellegi_sunter_scoring(spark):
    from tstore_spark.operators.dedup import fellegi_sunter

    recs = spark.createDataFrame(
        [(1, "en", "src0"), (2, "en", "src0"), (3, "de", "src0"),
         (4, None, "src1"), (5, None, "src1")],
        "doc_id long, lang string, source string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (2, 4)], "id_a long, id_b long")
    fw = {"lang": (1500, -800), "source": (700, -400)}
    out = {(r["id_a"], r["id_b"]): r for r in fellegi_sunter(
        pairs, recs, fw, upper_milli=2000, lower_milli=-500).collect()}
    # (1,2): both agree -> 2200 match; (1,3): lang differs -> -100 possible
    assert out[(1, 2)]["score_milli"] == 2200
    assert out[(1, 2)]["decision"] == "match"
    assert out[(1, 3)]["score_milli"] == -800 + 700
    assert out[(1, 3)]["decision"] == "possible"
    # (4,5): NULL langs agree (null-safe) -> 2200 match
    assert out[(4, 5)]["agree_lang"] and out[(4, 5)]["decision"] == "match"
    # (2,4): en vs NULL disagree, src0 vs src1 disagree -> -1200 non_match
    assert out[(2, 4)]["score_milli"] == -1200
    assert out[(2, 4)]["decision"] == "non_match"

    import pytest as _pt
    with _pt.raises(ValueError, match="must not be empty"):
        fellegi_sunter(pairs, recs, {})
    with _pt.raises(ValueError, match="lower"):
        fellegi_sunter(pairs, recs, fw, upper_milli=0, lower_milli=1)


def test_fellegi_sunter_deterministic_across_parallelism(spark):
    from tstore_spark.operators.dedup import fellegi_sunter

    recs = spark.createDataFrame(
        [(i, f"l{i % 5}", f"s{i % 3}") for i in range(500)],
        "doc_id long, lang string, source string")
    pairs = spark.createDataFrame(
        [(i, (i + 7) % 500) for i in range(500)], "id_a long, id_b long")
    fw = {"lang": (1000, -500), "source": (600, -300)}
    a = sorted(map(tuple, fellegi_sunter(
        pairs.repartition(1), recs.repartition(1), fw).collect()))
    b = sorted(map(tuple, fellegi_sunter(
        pairs.repartition(13), recs.repartition(7), fw).collect()))
    assert a == b
