"""BPE tokenizer training/encoding vs a straight-line Python reference."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.bpe import (
    bpe_encode,
    bpe_oracle_sql,
    bpe_train,
    word_counts,
)

CORPUS = [
    (1, "low low low lower lower lowest"),
    (2, "new newer newest newest, NEW!"),
    (3, "widest wider wide low"),
    (4, "aaaa aaa banana bandana"),
]


def _ref_train(texts: list[str], merges: int, max_word_len: int = 64):
    """Independent straight-line BPE: dict word counts, overlapping pair
    counts, (count desc, l, r) argmax, greedy left-to-right merge."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w and len(w) <= max_word_len:
                words[w] += 1
    tbl = {w: list(w) for w in words}
    out = []
    for rank in range(merges):
        pc = Counter()
        for w, syms in tbl.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            raise ValueError("exhausted")
        # total order: count desc, then l asc, r asc
        cnt = max(pc.values())
        l, r = min(p for p, c in pc.items() if c == cnt)
        out.append((rank, l, r, l + r, cnt))
        for w, syms in tbl.items():
            ns = []
            for s in syms:
                if ns and ns[-1] == l and s == r:
                    ns[-1] = l + r
                else:
                    ns.append(s)
            tbl[w] = ns
    return out, tbl


def test_train_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, merges=6).collect()]
    want, _ = _ref_train([t for _, t in CORPUS], 6)
    assert got == want


def test_train_matches_duckdb_twin(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, merges=5).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in CORPUS).replace("!", "")
        + ") t(doc_id, text)"
    )
    orc = con.sql(
        bpe_oracle_sql("SELECT * FROM d", merges=5) + " ORDER BY rank"
    ).fetchall()
    assert got == orc


def test_greedy_run_parity(spark):
    # 'aaaa' must merge positions (0,1) and (2,3) -> two 'aa', never (1,2);
    # 'aaa' -> ['aa','a'] so (a,a) appears again in round 2 counts
    df = spark.createDataFrame([(1, "aaaa aaaa aaa")], "doc_id long, text string")
    rows = bpe_train(df, merges=2).collect()
    assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["pair_count"]) == ("a", "a", 8)
    # after round 1: aaaa->[aa,aa] (pair (aa,aa) freq 2), aaa->[aa,a]
    assert (rows[1]["lhs"], rows[1]["rhs"]) == ("aa", "aa")
    assert rows[1]["pair_count"] == 2


def test_tie_break_total_order(spark):
    # 'ab' and 'ba' both count 2: (a,b) wins on l asc
    df = spark.createDataFrame(
        [(1, "ab ab bab a")], "doc_id long, text string"
    )
    r = bpe_train(df, merges=1).collect()[0]
    assert (r["lhs"], r["rhs"]) == ("a", "b")


def test_exhausted_corpus_raises(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(df, merges=1)


def test_max_word_len_rule(spark):
    long_word = "z" * 80
    df = spark.createDataFrame(
        [(1, f"{long_word} qq qq")], "doc_id long, text string"
    )
    # the 80-char word is excluded by the rule; (q,q) wins with count 2
    r = bpe_train(df, merges=1, max_word_len=64).collect()[0]
    assert (r["lhs"], r["rhs"], r["pair_count"]) == ("q", "q", 2)
    wc = {r["word"]: r["freq"] for r in word_counts(df).collect()}
    assert long_word not in wc and wc["qq"] == 2


def test_encode_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merge_table = bpe_train(df, merges=6).collect()
    pairs = [(r["lhs"], r["rhs"]) for r in merge_table]
    enc = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["bpe_token_count"])
        for r in bpe_encode(df, pairs).collect()
    }
    _, ref_tbl = _ref_train([t for _, t in CORPUS], 6)
    import re

    for doc_id, text in CORPUS:
        want = [
            t
            for w in re.split(r"[^a-z0-9]+", text.lower())
            if w
            for t in ref_tbl[w]
        ]
        assert enc[doc_id][0] == want, doc_id
        assert enc[doc_id][1] == len(want)


def test_encode_null_text(spark):
    df = spark.createDataFrame(
        [(1, "low low"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["bpe_token_count"] for r in bpe_encode(df, [("l", "o")]).collect()}
    assert got == {1: 4, 2: 0}


def test_deterministic_across_parallelism(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(df.repartition(1), merges=4).collect()]
    b = [tuple(r) for r in bpe_train(df.repartition(7), merges=4).collect()]
    assert a == b


def test_marker_roundtrip_exact(spark):
    """mark_word_end: train + encode with the </w> marker, decode back —
    the token stream is losslessly invertible to the normalized words."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tstore_spark.operators.bpe import (
        bpe_decode_tokens,
        bpe_encode,
        bpe_train,
    )
    from tstore_spark.operators.search import _tokens

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "the lower newer lowest low low low",
            "newer newest new news",
            "The LOWER, newer... lowest!",
            "",
            "xyz",
            "wide wider widest low lower",
        ],
    }))
    merges = bpe_train(docs, merges=6, mark_word_end=True)
    rows = [(r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()]
    # marker must actually participate in training (word-final merges exist)
    assert any("</w>" in l + r for l, r in rows)
    enc = bpe_encode(docs, rows, mark_word_end=True)
    dec = bpe_decode_tokens(enc)
    want = {r["doc_id"]: r["w"] for r in docs.select(
        "doc_id", F.array_join(_tokens("text"), " ").alias("w")).collect()}
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    assert got == want
    # every word's token run ends with the marker exactly once
    one = enc.where("doc_id = 0").head()["bpe_tokens"]
    assert "".join(one).count("</w>") == 7


def test_marker_off_unchanged(spark):
    """Default (marker off) training is byte-identical to before the flag."""
    import pandas as pd

    from tstore_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "text": ["aa ab aa ab aa"]}))
    m = bpe_train(docs, merges=1)
    r = m.head()
    assert (r["lhs"], r["rhs"]) == ("a", "a") or "</w>" not in r["token"]
