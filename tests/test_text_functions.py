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


# -- repetition signals (Gopher-style) ----------------------------------------

def test_dup_line_fraction(spark):
    from tstore_spark.functions.text import dup_line_fraction

    df = spark.createDataFrame(
        [(0, "a\nb\nc"), (1, "a\na\na\nb"), (2, "single"), (3, "x\nx")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["f"] for r in df.select("doc_id", dup_line_fraction("text").alias("f")).collect()}
    assert got[0] == 0.0
    assert got[1] == 1.0 - 2.0 / 4.0
    assert got[2] == 0.0
    assert got[3] == 0.5


def test_top_bigram_fraction_and_token_run(spark):
    from tstore_spark.functions.text import max_token_run, top_bigram_fraction

    df = spark.createDataFrame(
        [
            (0, "buy now buy now buy now"),     # 'buy now' dominates
            (1, "all words here are unique"),
            (2, "spam spam spam spam ok"),      # 4-token run
            (3, "one"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            top_bigram_fraction("text").alias("bg"),
            max_token_run("text").alias("run"),
        ).collect()
    }
    assert rows[0]["bg"] == 3.0 / 5.0   # bigrams: bn,nb,bn,nb,bn -> 'buy now' x3 of 5
    assert rows[1]["bg"] == 1.0 / 4.0
    assert rows[2]["run"] == 4
    assert rows[1]["run"] == 1
    assert rows[3]["bg"] == 0.0 and rows[3]["run"] == 1
    assert rows[4]["run"] == 0


def test_symbol_word_ratio(spark):
    from tstore_spark.functions.text import symbol_word_ratio

    df = spark.createDataFrame(
        [(0, "clean words only"), (1, "$$$ !!! ###"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", symbol_word_ratio("text").alias("s")).collect()}
    assert got[0] == 0.0
    assert got[1] == 9.0 / 3.0
    assert got[2] == 0.0


def test_bpe_regex_token_count(spark):
    from tstore_spark.functions.text import bpe_regex_token_count

    df = spark.createDataFrame(
        [(0, "Hello world"), (1, "it's 2024, really!"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", bpe_regex_token_count("text").alias("n")).collect()}
    # "Hello world" -> ["Hello", " world"]
    assert got[0] == 2
    # "it's 2024, really!" -> [it]['s][ 2024][,][ really][!]
    assert got[1] == 6
    assert got[2] == 0


def test_winnowing_fingerprints_guarantee(spark):
    """Winnowing guarantee: documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint; disjoint-alphabet docs
    share none."""
    from tstore_spark.functions.text import with_winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (0, "AAAA " + shared + " BBBB"),
            (1, "CCCC " + shared + " DDDD"),
            (2, "zzzzzzzz yyyyyy xxxxxx wwwww"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in with_winnowing_fingerprints(df, k=5, w=4).collect()}
    assert fps[0] & fps[1]          # shared substring -> shared fingerprint
    assert not (fps[0] & fps[2])    # disjoint alphabets -> disjoint prints
    assert len(fps[3]) == 1         # sub-k doc: one whole-text gram


def test_winnowing_deterministic(spark):
    from tstore_spark.functions.text import with_winnowing_fingerprints

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: list(r["fps"]) for r in with_winnowing_fingerprints(docs).collect()}
    b = {r["doc_id"]: list(r["fps"]) for r in with_winnowing_fingerprints(docs.repartition(7)).collect()}
    assert a == b


def test_redact_pii(spark):
    import pandas as pd

    from tstore_spark.functions.text import pii_counts, redact_pii

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "contact alice.smith+spam@sub.example.co.uk or 10.0.255.3 today",
            "card 4111111111111111 expires soon; short 12345 stays",
            "clean text with no secrets at all",
        ],
    })
    df = spark.createDataFrame(pdf)
    got = {r["doc_id"]: r["t"] for r in df.select("doc_id", redact_pii("text").alias("t")).collect()}
    assert got[1] == "contact <EMAIL> or <IP> today"
    assert got[2] == "card <NUMBER> expires soon; short 12345 stays"
    assert got[3] == "clean text with no secrets at all"
    c = {r["doc_id"]: r["c"] for r in df.select("doc_id", pii_counts("text").alias("c")).collect()}
    assert (c[1]["n_email"], c[1]["n_ip"], c[1]["n_number"]) == (1, 1, 0)
    assert (c[2]["n_email"], c[2]["n_ip"], c[2]["n_number"]) == (0, 0, 1)
    assert (c[3]["n_email"], c[3]["n_ip"], c[3]["n_number"]) == (0, 0, 0)


def test_html_to_text_byte_identity_on_pages(spark):
    """The input_hint invariant: extracting the datagen html column
    reproduces the text column byte-for-byte on every row."""
    from tstore_spark.datagen import pages_spark

    pages = pages_spark(spark, rows=500, seed=7)
    n_bad = (
        pages.select(TX.html_to_text("html").alias("ex"), "text")
        .where("ex IS DISTINCT FROM text")
        .count()
    )
    assert n_bad == 0


def test_html_to_text_strip_and_entities(spark):
    cases = [
        # script/style/comment bodies must vanish entirely
        ("<html><script>var x = '<b>not text</b>';</script><body>hi</body></html>", "hi"),
        ("<style>p{color:red}</style>one<!-- secret --> two", "one two"),
        # SCRIPT case-insensitive, multiline body
        ("<SCRIPT type='t'>\nline1\nline2\n</SCRIPT>ok", "ok"),
        # entity decoding, &amp; last: "&amp;lt;" is the literal text "&lt;"
        ("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; &amp; done", 'a <tag> "q" \'s\'   & done'),
        ("escaped: &amp;lt;", "escaped: &lt;"),
        # unclosed tag fragments stay (no tag match) — honest behavior
        ("broken < not a tag", "broken < not a tag"),
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(cases, columns=["html", "want"]))
    got = df.select(TX.html_to_text("html", input_is_binary=False).alias("ex"), "want").collect()
    for r in got:
        assert r["ex"] == r["want"], (r["ex"], r["want"])


def test_html_to_text_matches_duckdb_chain(spark):
    """Engine-portability: the identical pattern chain in DuckDB (RE2)
    produces identical bytes on hostile inputs — the property the driver
    oracle depends on."""
    import duckdb
    import pandas as pd

    texts = [
        "<html><head><title>t</title><style a=b>x{}</style></head>"
        "<body><p class='c'>alpha &amp; beta</p><script>if (a<b) {}</script></body></html>",
        "plain text no markup",
        "<div><div><div>nested</div></div></div>",
        "entities &lt;&gt;&quot;&#39;&nbsp;&amp; twice &amp;&amp;",
        "<a href='x?y=1&z=2'>link</a> tail",
        "",
    ]
    pdf = pd.DataFrame({"html": texts})
    got = (
        spark.createDataFrame(pdf)
        .select(TX.html_to_text("html", input_is_binary=False).alias("ex"))
        .toPandas()["ex"]
        .tolist()
    )
    con = duckdb.connect()
    expr = "html"
    for pat, rep in TX.HTML_STRIP_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    for ent, ch in TX.HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{ch_sql}')"
    want = [r[0] for r in con.execute(f"SELECT {expr} FROM pdf").fetchall()]
    assert got == want


# -- canonical_url -------------------------------------------------------------

CANON_CASES = [
    ("HTTP://ExAmple.COM:80/Path/To?q=1#frag", "http://example.com/Path/To?q=1"),
    ("https://Host.Org:443/", "https://host.org/"),
    ("https://host.org:8443/x", "https://host.org:8443/x"),
    ("http://a.b/p?utm_source=x&utm_medium=y&utm_campaign=z&q=2", "http://a.b/p?q=2"),
    ("http://a.b/p?q=2&fbclid=abc", "http://a.b/p?q=2"),
    ("http://a.b/p?utm_source=x", "http://a.b/p"),
    ("http://a.b/p?gclid=1&utm_a=2&utm_b=3&utm_c=4&utm_d=5", "http://a.b/p"),
    ("http://a.b/p?xutm_a=keep&q=3", "http://a.b/p?xutm_a=keep&q=3"),
    ("no-scheme/path?utm_source=x", "no-scheme/path"),
]


def test_canonical_url_cases(spark):
    import pandas as pd
    from tstore_spark.functions.urls import canonical_url

    pdf = pd.DataFrame({"u": [c[0] for c in CANON_CASES]})
    got = [
        r["c"]
        for r in spark.createDataFrame(pdf)
        .select(canonical_url("u").alias("c"))
        .collect()
    ]
    assert got == [c[1] for c in CANON_CASES]


def test_canonical_url_sql_twin_agrees(spark):
    """The generated DuckDB chain must produce byte-identical output."""
    import duckdb
    import pandas as pd
    from tstore_spark.functions.urls import canonical_url, canonical_url_sql

    inputs = [c[0] for c in CANON_CASES] + [
        "HTTPS://WWW.Site.com:443/A/B?fbclid=z&utm_x=1&keep=2#x",
        "http://h:80", "http://h:80?utm_a=1",
    ]
    pdf = pd.DataFrame({"u": inputs})
    spark_out = [
        r["c"]
        for r in spark.createDataFrame(pdf).select(canonical_url("u").alias("c")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    duck_out = [r[0] for r in con.execute(f"SELECT {canonical_url_sql('u')} FROM t").fetchall()]
    assert spark_out == duck_out
