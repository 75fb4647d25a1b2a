"""Unicode normalization (corpus.normalize_text) vs unicodedata reference."""

import unicodedata

import pytest

from tstore_spark.operators.corpus import normalize_text

DECOMP = "cafe\u0301 nai\u0308ve"  # e/i + combining marks
COMP = "caf\u00e9 na\u00efve"


def test_nfc_composes(spark):
    df = spark.createDataFrame(
        [(1, DECOMP), (2, COMP), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["norm_text"] for r in normalize_text(df).collect()}
    assert got[1] == COMP
    assert got[2] == COMP
    assert got[3] is None


def test_nfd_decomposes(spark):
    df = spark.createDataFrame([(1, COMP)], "doc_id long, text string")
    got = normalize_text(df, form="NFD").collect()[0]["norm_text"]
    assert got == unicodedata.normalize("NFD", COMP) == DECOMP


def test_nfkc_folds_compat(spark):
    # U+FB01 LATIN SMALL LIGATURE FI -> 'fi' under NFKC, untouched by NFC
    df = spark.createDataFrame([(1, "ﬁne")], "doc_id long, text string")
    assert normalize_text(df, form="NFKC").collect()[0]["norm_text"] == "fine"
    assert normalize_text(df, form="NFC").collect()[0]["norm_text"] == "ﬁne"


def test_strip_marks(spark):
    df = spark.createDataFrame(
        [(1, DECOMP), (2, COMP)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(df, strip_marks=True).collect()}
    assert got == {1: "cafe naive", 2: "cafe naive"}


def test_collapse_ws(spark):
    df = spark.createDataFrame([(1, "  a \t b\n\nc ")], "doc_id long, text string")
    assert (
        normalize_text(df, collapse_ws=True).collect()[0]["norm_text"] == "a b c"
    )


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")


def test_other_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "en", COMP)], "doc_id long, lang string, text string"
    )
    row = normalize_text(df).collect()[0]
    assert (row["doc_id"], row["lang"], row["text"]) == (1, "en", COMP)


def test_matches_duckdb_nfc(spark):
    import duckdb

    df = spark.createDataFrame(
        [(1, DECOMP), (2, "plain ascii")], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["norm_text"]) for r in normalize_text(df).collect()
    )
    want = sorted(
        duckdb.sql(
            "SELECT doc_id, nfc_normalize(text) FROM (VALUES "
            f"(1, 'cafe' || chr(769) || ' nai' || chr(776) || 've'),"
            "(2, 'plain ascii')) t(doc_id, text)"
        ).fetchall()
    )
    assert got == want
