"""Generator determinism + FIXTURES.md F1-F3 invariants."""

import numpy as np
import pandas as pd

from tstore_spark.datagen import (
    DOMAINS,
    attrs_pandas,
    pages_pandas,
    pages_spark,
    tstore_parity_pandas,
)


def test_pages_deterministic():
    a = pages_pandas(rows=1500)
    b = pages_pandas(rows=1500)
    pd.testing.assert_frame_equal(a, b)


def test_pages_schema_and_invariants(pages_pdf):
    df = pages_pdf
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    # byte-identity: text is a pure function of url (same across re-crawls)
    per_url = df.groupby("url")["text"].nunique()
    assert (per_url == 1).all()
    # each url appears at most once per warc_ts
    assert not df.duplicated(["url", "warc_ts"]).any()
    # html embeds text bytes exactly
    row = df.iloc[0]
    assert row["html"] == b"<html><body>" + row["text"].encode("utf-8") + b"</body></html>"
    # non-ASCII present somewhere (multibyte UTF-8 invariant)
    assert df["text"].str.contains("[^\x00-\x7f]", regex=True).any()
    # time range
    assert df["warc_ts"].min() >= pd.Timestamp("2024-01-01")
    assert df["warc_ts"].max() < pd.Timestamp("2024-01-08")
    # zipf skew: first domain is the hottest
    dom = df["url"].str.extract(r"https://([^/]+)/", expand=False)
    counts = dom.value_counts()
    assert counts.index[0] == DOMAINS[0]


def test_pages_spark_matches_pandas(spark):
    """Distributed generation == driver generation, bit for bit."""
    pdf = pages_pandas(rows=800)
    sdf = pages_spark(spark, rows=800, parallelism=4).toPandas()
    sdf = sdf.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
    pdf = pdf.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
    sdf["html"] = sdf["html"].map(bytes)
    sdf["warc_ts"] = sdf["warc_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(sdf, pdf)


def test_pages_spark_parallelism_invariant(spark):
    a = pages_spark(spark, rows=500, parallelism=1).toPandas()
    b = pages_spark(spark, rows=500, parallelism=7).toPandas()
    key = ["url", "warc_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    a["html"] = a["html"].map(bytes)
    b["html"] = b["html"].map(bytes)
    pd.testing.assert_frame_equal(a, b)


def test_attrs():
    a = attrs_pandas()
    assert len(a) == len(DOMAINS)
    assert a["static_var1"].iloc[0] == "A"
    assert a["geometry_wkb"].map(len).eq(21).all()  # WKB point = 1+4+8+8


def test_parity_table_shape():
    t = tstore_parity_pandas()
    # 4 ids x 48 hourly points = 192 rows (reference test_tslong.py:328-330)
    assert len(t) == 192
    assert t["tstore_id"].nunique() == 4
    assert t.groupby("tstore_id")["time"].count().eq(48).all()
    assert t["var2"].dtype == np.int64
