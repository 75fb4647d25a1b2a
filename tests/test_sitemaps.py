"""Sitemap parsing: block extraction, optional fields, CDATA/entities,
index files, same-host rule, frontier dedup + ledger anti-join."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.sitemaps import frontier_candidates, parse_sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example.com/page1</loc>
    <lastmod>2024-03-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://a.example.com/q?x=1&y=2]]></loc></url>
  <url>
    <loc>https://a.example.com/amp?a=1&amp;b=2</loc>
    <lastmod>2024-04-05T10:00:00+00:00</lastmod>
  </url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://other.example.org/offsite</loc></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://b.example.com/sitemap-1.xml</loc>
    <lastmod>2024-02-02</lastmod>
  </sitemap>
  <sitemap><loc>https://b.example.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "sitemap_url": [
                    "https://a.example.com/sitemap.xml",
                    "https://b.example.com/sitemap.xml",
                ],
                "body": [URLSET, INDEX],
            }
        )
    )
    return parse_sitemaps(df)


def test_urlset_entries_and_optional_fields(parsed):
    rows = {
        r["loc"]: r
        for r in parsed.where(F.col("kind") == "url").collect()
    }
    # the loc-less entry is dropped: 4 of 5 survive
    assert len(rows) == 4
    full = rows["https://a.example.com/page1"]
    assert (full["lastmod"], full["changefreq"], full["priority"]) == (
        "2024-03-01",
        "daily",
        "0.8",
    )
    cdata = rows["https://a.example.com/q?x=1&y=2"]
    assert cdata["lastmod"] is None and cdata["priority"] is None
    assert rows["https://a.example.com/amp?a=1&b=2"]["lastmod"] == "2024-04-05T10:00:00+00:00"


def test_sitemapindex_and_same_host(parsed):
    idx = parsed.where(F.col("kind") == "sitemap").collect()
    assert sorted(r["loc"] for r in idx) == [
        "https://b.example.com/sitemap-1.xml",
        "https://b.example.com/sitemap-2.xml",
    ]
    assert {r["lastmod"] for r in idx} == {"2024-02-02", None}
    assert all(r["same_host"] for r in idx)
    by_loc = {r["loc"]: r["same_host"] for r in parsed.collect()}
    assert by_loc["https://other.example.org/offsite"] is False
    assert by_loc["https://a.example.com/page1"] is True


def test_unescape_order_amp_last(spark):
    # &amp;lt; must decode to the literal text "&lt;", never to "<"
    body = "<urlset><url><loc>https://h.example.com/x?q=&amp;lt;tag&amp;gt;</loc></url></urlset>"
    df = spark.createDataFrame(
        pd.DataFrame({"sitemap_url": ["https://h.example.com/s.xml"], "body": [body]})
    )
    [r] = parse_sitemaps(df).collect()
    assert r["loc"] == "https://h.example.com/x?q=&lt;tag&gt;"


def test_frontier_dedup_ledger_and_host_rule(spark, parsed):
    ledger = spark.createDataFrame(
        pd.DataFrame({"url": ["https://a.example.com/page1"]})
    )
    got = frontier_candidates(parsed, ledger)
    locs = {r["loc"] for r in got.collect()}
    # page1 is in the ledger; offsite is cross-host; the CDATA and amp
    # entries survive
    assert locs == {
        "https://a.example.com/q?x=1&y=2",
        "https://a.example.com/amp?a=1&b=2",
    }
    lax = frontier_candidates(parsed, ledger, enforce_same_host=False)
    assert lax.count() == 3


def test_frontier_survivor_prefers_dated_lastmod(spark):
    bodies = [
        "<urlset><url><loc>https://c.example.com/p</loc></url></urlset>",
        "<urlset><url><loc>https://c.example.com/p</loc>"
        "<lastmod>2024-05-05</lastmod></url></urlset>",
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "sitemap_url": [
                    "https://c.example.com/s1.xml",
                    "https://c.example.com/s2.xml",
                ],
                "body": bodies,
            }
        )
    )
    [r] = frontier_candidates(parse_sitemaps(df)).collect()
    assert r["lastmod"] == "2024-05-05" and r["n_sitemaps"] == 2


def test_deterministic_across_parallelism(spark):
    n = 300
    bodies = [
        f"<urlset><url><loc>https://p{i % 7}.example.com/d{i}</loc>"
        f"<lastmod>2024-01-{1 + i % 28:02d}</lastmod></url></urlset>"
        for i in range(n)
    ]
    pdf = pd.DataFrame(
        {
            "sitemap_url": [f"https://p{i % 7}.example.com/s.xml" for i in range(n)],
            "body": bodies,
        }
    )
    a = parse_sitemaps(spark.createDataFrame(pdf).repartition(1)).collect()
    b = parse_sitemaps(spark.createDataFrame(pdf).repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
