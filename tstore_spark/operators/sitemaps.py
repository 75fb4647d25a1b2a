"""Sitemap ingestion: parse sitemaps.org XML (urlset + sitemapindex) and
derive crawl-frontier candidates — the discovery half of the crawl
compliance story whose enforcement half is :mod:`operators.robots`
(RFC 9309) and whose scheduling half is :mod:`operators.crawl`.

Reference parity note: the reference engine has no crawl layer at all —
this module exists for the web-archive graft (BASELINE.json north star:
Common-Crawl-style pages), where sitemap files arrive exactly like robots
files do: one KB-sized XML document per (host, path), fetched by the
crawler and landed as (sitemap_url, body) rows.

Why regex blocks and not XPath: Spark's ``xpath_*`` functions return the
STRING-VALUE of matched nodes, so ``/urlset/url/loc`` and
``/urlset/url/lastmod`` come back as two independent arrays that misalign
the moment one ``<url>`` omits ``<lastmod>`` (optional per the schema).
Extracting each ``<url>…</url>`` block first and then pulling fields out
of the block keeps optional fields attached to their entry. Everything is
``regexp_extract_all`` + ``explode`` + pure string expressions — one
whole-stage-codegen'd projection, no UDF, no shuffle beyond the explode
(entry-proportional, as any parse must be). The DuckDB side can replay
the same extraction, but the gate row instead generates the XML from an
algebraic row set and asserts the parse RECOVERS the generating set —
an independent oracle, per the robots-gate lesson.

Spec subset implemented (documented bluntly):

* ``<urlset>`` entries: ``loc`` (required; entries without it are
  dropped), ``lastmod``, ``changefreq``, ``priority`` (optional; NULL
  when absent).
* ``<sitemapindex>`` entries: ``loc`` + ``lastmod`` of child sitemaps
  (``kind = 'sitemap'``) — callers fetch those and feed the bodies back
  through the same parser; the engine does not fetch.
* CDATA sections and the five XML entities (&amp;amp; &amp;lt; &amp;gt;
  &amp;quot; &amp;apos;) are unescaped in field values, in that order
  (CDATA strip first, then entities, ``&amp;amp;`` LAST so it cannot
  create new entity matches — the standard unescape ordering).
* Same-host discipline: sitemaps.org scopes a sitemap's authority to its
  own host; ``same_host`` carries that verdict so callers can enforce or
  audit it (cross-host entries are flagged, not silently dropped).

Scale notes (100 TB): sitemap corpora are host-proportional (millions of
KB files, not billions of pages) — the parse is a projection over them;
``frontier_candidates`` is one anti-join against the crawl ledger keyed
on canonical URL, the same shape as crawl.plan_crawl_round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.urls import canonical_url, domain_of

#: lazy block matchers — (?s) so entries spanning lines match; non-greedy
#: so adjacent blocks never merge
_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"


def _field(block: Column, tag: str) -> Column:
    """One optional simple element's text from an entry block: NULL when
    the tag is absent (regexp_extract returns '' on no match — mapped to
    NULL so absence is distinguishable from an empty element)."""
    raw = F.regexp_extract(block, rf"(?s)<{tag}\b[^>]*>(.*?)</{tag}>", 1)
    return F.when(raw != "", _unescape(F.trim(raw)))


def _unescape(c: Column) -> Column:
    """CDATA strip + the five XML entities, &amp; last (unescape order)."""
    c = F.regexp_replace(c, r"(?s)<!\[CDATA\[(.*?)\]\]>", r"$1")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemaps(
    df: DataFrame,
    url_col: str = "sitemap_url",
    body_col: str = "body",
) -> DataFrame:
    """Entries of every sitemap body: one row per ``<url>`` (kind 'url')
    or ``<sitemap>`` index child (kind 'sitemap'), with unescaped fields.

    Output: (sitemap_url, kind, loc, lastmod, changefreq, priority,
    same_host). ``priority`` stays a string (the schema allows junk; cast
    at use), ``lastmod`` stays the raw W3C datetime string — time-zone
    interpretation is the caller's policy (NTZ discipline), and
    ``frontier_candidates`` only needs its date prefix. Entries without a
    ``<loc>`` are dropped (unaddressable); nothing else is validated —
    a sitemap is crawl input, and refusing a malformed optional field
    would drop the URL with it."""
    su = F.col(url_col)
    body = F.col(body_col)
    entries = df.select(
        su.alias("sitemap_url"),
        F.explode(
            F.concat(
                F.transform(
                    F.regexp_extract_all(body, F.lit(_URL_BLOCK), F.lit(1)),
                    lambda b: F.struct(F.lit("url").alias("kind"), b.alias("block")),
                ),
                F.transform(
                    F.regexp_extract_all(body, F.lit(_SITEMAP_BLOCK), F.lit(1)),
                    lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("block")),
                ),
            )
        ).alias("e"),
    )
    out = entries.select(
        "sitemap_url",
        F.col("e.kind").alias("kind"),
        _field(F.col("e.block"), "loc").alias("loc"),
        _field(F.col("e.block"), "lastmod").alias("lastmod"),
        _field(F.col("e.block"), "changefreq").alias("changefreq"),
        _field(F.col("e.block"), "priority").alias("priority"),
    ).where(F.col("loc").isNotNull())
    return out.withColumn(
        "same_host", domain_of(F.col("loc")) == domain_of(F.col("sitemap_url"))
    )


def frontier_candidates(
    sitemap_entries: DataFrame,
    crawl_ledger: DataFrame | None = None,
    ledger_url_col: str = "url",
    enforce_same_host: bool = True,
) -> DataFrame:
    """Crawl-frontier candidates from parsed sitemap entries: page URLs
    (kind 'url'), optionally restricted to same-host entries (the
    sitemaps.org authority rule; cross-host entries are advisory only),
    deduplicated on canonical URL keeping the best-evidenced entry, and
    anti-joined against the crawl ledger (URLs already fetched).

    Survivor per canonical URL: max (lastmod, loc) — the most recently
    asserted modification wins, NULL lastmod loses to any dated claim,
    ties break on loc text; one min/max groupBy, the same total-order
    struct idiom as corpus.dedup_paragraphs.

    Output: (canon_url, loc, lastmod, n_sitemaps). Scale: one groupBy on
    canon_url + one anti-join — both entry-proportional."""
    cands = sitemap_entries.where(F.col("kind") == "url")
    if enforce_same_host:
        cands = cands.where(F.col("same_host"))
    best = (
        cands.groupBy(canonical_url(F.col("loc")).alias("canon_url"))
        .agg(
            F.max(F.struct(F.col("lastmod"), F.col("loc"))).alias("_b"),
            F.count("*").alias("n_sitemaps"),
        )
        .select(
            "canon_url",
            F.col("_b.loc").alias("loc"),
            F.col("_b.lastmod").alias("lastmod"),
            "n_sitemaps",
        )
    )
    if crawl_ledger is not None:
        seen = crawl_ledger.select(
            canonical_url(F.col(ledger_url_col)).alias("canon_url")
        ).dropDuplicates(["canon_url"])
        best = best.join(seen, "canon_url", "left_anti")
    return best
