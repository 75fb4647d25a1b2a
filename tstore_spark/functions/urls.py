"""URL helpers — all JVM-side expressions (no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# canonicalization pattern table — shared verbatim with the SQL twin
# (canonical_url_sql) so the two chains cannot drift. RE2-compatible (no
# backrefs/lookaround), literal replacements only; the tracking-param pass
# is applied TRACKING_PASSES times because consecutive params hide behind
# the separator the previous match consumed.
SCHEME_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
TRACKING_PATTERNS: list[tuple[str, str]] = [
    (r"\?(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&", "?"),
    (r"&(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&", "&"),
    (r"\?(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*$", ""),
    (r"&(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*$", ""),
]
TRACKING_PASSES = 3


def canonical_url(url: str | Column) -> Column:
    """Engine-portable URL canonicalization, all codegen expressions:
    fragment stripped, scheme+host lowercased (path/query case preserved),
    default ports (:80 http / :443 https) dropped, utm_*/fbclid/gclid
    tracking params removed. The exact same chain is emitted as SQL by
    :func:`canonical_url_sql`, which is what makes dedup keys computed here
    auditable in any other engine."""
    c = F.col(url) if isinstance(url, str) else url
    u0 = F.regexp_replace(c, "#.*$", "")
    pref = F.regexp_extract(u0, SCHEME_HOST_RE, 0)
    rest = F.substring(u0, F.length(pref) + F.lit(1), F.lit(1 << 30))
    pl = F.lower(pref)
    pl = (
        F.when(pl.startswith("http://") & pl.endswith(":80"),
               F.substring(pl, F.lit(1), F.length(pl) - F.lit(3)))
        .when(pl.startswith("https://") & pl.endswith(":443"),
              F.substring(pl, F.lit(1), F.length(pl) - F.lit(4)))
        .otherwise(pl)
    )
    u = F.concat(pl, rest)
    for _ in range(TRACKING_PASSES):
        for pat, rep in TRACKING_PATTERNS:
            u = F.regexp_replace(u, pat, rep)
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`canonical_url`, generated from the SAME
    pattern table (the _html_extract_oracle pattern)."""
    u0 = f"regexp_replace({expr}, '#.*$', '')"
    pref = f"regexp_extract({u0}, '{SCHEME_HOST_RE}')"
    pl = f"lower({pref})"
    pl = (
        f"CASE WHEN starts_with({pl}, 'http://') AND ends_with({pl}, ':80') "
        f"THEN substr({pl}, 1, length({pl}) - 3) "
        f"WHEN starts_with({pl}, 'https://') AND ends_with({pl}, ':443') "
        f"THEN substr({pl}, 1, length({pl}) - 4) ELSE {pl} END"
    )
    u = f"({pl} || substr({u0}, length({pref}) + 1))"
    for _ in range(TRACKING_PASSES):
        for pat, rep in TRACKING_PATTERNS:
            # standard SQL single-quote strings are raw: the '\?' escape
            # reaches RE2 untouched, matching Spark's Java-regex reading
            u = f"regexp_replace({u}, '{pat}', '{rep}', 'g')"
    return u


# URL-template pattern table — shared verbatim with the SQL twin
# (url_template_sql). Order matters and is most-specific-first: UUIDs would
# otherwise be shredded by the digit pass, long hex tokens by both. All
# RE2-compatible, literal replacements (placeholders contain no digits or
# hex letters, so later passes never touch earlier placeholders).
_HEXC = "[0-9a-fA-F]"
TEMPLATE_PATTERNS: list[tuple[str, str]] = [
    (rf"{_HEXC}{{8}}-{_HEXC}{{4}}-{_HEXC}{{4}}-{_HEXC}{{4}}-{_HEXC}{{12}}", "{uuid}"),
    (rf"{_HEXC}{{16,}}", "{hex}"),  # session ids, content hashes
    (r"[0-9]+", "{n}"),  # counters, item/page ids
    (r"=[^&#]*", "="),  # drop query VALUES, keep param names
]


def url_template(url: str | Column) -> Column:
    """Collapse a URL to its structural template: UUIDs -> ``{uuid}``, long
    hex tokens -> ``{hex}``, digit runs -> ``{n}``, query values dropped
    (param names kept). URLs minted by the same handler collapse to one
    template, which is what makes infinite URL spaces (calendars, session
    ids, faceted search — crawler traps) countable. Pure codegen
    ``regexp_replace`` chain; :func:`url_template_sql` is the SQL twin from
    the SAME pattern table."""
    u = F.col(url) if isinstance(url, str) else url
    for pat, rep in TEMPLATE_PATTERNS:
        u = F.regexp_replace(u, pat, rep)
    return u


def url_template_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`url_template` (same pattern table)."""
    u = expr
    for pat, rep in TEMPLATE_PATTERNS:
        u = f"regexp_replace({u}, '{pat}', '{rep}', 'g')"
    return u


def domain_of(url: str | Column) -> Column:
    """Extract the host from an http(s) URL with a built-in expression.

    ``parse_url`` runs in the JVM inside whole-stage codegen — this is the
    rollup key derivation for every page row, so it must never be Python.
    """
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("HOST")).alias("domain")


def surt_key(url: str | Column) -> Column:
    """SURT-style sort key (the Common-Crawl CDX ``urlkey`` shape):
    ``com,example)/path?a=1&b=2`` — host labels reversed and
    comma-joined, ``www.`` dropped, whole key lowercased, query params
    sorted (so ``?b&a`` and ``?a&b`` collide, the point of the key).
    Pure codegen: try_parse_url + split/reverse/array_join/array_sort —
    NULL for unparseable URLs (try_, never the raising parse_url; the
    Spark 4 INVALID_URL lesson).

    Documented subset of full SURT: no scheme folding beyond drop, no
    session-param stripping (compose with canonical_url for tracking
    params), userinfo/ports handled by parse_url's HOST extraction."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(F.lower(F.try_parse_url(c, F.lit("PATH"))), F.lit(""))
    query = F.lower(F.try_parse_url(c, F.lit("QUERY")))
    qpart = F.when(
        query.isNotNull() & (query != ""),
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")),
    ).otherwise(F.lit(""))
    return F.when(host.isNotNull(), F.concat(rev, F.lit(")"), path, qpart))
