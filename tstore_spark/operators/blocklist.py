"""Blocklist filtering: substring wordlists and domain suffix lists.

The policy-filter pass of a web-corpus pipeline (CCNet / RefinedWeb run
URL-domain blocklists and bad-word lists before any expensive stage). Two
operators, each in the plan shape that survives 10^12 documents:

* **Substring wordlist** (:func:`blocklist_matches` / :func:`blocklist_filter`)
  — the corpus NEVER shuffles: patterns broadcast to every task and matching
  is a whole-stage-codegen ``contains`` + replace-count projection (the
  deliberate bounded-small-side nested loop, same posture as the bloom
  bitset probe). Counts are exact non-overlapping occurrence counts — the
  ``(len(t) - len(replace(t, p))) / len(p)`` identity, bit-identical in any
  engine. The pattern table must be broadcast-sized (wordlists are ~10^2-10^4
  entries); beyond ~10^4 the next valve is a trie automaton in an Arrow
  kernel — same output contract, swap the join.
* **Domain suffix blocklist** (:func:`domain_blocklist_filter`) — blocking
  ``example.com`` must also block ``a.b.example.com`` (registrable-domain
  semantics), which naively is an ``endswith`` nested loop over
  urls × domains. Exploding each host into its dot-suffixes turns it into
  a plain EQUI-join (hash-partitionable, AQE-planned) — a host has ≤ ~10
  suffixes, so the explode is a bounded constant factor and million-entry
  blocklists (the UT1 scale) stay shuffle-joinable with no nested loop
  anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pattern_df(docs: DataFrame, patterns) -> DataFrame:
    if isinstance(patterns, DataFrame):
        pdf = patterns
    else:
        if not patterns:
            raise ValueError("blocklist: empty pattern list — nothing to match")
        pdf = docs.sparkSession.createDataFrame(
            [(str(p),) for p in patterns], "pattern string"
        )
    if "pattern" not in pdf.columns:
        raise ValueError("patterns must have a 'pattern' column")
    # empty patterns match everywhere and zero the count divisor; the guard
    # rides the RETURNED pattern column so Catalyst cannot prune it away
    return pdf.select(
        F.when(
            F.length("pattern") > 0, F.col("pattern")
        ).otherwise(
            F.raise_error(F.lit("blocklist: empty pattern"))
        ).alias("pattern")
    )


def blocklist_matches(
    docs: DataFrame,
    patterns,
    id_col: str = "doc_id",
    text_col: str = "text",
    case_insensitive: bool = True,
) -> DataFrame:
    """Exact ``(id_col, pattern, n_hits)`` for every document × blocklist
    pattern with at least one occurrence. ``patterns`` is a list of strings
    or a broadcast-sized DataFrame with a ``pattern`` column; ``n_hits`` is
    the exact count of non-overlapping occurrences (BIGINT)."""
    pats = F.broadcast(_pattern_df(docs, patterns))
    t = F.lower(F.col(text_col)) if case_insensitive else F.col(text_col)
    p = F.lower(F.col("pattern")) if case_insensitive else F.col("pattern")
    return (
        docs.select(F.col(id_col), t.alias("_t"))
        .join(pats, F.contains(F.col("_t"), p))
        .select(
            id_col,
            "pattern",
            (
                (F.length("_t") - F.length(F.replace(F.col("_t"), p)))
                / F.length(p)
            ).cast("long").alias("n_hits"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    patterns,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
    case_insensitive: bool = True,
) -> DataFrame:
    """Documents whose TOTAL blocklist occurrence count is <= ``max_hits``
    (default 0: any hit blocks). Shape: the matches projection above, one
    small aggregate on (already-bounded) hit rows, one left-anti join back —
    the corpus text is scanned once and never shuffled."""
    hits = (
        blocklist_matches(docs, patterns, id_col, text_col, case_insensitive)
        .groupBy(id_col)
        .agg(F.sum("n_hits").alias("_n"))
        .where(F.col("_n") > max_hits)
        .select(id_col)
    )
    return docs.join(hits, id_col, "left_anti")


def domain_suffixes(host) -> "F.Column":
    """All dot-suffixes of a hostname: ``a.b.c -> [a.b.c, b.c, c]``."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def domain_blocklist_filter(
    docs: DataFrame,
    blocked,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents whose URL host is NOT covered by the blocklist
    (``blocked`` = list of domains or a DataFrame with a ``domain`` column;
    blocking a domain blocks all its subdomains). Suffix-explode equi-join:
    ≤ ~10 suffix rows per doc, hash-joinable at any blocklist size — never
    an ``endswith`` nested loop. Unparseable URLs (NULL host) survive; run
    them through url hygiene first if they should not."""
    if isinstance(blocked, DataFrame):
        bdf = blocked
    else:
        bdf = docs.sparkSession.createDataFrame(
            [(str(d),) for d in blocked], "domain string"
        )
    if "domain" not in bdf.columns:
        raise ValueError("blocked must have a 'domain' column")
    host = F.try_parse_url(F.col(url_col), F.lit("HOST"))
    hit_ids = (
        docs.select(F.col(id_col), F.explode(domain_suffixes(F.lower(host))).alias("_sfx"))
        .join(bdf.select(F.lower("domain").alias("_sfx")), "_sfx", "leftsemi")
        .select(id_col)
    )
    return docs.join(hit_ids, id_col, "left_anti")
