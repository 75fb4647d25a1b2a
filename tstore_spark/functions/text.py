"""Text-analysis column builders for large-scale training-data pipelines.

All JVM-side Catalyst expressions (no Python in the hot path): language-ID
(stopword-hit heuristic), quality scoring (length + stopword-density mix),
token counting (whitespace + BPE-ish estimate), and document fingerprinting.

The reference (ltelab/tstore) has no text functions at all — its only scalar
family is datetime parts (tstore/archive/partitions.py:14-49). This module is
part of the web-scale graft: operations a 100 TB web-text pipeline needs.

Scale notes: every function here is a pure column expression → whole-stage
codegen, pushed projections, zero shuffles. ``size(split(...))`` and
``filter(...)`` run on the JVM per row without materializing Python objects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: small English function-word list used by the language-ID heuristic and the
#: quality score. Fixed and ordered — part of the deterministic contract.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "from", "be",
]


def tokens(text_col: str | Column, lower: bool = True) -> Column:
    """Whitespace tokens of the (optionally lowercased) text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lower:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def ws_token_count(text_col: str | Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    ).cast("long")


def approx_bpe_token_count(text_col: str | Column, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token estimate: ceil(chars / 4) — the standard rule of thumb
    for byte-pair encodings over English-like text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.ceil(F.length(c) / F.lit(chars_per_token)).cast("long")


def stopword_hits(text_col: str | Column, stopwords: list[str] | None = None) -> Column:
    """Number of tokens that are in the stopword list (with multiplicity —
    ``filter``, not ``array_intersect``, which would dedup)."""
    sw = stopwords or EN_STOPWORDS
    toks = tokens(text_col)
    sw_arr = F.array(*[F.lit(s) for s in sw])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t))).cast("long")


def stopword_fraction(text_col: str | Column) -> Column:
    """stopword_hits / token_count (0 for empty docs)."""
    n = ws_token_count(text_col)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_hits(text_col) / n)


def lang_id(text_col: str | Column, threshold: float = 0.05) -> Column:
    """Heuristic language ID: 'en' if the stopword fraction clears the
    threshold, else 'und' (undetermined). An n-gram-profile classifier would
    slot in the same way — one deterministic column expression per language
    profile, argmax via ``greatest``."""
    return F.when(stopword_fraction(text_col) >= F.lit(threshold), F.lit("en")).otherwise(
        F.lit("und")
    )


def quality_score(text_col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.5 * min(1, chars/1000) + 0.5 * min(1, 5*stopword_fraction).

    Length rewards substantive documents; stopword density rewards natural
    prose over keyword spam. Pure rational arithmetic in a fixed operation
    order — bit-identical on any engine evaluating IEEE doubles (deliberately
    NOT rounded: decimal rounding of a near-tie double is engine-dependent,
    the raw double is not).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    len_score = F.least(F.lit(1.0), F.length(c) / F.lit(1000.0))
    stop_score = F.least(F.lit(1.0), stopword_fraction(text_col) * F.lit(5.0))
    return len_score * F.lit(0.5) + stop_score * F.lit(0.5)


def fingerprint(text_col: str | Column) -> Column:
    """Canonical document fingerprint: md5 of the lowercased, trimmed text.

    Used as the exact-dedup key; a rolling/winnowing fingerprint family can
    layer on top (see operators/dedup.py simhash/minhash for the fuzzy tiers).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(F.trim(c)))


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality rules — Rae et al. 2021, §A1.1):
# repeated lines, dominant n-grams, and token runs mark low-quality
# boilerplate/spam. All pure Catalyst expressions: ratios of integer counts,
# so the doubles are engine-exact (no rounding).
# ---------------------------------------------------------------------------


def lines(text_col: str | Column) -> Column:
    """Lines of the document (split on newline; blank lines count — runs of
    blank lines are themselves a duplication signal)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, "\n")


def dup_line_fraction(text_col: str | Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line:
    1 - distinct/total (0 for single-line docs)."""
    ls = lines(text_col)
    n = F.size(ls)
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(ls)) / n
    )


def word_bigrams(text_col: str | Column, toks: Column | None = None) -> Column:
    """NON-distinct word bigrams (multiplicity matters for dominance).

    Pass ``toks`` = a pre-tokenized array HOISTED into a named column when
    composing several token signals over the same text: the transform lambda
    references the token array per element, and an un-hoisted split()
    expression is re-evaluated on every reference (this repo measured
    22-90x slowdowns for that pattern — see with_hashed_shingles)."""
    t = toks if toks is not None else tokens(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
    )


def _max_sorted_run(arr: Column) -> Column:
    """Length of the longest run of equal consecutive elements in a SORTED
    array — i.e. the max multiplicity — via one aggregate() fold
    (state: previous element, current run, best run)."""
    state = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(arr, state, step, lambda acc: acc["best"])


def top_bigram_fraction(text_col: str | Column, toks: Column | None = None) -> Column:
    """Fraction of word bigrams taken by the single most frequent bigram
    (0 for docs under two tokens). Dominant bigrams mark templated spam.

    ``toks``: pre-tokenized array column (hoist it — see word_bigrams). The
    bigram count is computed arithmetically (greatest(n_tokens-1, 1) — the
    sequence length by construction) instead of size(bigrams), so the bigram
    transform is evaluated exactly once, inside the sorted-run fold."""
    t = toks if toks is not None else tokens(text_col)
    bg = word_bigrams(text_col, toks=t)
    n_bg = F.greatest(F.size(t) - F.lit(1), F.lit(1))
    return F.when(F.size(t) < 2, F.lit(0.0)).otherwise(
        _max_sorted_run(F.array_sort(bg)) / n_bg
    )


def max_token_run(text_col: str | Column, toks: Column | None = None) -> Column:
    """Longest run of the SAME consecutive token ("buy buy buy buy…");
    0 for empty docs. The run fold works on any array — over the unsorted
    token array it measures consecutive repetition in document order.
    ``toks``: pre-tokenized array column (hoist it — see word_bigrams)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = toks if toks is not None else tokens(text_col)
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        _max_sorted_run(t)
    ).cast("long")


def symbol_word_ratio(text_col: str | Column) -> Column:
    """Non-alphanumeric, non-whitespace characters per whitespace token
    (0 for empty docs) — the classic symbol-spam signal."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    symbols = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    n = ws_token_count(text_col)
    return F.when(n == 0, F.lit(0.0)).otherwise(symbols / n)


#: GPT-2-style pretokenizer pattern (contraction suffixes, letter runs,
#: number runs, punctuation runs, whitespace runs) — the public BPE
#: pre-tokenization shape (Radford et al. 2019); Java regex and RE2 agree
#: on it (asserted by the doc_stats oracle), so counts are engine-portable.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_regex_token_count(text_col: str | Column) -> Column:
    """Pre-token count under the GPT-2-style pretokenizer regex — a much
    closer BPE-cost proxy than chars/4 (each pre-token splits into >= 1 BPE
    tokens, so this is a lower bound with the right shape), still a pure
    codegen expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_PATTERN)).cast("long")


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003): the
# rolling-hash document fingerprint family. Character k-grams are hashed,
# and each sliding window of w consecutive gram hashes contributes its
# minimum — guaranteeing any shared substring of length >= k + w - 1 between
# two documents shares at least one selected fingerprint.
# ---------------------------------------------------------------------------


def with_winnowing_fingerprints(df, id_col: str = "doc_id", text_col: str = "text",
                                k: int = 5, w: int = 4, out_col: str = "fps"):
    """(id, fps array<long>): distinct winnowed k-gram fingerprints.

    The k-gram hash is the first 32 bits of md5 — deliberately an
    engine-portable construction (DuckDB: ``('0x' || substr(md5(...), 1,
    8))::BIGINT``) so fingerprint sets can be recomputed and audited in SQL.
    The gram-hash array is HOISTED into a named column before the window-min
    pass (referencing an un-hoisted transform re-evaluates it per element —
    see operators/dedup.with_hashed_shingles). Short docs (< k chars) yield
    one gram over the whole text; docs with fewer than w grams one window.
    """
    c = F.col(text_col)
    n_grams = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(c.substr(i, F.lit(k))), 1, 8), 16, 10).cast("long"),
    )
    staged = df.select(F.col(id_col), grams.alias("_gh"))
    gh = F.col("_gh")
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(gh) - F.lit(w - 1), F.lit(1))),
        lambda j: F.array_min(F.slice(gh, j, w)),
    )
    return staged.select(F.col(id_col), F.array_distinct(wins).alias(out_col))


# ---------------------------------------------------------------------------
# PII redaction — deterministic regex scrubbing of the patterns a pretraining
# pipeline must not emit (emails, IPv4 addresses, long digit runs such as
# card/account numbers). Patterns are deliberately restricted to syntax both
# Java regex (Spark) and RE2 (DuckDB, Go tooling) interpret identically —
# no lookaround, no backreferences — so the scrub is engine-portable and
# auditable in SQL. All pure codegen regexp_replace: zero shuffle.
# ---------------------------------------------------------------------------

#: applied IN ORDER (emails first: their local parts may contain digit runs)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<NUMBER>"),
]


def redact_pii(text_col: str | Column) -> Column:
    """Text with emails, IPv4 addresses, and 13-19-digit runs replaced by
    typed placeholders. Apply at ingest (``stats_columns``-style) or as a
    final corpus pass; composition with the quality gates is free since all
    are scan-time expressions."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(text_col: str | Column) -> Column:
    """struct(n_email, n_ip, n_number): how many of each PII pattern a
    document contains (audit metric for the scrub pass)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    counts = []
    names = ["n_email", "n_ip", "n_number"]
    for (pat, rep), name in zip(PII_PATTERNS, names):
        counts.append(F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(name))
        # later patterns must not see earlier matches (an email's digits are
        # not a card number) — count against the progressively-redacted text
        c = F.regexp_replace(c, pat, rep)
    return F.struct(*counts)


# ---------------------------------------------------------------------------
# HTML -> text extraction (the Common-Crawl ingest step)
# ---------------------------------------------------------------------------

#: strip chain for ``html_to_text``, applied in order. Patterns are
#: restricted to the Java-regex/RE2 common subset (inline (?si) flags, lazy
#: quantifiers, no backrefs, no lookaround) so a SQL oracle on another
#: engine can run the identical chain — same discipline as PII_PATTERNS.
HTML_STRIP_PATTERNS = [
    (r"(?si)<script[^>]*>.*?</script>", ""),  # executable payloads first:
    (r"(?si)<style[^>]*>.*?</style>", ""),    # their BODIES must not leak
    (r"(?s)<!--.*?-->", ""),                  # into the text
    (r"<[^>]*>", ""),                         # then any remaining tag
]

#: entity decode chain. ``&amp;`` is deliberately LAST: a literal
#: "&amp;lt;" in the source must decode to the text "&lt;", not "<" —
#: decoding the specific entities first cannot match the "&amp;"-escaped
#: forms (their "&" is spelled "&amp;"), and the final pass unescapes it.
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_to_text(
    html_col: str | Column,
    input_is_binary: bool = True,
    collapse_ws: bool = False,
) -> Column:
    """Deterministic HTML -> text extraction: drop script/style/comment
    bodies, strip remaining tags, decode the common entities.

    This is the ingest step of a Common-Crawl-style pipeline (the engine's
    page table carries ``html binary`` next to the extracted ``text`` — the
    per-row invariant is that extraction is reproducible byte-for-byte, cf.
    BASELINE input_hint). Pure Catalyst expression chain: whole-stage
    codegen, zero shuffle, runs at scan time so the raw html column can be
    pruned immediately after.

    ``collapse_ws=True`` additionally squeezes whitespace runs to single
    spaces and trims — use for display/tokenization, NOT when byte-identity
    against an existing text column must hold.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    if input_is_binary:
        c = F.decode(c, "UTF-8")
    for pat, rep in HTML_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def word_ngrams(text_col: str | Column, n: int, toks: Column | None = None) -> Column:
    """NON-distinct word n-grams joined with single spaces; empty array for
    texts shorter than n tokens. ``sequence`` is guarded with a when():
    Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an empty list.
    Hoist ``toks`` when composing multiple token signals (see word_bigrams)."""
    t = toks if toks is not None else tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
