"""Crawl-frontier scheduling — politeness-aware fetch planning.

`operators/robots.py` decides WHETHER a URL may be fetched; this module
decides WHEN. A crawl frontier at web scale is a table of (url, host,
priority) rows, and the politeness contract — one request per host per
``delay_ms`` — turns scheduling into pure relational window math:

* ``slot`` — the URL's position in its host's fetch queue: one
  ``row_number`` window per host ordered by (priority DESC, url ASC) — a
  total order, so the plan is bit-identical at any parallelism.
* ``fetch_offset_ms = slot * delay_ms`` — the earliest polite fetch
  time relative to the host's crawl start. Integer arithmetic, exact.
* ``fetcher`` — which of ``n_fetchers`` workers owns the host: a
  portable digest of the host name (every URL of a host maps to the
  SAME fetcher — politeness is enforceable only if one worker owns the
  host's clock). ``ascii(substr(md5(host),1,1)) % n`` is deliberately
  engine-portable (the media_features idiom) so schedules are
  oracle-checkable; it costs ~2 bits of balance vs a full hash, which a
  64-way spread absorbs.

Scale: the only shuffle is the per-host window. A pathological host with
10^9 frontier URLs would make one giant partition — but a polite crawler
could never fetch it anyway (10^9 s of delay), so the honest valve is
``max_per_host``: the per-host crawl budget every real crawler has
(frontier rows past the budget drop from THIS schedule round and
re-enter the next). With a budget of B the window partition is cut to
the top-B rows per host... after ranking — so set the budget to bound
schedule SIZE, and rely on the frontier builder (priority thresholds,
per-host sampling) to bound the ranking input for adversarial hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def crawl_schedule(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str | None = None,
    delay_ms: int = 1000,
    n_fetchers: int = 64,
    max_per_host: int | None = None,
) -> DataFrame:
    """Plan one polite crawl round over the frontier.

    Returns ``(url, host, slot, fetch_offset_ms, fetcher)`` — one row per
    scheduled URL. With ``priority_col`` unset, hosts fetch in plain url
    order (still deterministic). ``max_per_host`` keeps only the first B
    slots per host (the crawl budget).
    """
    if delay_ms <= 0 or n_fetchers <= 0:
        raise ValueError("delay_ms and n_fetchers must be positive")
    order = (
        [F.desc(priority_col), F.asc(url_col)]
        if priority_col
        else [F.asc(url_col)]
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    out = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        (F.row_number().over(w) - 1).cast("bigint").alias("slot"),
    )
    if max_per_host is not None:
        if max_per_host <= 0:
            raise ValueError("max_per_host must be positive")
        out = out.where(F.col("slot") < int(max_per_host))
    return out.select(
        "url",
        "host",
        "slot",
        (F.col("slot") * F.lit(int(delay_ms))).cast("bigint").alias("fetch_offset_ms"),
        (F.ascii(F.substring(F.md5(F.col("host")), 1, 1)) % F.lit(int(n_fetchers)))
        .cast("int")
        .alias("fetcher"),
    )


def fetcher_load(schedule: DataFrame) -> DataFrame:
    """Per-fetcher accounting from a schedule: hosts owned, URLs queued,
    and the makespan (the slowest host's last fetch offset) — the number
    that says whether ``n_fetchers`` is sized right. Pure aggregate."""
    return schedule.groupBy("fetcher").agg(
        F.countDistinct("host").alias("n_hosts"),
        F.count(F.lit(1)).alias("n_urls"),
        F.max("fetch_offset_ms").alias("makespan_ms"),
    )


def plan_crawl_round(
    pages: DataFrame,
    seen_urls: DataFrame,
    robots_rules: DataFrame | None = None,
    priority_col: str | None = None,
    delay_ms: int = 1000,
    n_fetchers: int = 64,
    max_per_host: int | None = None,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One full frontier-planning round, composed from the layers that
    each carry their own proof: extracted links (graph.extract_links) →
    NEW urls only (anti-join against ``seen_urls``; the crawl ledger) →
    RFC 9309 compliance (robots.robots_allowed, skipped when ``rules`` is
    None) → polite schedule (:func:`crawl_schedule`). Returns the
    schedule columns plus nothing else — feed the fetch results back in
    as the next round's ``pages`` and union the scheduled urls into
    ``seen_urls``.

    Scale shape: links are edge-proportional; the seen-ledger anti-join
    is the only corpus-history-sized shuffle (keyed by url — bucket the
    ledger by url to co-locate it); robots rules broadcast-ish via the
    host equi-join; scheduling shuffles once per host window.

    Frontier urls deduplicate by MIN source url (deterministic) before
    scheduling — one fetch per target regardless of in-degree.
    """
    from tstore_spark.operators.graph import extract_links
    from tstore_spark.operators.robots import robots_allowed

    links = extract_links(pages, html_col=html_col, url_col=url_col)
    frontier = (
        links.groupBy(F.col("href").alias("url"))
        .agg(F.min("src_url").alias("discovered_via"))
        .join(seen_urls.select(F.col(url_col).alias("url")), "url", "left_anti")
    )
    if robots_rules is not None:
        frontier = robots_allowed(frontier, robots_rules).where(
            F.col("allowed")
        ).select("url", "discovered_via")
    frontier = frontier.withColumn(
        "host", F.coalesce(F.try_parse_url("url", F.lit("HOST")), F.lit(""))
    )
    return crawl_schedule(
        frontier,
        priority_col=priority_col,
        delay_ms=delay_ms,
        n_fetchers=n_fetchers,
        max_per_host=max_per_host,
    )


def recrawl_intervals(
    observations: DataFrame,
    url_col: str = "url",
    round_col: str = "crawl_round",
    sig_col: str = "content_sig",
    min_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """Adaptive revisit intervals from observed change history — the
    refresh-policy estimator of Cho & Garcia-Molina (TODS 2003) in exact
    integer form: pages that changed on most visits get recrawled every
    round, pages that never change back off toward ``max_interval``.

    Input: one row per (url, crawl_round) observation carrying any
    content signature (md5 of the text, a crawl_diff verdict — equality
    is all that is used). Per URL ordered by round:

    * ``n_obs`` observations, ``n_changes`` = count of consecutive
      observation pairs whose signatures differ (a gap of several rounds
      still counts as ONE observed change — the estimator is honest about
      what it saw, it does not extrapolate unobserved flips),
    * ``revisit_every = clamp((n_obs - 1) div max(n_changes, 1))`` into
      [min_interval, max_interval] — the mean observed rounds-per-change;
      a single observation (no pairs) is unknown-rate and gets
      ``min_interval`` (explore before backing off),
    * ``next_round = last_round + revisit_every``.

    Priorities for :func:`crawl_schedule` fall out as staleness:
    ``current_round - next_round``.

    Scale notes (100 TB ledger): ONE shuffle on url — the lag window and
    the per-url aggregate share the same hash partitioning, so Spark
    plans a single Exchange; state per url is four BIGINTs. All integer
    arithmetic — bit-identical at any parallelism and replayed verbatim
    by the SQL oracle.
    """
    if min_interval < 1:
        raise ValueError(f"min_interval must be >= 1, got {min_interval}")
    if max_interval < min_interval:
        raise ValueError("max_interval must be >= min_interval")
    # total order (round, sig): a ledger normally holds one observation per
    # (url, round), but if duplicates ever land (a crawler retry with a
    # different snapshot), the sig tiebreak keeps lag() — and therefore
    # n_changes — deterministic across partitioning instead of
    # layout-dependent
    sig = F.col(sig_col).cast("string")
    w = Window.partitionBy(url_col).orderBy(F.col(round_col).asc(), sig.asc())
    marked = observations.select(
        F.col(url_col).alias("url"),
        F.col(round_col).cast("long").alias("_round"),
        F.when(
            F.lag(sig).over(w).isNotNull() & (sig != F.lag(sig).over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum("_chg").alias("n_changes"),
        F.max("_round").alias("last_round"),
    )
    interval = F.when(
        F.col("n_obs") <= 1, F.lit(int(min_interval)).cast("long")
    ).otherwise(
        F.greatest(
            F.lit(int(min_interval)).cast("long"),
            F.least(
                F.lit(int(max_interval)).cast("long"),
                # exact integer division (never a double round-trip)
                F.expr("(n_obs - 1) div greatest(n_changes, 1)"),
            ),
        )
    )
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        "last_round",
        interval.alias("revisit_every"),
        (F.col("last_round") + interval).alias("next_round"),
    )
